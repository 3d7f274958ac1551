"""Trace ONLY the physics step at the 116k reference scale and print the top
device ops.  Usage: python tools/trace_step_116k.py"""

import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

from spacetime_tpu import scene  # noqa: E402
from spacetime_tpu.models.softbody import SoftbodyModel  # noqa: E402
from spacetime_tpu.ops import forces as forces_ops  # noqa: E402


def main():
    n_half = 57209
    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(scene.radius_for_count(n_half), 0, (0.0, 0.0),
                               (0.07, 0.07), lattice_pad=True))
    sb.add(scene.disc_softbody(scene.radius_for_count(n_half), 1, (1.2, 0.8),
                               (-0.07, -0.07), lattice_pad=True))
    particles, objects = sb.build()
    model = SoftbodyModel(
        capacity=particles.capacity,
        spring_offsets=forces_ops.derive_spring_offsets(
            np.asarray(particles.neighbors)),
    )
    step = jax.jit(lambda p: model.step(p)[0], donate_argnums=0)
    p = particles
    for _ in range(6):
        p = step(p)
    jax.block_until_ready(p.pos)

    jax.profiler.start_trace("/tmp/trace_step116k")
    for _ in range(10):
        p = step(p)
    jax.block_until_ready(p.pos)
    jax.profiler.stop_trace()

    files = sorted(glob.glob("/tmp/trace_step116k/**/*.trace.json.gz",
                             recursive=True))
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    durs = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        args = e.get("args", {}) or {}
        cat = args.get("device_type", "")
        if "run_id" in args or "tf_op" in args or "hlo_module" in args or cat:
            durs[name] += e.get("dur", 0.0)
            counts[name] += 1
    total = sum(durs.values())
    print(f"total device op time over 10 steps: {total/1e3:.2f} ms "
          f"({total/1e4:.2f} ms/step)")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{d/1e4:8.3f} ms/step x{counts[name]//10:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
