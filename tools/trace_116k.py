"""Capture a jax.profiler trace of the 116k reference-scale frame and print
the top device ops by total duration.  Usage: python tools/trace_116k.py"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

from spacetime_tpu import scene  # noqa: E402
from spacetime_tpu.camera import Camera  # noqa: E402
from spacetime_tpu.models.softbody import SoftbodyModel  # noqa: E402
from spacetime_tpu.ops import forces as forces_ops  # noqa: E402
from spacetime_tpu.ops import raytrace  # noqa: E402
from spacetime_tpu.ops import worldline as wl  # noqa: E402


def build(history=1024):
    from tools import refdemo

    width, height = refdemo.WIDTH, refdemo.HEIGHT
    particles, objects, model, buf, cam, params = refdemo.build(history)

    def frame(particles, buf, cam, t):
        particles, _aux = model.step(particles)
        buf = wl.push_frame(buf, particles, t)
        img = raytrace.render_retarded(
            buf, particles.object_index, objects, cam, width, height, params,
            planar=True, boundary=wl.boundary_mask(particles))
        return particles, buf, img

    return jax.jit(frame, donate_argnums=(0, 1)), particles, buf, cam, model


def main():
    frame, particles, buf, cam, model = build()
    h = model.params.h
    t = 0.0
    p, b = particles, buf
    for _ in range(6):
        t += h
        p, b, img = frame(p, b, cam, jnp.float32(t))
    jax.block_until_ready(img)

    jax.profiler.start_trace("/tmp/trace_116k")
    for _ in range(5):
        t += h
        p, b, img = frame(p, b, cam, jnp.float32(t))
    jax.block_until_ready(img)
    jax.profiler.stop_trace()

    files = sorted(glob.glob("/tmp/trace_116k/**/*.trace.json.gz",
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
    print(f"total device op time over 5 frames: {total/1e3:.2f} ms "
          f"({total/5e3:.2f} ms/frame)")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{d/5e3:8.3f} ms/frame x{counts[name]//5:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
