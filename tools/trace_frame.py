"""Capture a jax.profiler trace of the fused bench frame and print the top
device ops by total duration."""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

import bench  # noqa: E402


def main():
    frame, step_only, particles, buf, cam, model, _ = bench.build()
    h = model.params.h
    t = 0.0
    p, b = particles, buf
    for _ in range(8):
        t += h
        p, b, img = frame(p, b, cam, jnp.float32(t))
    jax.block_until_ready(img)

    jax.profiler.start_trace("/tmp/trace_r2")
    for _ in range(5):
        t += h
        p, b, img = frame(p, b, cam, jnp.float32(t))
    jax.block_until_ready(img)
    jax.profiler.stop_trace()

    files = sorted(glob.glob("/tmp/trace_r2/**/*.trace.json.gz", recursive=True))
    path = files[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device-thread complete events
    durs = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        args = e.get("args", {}) or {}
        cat = args.get("device_type", "")
        # keep TPU device ops only (heuristic: has 'tf_op' or long_name or run_id)
        if "run_id" in args or "tf_op" in args or "hlo_module" in args or cat:
            durs[name] += e.get("dur", 0.0)
            counts[name] += 1
    total = sum(durs.values())
    print(f"total device op time over 5 frames: {total/1e3:.2f} ms "
          f"({total/5e3:.2f} ms/frame)")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{d/5e3:8.3f} ms/frame x{counts[name]//5:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
