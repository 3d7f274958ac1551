"""Shared jax.profiler trace parsing for the tools/trace_*.py profilers:
sum device-op durations from the newest trace.json.gz and print the top ops
(per-iteration).  Wall-clock timing through the axon tunnel is unreliable
(PERF.md) — these parsed device spans are the trusted op-level numbers."""

import glob
import gzip
import json
from collections import defaultdict


def print_top_ops(trace_dir: str, n_iters: int, label: str, top: int = 40):
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    durs = defaultdict(float)
    counts = defaultdict(int)
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        args = e.get("args", {}) or {}
        cat = args.get("device_type", "")
        if "run_id" in args or "tf_op" in args or "hlo_module" in args or cat:
            durs[name] += e.get("dur", 0.0)
            counts[name] += 1
    total = sum(durs.values())
    print(f"total device op time over {n_iters} {label}s: {total/1e3:.2f} ms "
          f"({total/(n_iters*1e3):.2f} ms/{label})")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d/(n_iters*1e3):8.3f} ms/{label} "
              f"x{counts[name]//n_iters:4d}  {name[:110]}")
