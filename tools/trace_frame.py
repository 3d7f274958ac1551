"""Capture a jax.profiler trace of the fused bench frame and print the top
device ops by total duration."""

import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

import bench  # noqa: E402
from tools import traceutil  # noqa: E402


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

    traceutil.print_top_ops("/tmp/trace_r2", 5, "frame")


if __name__ == "__main__":
    main()
