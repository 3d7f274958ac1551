"""Render-only timing of the 116k reference-demo frame: isolates
raytrace.render_retarded from the physics step so render optimizations can
be measured in a tight loop (the full frame is tools/bench_116k.py).

Usage: python tools/bench_render_116k.py [--trace]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

from spacetime_tpu.ops import raytrace  # noqa: E402
from spacetime_tpu.ops import worldline as wl  # noqa: E402
from tools import refdemo  # noqa: E402


def main():
    particles, objects, model, buf, cam, params = refdemo.build(1024)
    width, height = refdemo.WIDTH, refdemo.HEIGHT
    boundary = wl.boundary_mask(particles)

    render = jax.jit(
        lambda buf: raytrace.render_retarded(
            buf, particles.object_index, objects, cam, width, height,
            params, planar=True, boundary=boundary,
        )
    )
    img = render(buf)
    jax.block_until_ready(img)

    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        img = render(buf)
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / n
    print(f"render-only: {dt * 1e3:.2f} ms ({1.0 / dt:.1f} fps)")

    if "--trace" in sys.argv:
        import shutil

        from tools import trace_stages

        shutil.rmtree("/tmp/rtrace", ignore_errors=True)
        hlo = render.lower(buf).compile().as_text()
        jax.profiler.start_trace("/tmp/rtrace")
        for _ in range(10):
            img = render(buf)
        jax.block_until_ready(img)
        jax.profiler.stop_trace()
        trace_stages.aggregate("/tmp/rtrace", hlo, 10, top=40)


if __name__ == "__main__":
    main()
