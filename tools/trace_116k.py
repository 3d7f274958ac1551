"""Capture a jax.profiler trace of the 116k reference-scale frame and print
the top device ops by total duration.  Usage: python tools/trace_116k.py"""

import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

from spacetime_tpu.ops import raytrace  # noqa: E402
from spacetime_tpu.ops import worldline as wl  # noqa: E402
from tools import traceutil  # noqa: E402


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

    traceutil.print_top_ops("/tmp/trace_116k", 5, "frame", top=45)


if __name__ == "__main__":
    main()
