"""Trace ONLY the physics step at the 116k reference scale and print the top
device ops.  Usage: python tools/trace_step_116k.py

Builds the SAME workload as tools/bench_116k.py / trace_116k.py (the
reference demo scene via tools/refdemo — real testimg4/5 PNGs when mounted)
so step-stage profiles correspond to the benched frames."""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

from tools import refdemo  # noqa: E402
from tools import traceutil  # noqa: E402


def main():
    import numpy as np

    from spacetime_tpu.models.softbody import SoftbodyModel
    from spacetime_tpu.ops import forces as forces_ops

    particles, objects = refdemo.build_scene()
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

    traceutil.print_top_ops("/tmp/trace_step116k", 10, "step")


if __name__ == "__main__":
    main()
