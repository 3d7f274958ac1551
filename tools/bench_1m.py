"""Capacity run: 2^20 particles — the reference's stated limit
(MAX_PARTICLES = 1 << 20, /root/reference/src/twoplusone/softbody/mod.rs:226)
— physics-only stepping with the Pallas sorted-window collision kernel.

Two 1024 x 512 box lattices on a collision course; box bodies have zero
lattice-pad waste, so capacity == particle count == 2^20 exactly.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

from spacetime_tpu import scene  # noqa: E402
from spacetime_tpu.models.softbody import SoftbodyModel  # noqa: E402
from spacetime_tpu.ops import forces as forces_ops  # noqa: E402


def main():
    sb = scene.SceneBuilder()
    sb.add(
        scene.mask_to_softbody(
            scene.box_mask(1024, 512), 0, (0.0, 0.0), (0.0, 0.05),
            lattice_pad=True,
        ),
        base_color=(0.25, 0.35, 1.0),
    )
    sb.add(
        scene.mask_to_softbody(
            scene.box_mask(1024, 512), 1, (0.0, 1.85), (0.0, -0.05),
            lattice_pad=True,
        ),
        base_color=(1.0, 0.3, 0.25),
    )
    particles, objects = sb.build()
    n = int(particles.num_active())
    assert particles.capacity == 1 << 20, particles.capacity
    print(f"# particles: {n} (capacity {particles.capacity} = 2^20)",
          file=sys.stderr)

    # scene spans 1024*0.0035 = 3.58 ls: grid 768*0.005 = 3.84 ls; a 1024-
    # wide lattice row is ~717 cells x ~4 particles -> wmax 8192
    model = SoftbodyModel(
        capacity=particles.capacity,
        grid_dim=768,
        wmax=8192,
        split_windows=True,  # ~4k particles/row: per-row spans cut the
        # merged window's ~8 mostly-far DMA chunks to ~3 near ones
        spring_offsets=forces_ops.derive_spring_offsets(
            np.asarray(particles.neighbors)
        ),
    )
    step = jax.jit(lambda p: model.step(p))

    p, aux = step(particles)
    jax.block_until_ready(p.pos)
    t0 = time.perf_counter()
    n_steps = 30
    for _ in range(n_steps):
        p, aux = step(p)
    jax.block_until_ready(p.pos)
    dt = (time.perf_counter() - t0) / n_steps
    print(
        f"# physics step: {dt*1e3:.2f} ms ({1/dt:.1f} steps/s, "
        f"{n/dt/1e6:.0f} M particle-steps/s); "
        f"window_truncated={int(aux.window_truncated)} "
        f"grid_overflow={int(aux.grid_overflow)}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
