"""One-off budget sweep for the 116k reference-demo render: band and
bin_capacity are adaptation-guarded budgets (RenderDiag flags violations),
so the right values are an empirical question.  Prints frame ms + diag per
combo.  Usage: python tools/sweep_116k.py [band,cap ...] e.g. 4,96 3,72
"""

import dataclasses
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
    combos = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    if not combos:
        combos = [(4, 96), (3, 96), (4, 72), (3, 72), (2, 72)]
    particles, objects, model, buf, cam, params0 = refdemo.build(1024)
    width, height = refdemo.WIDTH, refdemo.HEIGHT
    boundary = wl.boundary_mask(particles)

    for band, cap in combos:
        params = dataclasses.replace(params0, band=band, bin_capacity=cap)

        def render(buf):
            return raytrace.render_retarded_with_diag(
                buf, particles.object_index, objects, cam, width, height,
                params, planar=True, boundary=boundary,
            )

        render = jax.jit(render)
        img, diag = render(buf)
        jax.block_until_ready(img)
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            img, diag = render(buf)
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / n
        print(
            f"band={band} cap={cap}: {dt * 1e3:.2f} ms "
            f"({1.0 / dt:.1f} fps) pairs={int(diag.pairs_used)} "
            f"band_trunc={int(diag.band_truncated)} "
            f"bin_dropped={int(diag.bin_dropped)} "
            f"entry_dropped={int(diag.entry_dropped)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
