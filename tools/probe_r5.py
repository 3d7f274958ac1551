"""One-off round-5 probe: boundary-pair count, band=3 truncation, and
frame ms at candidate (band, retina_budget) combos for the 116k demo."""

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
    particles, objects, model, buf, cam, params0 = refdemo.build(1024)
    width, height = refdemo.WIDTH, refdemo.HEIGHT
    boundary = wl.boundary_mask(particles)
    print(f"# boundary particles: {int(jnp.sum(boundary))}", flush=True)

    for band, rb in [(4, 16384), (4, 8192), (3, 8192), (3, 16384)]:
        params = dataclasses.replace(params0, band=band, retina_budget=rb)

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
        rd = diag.retina_dropped
        print(
            f"band={band} retina={rb}: {dt * 1e3:.2f} ms render-only "
            f"pairs={int(diag.pairs_used)} trunc={int(diag.band_truncated)} "
            f"bin_drop={int(diag.bin_dropped)} "
            f"retina_drop={int(rd) if rd is not None else -1} "
            f"entry_drop={int(diag.entry_dropped)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
