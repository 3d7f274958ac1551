"""Per-stage timing of the retarded render pipeline at the flagship bench
config (10k particles, 1080p, history 1024). Times cumulative pipeline
prefixes as separate jits and reports differences, so per-call dispatch
overhead (~3 ms through the tunnel) cancels between adjacent prefixes.

Usage: python tools/profile_render.py  (runs on the default TPU platform)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

sys.path.insert(0, ".")

import bench  # noqa: E402
from spacetime_tpu.ops import raytrace as rt  # noqa: E402


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    frame, step_only, particles, buf, cam, model, (width, height) = bench.build()
    h = model.params.h
    t = 0.0
    p, b = particles, buf
    for _ in range(8):
        t += h
        p, b, img = frame(p, b, cam, jnp.float32(t))
    jax.block_until_ready(img)

    import dataclasses

    params = rt.RenderParams(
        dt=model.params.h, num_rays=4096, pair_budget=32768, bin_capacity=48
    )
    params = dataclasses.replace(
        params, cell_px=rt.auto_cell_px(params, width, height, 1.2)
    )
    print(f"# cell_px={params.cell_px}", file=sys.stderr)
    obj_index = p.object_index
    objects = bench.build.__globals__  # placeholder; rebuild objects below

    from spacetime_tpu import scene

    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(scene.radius_for_count(5000), 0, (0.35, 0.40), (0.25, 0.05)),
           base_color=(0.25, 0.35, 1.0))
    sb.add(scene.disc_softbody(scene.radius_for_count(5000), 1, (1.05, 0.55), (-0.25, -0.05)),
           base_color=(1.0, 0.3, 0.25))
    _parts, objects = sb.build()

    t_now_fn = lambda b: b.times[b.cursor]

    @jax.jit
    def stage_pairs(b, cam):
        t_now = t_now_fn(b)
        pairs, trunc, _segd = rt._band_pairs(b, obj_index, objects, cam, t_now,
                                      width, height, params)
        pairs = rt._compact_pairs_to_budget(pairs, params.pair_budget)
        return pairs.pdata, pairs.pair_valid

    @jax.jit
    def stage_tables(b, cam):
        t_now = t_now_fn(b)
        pairs, trunc, _segd = rt._band_pairs(b, obj_index, objects, cam, t_now,
                                      width, height, params)
        pairs = rt._compact_pairs_to_budget(pairs, params.pair_budget)
        tables, dropped, _ed, _small, geom = rt._build_view_tables(
            pairs, cam, width, height, params)
        return tables.vdat, tables.vok

    @jax.jit
    def stage_retina(b, cam):
        t_now = t_now_fn(b)
        pairs, trunc, _segd = rt._band_pairs(b, obj_index, objects, cam, t_now,
                                      width, height, params)
        pairs = rt._compact_pairs_to_budget(pairs, params.pair_budget)
        tables, dropped, _ed, _small, geom = rt._build_view_tables(
            pairs, cam, width, height, params)
        s_first = rt._retina(pairs, cam, t_now, params)
        return tables.vdat, s_first

    @jax.jit
    def stage_full(b, cam):
        img, diag = rt._render_retarded_impl(
            b, obj_index, objects, cam, width, height, params, planar=True)
        return img

    @jax.jit
    def stage_step(p):
        new, _ = model.step(p)
        return new.pos

    @jax.jit
    def noop(b, cam):
        return b.cursor + 1

    base = timeit(noop, b, cam)
    t_pairs = timeit(stage_pairs, b, cam)
    t_tables = timeit(stage_tables, b, cam)
    t_retina = timeit(stage_retina, b, cam)
    t_full = timeit(stage_full, b, cam)
    t_step = timeit(stage_step, p)

    print(f"dispatch floor        : {base:7.2f} ms")
    print(f"band pairs + compact  : {t_pairs - base:7.2f} ms")
    print(f"+ view tables (bin)   : {t_tables - t_pairs:7.2f} ms")
    print(f"+ retina march        : {t_retina - t_tables:7.2f} ms")
    print(f"+ pixel pass+assembly : {t_full - t_retina:7.2f} ms")
    print(f"render total          : {t_full - base:7.2f} ms")
    print(f"physics step          : {t_step - base:7.2f} ms")


if __name__ == "__main__":
    main()
