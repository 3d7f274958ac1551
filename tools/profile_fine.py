"""Finer cumulative-prefix timing inside band-pairs / view-tables / pixel
pass at the flagship config."""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")

import bench  # noqa: E402
from spacetime_tpu import scene  # noqa: E402
from spacetime_tpu.ops import raytrace as rt  # noqa: E402


def timeit(fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    frame, step_only, particles, buf, cam, model, (width, height) = bench.build()
    h = model.params.h
    t = 0.0
    p, b = particles, buf
    for _ in range(8):
        t += h
        p, b, img = frame(p, b, cam, jnp.float32(t))
    jax.block_until_ready(img)

    params = rt.RenderParams(
        dt=model.params.h, num_rays=4096, pair_budget=32768, bin_capacity=48
    )
    params = dataclasses.replace(
        params, cell_px=rt.auto_cell_px(params, width, height, 1.2)
    )
    obj_index = p.object_index
    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(scene.radius_for_count(5000), 0, (0.35, 0.40), (0.25, 0.05)),
           base_color=(0.25, 0.35, 1.0))
    sb.add(scene.disc_softbody(scene.radius_for_count(5000), 1, (1.05, 0.55), (-0.25, -0.05)),
           base_color=(1.0, 0.3, 0.25))
    _parts, objects = sb.build()

    # --- band stage internals ---
    @jax.jit
    def band_search_only(b, cam):
        t_now = b.times[b.cursor]
        dt, rho, band = params.dt, params.rho, params.band
        t_cap = b.capacity
        n = b.num_particles
        cxm, cym = cam.pos[0], cam.pos[1]
        route = lambda qx, qy: jnp.sqrt((qx - cxm) ** 2 + (qy - cym) ** 2)
        flat_x = b.pos_x.reshape(-1)
        flat_y = b.pos_y.reshape(-1)
        row0 = jnp.arange(n, dtype=jnp.int32) * (2 * t_cap)
        base_col = b.cursor + t_cap
        thresh = rho + dt

        def f_at(a):
            idx = row0 + (base_col - a)
            return route(flat_x[idx], flat_y[idx]) - a.astype(jnp.float32) * dt

        hi0 = jnp.minimum(b.frames_in_use - 1, t_cap - 1)
        lo = jnp.ones((n,), jnp.int32)
        hi = jnp.full((n,), 1, jnp.int32) * hi0
        for _ in range(max(1, (t_cap - 1).bit_length())):
            mid = (lo + hi) // 2
            go = f_at(mid) > thresh
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go, hi, mid)
        return lo

    @jax.jit
    def band_full(b, cam):
        t_now = b.times[b.cursor]
        pairs, trunc, _segd = rt._band_pairs(b, obj_index, objects, cam, t_now,
                                      width, height, params)
        return pairs.pdata

    @jax.jit
    def band_compact(b, cam):
        t_now = b.times[b.cursor]
        pairs, trunc, _segd = rt._band_pairs(b, obj_index, objects, cam, t_now,
                                      width, height, params)
        pairs = rt._compact_pairs_to_budget(pairs, params.pair_budget)
        return pairs.pdata

    # --- tables internals: reuse compacted pairs as fixed input ---
    t_now = b.times[b.cursor]
    pairs0, _, _segd = jax.jit(
        lambda b, cam: rt._band_pairs(b, obj_index, objects, cam,
                                      b.times[b.cursor], width, height, params)
    )(b, cam)
    pairs0 = rt._compact_pairs_to_budget(pairs0, params.pair_budget)
    pairs0 = jax.block_until_ready(pairs0)

    @jax.jit
    def tables_fn(pdata, pvalid, cam):
        pr = rt.PairData(pdata=pdata, pair_valid=pvalid, n_pairs=jnp.int32(0))
        tables, dropped, _ed, _s, _g = rt._build_view_tables(pr, cam, width, height, params)
        return tables.vdat, tables.vok

    @jax.jit
    def retina_fn(pdata, pvalid, cam, tn):
        pr = rt.PairData(pdata=pdata, pair_valid=pvalid, n_pairs=jnp.int32(0))
        return rt._retina(pr, cam, tn, params)

    # --- pixel pass with fixed tables ---
    tables0, _d, _ed, _s, geom = jax.jit(
        lambda pdata, pvalid, cam: rt._build_view_tables(
            rt.PairData(pdata=pdata, pair_valid=pvalid, n_pairs=jnp.int32(0)),
            cam, width, height, params)
    )(pairs0.pdata, pairs0.pair_valid, cam)
    tables0 = jax.block_until_ready(tables0)
    s_first0 = jax.block_until_ready(retina_fn(pairs0.pdata, pairs0.pair_valid, cam, t_now))
    wc_img = -(-width // params.cell_px)
    hc_img = -(-height // params.cell_px)

    def pixel_pass(vdat, vok, s_first, cam, tn, do_assemble):
        n_rays = params.num_rays
        s_first_rows = jnp.broadcast_to(s_first[:, None], (n_rays, 8))
        pxs, pys = rt._cell_pixel_coords(width, height, cam, params)
        cb = params.cells_per_block
        n_blocks = pxs.shape[0] // cb
        cxm, cym = cam.pos[0], cam.pos[1]
        dt, rho = params.dt, params.rho

        def block_fn(args):
            vdat_, vok_, px, py = args
            relx = px - cxm
            rely = py - cym
            r = jnp.sqrt(relx * relx + rely * rely)
            t_e = tn - r
            occupied, best = rt._occupancy_cells(px, py, t_e, vdat_, vok_, dt, rho)
            phi_p = jnp.arctan2(rely, relx)
            ray_of_pix = jnp.clip(
                jnp.floor((phi_p + rt._PI) / (2 * rt._PI) * n_rays).astype(jnp.int32),
                0, n_rays - 1)
            s_first_px = s_first_rows[ray_of_pix][..., 0]
            return rt._compose_cells(px, py, r, occupied, best, s_first_px,
                                     vdat_, cam, params)

        args = (
            vdat.reshape(n_blocks, cb, *vdat.shape[1:]),
            vok.reshape(n_blocks, cb, *vok.shape[1:]),
            pxs.reshape(n_blocks, cb, -1),
            pys.reshape(n_blocks, cb, -1),
        )
        crgb = jax.lax.map(block_fn, args)
        if do_assemble:
            return rt._assemble_image(crgb, width, height, params, True,
                                      wc_img, hc_img)
        return crgb

    pix_full = jax.jit(lambda v, o, s, c, tn: pixel_pass(v, o, s, c, tn, True))
    pix_noasm = jax.jit(lambda v, o, s, c, tn: pixel_pass(v, o, s, c, tn, False))

    r_bs = timeit(band_search_only, b, cam)
    r_bf = timeit(band_full, b, cam)
    r_bc = timeit(band_compact, b, cam)
    r_tab = timeit(tables_fn, pairs0.pdata, pairs0.pair_valid, cam)
    r_ret = timeit(retina_fn, pairs0.pdata, pairs0.pair_valid, cam, t_now)
    r_pxf = timeit(pix_full, tables0.vdat, tables0.vok, s_first0, cam, t_now)
    r_pxn = timeit(pix_noasm, tables0.vdat, tables0.vok, s_first0, cam, t_now)

    print(f"band binary search only : {r_bs:7.2f} ms")
    print(f"band pairs full         : {r_bf:7.2f} ms")
    print(f"band pairs + compact    : {r_bc:7.2f} ms")
    print(f"view tables (isolated)  : {r_tab:7.2f} ms")
    print(f"retina (isolated)       : {r_ret:7.2f} ms")
    print(f"pixel pass no assemble  : {r_pxn:7.2f} ms")
    print(f"pixel pass + assemble   : {r_pxf:7.2f} ms")
    print(f"vdat shape {tables0.vdat.shape}, n_blocks {tables0.vdat.shape[0]//params.cells_per_block}")


if __name__ == "__main__":
    main()
