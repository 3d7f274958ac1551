"""Pallas TPU kernel: fused per-pixel pass of the retarded-time renderer.

Replaces the XLA `lax.map` over cell blocks in ops/raytrace.py (reference
capability: the raytraced pixel shading the reference left as a stub at
src/twoplusone/worldline/raytrace.glsl:11-21).  The XLA block map paid, per
frame at 1080p (traced): ~1.5 ms of block slicing/stacking plumbing, ~0.8 ms
of candidate-table relayout, and materialized every (cells, k2, cap)
intermediate through HBM.  This kernel keeps the whole candidate loop in
VMEM/registers and fuses occupancy, winner selection, Doppler/beaming
shading (incl. the exact blackbody spectral model), retina occlusion, and
composition into one pass.

Layout (cells-on-lanes, sorted-window fold — round 5):
  * grid = (hc, wgroups): one step per 128 view cells of one cell-row.
  * Pixel ops are (k2, 128) blocks: sublane = pixel-within-cell, lane = cell.
  * vdat_t is (W, 80, n_cells_pad): W-row-major (8 entries x 10 fields
    per 80-sublane row — assembled 80-wide end to end so the host-side
    gather never lane-pads a 10-wide minor dim) and the candidate loop's
    dynamic W-row index rides the LEADING dim (the paged-KV rule, see
    forces_pallas.py); per slot j, field f, the slice [j, f, :] is one
    (1, 128) sublane row broadcast over k2 pixel sublanes — no gathers, no
    transposes in the hot loop.  Slots hold 8-entry-aligned windows of the
    SORTED splat entries (raytrace._splat_windows); each lane masks its own
    window by index: slot j is lane c's candidate iff lo[c] <= j < hi[c].
  * The loop depth is DYNAMIC per 128-cell group (max occupied W-rows),
    not a static bin capacity — sky groups run zero iterations, interior
    groups only as deep as their densest cell.
  * Winner selection is a running masked min (strict <, keeping the FIRST
    minimum in sorted-entry order — same tie rule as the XLA path's
    cumsum==1 one-hot over rank order).

Output is "cell-major planar": (3, hc, k2, wcp); `assemble_cell_major`
unpacks to the (3, H, W) image (one transpose outside the kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIGF = 3.0e38  # python float: kernels must not capture device constants

# field order must match raytrace.PairData pdata columns
_F_AX, _F_AY, _F_BX, _F_BY, _F_TA, _F_VX, _F_VY, _F_CR, _F_CG, _F_CB = range(10)

# channel wavelengths + h*c/k for the spectral model — must mirror
# raytrace._LAMBDA_RGB / _HC_OVER_K exactly (kernel-vs-XLA parity tests)
_LAMBDA_RGB = (610e-9, 550e-9, 465e-9)
_HC_OVER_K = 1.43877688e-2


def _pixel_kernel(
    scal_ref,  # SMEM (9,) f32: t_now, cxm, cym, cvx, cvy, x0, y0, px_size, row_off
    depth_ref,  # SMEM (hc, wgroups) i32: W-rows to scan in this 128-cell group
    vdat_ref,  # VMEM (W, 80, 128) sorted-window candidate W-rows
    lo_ref,  # VMEM (1, 1, 128) i32: first window slot per cell lane
    hi_ref,  # VMEM (1, 1, 128) i32: end of window slots per cell lane
    cid_ref,  # VMEM (1, 1, 128) i32 image cell id per lane, or None (row-major)
    sfpx_ref,  # VMEM (1, k2, 128) or None (x-ray / instantaneous)
    out_ref,  # VMEM (3, 1, k2, 128)
    *,
    k: int,
    wc_img: int,
    use_rays: bool,
    retarded: bool,
    doppler: bool,
    beaming: bool,
    spectral: bool,
    spectral_temp: float,
    rho: float,
    dt: float,
    doppler_strength: float,
    ambient: float,
    absorbed_dim: float,
    shadow: float,
    camera_frame: bool,
):
    # scal[8] is the GLOBAL row offset of this program's first cell row —
    # 0 single-chip; under shard_map each chip's program_id(0) restarts at 0
    # while the pixel world coords must stay global
    r_id = pl.program_id(0) + scal_ref[8].astype(jnp.int32)
    g_id = pl.program_id(1)
    k2 = k * k
    t_now = scal_ref[0]
    cxm, cym = scal_ref[1], scal_ref[2]
    cvx, cvy = scal_ref[3], scal_ref[4]
    x0, y0 = scal_ref[5], scal_ref[6]
    pixel_size = scal_ref[7]

    # pixel world coords: sublane p = y_in*k + x_in, lane = cell col in group
    # (row-major) or the lane's cid (occupancy-sorted layouts)
    p = jax.lax.broadcasted_iota(jnp.int32, (k2, 128), 0)
    if cid_ref is not None:
        cell = cid_ref[0, 0, :].reshape(1, 128)
        cy = cell // wc_img
        gx = (cell - cy * wc_img) * k + p % k
        gy = cy * k + p // k
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (k2, 128), 1)
        gx = (g_id * 128 + lane) * k + p % k
        gy = r_id * k + p // k
    pxw = x0 + gx.astype(jnp.float32) * pixel_size
    pyw = y0 + gy.astype(jnp.float32) * pixel_size

    if camera_frame:
        # boosted-view pixels -> ground query points via the closed-form
        # inverse warp (ops/boost.py; pure jnp, Pallas-safe).  Everything
        # below (cone radius, occupancy, shading direction) is ground-frame.
        from . import boost

        ox, oy = boost.unwarp_xy(pxw - cxm, pyw - cym, cvx, cvy)
        pxw = cxm + ox
        pyw = cym + oy

    relx = pxw - cxm
    rely = pyw - cym
    r = jnp.sqrt(relx * relx + rely * rely)
    t_e = t_now - r if retarded else jnp.broadcast_to(t_now, r.shape)

    inv_dt = jnp.float32(1.0 / dt)
    # one f32 ULP past rho^2 (static python float): `dist2 < rho2_edge`
    # matches the XLA path's `dist2 <= rho2` acceptance exactly
    rho2_edge = float(
        np.nextafter(np.float32(rho * rho), np.float32(np.inf))
    )

    if use_rays:
        blocked = sfpx_ref[0] < (r - 2.0 * jnp.float32(rho))
        bg = jnp.where(blocked, jnp.float32(shadow), 1.0)
    else:
        blocked = None
        bg = jnp.ones((k2, 128), jnp.float32)

    # empty-group fast path: a 128-cell group with zero candidates (most of
    # any frame's sky/background bands) skips the whole candidate loop and
    # shading — only the shadow composition runs
    out_ref[0, 0, :, :] = bg
    out_ref[1, 0, :, :] = bg
    out_ref[2, 0, :, :] = bg

    depth = depth_ref[pl.program_id(0), g_id]

    @pl.when(depth > 0)
    def _occupied_group():
        _shade_group(
            vdat_ref, lo_ref, hi_ref, out_ref, depth, pxw, pyw, r, t_e,
            blocked, inv_dt, rho2_edge, t_now, cxm, cym, cvx, cvy,
            k2=k2, use_rays=use_rays, doppler=doppler,
            beaming=beaming, spectral=spectral, spectral_temp=spectral_temp,
            doppler_strength=doppler_strength,
            ambient=ambient, absorbed_dim=absorbed_dim, shadow=shadow,
        )


def _planck_factor(d_safe, lam: float, temp: float):
    """Stable blackbody channel ratio — mirrors raytrace.planck_channel_factor
    exactly (exp(x - x/D) * (1 - e^-x) / (1 - e^-x/D), exponent clamped)."""
    x = _HC_OVER_K / (lam * temp)
    expo = jnp.clip(x - x / d_safe, -80.0, 80.0)
    num = -jnp.expm1(jnp.float32(-x))
    den = -jnp.expm1(-x / d_safe)
    return jnp.exp(expo) * num / jnp.maximum(den, 1e-38)


def _shade_group(
    vdat_ref, lo_ref, hi_ref, out_ref, depth, pxw, pyw, r, t_e, blocked,
    inv_dt, rho2_edge, t_now, cxm, cym, cvx, cvy, *,
    k2, use_rays, doppler, beaming, spectral, spectral_temp,
    doppler_strength, ambient, absorbed_dim, shadow,
):
    lo = lo_ref[0, 0, :].reshape(1, 128)
    hi = hi_ref[0, 0, :].reshape(1, 128)

    # min_d starts one f32 ULP past rho^2 (rho2_edge, static), so
    # `dist2 < min_d` subsumes the XLA path's `dist2 <= rho2` acceptance
    # EXACTLY (same f32 boundary) and the in-disc test costs zero extra ops
    # per slot; occupied lanes are the ones whose min dropped to <= rho2
    def w_body(w, carry):
        min_d, wvx, wvy, wcr, wcg, wcb = carry
        slab = vdat_ref[w, :, :]  # (80, 128): 8 entries x 10 fields
        for s in range(8):
            j = w * 8 + s
            f = lambda i: slab[s * 10 + i, :].reshape(1, 128)
            ax, ay = f(_F_AX), f(_F_AY)
            bx, by = f(_F_BX), f(_F_BY)
            ta = f(_F_TA)
            tau = (t_e - ta) * inv_dt
            # |tau - 0.5| <= 0.501 == (-0.001 <= tau <= 1.001), one op fewer
            in_time = jnp.abs(tau - 0.5) <= 0.501
            tau_c = jnp.clip(tau, 0.0, 1.0)
            dx = pxw - (ax + tau_c * (bx - ax))
            dy = pyw - (ay + tau_c * (by - ay))
            dist2 = dx * dx + dy * dy
            mine = (j >= lo) & (j < hi)  # slot belongs to this lane's cell
            better = mine & in_time & (dist2 < min_d)
            min_d = jnp.where(better, dist2, min_d)
            wvx = jnp.where(better, f(_F_VX), wvx)
            wvy = jnp.where(better, f(_F_VY), wvy)
            wcr = jnp.where(better, f(_F_CR), wcr)
            wcg = jnp.where(better, f(_F_CG), wcg)
            wcb = jnp.where(better, f(_F_CB), wcb)
        return min_d, wvx, wvy, wcr, wcg, wcb

    zero = lambda: jnp.zeros((k2, 128), jnp.float32)
    min_d, wvx, wvy, wcr, wcg, wcb = jax.lax.fori_loop(
        0, depth, w_body,
        (jnp.full((k2, 128), rho2_edge, jnp.float32),
         zero(), zero(), zero(), zero(), zero()),
    )

    occupied = min_d < rho2_edge

    # shading (mirrors raytrace.shade_channels / _compose_cells)
    inv_r = 1.0 / jnp.maximum(r, 1e-12)
    nx = (cxm - pxw) * inv_r
    ny = (cym - pyw) * inv_r
    if doppler or beaming or spectral:
        c2 = jnp.float32(1.0)
        v2s = wvx * wvx + wvy * wvy
        gs = 1.0 / jnp.sqrt(jnp.maximum(1.0 - v2s / c2, 1e-12))
        d_src = 1.0 / (gs * (1.0 - (wvx * nx + wvy * ny) / c2))
        v2c = cvx * cvx + cvy * cvy
        gc = 1.0 / jnp.sqrt(jnp.maximum(1.0 - v2c / c2, 1e-12))
        d_cam = gc * (1.0 - (cvx * nx + cvy * ny) / c2)
        d = d_src * d_cam
    else:
        d = jnp.ones_like(r)
    if spectral:
        # exact blackbody photometry (beaming inherent, D^3 flag ignored —
        # mirrors shade_channels' spectral branch)
        d_safe = jnp.maximum(d, 1e-3)
        sr = wcr * _planck_factor(d_safe, _LAMBDA_RGB[0], spectral_temp)
        sg = wcg * _planck_factor(d_safe, _LAMBDA_RGB[1], spectral_temp)
        sb = wcb * _planck_factor(d_safe, _LAMBDA_RGB[2], spectral_temp)
    elif doppler:
        t = jnp.clip(
            jnp.log2(jnp.maximum(d, 1e-6)) * jnp.float32(doppler_strength),
            -2.5, 2.5,
        )
        hat = lambda x: jnp.maximum(0.0, 1.0 - jnp.abs(x))
        outs = []
        for i in range(3):
            src = i - t
            outs.append(hat(src) * wcr + hat(src - 1) * wcg + hat(src - 2) * wcb)
        sr, sg, sb = outs
    else:
        sr, sg, sb = wcr, wcg, wcb
    if beaming and not spectral:
        boost = d * d * d
        sr, sg, sb = sr * boost, sg * boost, sb * boost
    amb = jnp.float32(ambient)
    mix = lambda s, c: amb * c + (1.0 - amb) * jnp.clip(s, 0.0, 1.0)
    sr, sg, sb = mix(sr, wcr), mix(sg, wcg), mix(sb, wcb)

    if use_rays:
        dim = jnp.float32(absorbed_dim)
        shd = jnp.float32(shadow)
        compose = lambda s: jnp.where(
            occupied,
            jnp.where(blocked, s * dim, s),
            jnp.where(blocked, shd, 1.0),
        )
    else:
        compose = lambda s: jnp.where(occupied, s, 1.0)

    out_ref[0, 0, :, :] = compose(sr)
    out_ref[1, 0, :, :] = compose(sg)
    out_ref[2, 0, :, :] = compose(sb)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "hc", "wgroups", "use_rays", "retarded", "doppler",
        "beaming", "spectral", "spectral_temp", "rho", "dt",
        "doppler_strength", "ambient", "absorbed_dim",
        "shadow", "camera_frame", "interpret", "shard", "wc_img",
    ),
)
def pixel_pass_pallas(
    vdat_t: jax.Array,  # (W, 80, hc*wgroups*128) f32 sorted-window W-rows
    wlo: jax.Array,  # (hc, wgroups*128) i32 first window slot per cell
    whi: jax.Array,  # (hc, wgroups*128) i32 end of window slots per cell
    depth: jax.Array,  # (hc, wgroups) i32 W-rows to scan per group
    sfpx: jax.Array,  # (hc, k2, wgroups*128) f32 (ignored unless use_rays)
    scal: jax.Array,  # (8,) f32
    *,
    k: int,
    hc: int,
    wgroups: int,
    use_rays: bool,
    retarded: bool,
    doppler: bool,
    beaming: bool,
    rho: float,
    dt: float,
    doppler_strength: float,
    ambient: float,
    absorbed_dim: float,
    shadow: float,
    spectral: bool = False,
    spectral_temp: float = 6500.0,
    camera_frame: bool = False,
    interpret: bool = False,
    shard: "tuple | None" = None,  # (Mesh, axis): shard cell rows over chips
    cell_ids: "jax.Array | None" = None,  # (hc, wcp) i32 per-lane image cell
    wc_img: int = 0,  # image cells per row (pixel coords from cell_ids)
) -> jax.Array:
    """Returns the cell-major planar image (3, hc, k2, wgroups*128).

    `cell_ids` switches the pass to an occupancy-sorted layout (see
    raytrace._splat_windows sort_cells): lanes are arbitrary image cells and
    the kernel derives their pixel coords from the id; the caller unscrambles
    with assemble_sorted.  Incompatible with `shard` (row-major split).

    `shard=(mesh, axis)` splits the CELL-ROW grid dimension across the mesh
    via shard_map — the pixel pass is embarrassingly parallel over view
    cells; each chip shades its band of image rows with the same kernel
    (VERDICT r2 #2: multi-chip used to force the XLA pixel path)."""
    k2 = k * k
    s_wrows = vdat_t.shape[0]
    use_cid = cell_ids is not None
    kernel = functools.partial(
        _pixel_kernel,
        k=k, wc_img=wc_img, use_rays=use_rays, retarded=retarded,
        doppler=doppler, beaming=beaming, spectral=spectral,
        spectral_temp=spectral_temp, rho=rho, dt=dt,
        doppler_strength=doppler_strength, ambient=ambient,
        absorbed_dim=absorbed_dim, shadow=shadow, camera_frame=camera_frame,
    )

    def wrapped(*refs):
        refs = list(refs)
        scal_ref, depth_ref, vdat_ref, lo_ref, hi_ref = refs[:5]
        rest = refs[5:]
        cid_ref = rest.pop(0) if use_cid else None
        sfpx_ref = rest.pop(0) if use_rays else None
        out_ref = rest.pop(0)
        kernel(scal_ref, depth_ref, vdat_ref, lo_ref, hi_ref, cid_ref,
               sfpx_ref, out_ref)

    def run(scal9, depth_loc, vdat_loc, lo_loc, hi_loc, cid_loc, sfpx_loc):
        hc_loc = depth_loc.shape[0]
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-group depth
            pl.BlockSpec((s_wrows, 80, 128), lambda r, g: (0, 0, r * wgroups + g)),
            pl.BlockSpec((1, 1, 128), lambda r, g: (r, 0, g)),
            pl.BlockSpec((1, 1, 128), lambda r, g: (r, 0, g)),
        ]
        operands = [scal9, depth_loc, vdat_loc, lo_loc, hi_loc]
        if use_cid:
            in_specs.append(pl.BlockSpec((1, 1, 128), lambda r, g: (r, 0, g)))
            operands.append(cid_loc)
        if use_rays:
            in_specs.append(
                pl.BlockSpec((1, k2, 128), lambda r, g: (r, 0, g)))
            operands.append(sfpx_loc)
        return pl.pallas_call(
            wrapped,
            grid=(hc_loc, wgroups),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((3, 1, k2, 128), lambda r, g: (0, r, 0, g)),
            out_shape=jax.ShapeDtypeStruct(
                (3, hc_loc, k2, wgroups * 128), jnp.float32
            ),
            interpret=interpret,
        )(*operands)

    if shard is None:
        scal9 = jnp.concatenate([scal, jnp.zeros((1,), jnp.float32)])
        return run(
            scal9, depth, vdat_t, wlo[:, None, :], whi[:, None, :],
            cell_ids[:, None, :] if use_cid else None, sfpx,
        )
    assert not use_cid, "cell_ids layouts are single-chip (row-major shard)"

    from jax.sharding import PartitionSpec as P

    from ..utils.shmap import shard_map_nocheck

    mesh, axis = shard
    d = mesh.shape[axis]
    hcp = -(-hc // d) * d
    rpad = hcp - hc
    wcp = wgroups * 128
    # pad cell rows to the mesh: padded groups get depth 0 (the kernel
    # shades pure background); padded output rows are sliced off
    vdat_p = jnp.pad(
        vdat_t.reshape(s_wrows, 80, hc, wcp), ((0, 0), (0, 0), (0, rpad), (0, 0)),
    ).reshape(s_wrows, 80, hcp * wcp)
    lo_p = jnp.pad(wlo, ((0, rpad), (0, 0)))[:, None, :]
    hi_p = jnp.pad(whi, ((0, rpad), (0, 0)))[:, None, :]
    sfpx_p = jnp.pad(sfpx, ((0, rpad), (0, 0), (0, 0)))
    depth_p = jnp.pad(depth, ((0, rpad), (0, 0)))

    def run_shard(scal, depth_loc, vdat_loc, lo_loc, hi_loc, sfpx_loc):
        row_off = jax.lax.axis_index(axis) * (hcp // d)
        scal9 = jnp.concatenate([scal, row_off[None].astype(jnp.float32)])
        return run(scal9, depth_loc, vdat_loc, lo_loc, hi_loc, None, sfpx_loc)

    out = shard_map_nocheck(
        run_shard,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(None, None, axis),
                  P(axis, None, None), P(axis, None, None),
                  P(axis, None, None)),
        out_specs=P(None, axis, None, None),
    )(scal, depth_p, vdat_p, lo_p, hi_p, sfpx_p)
    return out[:, :hc]


def assemble_cell_major(out, width, height, k, wc_img, planar):
    """(3, hc, k2, wcp) cell-major planar -> (3, H, W) or (H, W, 3)."""
    three, hc, k2, wcp = out.shape
    img = out.reshape(3, hc, k, k, wcp)[:, :, :, :, :wc_img]
    img = img.transpose(0, 1, 2, 4, 3).reshape(3, hc * k, wc_img * k)
    img = img[:, :height, :width]
    return img if planar else img.transpose(1, 2, 0)


def assemble_sorted(out, perm, width, height, k, wc_img, hc_img, planar):
    """(3, G, k2, 128) occupancy-sorted kernel output -> image.

    Sorted slot s holds image cell perm[s]; one row gather (n_cells rows of
    k2*3 floats — the fast row class) unscrambles, then the cell->raster
    relayout matches assemble_cell_major's."""
    three, G, k2, lanes = out.shape
    n_cells = hc_img * wc_img
    # cell c sits at sorted slot inv[c]: invert by a second sort (cheaper
    # than a scalar scatter — see forces_pallas.build_sorted_order)
    _, inv = jax.lax.sort_key_val(perm, jnp.arange(n_cells, dtype=jnp.int32))
    rows = out.transpose(1, 3, 2, 0).reshape(G * lanes, k2 * 3)
    rows = rows[inv]  # (n_cells, k2*3)
    img = rows.reshape(hc_img, wc_img, k, k, 3)
    img = img.transpose(4, 0, 2, 1, 3).reshape(3, hc_img * k, wc_img * k)
    img = img[:, :height, :width]
    return img if planar else img.transpose(1, 2, 0)
