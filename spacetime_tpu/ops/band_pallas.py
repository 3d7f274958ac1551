"""Pallas TPU kernel: fused light-cone band search + window extraction.

Replaces the XLA dense cone sweep of ops/raytrace._cone_band_window for the
Euclidean (flat-space) route.  The XLA version makes several streaming
passes over the (A, N) swept age block — the a0 min-reduce reads two
position planes, the masked-reduce window extraction re-reads all four
planes with band+1 select-accumulate outputs, and the (N, band) pair
assembly re-broadcasts the results (~2.5-3 ms/frame at the 116k reference
scene, traced).  This kernel streams the position planes exactly ONCE:

  pass 1 (per 256-lane block): double-buffered row-chunk DMA of pos_x/pos_y
      over the swept age range; f(age) = dist(age) - age*dt is monotone in
      age, so a running masked min/max yields each lane's band start a0 and
      last crossing age (truncation diagnostic) in registers.
  pass 2: the window rows [a0+band-1 .. a0-1] form a per-lane range; lanes
      in a block are INDEX-adjacent particles (spatially coherent), so the
      block's union of ranges is a short row span.  One DMA of that span
      (all four planes) + a masked-reduce extraction yields the (band+1, L)
      windows.  Non-crossing lanes (inactive padding, out-of-cone bodies)
      are pinned to the span start so they can't widen it — their window
      values are dead downstream (the annulus validity test rejects them).

Layout: the (2T, N) ring planes are viewed as (2T/8, 8, N) so every DMA
slices the LEADING dim at 8-row granularity (Mosaic requires provably
tile-aligned dynamic slices; see ops/forces_pallas.py layout notes).  The
traced row offsets are aligned DOWN to 8 and the extra rows masked:
idempotent min/max absorbs duplicates in the sweep; the extraction matches
each (lane, window-column) target against its owning chunk's logical range
so clamped/overlapping physical reads never double-count.

Parity: the kernel returns the same a0/alast as the XLA sweep and the same
window VALUES for every lane whose window is inside the swept range; lanes
outside extract real ring values where the XLA version extracted 0.0 —
both are masked by the downstream validity test (see
raytrace._band_pairs).  tests/test_band_pallas.py asserts equality of the
downstream pair tables in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 512  # lanes per block (falls back to 256 when capacity % 512 != 0)
_R = 256  # sweep rows per DMA chunk (leading-dim groups of 8)


def _band_kernel(  # noqa: C901
    scal_ref,  # SMEM (7,) f32: col0, hi0, base_col, cx, cy, dt, thresh
    # (a_sw reaches the kernel as a STATIC kwarg, not a scalar slot)
    px_hbm, py_hbm, vx_hbm, vy_hbm,  # (2T/8, 8, N) ANY
    a0_ref, alast_ref,  # (1, L) i32 out
    wx_ref, wy_ref, wvx_ref, wvy_ref,  # (w, L) f32 out
    bx_ref, by_ref,  # VMEM (2, 8, 8, L) sweep double buffers
    ex_ref,  # VMEM (4, eb//8, 8, L) extraction buffer (x, y, vx, vy)
    sems,  # DMA sems (2, 2)
    esems,  # DMA sems (4,)
    *,
    w: int,
    a_sw: int,
    erows: int,
    eb: int,
    band: int,
    t2: int,
    lanes_n: int,
):
    j = pl.program_id(0)
    col0 = scal_ref[0].astype(jnp.int32)
    hi0 = scal_ref[1].astype(jnp.int32)
    base_col = scal_ref[2].astype(jnp.int32)
    cx = scal_ref[3]
    cy = scal_ref[4]
    dt = scal_ref[5]
    thresh = scal_ref[6]

    L = lanes_n
    lane_lo = j * L
    lanes = pl.ds(lane_lo, L)
    g_max = t2 // 8

    # static chunk count: a_sw/64 chunks + 1 for the <8-row alignment spill
    n_chunks = a_sw // _R + 1
    g_base = col0 // 8  # aligned-down group of the slice start

    def dma(slot, c):
        gs = jnp.minimum(g_base + c * (_R // 8), g_max - _R // 8)
        return gs, [
            pltpu.make_async_copy(px_hbm.at[pl.ds(gs, _R // 8), :, lanes],
                                  bx_ref.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(py_hbm.at[pl.ds(gs, _R // 8), :, lanes],
                                  by_ref.at[slot], sems.at[slot, 1]),
        ]

    _, cps = dma(0, 0)
    for cp in cps:
        cp.start()

    # pass 1: sweep.  global row g holds age a_sw - 1 - (g - col0); f is
    # strictly decreasing in age, so running masked reductions find the
    # band.  Clamped/duplicated rows are absorbed by idempotent min/max.
    def body(c, carry):
        a0, alast = carry
        slot = c % 2
        gs, cps = dma(slot, c)

        @pl.when(c + 1 < n_chunks)
        def _():
            _, nxt = dma((c + 1) % 2, c + 1)
            for cp in nxt:
                cp.start()

        for cp in cps:
            cp.wait()
        x = bx_ref[slot].reshape(_R, L)
        y = by_ref[slot].reshape(_R, L)
        grow = jax.lax.broadcasted_iota(jnp.int32, (_R, L), 0) + gs * 8
        age = (a_sw - 1) - (grow - col0)
        dx = x - cx
        dy = y - cy
        f = jnp.sqrt(dx * dx + dy * dy) - age.astype(jnp.float32) * dt
        in_range = (
            (age >= 1) & (age <= hi0) & (grow >= col0)
            & (grow < col0 + a_sw)
        )
        enter = (f <= thresh) & in_range
        crossing = enter & (f >= -thresh)
        a0 = jnp.minimum(a0, jnp.min(jnp.where(enter, age, hi0 + 1), axis=0))
        alast = jnp.maximum(
            alast, jnp.max(jnp.where(crossing, age, -1), axis=0)
        )
        return a0, alast

    a0_init = jnp.zeros((L,), jnp.int32) + hi0 + 1
    alast_init = jnp.full((L,), -1, jnp.int32)
    a0, alast = jax.lax.fori_loop(
        0, n_chunks, body, (a0_init, alast_init), unroll=False
    )
    a0_ref[0, :] = a0
    alast_ref[0, :] = alast

    # pass 2: per-lane window start columns (mirrored coords), exactly the
    # XLA formula; non-crossing lanes pinned to the block minimum so the
    # span stays tight (their windows are dead downstream)
    start_col = jnp.clip(base_col - (a0 + band - 1), 0, t2 - w)
    entered = a0 <= hi0
    big = jnp.int32(2 * t2)
    lo = jnp.min(jnp.where(entered, start_col, big))
    any_entered = lo < big
    lo = jnp.where(any_entered, lo, 0)
    start_eff = jnp.where(entered, start_col, lo)
    hi = jnp.max(jnp.where(entered, start_col, 0))
    hi = jnp.where(any_entered, hi, 0)
    span = hi - lo + w  # dynamic; usually w + a few rows

    for k in range(w):
        wx_ref[k, :] = jnp.zeros((L,), jnp.float32)
        wy_ref[k, :] = jnp.zeros((L,), jnp.float32)
        wvx_ref[k, :] = jnp.zeros((L,), jnp.float32)
        wvy_ref[k, :] = jnp.zeros((L,), jnp.float32)

    n_e = pl.cdiv(span, erows)

    def ebody(c, _):
        # logical chunk targets rows [chunk_lo, chunk_lo + erows); physical
        # DMA reads eb rows from the aligned-down, bounds-clamped start
        chunk_lo = lo + c * erows
        r0 = jnp.minimum(chunk_lo, t2 - eb)
        g2 = r0 // 8
        r0a = g2 * 8
        cps = [
            pltpu.make_async_copy(
                b.at[pl.ds(g2, eb // 8), :, lanes], ex_ref.at[k_],
                esems.at[k_],
            )
            for k_, b in enumerate((px_hbm, py_hbm, vx_hbm, vy_hbm))
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        exm = [ex_ref[k_].reshape(eb, L) for k_ in range(4)]
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (eb, L), 0)
        # masked-reduce: window column k of lane l targets global row
        # start_eff[l] + k, owned by THIS chunk iff inside its logical
        # range.  One (eb, L) compare + sublane reduce per (column, plane)
        # — a per-row (1, L) RMW loop here traced at ~6 ms/frame at the
        # 116k scene (tiny-op issue overhead), the batched form ~0.5 ms.
        for k in range(w):
            tgt = start_eff + k
            rel = tgt - r0a  # buffer row per lane
            own = (tgt >= chunk_lo) & (tgt < chunk_lo + erows)
            m = (rows_iota == rel[None, :]) & own[None, :]
            wx_ref[k, :] = wx_ref[k, :] + jnp.sum(
                jnp.where(m, exm[0], 0.0), axis=0)
            wy_ref[k, :] = wy_ref[k, :] + jnp.sum(
                jnp.where(m, exm[1], 0.0), axis=0)
            wvx_ref[k, :] = wvx_ref[k, :] + jnp.sum(
                jnp.where(m, exm[2], 0.0), axis=0)
            wvy_ref[k, :] = wvy_ref[k, :] + jnp.sum(
                jnp.where(m, exm[3], 0.0), axis=0)
        return 0

    jax.lax.fori_loop(0, n_e, ebody, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("a_sw", "band", "interpret"),
)
def cone_band_window_pallas(
    pos_x, pos_y, vel_x, vel_y,  # (2T, N) mirrored time-major ring planes
    col0, hi0, base_col,  # traced i32 scalars
    cx, cy, dt, thresh,  # traced f32 scalars
    a_sw: int,
    band: int,
    interpret: bool = False,
):
    """Fused band search + window extraction.  Returns
    (a0 (N,), alast (N,), wx, wy, wvx, wvy each (N, band+1))."""
    t2, n = pos_x.shape
    lanes_n = L if n % L == 0 else 256
    assert n % lanes_n == 0, "capacity must be a multiple of 256"
    assert t2 % 8 == 0 and a_sw % 128 == 0
    w = band + 1
    erows = max(16, ((w + 8 + 7) // 8) * 8)
    eb = erows + 8  # physical buffer: +8 rows of alignment slack
    assert t2 >= eb
    scal = jnp.stack([
        col0.astype(jnp.float32), hi0.astype(jnp.float32),
        base_col.astype(jnp.float32), cx, cy, dt, thresh,
    ])
    kernel = functools.partial(
        _band_kernel, w=w, a_sw=a_sw, erows=erows, eb=eb, band=band, t2=t2,
        lanes_n=lanes_n,
    )
    LN = lanes_n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // LN,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[
            pl.BlockSpec((1, LN), lambda j, *_: (0, j)),
            pl.BlockSpec((1, LN), lambda j, *_: (0, j)),
            pl.BlockSpec((w, LN), lambda j, *_: (0, j)),
            pl.BlockSpec((w, LN), lambda j, *_: (0, j)),
            pl.BlockSpec((w, LN), lambda j, *_: (0, j)),
            pl.BlockSpec((w, LN), lambda j, *_: (0, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, _R // 8, 8, LN), jnp.float32),
            pltpu.VMEM((2, _R // 8, 8, LN), jnp.float32),
            pltpu.VMEM((4, eb // 8, 8, LN), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    r3 = lambda p: p.reshape(t2 // 8, 8, n)
    a0, alast, wx, wy, wvx, wvy = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((w, n), jnp.float32),
            jax.ShapeDtypeStruct((w, n), jnp.float32),
            jax.ShapeDtypeStruct((w, n), jnp.float32),
            jax.ShapeDtypeStruct((w, n), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(scal, r3(pos_x), r3(pos_y), r3(vel_x), r3(vel_y))
    return (a0[0], alast[0], wx.T, wy.T, wvx.T, wvy.T)
