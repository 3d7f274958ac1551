"""Pallas TPU kernel: the non-relativistic point renderer, scatter-free.

This is the reference's SHIPPED renderer (its raytracer is an empty stub):
one pixel per particle, camera pan+zoom, colored by object, white background
(reference: src/twoplusone/softbody/point_render_nr.rs:32-91,
points_norel.glsl:1-52).  `ops/rasterize.py` implements it as an XLA scatter
— correct everywhere, but TPU scatters serialize per index: 8 ms/frame at
the 116k reference demo (traced; scalar scatters and scatter-max measured
WORSE, see PERF.md "point renderer" notes).  This kernel replaces the
scatter with sort + one-hot matmuls — the two primitives the TPU is
actually fast at:

  * Each particle gets an integer key = image tile id * 1024 + local pixel
    id, where tiles are the native (8, 128) pixel blocks of the image and
    local id = (y%8)*128 + x%128.  One `lax.sort` by key groups particles
    by tile, in-tile in raster order.
  * Duplicate pixels are masked after the sort (stable sort -> the LOWEST
    particle index wins, a deterministic version of the reference's
    unordered last-write-wins; key -> -1 never matches any tile).
  * A Pallas kernel walks tile GROUPS; per 128-entry sorted row it builds
    two one-hot matrices (sublane = which of the group's G*8 pixel rows,
    lane = which of 128 pixel columns) and turns pixel placement into
    `(4*G*8, E) @ (E, 128)` MXU matmuls — RGB plus a coverage channel that
    composes the white background without a separate pass.  No gather, no
    scatter, no per-entry control flow anywhere.

The entry windows per group come from one vectorized `searchsorted` over
the sorted keys (the collision kernel's trick, forces_pallas.py); window
chunks stream HBM -> VMEM with double-buffered DMA.  Entries beyond
`wmax` chunks are dropped and COUNTED (PointsDiag.window_truncated — the
engine warns; a group only exceeds the default cap when > wmax*256
particles land on its G*1024 pixels).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..camera import Camera, world_to_pixel
from ..state import Objects, Particles

_SUB = 8
_LANE = 128
_TILE_PX = _SUB * _LANE  # 1024 pixels per (8, 128) image tile
_ROW = 2  # sorted-entry rows (of 128 entries) per DMA chunk


class PointsDiag(NamedTuple):
    window_truncated: jax.Array  # () i32: entries dropped beyond wmax


def _points_kernel(
    start_ref,  # SMEM (n_inst + 1,) i32: group g's entries = [start[g], start[g+1])
    ent_hbm,  # ANY (n_rows, 4, 128) f32: sorted (key, r, g, b) entry rows
    out_ref,  # VMEM (4, G, 8, 128) f32: rgb + coverage, G tiles of this group
    wbuf,  # VMEM (2, _ROW, 4, 128) double-buffered entry chunks
    sems,  # DMA (2,)
    *,
    G: int,
    wmax: int,
    n_rows: int,
):
    i = pl.program_id(0)
    lo = start_ref[i]
    hi = start_ref[i + 1]
    # chunk range of this group's entry window (chunk = _ROW entry rows)
    c0 = lo // (_ROW * _LANE)
    n_chunks = jnp.minimum(
        jnp.maximum((hi + _ROW * _LANE - 1) // (_ROW * _LANE) - c0, 0), wmax
    )

    def dma(slot, c):
        src_row = jnp.minimum((c0 + c) * _ROW, n_rows - _ROW)
        return pltpu.make_async_copy(
            ent_hbm.at[pl.ds(src_row, _ROW)], wbuf.at[slot], sems.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    g8 = G * _SUB
    sub_g = jax.lax.broadcasted_iota(jnp.int32, (g8, _LANE), 0)
    sub_px = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
    # group's first pixel key: tiles [i*G, (i+1)*G) own keys
    # [i*G*1024, (i+1)*G*1024) -- exact in f32 (keys < 2^24, see host side)
    base = (i * jnp.int32(G * _TILE_PX)).astype(jnp.float32)

    def chunk_body(c, acc):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            dma(1 - slot, c + 1).start()

        dma(slot, c).wait()
        for r in range(_ROW):
            kyf = wbuf[slot, r, 0, :].reshape(1, _LANE) - base
            # 128-lane-row index within the group: entries of OTHER groups
            # (window overscan, dup/sentinel keys) fall outside [0, G*8) and
            # match no sublane -- window masking is free (module docstring)
            lrow = jnp.floor(kyf * jnp.float32(1.0 / _LANE))
            lcol = kyf - lrow * jnp.float32(_LANE)
            rowoh = (sub_g == lrow.astype(jnp.int32)).astype(jnp.float32)
            # guard the int cast's UB range: huge/negative keys -> no match
            rowoh = rowoh * ((kyf >= 0.0) & (kyf < jnp.float32(g8 * _LANE)))
            coloh = (sub_px == lcol.astype(jnp.int32)).astype(jnp.float32)
            a4 = jnp.concatenate(
                [
                    rowoh * wbuf[slot, r, 1, :].reshape(1, _LANE),
                    rowoh * wbuf[slot, r, 2, :].reshape(1, _LANE),
                    rowoh * wbuf[slot, r, 3, :].reshape(1, _LANE),
                    rowoh,
                ],
                axis=0,
            )  # (4*G*8, E)
            acc = acc + jax.lax.dot_general(
                a4, coloh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    acc = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        jnp.zeros((4 * g8, _LANE), jnp.float32),
    )
    acc = acc.reshape(4, G, _SUB, _LANE)
    cov = acc[3]
    # white background where uncovered; dedup guarantees cov in {0, 1}
    for ch in range(3):
        out_ref[ch] = acc[ch] + (1.0 - cov)
    out_ref[3] = cov


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "G", "wmax", "interpret"),
)
def _rasterize_sorted(
    key: jax.Array,  # (N,) i32 pixel keys (SENT for inactive/offscreen)
    cr: jax.Array, cg: jax.Array, cb: jax.Array,  # (N,) f32 colors
    *,
    width: int,
    height: int,
    G: int,
    wmax: int,
    interpret: bool,
):
    n = key.shape[0]
    wt = -(-width // _LANE)
    ht = -(-height // _SUB)
    n_tiles = ht * wt
    n_inst = -(-n_tiles // G)
    n_tiles_pad = n_inst * G

    key_s, cr_s, cg_s, cb_s = jax.lax.sort(
        (key, cr, cg, cb), num_keys=1
    )
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), key_s[1:] == key_s[:-1]]
    )
    kyf = jnp.where(dup, jnp.float32(-1.0), key_s.astype(jnp.float32))

    # per-group entry windows (vectorized binary search, forces_pallas.py)
    qs = jnp.arange(n_inst + 1, dtype=jnp.int32) * jnp.int32(G * _TILE_PX)
    starts = jnp.searchsorted(key_s, qs, side="left").astype(jnp.int32)
    ends = starts[1:]
    avail = (starts[:-1] // (_ROW * _LANE) + wmax) * (_ROW * _LANE)
    truncated = jnp.sum(jnp.maximum(ends - jnp.maximum(starts[:-1], avail), 0))

    # pack sorted entries as (n_rows, 4, 128) so one DMA moves a whole chunk
    n_pad = -(-max(n, _ROW * _LANE) // (_ROW * _LANE)) * (_ROW * _LANE)
    pad = n_pad - n
    ent = jnp.stack(
        [
            jnp.pad(kyf, (0, pad), constant_values=-1.0),
            jnp.pad(cr_s, (0, pad)),
            jnp.pad(cg_s, (0, pad)),
            jnp.pad(cb_s, (0, pad)),
        ],
        axis=0,
    )  # (4, n_pad)
    ent = ent.reshape(4, n_pad // _LANE, _LANE).transpose(1, 0, 2)
    n_rows = n_pad // _LANE

    kernel = functools.partial(
        _points_kernel, G=G, wmax=wmax, n_rows=n_rows
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_inst,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (4, G, _SUB, _LANE), lambda i: (0, i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (4, n_tiles_pad, _SUB, _LANE), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _ROW, 4, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(starts, ent)

    img = (
        out[:3, :n_tiles]
        .reshape(3, ht, wt, _SUB, _LANE)
        .transpose(0, 1, 3, 2, 4)
        .reshape(3, ht * _SUB, wt * _LANE)[:, :height, :width]
    )
    return img, truncated


def render_points_pallas(
    particles: Particles,
    objects: Objects,
    cam: Camera,
    width: int = 1280,
    height: int = 720,
    *,
    G: int = 8,
    wmax: int = 96,
    interpret: bool = False,
    planar: bool = False,
):
    """(image, PointsDiag).  Image is (H, W, 3) f32 in [0, 1] (or (3, H, W)
    with planar=True), white background — same contract as
    rasterize.render_points, deterministic lowest-index winner on
    overlapping pixels.

    G = image tiles (of 8x128 pixels) per kernel instance; wmax bounds each
    instance's entry window at wmax*256 sorted entries (drops counted in
    the diag)."""
    wt_chk = -(-width // _LANE)
    ht_chk = -(-height // _SUB)
    if (ht_chk * wt_chk + G) * _TILE_PX >= 1 << 24:
        raise ValueError(
            "image too large for exact f32 keys in the points kernel "
            f"({ht_chk * wt_chk} tiles; max ~16k)"
        )
    px = world_to_pixel(particles.pos, width, height, cam)
    xi = jnp.round(px[:, 0]).astype(jnp.int32)
    yi = jnp.round(px[:, 1]).astype(jnp.int32)
    inside = (
        particles.active
        & (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
    )
    wt = -(-width // _LANE)
    ht = -(-height // _SUB)
    # sentinel must sort PAST the last padded group's window upper bound
    # (n_inst*G*1024, with n_inst*G < n_tiles + G) or inactive/offscreen
    # entries land in the last group's window and count as truncation
    sent = jnp.int32((ht * wt + G) * _TILE_PX)
    tile = (yi // _SUB) * wt + xi // _LANE
    local = (yi % _SUB) * _LANE + xi % _LANE
    key = jnp.where(inside, tile * _TILE_PX + local, sent)
    color = objects.base_color[particles.object_index]  # (N, 3)
    img, truncated = _rasterize_sorted(
        key, color[:, 0], color[:, 1], color[:, 2],
        width=width, height=height, G=G, wmax=wmax, interpret=interpret,
    )
    if not planar:
        img = img.transpose(1, 2, 0)
    return img, PointsDiag(window_truncated=truncated)
