"""Curved 2+1 spacetime: retarded-time rendering around a conical defect.

BASELINE.json config 5 (stretch): "curved 2+1 spacetime — geodesic ray
integration around a conical-defect/BTZ mass".  The reference has nothing for
this; this module implements the conical-defect case exactly (no numerical
ray marching needed).

Physics.  A point mass M in 2+1D GR curves space into a CONE: the geometry
stays flat everywhere except the defect point, but the total angle around it
is alpha = 2*pi - deficit (deficit = 8*pi*G*M).  Photons travel along
geodesics of the cone; between two points there are up to TWO geodesics —
the direct one and one "around the back" of the defect — with *different
lengths*, hence different retarded times: a moving body near the defect
shows two images from two different moments of its history (gravitational
lensing with time delay), all in closed form:

  Let (r_a, phi_a), (r_b, phi_b) be chart polar coords around the defect and
  d_phi the chart angular separation.  Route 1 is the chart-straight segment
  (length = Euclidean chart distance, valid while the segment's minor arc
  avoids the cut).  Route 2 spans angle (alpha - d_phi); by the law of
  cosines L2 = sqrt(ra^2 + rb^2 - 2 ra rb cos(alpha - d_phi)), and it exists
  as a geodesic iff (alpha - d_phi) < pi.

Modeling choices (documented limitations, round-1):
  * The softbody physics itself runs in the flat chart — valid because
    conical space is flat away from the tip; keep bodies off the defect.
  * The scene should keep its action away from the cut ray (the chart seam).
  * Curved mode renders x-ray (no occlusion retina): occlusion along bent
    geodesics needs per-route visibility and is future work.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..camera import Camera, pixel_centers
from ..state import Objects
from .raytrace import (
    PairTables,
    RenderParams,
    _BIG,
    _compose_block,
    _occupancy_block,
    _pad_pixels,
    _segment_data,
    shade_hit,
)
from .worldline import WorldlineBuffer


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConicalDefect:
    center: jax.Array  # (2,) f32 — defect position in chart coords
    deficit: jax.Array  # () f32 — deficit angle in radians (8*pi*G*M)

    @staticmethod
    def create(center=(0.5, 0.5), deficit=0.8) -> "ConicalDefect":
        return ConicalDefect(
            center=jnp.asarray(center, jnp.float32),
            deficit=jnp.asarray(deficit, jnp.float32),
        )


def geodesic_lengths(a, b, defect: ConicalDefect):
    """Lengths of the two geodesics between chart points a (..., 2) and
    b (..., 2).  Returns (l1, l2, valid2): l1 is the direct chart distance,
    l2 the around-the-back route (inf-like where it doesn't exist)."""
    ra_v = a - defect.center
    rb_v = b - defect.center
    ra = jnp.linalg.norm(ra_v, axis=-1)
    rb = jnp.linalg.norm(rb_v, axis=-1)
    l1 = jnp.linalg.norm(a - b, axis=-1)
    # chart angular separation in [0, pi] (cos is enough: it's symmetric)
    cos_d = jnp.clip(
        jnp.sum(ra_v * rb_v, axis=-1) / jnp.maximum(ra * rb, 1e-12), -1.0, 1.0
    )
    d_phi = jnp.arccos(cos_d)
    alpha = 2.0 * jnp.pi - defect.deficit
    back = alpha - d_phi
    valid2 = back < jnp.pi
    l2 = jnp.sqrt(
        jnp.maximum(ra**2 + rb**2 - 2.0 * ra * rb * jnp.cos(back), 0.0)
    )
    l2 = jnp.where(valid2, l2, _BIG)
    return l1, l2, valid2


@partial(jax.jit, static_argnames=("width", "height", "params"))
def render_retarded_conical(
    buf: WorldlineBuffer,
    obj_index: jax.Array,
    objects: Objects,
    cam: Camera,
    defect: ConicalDefect,
    width: int,
    height: int,
    params: RenderParams,
) -> jax.Array:
    """Retarded x-ray render with conical-defect geodesics: each pixel can
    show matter via the direct route OR the around-the-back route (double
    images with different retarded times); the brighter/nearer (shorter
    route) wins where both hit.

    Structure mirrors the flat accelerated path, with annulus candidate
    compaction + spatial hashing; the light-cone radius per route is the
    geodesic length instead of |p - cam|.
    """
    from . import grid as grid_ops
    from .raytrace import _compact

    dt, rho = params.dt, params.rho
    lam = params.cell_size
    t_cap, n = buf.capacity, buf.num_particles
    t_now = buf.times[buf.cursor]
    qa, qb, ta, seg_valid = _segment_data(buf, dt)

    # --- annulus mask per ROUTE (union) ---
    l1a, l2a, _ = geodesic_lengths(qa, cam.pos, defect)  # (T, N)
    l1b, l2b, _ = geodesic_lengths(qb, cam.pos, defect)
    s_hi = t_now - ta
    s_lo = s_hi - dt

    def route_mask(la, lb):
        return (jnp.maximum(la, lb) >= s_lo[:, None] - rho) & (
            jnp.minimum(la, lb) <= s_hi[:, None] + rho
        )

    cand = (
        seg_valid[:, None]
        & (s_hi[:, None] > 0)
        & (route_mask(l1a, l1b) | route_mask(l2a, l2b))
        & (jnp.linalg.norm(qa - cam.pos, axis=-1) < 1.0e8)
    )

    pcap = params.pair_capacity
    pair_sid, n_pairs = _compact(cand.reshape(-1), pcap)
    pair_valid = pair_sid >= 0
    sid = jnp.maximum(pair_sid, 0)
    slot, pidx = sid // n, sid % n
    pqa = jnp.where(pair_valid[:, None], qa.reshape(-1, 2)[sid], 2.0e9)
    pqb = jnp.where(pair_valid[:, None], qb.reshape(-1, 2)[sid], 2.0e9)
    pta = ta[slot]
    pvel = buf.vel.reshape(-1, 2)[sid]
    pobj = obj_index[pidx]

    # --- spatial hash (identical to flat path) ---
    n_keys = params.table_factor * pcap
    center = 0.5 * (pqa + pqb)
    reach = rho + 0.5 * jnp.linalg.norm(pqb - pqa, axis=-1)
    cell0 = grid_ops.cell_of(center, lam)
    doffs = jnp.array([(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)], jnp.int32)
    cells = cell0[:, None, :] + doffs[None, :, :]
    lo = cells.astype(jnp.float32) * lam
    nearest = jnp.clip(center[:, None, :], lo, lo + lam)
    d2cell = jnp.sum((nearest - center[:, None, :]) ** 2, axis=-1)
    use = pair_valid[:, None] & (d2cell <= (reach[:, None] + 1e-6) ** 2)
    key = jnp.where(use, grid_ops.hash_cell(cells, n_keys - 1), n_keys).reshape(-1)
    val = jnp.broadcast_to(
        jnp.arange(pcap, dtype=jnp.int32)[:, None], (pcap, 9)
    ).reshape(-1)
    skey, sval = jax.lax.sort_key_val(key, val)
    n_entries = skey.shape[0]
    starts = jnp.full((n_keys + 1,), n_entries, jnp.int32)
    starts = starts.at[skey].min(jnp.arange(n_entries, dtype=jnp.int32))
    counts = jnp.zeros((n_keys + 1,), jnp.int32).at[key].add(1)

    # --- per-pixel occupancy, both routes, chunked pixel blocks ---
    tables = PairTables(
        starts=starts, counts=counts, sval=sval, pair_valid=pair_valid,
        pax=pqa[:, 0], pay=pqa[:, 1], pbx=pqb[:, 0], pby=pqb[:, 1],
        pta=pta, pvx=pvel[:, 0], pvy=pvel[:, 1], pobj=pobj,
    )
    pxs, pys, n_px = _pad_pixels(width, height, cam, params.pixel_block)
    cap = params.bin_capacity
    xray = dataclasses.replace(params, opaque=False)

    def block_fn(args):
        px, py = args
        p2 = jnp.stack([px, py], axis=-1)
        lp1, lp2, _v2 = geodesic_lengths(p2, cam.pos, defect)
        occ1, bid1 = _occupancy_block(
            px, py, t_now - lp1, tables, lam, n_keys, cap, dt, rho
        )
        occ2, bid2 = _occupancy_block(
            px, py, t_now - lp2, tables, lam, n_keys, cap, dt, rho
        )
        # shorter route wins where both hit (younger, brighter image)
        use1 = occ1 | ~occ2
        occupied = occ1 | occ2
        best_pid = jnp.where(use1, bid1, bid2)
        r_eff = jnp.where(use1, lp1, lp2)
        return _compose_block(
            px, py, r_eff, occupied, best_pid, jnp.full_like(r_eff, _BIG),
            tables, objects, cam, xray,
        )

    colors = jax.lax.map(block_fn, (pxs, pys))
    return colors.reshape(-1, 3)[:n_px].reshape(height, width, 3)
