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
  * Shading uses the chart arrival direction (exact for route 1; for route 2
    the true arrival direction is rotated around the defect).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..camera import Camera
from ..state import Objects
from .raytrace import (
    PairData,
    RenderParams,
    _BIG,
    _assemble_image,
    _band_pairs,
    _build_view_tables,
    _cell_pixel_coords,
    _compose_cells,
    _occupancy_cells,
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


def geodesic_lengths_xy(ax, ay, bx, by, defect: ConicalDefect):
    """Lengths of the two geodesics between chart points a and b (scalar
    components).  Returns (l1, l2, valid2): l1 is the direct chart distance,
    l2 the around-the-back route (BIG where it doesn't exist)."""
    dxc, dyc = defect.center[0], defect.center[1]
    rax, ray_ = ax - dxc, ay - dyc
    rbx, rby = bx - dxc, by - dyc
    ra = jnp.sqrt(rax * rax + ray_ * ray_)
    rb = jnp.sqrt(rbx * rbx + rby * rby)
    l1 = jnp.sqrt((ax - bx) ** 2 + (ay - by) ** 2)
    cos_d = jnp.clip(
        (rax * rbx + ray_ * rby) / jnp.maximum(ra * rb, 1e-12), -1.0, 1.0
    )
    d_phi = jnp.arccos(cos_d)
    alpha = 2.0 * jnp.pi - defect.deficit
    back = alpha - d_phi
    valid2 = back < jnp.pi
    l2 = jnp.sqrt(jnp.maximum(ra**2 + rb**2 - 2.0 * ra * rb * jnp.cos(back), 0.0))
    l2 = jnp.where(valid2, l2, _BIG)
    return l1, l2, valid2


def geodesic_lengths(a, b, defect: ConicalDefect):
    """Vector-form wrapper (tests)."""
    return geodesic_lengths_xy(
        a[..., 0], a[..., 1], b[..., 0], b[..., 1], defect
    )


@partial(jax.jit, static_argnames=("width", "height", "params", "planar"))
def render_retarded_conical(
    buf: WorldlineBuffer,
    obj_index: jax.Array,
    objects: Objects,
    cam: Camera,
    defect: ConicalDefect,
    width: int,
    height: int,
    params: RenderParams,
    planar: bool = False,
) -> jax.Array:
    """Retarded x-ray render with conical-defect geodesics: each pixel can
    show matter via the direct route OR the around-the-back route (double
    images with different retarded times); the shorter (younger) route wins
    where both hit.

    Structure mirrors the flat accelerated path; the light-cone radius per
    route is the geodesic length instead of |p - cam|."""
    dt, rho = params.dt, params.rho
    t_now = buf.times[buf.cursor]
    cxm, cym = cam.pos[0], cam.pos[1]

    # One band search per geodesic ROUTE (each route length is monotone in
    # age because |v| < c), pairs concatenated into one table.
    def l1_of(qx, qy):
        return geodesic_lengths_xy(qx, qy, cxm, cym, defect)[0]

    def l2_of(qx, qy):
        return geodesic_lengths_xy(qx, qy, cxm, cym, defect)[1]

    pairs1, _tr1 = _band_pairs(
        buf, obj_index, objects, cam, t_now, width, height, params,
        route_lengths=l1_of,
    )
    pairs2, _tr2 = _band_pairs(
        buf, obj_index, objects, cam, t_now, width, height, params,
        route_lengths=l2_of,
    )
    pairs = PairData(
        pdata=jnp.concatenate([pairs1.pdata, pairs2.pdata], axis=0),
        pair_valid=jnp.concatenate([pairs1.pair_valid, pairs2.pair_valid]),
        n_pairs=pairs1.n_pairs + pairs2.n_pairs,
    )
    from .raytrace import _compact_pairs_to_budget

    pairs = _compact_pairs_to_budget(pairs, params.pair_budget)

    tables, _bdrop, _small, geom = _build_view_tables(
        pairs, cam, width, height, params
    )
    wc_img, hc_img, _ps, _gx, _gy = geom

    # --- per-pixel occupancy, both routes, dense cell blocks ---
    pxs, pys = _cell_pixel_coords(width, height, cam, params)
    cb = params.cells_per_block
    n_blocks = pxs.shape[0] // cb
    xray = dataclasses.replace(params, opaque=False)

    def block_fn(args):
        vdat, vok, px, py = args
        lp1, lp2, _v2 = geodesic_lengths_xy(px, py, cxm, cym, defect)
        occ1, win1 = _occupancy_cells(px, py, t_now - lp1, vdat, vok, dt, rho)
        occ2, win2 = _occupancy_cells(px, py, t_now - lp2, vdat, vok, dt, rho)
        # shorter route wins where both hit (younger, brighter image) —
        # the around-the-back route is shorter when d_phi > alpha/2
        use1 = occ1 & (~occ2 | (lp1 <= lp2))
        occupied = occ1 | occ2
        winner = jnp.where(use1[:, :, None], win1, win2)
        r_eff = jnp.where(use1, lp1, lp2)
        return _compose_cells(
            px, py, r_eff, occupied, winner, jnp.full_like(r_eff, _BIG),
            vdat, cam, xray,
        )

    crgb = jax.lax.map(
        block_fn,
        (
            tables.vdat.reshape(n_blocks, cb, *tables.vdat.shape[1:]),
            tables.vok.reshape(n_blocks, cb, *tables.vok.shape[1:]),
            pxs.reshape(n_blocks, cb, -1),
            pys.reshape(n_blocks, cb, -1),
        ),
    )
    return _assemble_image(crgb, width, height, params, planar, wc_img, hc_img)
