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

Occlusion and arrival directions (round 2) use the UNROLLED-CONE picture:
rotating a chart point about the defect by -sign(d_phi) * alpha maps it to
its "route-2 image", and the around-the-back geodesic from the camera is the
chart-STRAIGHT segment to that image.  Therefore:
  * route-1 occlusion is the ordinary flat 1D retina (chart-straight rays);
  * route-2 occlusion is a SECOND retina marched over route-2-imaged
    candidates (positions and velocities rotated by each candidate's sign);
  * the route-2 arrival direction at the camera is toward the rotated event,
    and the emitter velocity is parallel-transported (rotated) likewise
    before Doppler shading.

Modeling choices (documented limitations):
  * The softbody physics itself runs in the flat chart — valid because
    conical space is flat away from the tip; keep bodies off the defect.
  * The rotation sign is taken per candidate/pixel from its bearing relative
    to the camera; paths grazing d_phi ≈ 0 or pi can pick the wrong image
    for occlusion (oracle tests budget the resulting pixel drift).
  * MULTI-DEFECT scenes (a tuple of defects) use the single-scattering
    superposition: routes = the direct ray plus one around-the-back route
    per defect; paths bending around two or more defects in sequence are
    neglected.  Valid when defects are well separated relative to the scene
    (each extra scattering adds a route longer by O(defect separation)).
  * DEFECT MOTION is quasi-static: each frame renders with the defect at
    its current position (engine-level trajectory), neglecting the
    retardation of the geometry change itself.
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
    RenderDiag,
    RenderParams,
    _BIG,
    _PI,
    _assemble_image,
    _band_pairs,
    _build_view_tables,
    _cell_pixel_coords,
    _occupancy_cells,
    _field_at,
    _retina,
    _F_VX, _F_VY, _F_CR, _F_CG, _F_CB,
    camera_doppler_factor_xy,
    doppler_factor_xy,
    shade_channels,
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


def _route2_theta(px, py, cam, defect: ConicalDefect):
    """Rotation angle mapping chart points to their route-2 images w.r.t.
    the camera: theta = -sign(bearing - camera bearing) * alpha, so the
    rotated angular separation is alpha - |d_phi| (the back route)."""
    cx, cy = defect.center[0], defect.center[1]
    phi_c = jnp.arctan2(cam.pos[1] - cy, cam.pos[0] - cx)
    d = jnp.arctan2(py - cy, px - cx) - phi_c
    d = jnp.mod(d + jnp.pi, 2.0 * jnp.pi) - jnp.pi  # wrap to (-pi, pi]
    alpha = 2.0 * jnp.pi - defect.deficit
    return jnp.where(d >= 0, -alpha, alpha)


def _rotate_about(px, py, theta, defect: ConicalDefect):
    cx, cy = defect.center[0], defect.center[1]
    ct, st = jnp.cos(theta), jnp.sin(theta)
    rx, ry = px - cx, py - cy
    return cx + ct * rx - st * ry, cy + st * rx + ct * ry


def _route2_image_pairs(pairs: PairData, cam, defect: ConicalDefect) -> PairData:
    """Route-2-imaged candidates: segment endpoints and velocities rotated
    about the defect by each candidate's (midpoint) rotation angle.  A
    straight retina over these IS route-2 occlusion (unrolled cone)."""
    from .raytrace import (
        _F_AX, _F_AY, _F_BX, _F_BY, _F_TA, _F_VX, _F_VY, _F_CR, _F_CG, _F_CB,
    )

    pd = pairs.pdata
    mx = 0.5 * (pd[:, _F_AX] + pd[:, _F_BX])
    my = 0.5 * (pd[:, _F_AY] + pd[:, _F_BY])
    theta = _route2_theta(mx, my, cam, defect)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cx, cy = defect.center[0], defect.center[1]

    def rot(x, y):
        rx, ry = x - cx, y - cy
        return cx + ct * rx - st * ry, cy + st * rx + ct * ry

    ax, ay = rot(pd[:, _F_AX], pd[:, _F_AY])
    bx, by = rot(pd[:, _F_BX], pd[:, _F_BY])
    vx = ct * pd[:, _F_VX] - st * pd[:, _F_VY]
    vy = st * pd[:, _F_VX] + ct * pd[:, _F_VY]
    pdata = jnp.stack(
        [ax, ay, bx, by, pd[:, _F_TA], vx, vy,
         pd[:, _F_CR], pd[:, _F_CG], pd[:, _F_CB]],
        axis=-1,
    )
    return PairData(pdata=pdata, pair_valid=pairs.pair_valid,
                    n_pairs=pairs.n_pairs)


def _render_conical_impl(
    buf: WorldlineBuffer,
    obj_index: jax.Array,
    objects: Objects,
    cam: Camera,
    defect,  # ConicalDefect | tuple[ConicalDefect, ...]
    width: int,
    height: int,
    params: RenderParams,
    planar: bool,
):
    """Retarded render with conical-defect geodesics: each pixel can show
    matter via the direct route or any defect's around-the-back route
    (multiple images with different retarded times); the shortest VISIBLE
    route wins.  Returns (image, RenderDiag).

    Opaque mode (params.opaque) marches one 1D occlusion retina PER ROUTE —
    the flat one for the direct route and one over route-2-imaged (rotated)
    candidates per defect — and shades each route with its true arrival
    direction and parallel-transported emitter velocity.  Multi-defect
    scenes use the single-scattering superposition (module docstring).
    """
    defects = defect if isinstance(defect, (tuple, list)) else (defect,)
    dt, rho = params.dt, params.rho
    t_now = buf.times[buf.cursor]
    cxm, cym = cam.pos[0], cam.pos[1]
    use_rays = params.opaque and params.retarded

    # One band search per geodesic ROUTE (each route length is monotone in
    # age because |v| < c), pairs concatenated into one table.
    def l1_of(qx, qy):
        return jnp.sqrt((qx - cxm) ** 2 + (qy - cym) ** 2)

    def l2_of(d):
        return lambda qx, qy: geodesic_lengths_xy(qx, qy, cxm, cym, d)[1]

    route_fns = [l1_of] + [l2_of(d) for d in defects]
    # NO view-hull culling: the route-2 retinas test ROTATED candidates
    # against 360-degree straight rays, so off-screen matter can occlude
    # (the flat renderer handles the same concern via _band_pairs_nocull)
    plist = []
    band_truncated = jnp.int32(0)
    for fn in route_fns:
        p, trunc, _segd = _band_pairs(buf, obj_index, objects, cam, t_now, width,
                               height, params, route_lengths=fn,
                               cull_hull=False)
        plist.append(p)
        band_truncated = band_truncated + trunc
    pairs = PairData(
        pdata=jnp.concatenate([p.pdata for p in plist], axis=0),
        pair_valid=jnp.concatenate([p.pair_valid for p in plist]),
        n_pairs=sum(p.n_pairs for p in plist),
    )
    from .raytrace import _compact_pairs_to_budget

    # K+1 routes of pairs share one pair_budget; pairs.n_pairs stays the
    # PRE-budget count so Engine._check_diag can warn/adapt on overflow
    # (ADVICE r2: the overflow used to be silent)
    pairs = _compact_pairs_to_budget(pairs, params.pair_budget)

    tables, bin_dropped, entry_dropped, cell_too_small, geom = _build_view_tables(
        pairs, cam, width, height, params
    )
    wc_img, hc_img, _ps, _gx, _gy = geom
    diag = RenderDiag(
        pairs_used=pairs.n_pairs,
        band_truncated=band_truncated,
        bin_dropped=bin_dropped,
        cell_too_small=cell_too_small,
        retina_dropped=None,
        entry_dropped=entry_dropped,
    )

    # --- per-route occlusion retinas (opaque mode) ---
    n_rays = params.num_rays
    if use_rays:
        retinas = [_retina(pairs, cam, t_now, params)]
        for d in defects:
            retinas.append(
                _retina(_route2_image_pairs(pairs, cam, d), cam, t_now, params)
            )
        retina_rows = [
            jnp.broadcast_to(s[:, None], (n_rays, 8)) for s in retinas
        ]

    def retina_at(rows, phi):
        ri = jnp.clip(
            jnp.floor((phi + _PI) / (2 * _PI) * n_rays).astype(jnp.int32),
            0, n_rays - 1,
        )
        return rows[ri][..., 0]

    # --- per-pixel occupancy + visibility + shading, dense cell blocks ---
    pxs, pys = _cell_pixel_coords(width, height, cam, params)
    cb = params.cells_per_block
    n_blocks = pxs.shape[0] // cb

    def block_fn(args):
        vdat, vok, px, py = args

        # per-route quantities (python loop, K+1 routes, K static & small)
        routes = []
        lp1 = jnp.sqrt((px - cxm) ** 2 + (py - cym) ** 2)
        occ1, win1 = _occupancy_cells(px, py, t_now - lp1, vdat, vok, dt, rho)
        if use_rays:
            blk1 = retina_at(
                retina_rows[0], jnp.arctan2(py - cym, px - cxm)
            ) < (lp1 - 2.0 * rho)
        else:
            blk1 = jnp.zeros_like(occ1)
        routes.append(dict(lp=lp1, occ=occ1, win=win1, blk=blk1,
                           ex=px, ey=py, theta=None))
        for i, d in enumerate(defects):
            _l1, lp2, v2 = geodesic_lengths_xy(px, py, cxm, cym, d)
            occ2, win2 = _occupancy_cells(
                px, py, t_now - lp2, vdat, vok, dt, rho
            )
            occ2 = occ2 & v2
            theta_p = _route2_theta(px, py, cam, d)
            rpx, rpy = _rotate_about(px, py, theta_p, d)
            if use_rays:
                blk2 = retina_at(
                    retina_rows[i + 1], jnp.arctan2(rpy - cym, rpx - cxm)
                ) < (lp2 - 2.0 * rho)
            else:
                blk2 = jnp.zeros_like(occ2)
            routes.append(dict(lp=lp2, occ=occ2, win=win2, blk=blk2,
                               ex=rpx, ey=rpy, theta=theta_p))

        # masked-min winner among routes: visible (occupied & unblocked)
        # routes first; absorbed fallback over merely-occupied routes
        def masked_best(cond_key):
            best_lp = jnp.full_like(lp1, _BIG)
            sel_idx = jnp.full(lp1.shape, -1, jnp.int32)
            for i, r in enumerate(routes):
                cond = r["occ"] & ~r["blk"] if cond_key == "vis" else r["occ"]
                better = cond & (r["lp"] < best_lp)
                best_lp = jnp.where(better, r["lp"], best_lp)
                sel_idx = jnp.where(better, i, sel_idx)
            return sel_idx, best_lp

        vis_idx, _vis_lp = masked_best("vis")
        occ_idx, _occ_lp = masked_best("occ")
        visible = vis_idx >= 0
        occupied = occ_idx >= 0
        route_idx = jnp.where(visible, vis_idx, occ_idx)

        # gather per-route fields by masked select (K+1 static routes)
        winner = routes[0]["win"]
        r_eff, ex, ey = routes[0]["lp"], routes[0]["ex"], routes[0]["ey"]
        for i, r in enumerate(routes[1:], start=1):
            m = route_idx == i
            winner = jnp.where(m[:, :, None], r["win"], winner)
            r_eff = jnp.where(m, r["lp"], r_eff)
            ex = jnp.where(m, r["ex"], ex)
            ey = jnp.where(m, r["ey"], ey)

        # shading: per-route arrival direction; back-route emitter velocity
        # is parallel-transported (rotated by the pixel's theta — the winner
        # sits within rho of the pixel, same rotation branch)
        vx0 = _field_at(vdat, winner, _F_VX)
        vy0 = _field_at(vdat, winner, _F_VY)
        vx, vy = vx0, vy0
        for i, r in enumerate(routes[1:], start=1):
            m = route_idx == i
            ct, st = jnp.cos(r["theta"]), jnp.sin(r["theta"])
            vx = jnp.where(m, ct * vx0 - st * vy0, vx)
            vy = jnp.where(m, st * vx0 + ct * vy0, vy)
        inv_r = 1.0 / jnp.maximum(r_eff, 1e-12)
        nx = (cxm - ex) * inv_r
        ny = (cym - ey) * inv_r
        d = doppler_factor_xy(vx, vy, nx, ny) * camera_doppler_factor_xy(
            cam.vel[0], cam.vel[1], nx, ny
        )
        cr = _field_at(vdat, winner, _F_CR)
        cg = _field_at(vdat, winner, _F_CG)
        cb_ = _field_at(vdat, winner, _F_CB)
        sr, sg, sb = shade_channels(cr, cg, cb_, d, params)

        if use_rays:
            # background shadow: every route that could carry light is blocked
            bg_blocked = routes[0]["blk"]
            for r in routes[1:]:
                # a defect route shadows only where it exists (occ-independent
                # existence = the geodesic validity baked into lp < BIG)
                bg_blocked = bg_blocked & (r["blk"] | (r["lp"] >= _BIG))

            def compose(s):
                return jnp.where(
                    visible, s,
                    jnp.where(
                        occupied, s * params.absorbed_dim,
                        jnp.where(bg_blocked, jnp.float32(params.shadow), 1.0),
                    ),
                )

        else:

            def compose(s):
                return jnp.where(occupied, s, 1.0)

        return jnp.stack([compose(sr), compose(sg), compose(sb)], axis=1)

    crgb = jax.lax.map(
        block_fn,
        (
            tables.vdat.reshape(n_blocks, cb, *tables.vdat.shape[1:]),
            tables.vok.reshape(n_blocks, cb, *tables.vok.shape[1:]),
            pxs.reshape(n_blocks, cb, -1),
            pys.reshape(n_blocks, cb, -1),
        ),
    )
    img = _assemble_image(crgb, width, height, params, planar, wc_img, hc_img)
    return img, diag


@partial(jax.jit, static_argnames=("width", "height", "params", "planar"))
def render_retarded_conical(
    buf: WorldlineBuffer,
    obj_index: jax.Array,
    objects: Objects,
    cam: Camera,
    defect,
    width: int,
    height: int,
    params: RenderParams,
    planar: bool = False,
) -> jax.Array:
    img, _ = _render_conical_impl(
        buf, obj_index, objects, cam, defect, width, height, params, planar
    )
    return img


@partial(jax.jit, static_argnames=("width", "height", "params", "planar"))
def render_retarded_conical_with_diag(
    buf: WorldlineBuffer,
    obj_index: jax.Array,
    objects: Objects,
    cam: Camera,
    defect,
    width: int,
    height: int,
    params: RenderParams,
    planar: bool = False,
):
    """(image, RenderDiag) — the flat renderer's diagnostics surface for the
    conical path (VERDICT r2 #4; retina_dropped is None: curved retinas
    march the full compacted pair table)."""
    return _render_conical_impl(
        buf, obj_index, objects, cam, defect, width, height, params, planar
    )


@partial(jax.jit, static_argnames=("width", "height", "params"))
def render_conical_brute(
    buf: WorldlineBuffer,
    obj_index: jax.Array,
    objects: Objects,
    cam: Camera,
    defect,  # ConicalDefect | tuple[ConicalDefect, ...]
    width: int,
    height: int,
    params: RenderParams,
) -> jax.Array:
    """Exhaustive conical-defect oracle: every pixel tests every (slot,
    particle) segment on EVERY geodesic route (direct + one back route per
    defect), with exact per-pixel occlusion (chart-straight rays for the
    direct route; each back route against its route-2-imaged segments).
    Defines correct output for render_retarded_conical (SURVEY.md §4 oracle
    strategy) — tiny scenes."""
    from .raytrace import _occupancy_xy, _ray_hit_xy, _segment_data
    from ..camera import pixel_centers

    defects = defect if isinstance(defect, (tuple, list)) else (defect,)
    dt, rho = params.dt, params.rho
    t_now = buf.times[buf.cursor]
    cxm, cym = cam.pos[0], cam.pos[1]
    use_rays = params.opaque and params.retarded

    qax, qay, qbx, qby, ta, seg_valid = _segment_data(buf, dt)
    t_cap, n = qax.shape
    fax, fay = qax.reshape(-1), qay.reshape(-1)
    fbx, fby = qbx.reshape(-1), qby.reshape(-1)
    fta = jnp.repeat(ta, n)
    valid_f = jnp.repeat(seg_valid, n) & (jnp.abs(fax) < 1e8)
    fobj = jnp.tile(obj_index, t_cap)
    fvx = buf.vel_x[:t_cap].reshape(-1)
    fvy = buf.vel_y[:t_cap].reshape(-1)

    pc = pixel_centers(width, height, cam)
    px = pc[..., 0].reshape(-1)
    py = pc[..., 1].reshape(-1)

    def route_pass(t_e, seg):
        ax, ay, bx, by = seg
        inside, dist2 = _occupancy_xy(
            px[:, None], py[:, None], t_e[:, None],
            ax[None], ay[None], bx[None], by[None], fta[None], dt, rho,
        )
        inside = inside & valid_f[None, :]
        dist2 = jnp.where(inside, dist2, _BIG)
        best = jnp.argmin(dist2, axis=1)
        occ = jnp.take_along_axis(inside, best[:, None], axis=1)[:, 0]
        return occ, best

    def first_hit(dhx, dhy, ax, ay, bx, by):
        hit, s_hit = _ray_hit_xy(
            cxm, cym, dhx[:, None], dhy[:, None],
            ax[None], ay[None], bx[None], by[None], fta[None],
            t_now, dt, rho,
        )
        s_hit = jnp.where(hit & valid_f[None, :], s_hit, _BIG)
        return jnp.min(s_hit, axis=1)

    # direct route
    lp1 = jnp.sqrt((px - cxm) ** 2 + (py - cym) ** 2)
    occ1, best1 = route_pass(t_now - lp1, (fax, fay, fbx, fby))
    if use_rays:
        inv1 = 1.0 / jnp.maximum(lp1, 1e-12)
        blk1 = first_hit((px - cxm) * inv1, (py - cym) * inv1,
                         fax, fay, fbx, fby) < (lp1 - 2.0 * rho)
    else:
        blk1 = jnp.zeros_like(occ1)
    routes = [dict(lp=lp1, occ=occ1, best=best1, blk=blk1,
                   ex=px, ey=py, theta=jnp.zeros_like(px))]

    for dfc in defects:
        # route-2 images of every segment (midpoint rotation sign)
        mx, my = 0.5 * (fax + fbx), 0.5 * (fay + fby)
        th_s = _route2_theta(mx, my, cam, dfc)
        rax, ray_ = _rotate_about(fax, fay, th_s, dfc)
        rbx, rby = _rotate_about(fbx, fby, th_s, dfc)

        _l1, lp2, v2 = geodesic_lengths_xy(px, py, cxm, cym, dfc)
        theta_p = _route2_theta(px, py, cam, dfc)
        rpx, rpy = _rotate_about(px, py, theta_p, dfc)
        occ2, best2 = route_pass(t_now - lp2, (fax, fay, fbx, fby))
        occ2 = occ2 & v2
        if use_rays:
            inv2 = 1.0 / jnp.maximum(
                jnp.sqrt((rpx - cxm) ** 2 + (rpy - cym) ** 2), 1e-12
            )
            blk2 = first_hit((rpx - cxm) * inv2, (rpy - cym) * inv2,
                             rax, ray_, rbx, rby) < (lp2 - 2.0 * rho)
        else:
            blk2 = jnp.zeros_like(occ2)
        routes.append(dict(lp=lp2, occ=occ2, best=best2, blk=blk2,
                           ex=rpx, ey=rpy, theta=theta_p))

    def masked_best(vis):
        best_lp = jnp.full_like(px, _BIG)
        sel = jnp.full(px.shape, -1, jnp.int32)
        for i, r in enumerate(routes):
            cond = r["occ"] & ~r["blk"] if vis else r["occ"]
            better = cond & (r["lp"] < best_lp)
            best_lp = jnp.where(better, r["lp"], best_lp)
            sel = jnp.where(better, i, sel)
        return sel

    vis_idx = masked_best(True)
    occ_idx = masked_best(False)
    visible = vis_idx >= 0
    occupied = occ_idx >= 0
    route_idx = jnp.where(visible, vis_idx, occ_idx)

    best = routes[0]["best"]
    r_eff, ex, ey, theta_p = (routes[0][k] for k in ("lp", "ex", "ey", "theta"))
    for i, r in enumerate(routes[1:], start=1):
        m = route_idx == i
        best = jnp.where(m, r["best"], best)
        r_eff = jnp.where(m, r["lp"], r_eff)
        ex = jnp.where(m, r["ex"], ex)
        ey = jnp.where(m, r["ey"], ey)
        theta_p = jnp.where(m, r["theta"], theta_p)

    obj = fobj[best]
    cr = objects.base_color[:, 0][obj]
    cg = objects.base_color[:, 1][obj]
    cb = objects.base_color[:, 2][obj]
    wvx, wvy = fvx[best], fvy[best]
    ct, st = jnp.cos(theta_p), jnp.sin(theta_p)
    vx = ct * wvx - st * wvy  # theta = 0 on the direct route
    vy = st * wvx + ct * wvy
    inv_r = 1.0 / jnp.maximum(r_eff, 1e-12)
    nx = (cxm - ex) * inv_r
    ny = (cym - ey) * inv_r
    d = doppler_factor_xy(vx, vy, nx, ny) * camera_doppler_factor_xy(
        cam.vel[0], cam.vel[1], nx, ny
    )
    sr, sg, sb = shade_channels(cr, cg, cb, d, params)
    if use_rays:
        bg_blocked = routes[0]["blk"]
        for r in routes[1:]:
            bg_blocked = bg_blocked & (r["blk"] | (r["lp"] >= _BIG))
        comp = lambda s: jnp.where(
            visible, s,
            jnp.where(
                occupied, s * params.absorbed_dim,
                jnp.where(bg_blocked, jnp.float32(params.shadow), 1.0),
            ),
        )
    else:
        comp = lambda s: jnp.where(occupied, s, 1.0)
    img = jnp.stack([comp(sr), comp(sg), comp(sb)], axis=-1)
    return img.reshape(height, width, 3)
