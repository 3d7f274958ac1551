"""EXACT rotating-BTZ null-geodesic optics — closed-form integrals + a
branch-bracketed bisection BVP (near-extremal spins).

The slow-rotation model in ops/btz.py is exact to O(J^2) (valid for
|J| << M l).  This module solves the FULL rotating metric

    ds^2 = -N^2 dt^2 + dr^2/N^2 + r^2 (dphi + N^phi dt)^2,
    N^2 = r^2/l^2 - M + J^2/(4 r^2),   N^phi = -J/(2 r^2),

for which everything is still elementary.  With E = 1, L = k and x = r^2:

    (dx/dlambda)^2 = 4 W^2,      W = sqrt(alpha x + beta),
    alpha = 1 - k^2/l^2,         beta = k (M k - J),
    phidot = (k x - l^2(M k - J/2)) / ((x - xp)(x - xm)),
    tdot   = l^2 (x - J k / 2)   / ((x - xp)(x - xm)),
    xpm    = l^2 (M +- sqrt(M^2 - J^2/l^2)) / 2   (outer/inner horizons^2).

Both sweep and time integrate in closed form: partial fractions over the
horizon poles and  int dx/((x-c) W) = 2 int dw/(w^2 - wc^2),  w = W,
wc^2 = alpha c + beta — a log or arctan.  The BVP (find k so the sweep
matches the route's angular separation) runs a fixed-depth bisection inside
per-branch k-brackets whose edges are closed form:

  * mono — x monotone between the endpoints; valid while rdot^2 > 0 at both
    (k below the smaller root of rr2(x_e) = 0).
  * apo  — out, turn at the apocenter x_t = -beta/alpha, back in; valid for
    k in (l, k*] where x_t(k*) = max(x_c, x_q).
  * peri — in, turn at the pericenter, back out (frame dragging lets
    co-rotating photons dip and return: requires beta < 0, i.e. 0 < k < J/M
    — IMPOSSIBLE at J = 0, which is how the static analysis proved
    single-bounce; at J > 0 multi-bounce orbits exist but add strictly
    longer delays and are neglected like higher windings beyond
    params.btz_windings).
  * bounce — out to the AdS boundary (x = inf, finite time, alpha > 0),
    Dirichlet reflection, back in: the reflected routes.

Where no branch brackets the target (extreme geometries at near-extremal
spin), the renderer falls back to the slow-rotation closed form — the
`fallback` output lets tests pin that rate to ~0 on scene-like inputs.

Validated against an f64 RK4 Hamiltonian shooting oracle to ~1e-9 at spins
up to 95% of extremality (tests/test_btz_exact.py; the in-tree oracle's
horizon floor is corrected to the true outer horizon r_+ there).

Cost: ~50 bisection steps x 2 closed-form segment evaluations per (point,
route) — roughly 100x the slow-rotation delay evaluation, all dense VPU
math.  Opt-in via RenderParams.btz_exact_spin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12
_BIG = 1e9
_N_BISECT = 54


def _horizons_x(M, l, J):
    """(xp, xm): squared outer/inner horizon radii."""
    root = jnp.sqrt(jnp.maximum(M * M - (J * J) / (l * l), 0.0))
    xp = l * l * (M + root) * 0.5
    xm = l * l * (M - root) * 0.5
    return xp, xm


def _G(w, wc2, at_inf: bool):
    """Antiderivative (in w = W) of 2/(w^2 - wc2); `at_inf` statically
    selects the w -> inf limit (the AdS-boundary endpoint)."""
    pos = wc2 > _EPS
    wc = jnp.sqrt(jnp.maximum(wc2, _EPS))
    s = jnp.sqrt(jnp.maximum(-wc2, _EPS))
    if at_inf:
        log_form = jnp.zeros_like(wc)  # ln((w-wc)/(w+wc)) -> ln 1
        atan_form = jnp.pi / s
    else:
        num = jnp.abs(w - wc)
        den = jnp.maximum(w + wc, _EPS)
        log_form = jnp.log(jnp.maximum(num, 1e-30) / den) / wc
        atan_form = 2.0 * jnp.arctan(w / s) / s
    return jnp.where(pos, log_form, atan_form)


def _seg(x1, x2, k, M, l, J, sr, to_inf: bool = False, beta=None):
    """(dphi, dt) along one monotone x-segment x1 -> x2 (sr = sign of
    dx/dlambda).  `to_inf` statically replaces x2 by the AdS boundary.
    `beta` overrides k(Mk - J): turning-point-parametrized solves pass
    beta = -alpha x_t so W^2 = alpha (x - x_t) is cancellation-free at the
    grazing endpoint (f32: the k round-trip loses the turning point)."""
    xp, xm = _horizons_x(M, l, J)
    alpha = 1.0 - (k * k) / (l * l)
    if beta is None:
        beta = k * (M * k - J)
    cphi = -l * l * (M * k - J / 2.0)
    ct = -J * k / 2.0
    dx = jnp.maximum(xp - xm, _EPS)
    Pp = (k * xp + cphi) / dx
    Pm = -(k * xm + cphi) / dx
    Qp = l * l * (xp + ct) / dx
    Qm = -l * l * (xm + ct) / dx

    w1 = jnp.sqrt(jnp.maximum(alpha * x1 + beta, 0.0))
    w2 = None if to_inf else jnp.sqrt(jnp.maximum(alpha * x2 + beta, 0.0))

    out_phi = jnp.zeros_like(x1)
    out_t = jnp.zeros_like(x1)
    for c, P, Q in ((xp, Pp, Qp), (xm, Pm, Qm)):
        wc2 = alpha * c + beta
        g2 = _G(jnp.zeros_like(w1), wc2, True) if to_inf else _G(w2, wc2, False)
        g = g2 - _G(w1, wc2, False)
        out_phi = out_phi + P * g
        out_t = out_t + Q * g
    return sr * out_phi * 0.5, sr * out_t * 0.5


def _path(xc, xq, k, M, l, J, branch: str, xt_exact=None):
    """(dphi, dt) of the branch path; NaN dphi where the branch is invalid
    at this k.  `xt_exact` carries the turning point of a turning-point-
    parametrized solve so beta = -alpha x_t is exact (see _seg)."""
    alpha = 1.0 - (k * k) / (l * l)
    if xt_exact is None:
        beta = k * (M * k - J)
        xt = -beta / jnp.where(jnp.abs(alpha) > _EPS, alpha, _EPS)
    else:
        xt = xt_exact
        beta = -alpha * xt
    rr2c = alpha + beta / xc
    rr2q = alpha + beta / xq
    nan = jnp.float32(jnp.nan)

    if branch == "mono":
        sr = jnp.where(xq >= xc, 1.0, -1.0)
        p, t = _seg(xc, xq, k, M, l, J, sr, beta=beta)
        ok = (rr2c > 0) & (rr2q > 0)
        return jnp.where(ok, p, nan), t
    if branch == "apo":
        # f32 tolerance at the mono/apo junction (x_t == the larger
        # endpoint): the clamped x_t makes the marginal path exactly the
        # junction orbit, so accepting a hair below costs no accuracy
        ok = (alpha < 0) & (beta > 0) & (
            xt >= jnp.maximum(xc, xq) * (1.0 - 1e-4)
        )
        xt_s = jnp.maximum(xt, jnp.maximum(xc, xq))  # guard NaN off-branch
        pa, ta = _seg(xc, xt_s, k, M, l, J, 1.0, beta=beta)
        pb, tb = _seg(xt_s, xq, k, M, l, J, -1.0, beta=beta)
        return jnp.where(ok, pa + pb, nan), ta + tb
    if branch == "peri":
        xp, _ = _horizons_x(M, l, J)
        ok = (alpha > 0) & (beta < 0) & (
            xt <= jnp.minimum(xc, xq) * (1.0 + 1e-4)
        ) & (xt > xp)
        xt_s = jnp.minimum(xt, jnp.minimum(xc, xq))
        xt_s = jnp.maximum(xt_s, xp * (1.0 + 1e-6))
        pa, ta = _seg(xc, xt_s, k, M, l, J, -1.0, beta=beta)
        pb, tb = _seg(xt_s, xq, k, M, l, J, 1.0, beta=beta)
        return jnp.where(ok, pa + pb, nan), ta + tb
    if branch == "bounce":
        # NOTE: a pericenter "blocking" the down-leg is the same condition
        # as rr2q < 0 (x_t > xq <=> alpha xq + beta < 0), so rr2 positivity
        # at both endpoints is the complete validity condition
        ok = (alpha > 0) & (rr2c > 0) & (rr2q > 0)
        pa, ta = _seg(xc, xc, k, M, l, J, 1.0, to_inf=True, beta=beta)
        pb, tb = _seg(xq, xq, k, M, l, J, 1.0, to_inf=True, beta=beta)
        # boundary legs: (xc -> inf, sr +1) then (inf -> xq, sr -1); the
        # reversed down-leg equals +seg(xq -> inf, +1), so total = pa + pb
        return jnp.where(ok, pa + pb, nan), ta + tb
    raise ValueError(branch)


def _k_edge_rr2(xe, M, l, J):
    """Smallest positive k with rdot^2(xe) = 0 (mono/bounce bracket top);
    +inf when rr2 > 0 for every k."""
    a = M / xe - 1.0 / (l * l)
    b = -J / xe
    disc = b * b - 4.0 * a
    has = disc > 0
    root = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (
        2.0 * jnp.where(jnp.abs(a) > _EPS, a, _EPS)
    )
    # a ~ 0: linear bk + 1 = 0 -> k = -1/b (b < 0)
    lin = jnp.where(b < -_EPS, -1.0 / jnp.where(b < -_EPS, b, -1.0), _BIG)
    root = jnp.where(jnp.abs(a) > _EPS, root, lin)
    return jnp.where(has & (root > 0), root, _BIG)


def _k_apo_edge(xe, M, l, J):
    """Positive k where the turning point x_t(k) = xe:
    k^2 (xe - l^2 M) + l^2 J k - xe l^2 = 0."""
    a = xe - l * l * M
    b = l * l * J
    c = -xe * l * l
    disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
    root = (-b + jnp.sqrt(disc)) / (2.0 * jnp.where(jnp.abs(a) > _EPS, a, _EPS))
    lin = jnp.where(jnp.abs(b) > _EPS, -c / jnp.where(jnp.abs(b) > _EPS, b, 1.0), _BIG)
    return jnp.where(jnp.abs(a) > _EPS, root, lin)


def _bisect(xc, xq, target, M, l, J, branch, lo, hi, k_of=None,
            signed_param: bool = False, xt_of=None):
    """Fixed-depth bisection of the branch sweep toward `target` inside a
    [lo, hi] PARAMETER bracket; `k_of` maps the parameter to k (identity
    when None).  Turning-point branches bisect in a turning-point
    parameter instead of k: near the branch junction dphi/dk diverges
    (orbits grazing the turning point) and f32 k-resolution costs ~3
    digits, while the turning-point position controls the sweep smoothly.

    `signed_param` with branch = (neg_branch, pos_branch) evaluates the
    first branch for parameter < 0 and the second for >= 0 — the combined
    mono/apo search that is monotone straight through the junction.
    Returns (k, dt, valid); in signed mode k is (k, used_pos_branch)."""
    if k_of is None:
        k_of = lambda v: v
    shape = jnp.broadcast_shapes(
        jnp.shape(xc), jnp.shape(xq), jnp.shape(target),
        jnp.shape(lo), jnp.shape(hi),
    )
    xc = jnp.broadcast_to(jnp.asarray(xc, jnp.float32), shape)
    xq = jnp.broadcast_to(jnp.asarray(xq, jnp.float32), shape)
    target = jnp.broadcast_to(jnp.asarray(target, jnp.float32), shape)
    lo = jnp.broadcast_to(jnp.asarray(lo, jnp.float32), shape)
    hi = jnp.broadcast_to(jnp.asarray(hi, jnp.float32), shape)

    def PT(v):
        k = k_of(v)
        xt = None if xt_of is None else xt_of(v)
        if signed_param:
            pn, tn = _path(xc, xq, k, M, l, J, branch[0], xt_exact=xt)
            pp, tp = _path(xc, xq, k, M, l, J, branch[1], xt_exact=xt)
            pos = v >= 0
            return jnp.where(pos, pp, pn), jnp.where(pos, tp, tn)
        return _path(xc, xq, k, M, l, J, branch, xt_exact=xt)

    def F(v):
        return PT(v)[0]

    flo, fhi = F(lo), F(hi)
    inc = fhi > flo
    valid = (
        (hi > lo)
        & jnp.isfinite(flo)
        & jnp.isfinite(fhi)
        & (jnp.minimum(flo, fhi) <= target)
        & (target <= jnp.maximum(flo, fhi))
    )

    def body(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        fm = F(mid)
        bad = ~jnp.isfinite(fm)
        go_lo = ((fm < target) == inc) & ~bad
        return jnp.where(go_lo, mid, lo), jnp.where(go_lo, hi, mid)

    lo, hi = jax.lax.fori_loop(0, _N_BISECT, body, (lo, hi))
    v = 0.5 * (lo + hi)
    k = k_of(v)
    p, t = PT(v)
    # acceptance: junction-adjacent orbits carry ~5e-3 f32 sweep noise
    # (the bisection random-walks once |F - target| drops below the
    # evaluation noise); the DELAY error that reaches the renderer stays
    # ~1e-3 relative — a fraction of a worldline tick.  1e-2 admits those
    # while still rejecting genuinely unbracketed targets.
    valid = valid & jnp.isfinite(p) & (
        jnp.abs(p - target) <= 1e-2 * jnp.maximum(target, 1.0)
    )
    if signed_param:
        return (k, v >= 0), t, valid
    return k, t, valid


def _solve_exact(xc, xq, dphi, M, l, J):
    """Direct-route exact solve.  Returns (k, dt, sr_cam, sr_emit, valid).

    Two complementary searches cover the whole direct family:

    * mono-low — k-bisection over (0, l): orbits with no turning point.
    * combined — ONE sigma-bisection through the mono/apo junction:
      sigma parametrizes the (virtual or real) turning point
      x_t = xmax + sigma^2 with k = _k_apo_edge(x_t); sigma < 0 evaluates
      the monotone path (turning point above the start, never reached),
      sigma > 0 the apocenter path.  The sweep is monotone INCREASING
      across sigma = 0 and scales like sqrt(x_t - xmax) exactly where a
      k-bisection loses all precision (the grazing orbit's dF/dk
      diverges), so f32 resolves the junction cleanly.
    * peri — sigma-bisection below xmin (co-rotating dips; J > 0 only).
    """
    l32 = jnp.float32(l) if not hasattr(l, "dtype") else l
    tiny = 1e-4 * jnp.sqrt(jnp.maximum(M, _EPS)) * l32

    k_m_hi = jnp.minimum(_k_edge_rr2(xc, M, l, J), _k_edge_rr2(xq, M, l, J))
    k_m_hi = jnp.minimum(k_m_hi, l32) * (1.0 - 1e-6)
    km, tm, vm = _bisect(xc, xq, dphi, M, l, J, "mono", tiny, k_m_hi)

    xmax = jnp.maximum(xc, xq)
    xt_cap = 1e4 * jnp.maximum(l32 * l32 * M, xmax)
    s_cap = jnp.sqrt(xt_cap - xmax)
    xt_of_comb = lambda sg: xmax + sg * sg
    k_of_comb = lambda sg: _k_apo_edge(xmax + sg * sg, M, l, J)
    kc, tc, vc = _bisect(xc, xq, dphi, M, l, J, ("mono", "apo"),
                         -s_cap, s_cap, k_of=k_of_comb, signed_param=True,
                         xt_of=xt_of_comb)

    # peri: turning point below BOTH endpoints (frame-dragging dips)
    xp_h, _ = _horizons_x(M, l, J)
    xmin = jnp.minimum(xc, xq)

    def k_of_peri(s):
        xt = jnp.maximum(xmin - s * s, xp_h * (1.0 + 1e-5))
        # the co-rotating root of k^2(xt - l^2 M) + l^2 J k - xt l^2 = 0
        a = xt - l * l * M
        b = l * l * J
        c = -xt * l * l
        disc = jnp.sqrt(jnp.maximum(b * b - 4.0 * a * c, 0.0))
        r1 = (-b + disc) / (2.0 * jnp.where(jnp.abs(a) > _EPS, a, _EPS))
        r2 = (-b - disc) / (2.0 * jnp.where(jnp.abs(a) > _EPS, a, _EPS))
        small = jnp.minimum(jnp.abs(r1), jnp.abs(r2))
        pick = jnp.where(jnp.abs(r1) <= jnp.abs(r2), r1, r2)
        return jnp.where(pick > 0, pick, jnp.maximum(small, _EPS))

    xt_of_peri = lambda s: jnp.maximum(xmin - s * s, xp_h * (1.0 + 1e-5))
    kp, tp, vp = _bisect(xc, xq, dphi, M, l, J, "peri",
                         jnp.zeros_like(xc),
                         jnp.sqrt(jnp.maximum(
                             xmin - xp_h * (1.0 + 1e-5), _EPS)),
                         k_of=k_of_peri, xt_of=xt_of_peri)
    vp = vp & (J > 0)

    # the combined solve reports which side of the junction won
    kc_k, kc_apo = kc
    k = jnp.where(vm, km, jnp.where(vc, kc_k, kp))
    t = jnp.where(vm, tm, jnp.where(vc, tc, tp))
    valid = vm | vc | vp
    mono_dir = jnp.where(xq >= xc, 1.0, -1.0)
    comb_cam = jnp.where(kc_apo, 1.0, mono_dir)
    comb_emit = jnp.where(kc_apo, -1.0, mono_dir)
    sr_cam = jnp.where(vm, mono_dir, jnp.where(vc, comb_cam, -1.0))
    sr_emit = jnp.where(vm, mono_dir, jnp.where(vc, comb_emit, 1.0))
    return k, t, sr_cam, sr_emit, valid


def _solve_exact_bounce(xc, xq, dphi, M, l, J):
    """Reflected-route exact solve (one AdS-boundary bounce).  Validity is
    exactly rdot^2 > 0 at both endpoints (a pericenter "blocking" the
    down-leg is the same condition as rr2(xq) < 0 — x_t > xq <=>
    alpha xq + beta < 0), so the valid k interval is a single bracket."""
    l32 = jnp.float32(l) if not hasattr(l, "dtype") else l
    tiny = 1e-4 * jnp.sqrt(jnp.maximum(M, _EPS)) * l32
    hi_all = jnp.minimum(
        jnp.minimum(_k_edge_rr2(xc, M, l, J), _k_edge_rr2(xq, M, l, J)),
        l32,
    ) * (1.0 - 1e-6)
    k, t, v = _bisect(xc, xq, dphi, M, l, J, "bounce", tiny, hi_all)
    return k, t, jnp.ones_like(k), -jnp.ones_like(k), v


def exact_route_optics_xy(qx, qy, cx, cy, hole, route: int):
    """(camera bearing, delay, emitter-side propagation direction, fallback
    mask) for one route in the EXACT rotating metric — the drop-in analog
    of btz.route_optics_xy.  Where the branch solve fails (near-extremal
    edge geometries) the slow-rotation values are substituted and
    `fallback` is True there."""
    from .btz import _orbit_setup, route_optics_xy

    M, l, J = hole.mass, hole.ads_l, hole.spin
    # slow-rotation values double as the fallback AND the sign convention
    # anchor (tests pin exact == slow-rotation as J -> 0)
    sb, sd, sx, sy = route_optics_xy(qx, qy, cx, cy, hole, route)
    ob = _orbit_setup(qx, qy, cx, cy, hole, route)
    dphi, s = ob["dphi"], ob["s"]
    xc = ob["rc"] * ob["rc"]
    xq = ob["rq"] * ob["rq"]

    # mirrored frame: positive sweep, spin s * J... the oracle-pinned
    # convention (tests/test_btz.py): the camera->emitter traversal at spin
    # J equals the model's delay at spin -J; route_delay_xy applies the
    # drag along travel sense s.  Net: solve the positive-sweep BVP with
    # J_m = -s * J (validated against both the oracle and the J -> 0 limit).
    Jm = -s * J
    reflected = (route % 4) >= 2
    if reflected:
        k, t, sr_c, sr_e, valid = _solve_exact_bounce(xc, xq, dphi, M, l, Jm)
    else:
        k, t, sr_c, sr_e, valid = _solve_exact(xc, xq, dphi, M, l, Jm)

    # endpoint tangents in the mirrored frame -> chart directions
    xp, xm = _horizons_x(M, l, Jm)
    alpha = 1.0 - (k * k) / (l * l)
    beta = k * (M * k - Jm)

    def tangent(x, ang, sr):
        # the exact machinery integrates PHYSICAL x > 0 with explicit legs
        # (no signed-u continuation), so the endpoint radial sign sr_e
        # already encodes reflected/turned arrivals — no -u branch flip
        rr2 = jnp.maximum(alpha + beta / x, 0.0)
        rdot = sr * jnp.sqrt(rr2)
        phid = (k * x - l * l * (M * k - Jm / 2.0)) / (
            jnp.maximum((x - xp) * (x - xm), _EPS)
        )
        r = jnp.sqrt(x)
        rhx, rhy = jnp.cos(ang), jnp.sin(ang)
        thx, thy = -rhy * s, rhx * s
        return rdot * rhx + r * phid * thx, rdot * rhy + r * phid * thy

    ang_c = ob["phi_c"]
    ang_q = ob["phi_c"] + s * dphi
    vx, vy = tangent(xc, ang_c, sr_c)
    bearing = jnp.arctan2(vy, vx)
    tx, ty = tangent(xq, ang_q, sr_e)
    inv = jax.lax.rsqrt(jnp.maximum(tx * tx + ty * ty, _EPS))
    nex, ney = -tx * inv, -ty * inv

    # inside-horizon endpoints freeze like the slow-rotation path
    inside = (xc <= xp) | (xq <= xp)
    delay = jnp.where(inside, _BIG, t)
    valid = valid & ~inside

    fallback = ~valid
    return (
        jnp.where(valid, bearing, sb),
        jnp.where(valid, delay, sd),
        jnp.where(valid, nex, sx),
        jnp.where(valid, ney, sy),
        fallback,
    )


def exact_route_delay_xy(qx, qy, cx, cy, hole, route: int):
    """Delay-only exact solve (band-search route function)."""
    _, d, _, _, _ = exact_route_optics_xy(qx, qy, cx, cy, hole, route)
    return d
