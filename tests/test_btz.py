"""BTZ closed-form null geodesics vs independent float64 quadrature."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from spacetime_tpu import scene
from spacetime_tpu.camera import Camera
from spacetime_tpu.ops import btz, raytrace
from spacetime_tpu.ops import worldline as wl

H = 0.005


def _delay_quadrature(ra, rb, dphi, M, l, n=200_000):
    """Independent check: solve the orbit BVP in float64 and integrate
    dt/dphi = (E/L) l^2 / (1 - M l^2 u^2) by trapezoid."""
    mu = np.sqrt(M)
    ua, ub = 1.0 / ra, 1.0 / rb
    e = np.exp(mu * dphi)
    A = (ub - ua / e) / (e - 1.0 / e)
    B = ua - A
    EoverL = np.sqrt(1.0 / l**2 - 4.0 * A * B * M)
    phi = np.linspace(0.0, dphi, n)
    u = A * np.exp(mu * phi) + B * np.exp(-mu * phi)
    assert np.all(u > 0), "orbit leaves the chart"
    integrand = EoverL * l * l / (1.0 - M * l * l * u * u)
    return float(np.trapezoid(integrand, phi))


def test_closed_form_matches_quadrature():
    rng = np.random.default_rng(7)
    M, l = 0.01, 4.0
    r_h = l * np.sqrt(M)  # 0.4
    for _ in range(30):
        ra = float(rng.uniform(1.5 * r_h, 6.0 * r_h))
        rb = float(rng.uniform(1.5 * r_h, 6.0 * r_h))
        dphi = float(rng.uniform(0.1, 2.0 * np.pi - 0.1))
        want = _delay_quadrature(ra, rb, dphi, M, l)
        got = float(btz.btz_null_delay(
            jnp.float32(ra), jnp.float32(rb), jnp.float32(dphi),
            jnp.float32(M), jnp.float32(l),
        ))
        assert want > 0
        np.testing.assert_allclose(got, want, rtol=2e-3), (ra, rb, dphi)


def test_near_radial_stable():
    """dphi -> 0 degenerates the BVP solve (A ~ 1/dphi, catastrophic f32
    cancellation); the radial closed form must take over, matching float64
    quadrature and never going NaN."""
    M, l = 0.03, 0.45
    for ra, rb in [(0.2, 0.42), (0.3, 0.3), (0.1, 0.4)]:
        want = _delay_quadrature(ra, rb, 1e-3, M, l) if ra != rb else None
        for dphi in (1e-6, 1e-4, 1e-3):
            got = float(btz.btz_null_delay(ra, rb, dphi, M, l))
            assert np.isfinite(got), (ra, rb, dphi)
        if want is not None:
            got = float(btz.btz_null_delay(ra, rb, 1e-3, M, l))
            np.testing.assert_allclose(got, want, rtol=5e-3)


def test_delay_symmetric_in_endpoints():
    M, l = 0.04, 3.0
    for ra, rb, dphi in [(1.0, 2.0, 1.3), (0.8, 3.0, 2.8), (2.5, 2.5, 0.7)]:
        ab = float(btz.btz_null_delay(ra, rb, dphi, M, l))
        ba = float(btz.btz_null_delay(rb, ra, dphi, M, l))
        np.testing.assert_allclose(ab, ba, rtol=1e-4)


def test_horizon_freeze_and_interior():
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=0.01, ads_l=4.0)
    r_h = float(hole.r_h)
    far = float(btz.btz_null_delay(1.5 * r_h, 3.0 * r_h, 1.0, 0.01, 4.0))
    near = float(btz.btz_null_delay(1.001 * r_h, 3.0 * r_h, 1.0, 0.01, 4.0))
    assert near > 2.0 * far  # delay diverges toward the horizon
    inside = float(btz.btz_null_delay(0.5 * r_h, 3.0 * r_h, 1.0, 0.01, 4.0))
    assert inside >= 1e8  # BIG sentinel


def test_btz_double_image_render():
    """A moving blob outside a BTZ hole shows extra image area vs the flat
    renderer (two routes, different retarded times), and the horizon disc
    renders black."""
    body = scene.disc_softbody(4, 0, (0.25, -0.3), (0.0, 0.4))
    sb = scene.SceneBuilder()
    sb.add(body, base_color=(0.2, 0.9, 0.3))
    particles, objects = sb.build(capacity=256)
    buf = wl.create(256, particles.capacity)
    p0 = particles.pos
    for k in range(256):
        t = k * H
        buf = wl.push_frame(
            buf, dataclasses.replace(particles, pos=p0 + particles.vel * t),
            time=t,
        )
    cam = Camera.create(pos=(-0.35, 0.0), zoom=1.4)
    params = dataclasses.replace(
        raytrace.RenderParams(dt=H, opaque=False),
        cell_px=raytrace.auto_cell_px(
            raytrace.RenderParams(dt=H, opaque=False), 128, 128, 1.4
        ),
    )
    flat = np.asarray(raytrace.render_retarded(
        buf, particles.object_index, objects, cam, 128, 128, params))
    # ads_l ~ scene scale keeps the lapse O(1) where matter lives (see
    # config_btz_hole); r_h = 0.4 sqrt(0.02) = 0.057
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=0.02, ads_l=0.4)
    img = np.asarray(btz.render_btz_xray(
        buf, particles.object_index, objects, cam, hole, 128, 128, params))
    n_flat = (flat.min(-1) < 0.9).sum()
    n_btz = (img.min(-1) < 0.9).sum()
    assert n_flat > 0
    assert n_btz > n_flat, (n_flat, n_btz)
    # horizon disc is black
    dark = (img.max(-1) < 0.05).sum()
    assert dark > 0


def test_btz_engine_config_renders():
    import dataclasses as dc

    from spacetime_tpu.engine import Engine
    from spacetime_tpu.utils.config import get_config

    cfg = dc.replace(get_config("btz_hole"), width=48, height=48, history=32)
    eng = Engine(cfg)
    img = None
    for _ in range(2):
        img = eng.run_frame()
    arr = np.asarray(img)
    assert arr.shape[-1] == 3
    assert (arr.max(-1) < 0.05).sum() > 0  # horizon disc


def test_arrival_bearing_matches_orbit_tangent():
    """Closed-form arrival bearing == finite-difference tangent of the
    sampled orbit at the camera, for both routes and both angular signs."""
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=0.03, ads_l=0.45)
    cam = (0.1, -0.35)
    for q in [(0.3, 0.25), (-0.33, 0.1), (0.05, 0.4), (-0.2, -0.3)]:
        for route in (0, 1):
            b, d = btz.arrival_bearing_xy(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route)
            xs, ys, _ = btz.sample_orbit(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route, 4096)
            fd = np.arctan2(float(ys[1] - ys[0]), float(xs[1] - xs[0]))
            diff = abs(((float(b) - fd) + np.pi) % (2 * np.pi) - np.pi)
            assert diff < 0.02, (q, route, float(b), fd)
            # the orbit actually ends at q
            np.testing.assert_allclose(
                [float(xs[-1]), float(ys[-1])], q, atol=1e-4)


def test_bearing_flat_limit_is_chart_direction():
    """Where the lapse is ~1 and the path stays far from the hole, the
    direct-route bearing approaches the straight chart direction."""
    hole = btz.BTZBlackHole.create(center=(-30.0, 0.0), mass=1e-4, ads_l=30.0)
    cam = (0.0, 0.0)
    q = (0.3, 0.2)
    b, _ = btz.arrival_bearing_xy(
        jnp.float32(q[0]), jnp.float32(q[1]),
        jnp.float32(cam[0]), jnp.float32(cam[1]), hole, 0)
    chart = np.arctan2(q[1], q[0])
    diff = abs(((float(b) - chart) + np.pi) % (2 * np.pi) - np.pi)
    assert diff < 0.05, (float(b), chart)


def test_btz_opaque_matches_geodesic_oracle():
    """BTZ opaque mode: the bearing-retina occlusion must match the
    exhaustive oracle that walks each pixel's closed-form curved geodesic."""
    from spacetime_tpu.models.softbody import SoftbodyModel

    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(4, 0, (0.28, -0.25), (0.0, 0.3)),
           base_color=(0.2, 0.9, 0.3))
    sb.add(scene.disc_softbody(3, 1, (-0.2, -0.08), (0.05, 0.0)),
           base_color=(0.9, 0.4, 0.2))
    particles, objects = sb.build(capacity=256)
    model = SoftbodyModel(capacity=particles.capacity)
    # BTZ delays run 1.5-3x the chart distance: prefill the FULL ring so
    # retarded images exist (128 pushed ticks = 0.64 s would be too short)
    buf = wl.create(256, particles.capacity)
    buf = wl.prefill_inertial(
        buf, particles.pos, particles.vel, particles.active,
        jnp.float32(0.0), jnp.float32(H),
    )
    p = particles
    t = 0.0
    for _ in range(80):
        p, _ = model.step(p)
        t += H
        buf = wl.push_frame(buf, p, t)
    cam = Camera.create(pos=(-0.38, 0.0), zoom=1.2)
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=0.03, ads_l=0.45)
    base = raytrace.RenderParams(dt=H, opaque=True, num_rays=2048)
    params = dataclasses.replace(
        base, cell_px=raytrace.auto_cell_px(base, 96, 96, 1.2)
    )
    fast = np.asarray(btz.render_btz_xray(
        buf, p.object_index, objects, cam, hole, 96, 96, params))
    oracle = np.asarray(btz.render_btz_brute(
        buf, p.object_index, objects, cam, hole, 96, 96, params))
    mismatch = np.mean(np.any(np.abs(fast - oracle) > 0.05, axis=-1))
    assert mismatch < 0.05, mismatch
    # occlusion is doing something: opaque differs from x-ray
    xray = np.asarray(btz.render_btz_xray(
        buf, p.object_index, objects, cam, hole, 96, 96,
        dataclasses.replace(params, opaque=False)))
    assert np.any(np.abs(fast - xray) > 0.05)


def test_emitter_direction_matches_orbit_far_tangent():
    """emitter_direction_xy == minus the finite-difference tangent at the
    far (emitter) end of the sampled orbit, both routes."""
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=0.03, ads_l=0.45)
    cam = (0.1, -0.35)
    for q in [(0.3, 0.25), (-0.33, 0.1), (-0.2, -0.3)]:
        for route in (0, 1):
            nex, ney = btz.emitter_direction_xy(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route)
            xs, ys, _ = btz.sample_orbit(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route, 4096)
            # tangent of camera->emitter path at the emitter, flipped
            tx = -(float(xs[-1]) - float(xs[-2]))
            ty = -(float(ys[-1]) - float(ys[-2]))
            norm = np.hypot(tx, ty)
            dot = (float(nex) * tx + float(ney) * ty) / norm
            assert dot > 0.999, (q, route, dot)


# ---------------------------------------------------------------------------
# Rotating BTZ (frame dragging), slow-rotation model


def _drag_quadrature(ra, rb, dphi, M, l, n=200_000):
    """Independent float64 check of int_0^dphi dphi'/f(r(phi')) along the
    BVP orbit (same parametrization as _delay_quadrature)."""
    mu = np.sqrt(M)
    ua, ub = 1.0 / ra, 1.0 / rb
    e = np.exp(mu * dphi)
    A = (ub - ua / e) / (e - 1.0 / e)
    B = ua - A
    phi = np.linspace(0.0, dphi, n)
    u = A * np.exp(mu * phi) + B * np.exp(-mu * phi)
    assert np.all(u > 0)
    f = 1.0 / (l * l * u * u) * (1.0 - M * l * l * u * u)
    assert np.all(f > 0), "orbit dips inside the horizon"
    return float(np.trapezoid(1.0 / f, phi))


def test_drag_integral_matches_quadrature():
    rng = np.random.default_rng(11)
    M, l = 0.01, 4.0
    r_h = l * np.sqrt(M)
    for _ in range(30):
        ra = float(rng.uniform(1.5 * r_h, 6.0 * r_h))
        rb = float(rng.uniform(1.5 * r_h, 6.0 * r_h))
        dphi = float(rng.uniform(0.1, 2.0 * np.pi - 0.1))
        want = _drag_quadrature(ra, rb, dphi, M, l)
        got = float(btz.btz_drag_integral(
            jnp.float32(ra), jnp.float32(rb), jnp.float32(dphi),
            jnp.float32(M), jnp.float32(l)))
        assert want > 0
        np.testing.assert_allclose(got, want, rtol=3e-3), (ra, rb, dphi)


def test_drag_integral_near_radial_and_interior():
    M, l = 0.03, 0.45
    for dphi in (1e-6, 1e-4, 1e-3):
        got = float(btz.btz_drag_integral(0.2, 0.42, dphi, M, l))
        assert np.isfinite(got) and got >= 0
    # near-radial limit ~ dphi * mean(1/f): check against quadrature scale
    want = _drag_quadrature(0.2, 0.42, 1e-3, M, l)
    got = float(btz.btz_drag_integral(0.2, 0.42, 1e-3, M, l))
    np.testing.assert_allclose(got, want, rtol=0.2)
    # interior endpoint: integral masked to 0 (delay is BIG anyway)
    r_h = l * np.sqrt(M)
    assert float(btz.btz_drag_integral(0.5 * r_h, 3 * r_h, 1.0, M, l)) == 0.0


def test_spin_sign_and_antisymmetry():
    """For J > 0 (counterclockwise spin), light whose travel is CLOCKWISE
    (counter-rotating) is delayed MORE; the two routes shift oppositely;
    flipping J flips both shifts exactly (the model is linear in J)."""
    hole0 = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=0.03, ads_l=0.45)
    holep = btz.BTZBlackHole.create(
        center=(0.0, 0.0), mass=0.03, ads_l=0.45, spin=0.004)
    holem = btz.BTZBlackHole.create(
        center=(0.0, 0.0), mass=0.03, ads_l=0.45, spin=-0.004)
    cx, cy = 0.3, 0.0  # camera at phi = 0
    qx, qy = 0.0, 0.25  # emitter at phi = +pi/2 (counterclockwise of cam)
    t1_0, t2_0 = [float(v) for v in btz.route_delays_xy(
        qx, qy, cx, cy, hole0)]
    t1_p, t2_p = [float(v) for v in btz.route_delays_xy(
        qx, qy, cx, cy, holep)]
    t1_m, t2_m = [float(v) for v in btz.route_delays_xy(
        qx, qy, cx, cy, holem)]
    # route 0: emitter is +pi/2 AHEAD of the camera, so the light travels
    # clockwise (against J > 0) -> delayed more
    assert t1_p > t1_0 > t1_m, (t1_m, t1_0, t1_p)
    # route 1 winds the other way -> helped by the spin
    assert t2_p < t2_0 < t2_m, (t2_m, t2_0, t2_p)
    # antisymmetry in J
    np.testing.assert_allclose(t1_p - t1_0, t1_0 - t1_m, rtol=1e-3)
    np.testing.assert_allclose(t2_p - t2_0, t2_0 - t2_m, rtol=1e-3)
    # route_optics_xy (renderer path) agrees with route_delays_xy
    for route, want in ((0, t1_p), (1, t2_p)):
        _, d, _, _ = btz.route_optics_xy(
            jnp.float32(qx), jnp.float32(qy), jnp.float32(cx),
            jnp.float32(cy), holep, route)
        np.testing.assert_allclose(float(d), want, rtol=1e-5)


def _exact_rotating_delay(rc, rq, dphi_signed, M, l, J, n_steps=6000):
    """EXACT rotating-BTZ null-geodesic oracle: RK4 Hamiltonian integration
    of the full metric N^2 = r^2/l^2 - M + J^2/(4 r^2), N^phi = -J/(2 r^2),
    shot from (rc, phi=0) toward (rq, dphi_signed), bisecting the angular
    momentum L around the static solution's L/E.  Returns the coordinate
    time of the CAMERA->EMITTER traversal: by stationarity-reversal this is
    the physical emitter->camera delay of the hole with spin -J."""
    mu = np.sqrt(M)

    def nsq(r):
        return r * r / (l * l) - M + J * J / (4.0 * r * r)

    def nphi(r):
        return -J / (2.0 * r * r)

    E = 1.0

    def hamil(r, pr, L):
        w = E + nphi(r) * L
        return 0.5 * (-w * w / nsq(r) + L * L / (r * r) + nsq(r) * pr * pr)

    def rhs(state, L):
        t, r, phi, pr = state
        w = E + nphi(r) * L
        tdot = w / nsq(r)
        phidot = L / (r * r) - nphi(r) * tdot
        rdot = nsq(r) * pr
        dr = 1e-6 * max(r, 1e-3)
        dH = (hamil(r + dr, pr, L) - hamil(r - dr, pr, L)) / (2 * dr)
        return np.array([tdot, rdot, phidot, -dH])

    # static-orbit warm start: L0/E and initial radial direction
    ua, ub = 1.0 / rc, 1.0 / rq
    adphi = abs(dphi_signed)
    e = np.exp(mu * adphi)
    A = (ub - ua / e) / (e - 1.0 / e)
    B = ua - A
    L0 = np.sign(dphi_signed) / np.sqrt(1.0 / l**2 - 4.0 * A * B * M)
    sigma = -np.sign(A - B) if abs(A - B) > 1e-15 else 1.0

    def shoot(L):
        """Integrate to the target angle.  r_end conventions for the
        bisection: +inf when the ray cannot launch (pr^2 < 0, |L| above the
        camera-radius cap) — the monotone limit of 'stays far out'; 0.0
        when it falls to the horizon before reaching the target angle."""
        w0 = E + nphi(rc) * L
        pr2 = (w0 * w0 / nsq(rc) - L * L / (rc * rc)) / nsq(rc)
        if pr2 < 0:
            return np.inf, None
        state = np.array([0.0, rc, 0.0, sigma * np.sqrt(pr2)])
        target = abs(dphi_signed)
        # affine step sized so phi advances ~target/n_steps initially
        phidot0 = abs(L) / (rc * rc) - nphi(rc) * w0 / nsq(rc) * np.sign(L)
        dlam = target / n_steps / max(abs(phidot0), 1e-9)
        prev = state.copy()
        for _ in range(50 * n_steps):
            k1 = rhs(state, L)
            k2 = rhs(state + 0.5 * dlam * k1, L)
            k3 = rhs(state + 0.5 * dlam * k2, L)
            k4 = rhs(state + dlam * k3, L)
            prev = state.copy()
            state = state + (dlam / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            if state[1] <= l * mu * 1.01:
                return 0.0, None  # fell toward the horizon
            if abs(state[2]) >= target:
                # linear interpolation to the crossing
                f = (target - abs(prev[2])) / (abs(state[2]) - abs(prev[2]))
                r_end = prev[1] + f * (state[1] - prev[1])
                t_end = prev[0] + f * (state[0] - prev[0])
                return r_end, t_end
        return 0.0, None

    # bracket L around L0 so that r_end straddles rq; J is a small
    # perturbation, so expand geometrically from the static solution
    # (larger |L| -> orbit stays farther out -> r_end larger)
    sgn = np.sign(L0)
    los = his = abs(L0)
    rlo = rhi = shoot(sgn * los)[0]
    for _ in range(40):
        if rlo < rq:
            break
        los *= 0.97
        rlo = shoot(sgn * los)[0]
    for _ in range(40):
        if rhi > rq:
            break
        his *= 1.03
        rhi = shoot(sgn * his)[0]
    assert rlo < rq < rhi, (rlo, rhi, rq)
    t_end = None
    for _ in range(48):
        mid = 0.5 * (los + his)
        rm, tm = shoot(sgn * mid)
        if rm < rq:
            los = mid
        else:
            his = mid
        if tm is not None:
            t_end = tm  # Fermat stationarity: t error is O(L error^2)
    assert t_end is not None, "oracle never reached the target angle"
    return t_end


def test_spin_matches_exact_geodesic_oracle():
    """First-order drag delay vs the EXACT rotating-metric geodesic: the
    residual must be O(J^2) (quartic ratio when J halves) and much smaller
    than the drag term itself."""
    M, l = 0.03, 0.45
    rc, rq, dphi_signed = 0.30, 0.22, 1.1  # emitter counterclockwise of cam
    # closed-form pieces (f64 quadrature-validated elsewhere)
    base = float(btz.btz_null_delay(rq, rc, abs(dphi_signed), M, l))

    def model_delay(J):
        # camera->emitter sweep sense s = sign(dphi_signed); oracle shoots
        # camera->emitter in a hole of spin J == physical delay at spin -J:
        # compare against the model at spin -J.
        hole = btz.BTZBlackHole.create(
            center=(0.0, 0.0), mass=M, ads_l=l, spin=-J)
        # emitter at angle dphi_signed from camera (camera on +x axis)
        cx, cy = rc, 0.0
        qx = rq * np.cos(dphi_signed)
        qy = rq * np.sin(dphi_signed)
        t1, _ = btz.route_delays_xy(qx, qy, cx, cy, hole)
        return float(t1)

    errs = {}
    for J in (0.004, 0.002):
        exact = _exact_rotating_delay(rc, rq, dphi_signed, M, l, J)
        model = model_delay(J)
        drag = model - base
        errs[J] = abs(model - exact)
        # the drag term is real and the model captures it
        assert abs(drag) > 5 * errs[J], (J, drag, errs[J])
    # O(J^2): halving J should shrink the residual ~4x (loose bounds: the
    # oracle has its own integration error)
    ratio = errs[0.004] / max(errs[0.002], 1e-12)
    assert ratio > 2.0, errs


def test_spin_render_smoke():
    """The btz renderer accepts a spinning hole and the image differs from
    the non-spinning one (double images shift by the route-asymmetric
    delay)."""
    body = scene.disc_softbody(4, 0, (0.25, -0.3), (0.0, 0.4))
    sb = scene.SceneBuilder()
    sb.add(body, base_color=(0.2, 0.9, 0.3))
    particles, objects = sb.build(capacity=256)
    buf = wl.create(256, particles.capacity)
    p0 = particles.pos
    for k in range(256):
        t = k * H
        buf = wl.push_frame(
            buf, dataclasses.replace(particles, pos=p0 + particles.vel * t),
            time=t)
    cam = Camera.create(pos=(-0.35, 0.0), zoom=1.4)
    params = dataclasses.replace(
        raytrace.RenderParams(dt=H, opaque=False),
        cell_px=raytrace.auto_cell_px(
            raytrace.RenderParams(dt=H, opaque=False), 96, 96, 1.4))
    hole0 = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=0.02, ads_l=0.4)
    holes = btz.BTZBlackHole.create(
        center=(0.0, 0.0), mass=0.02, ads_l=0.4, spin=0.003)
    a = np.asarray(btz.render_btz_xray(
        buf, particles.object_index, objects, cam, hole0, 96, 96, params))
    b = np.asarray(btz.render_btz_xray(
        buf, particles.object_index, objects, cam, holes, 96, 96, params))
    assert np.any(np.abs(a - b) > 0.05)


# ---------------------------------------------------------------------------
# AdS boundary-reflected routes (routes 2/3)


def _delay_quadrature_reflected(ra, rb, dphi, M, l, n=400_000):
    """f64 oracle for the once-boundary-reflected delay: the continued
    orbit with the far endpoint negated in u (ops/btz.py ROUTES); the
    integrand is even in u so integrating through the u = 0 crossing IS
    the physical two-leg path."""
    mu = np.sqrt(M)
    ua, ub = 1.0 / ra, -1.0 / rb
    e = np.exp(mu * dphi)
    A = (ub - ua / e) / (e - 1.0 / e)
    B = ua - A
    EoverL = np.sqrt(1.0 / l**2 - 4.0 * A * B * M)
    phi = np.linspace(0.0, dphi, n)
    u = A * np.exp(mu * phi) + B * np.exp(-mu * phi)
    assert u[0] > 0 and u[-1] < 0
    # exactly one boundary crossing
    assert np.sum(np.diff(np.sign(u)) != 0) == 1
    integrand = EoverL * l * l / (1.0 - M * l * l * u * u)
    return float(np.trapezoid(integrand, phi))


def _drag_quadrature_reflected(ra, rb, dphi, M, l, n=400_000):
    mu = np.sqrt(M)
    ua, ub = 1.0 / ra, -1.0 / rb
    e = np.exp(mu * dphi)
    A = (ub - ua / e) / (e - 1.0 / e)
    B = ua - A
    phi = np.linspace(0.0, dphi, n)
    u = A * np.exp(mu * phi) + B * np.exp(-mu * phi)
    over_f = l * l * u * u / (1.0 - M * l * l * u * u)  # even in u
    return float(np.trapezoid(over_f, phi))


def test_reflected_delay_matches_quadrature():
    rng = np.random.default_rng(13)
    M, l = 0.02, 0.4
    r_h = l * np.sqrt(M)
    for _ in range(20):
        ra = float(rng.uniform(1.5 * r_h, 6.0 * r_h))
        rb = float(rng.uniform(1.5 * r_h, 6.0 * r_h))
        dphi = float(rng.uniform(0.1, 2.0 * np.pi - 0.1))
        want = _delay_quadrature_reflected(ra, rb, dphi, M, l)
        got = float(btz.btz_null_delay_reflected(
            jnp.float32(ra), jnp.float32(rb), jnp.float32(dphi),
            jnp.float32(M), jnp.float32(l)))
        np.testing.assert_allclose(got, want, rtol=2e-3)
        # strictly longer than the direct route between the same endpoints
        direct = float(btz.btz_null_delay(ra, rb, dphi, M, l))
        assert got > direct, (ra, rb, dphi)
        # endpoint symmetry (time reversal of the same path)
        rev = float(btz.btz_null_delay_reflected(rb, ra, dphi, M, l))
        np.testing.assert_allclose(got, rev, rtol=1e-4)


def test_reflected_drag_matches_quadrature():
    rng = np.random.default_rng(17)
    M, l = 0.02, 0.4
    r_h = l * np.sqrt(M)
    for _ in range(20):
        ra = float(rng.uniform(1.5 * r_h, 6.0 * r_h))
        rb = float(rng.uniform(1.5 * r_h, 6.0 * r_h))
        dphi = float(rng.uniform(0.1, 2.0 * np.pi - 0.1))
        want = _drag_quadrature_reflected(ra, rb, dphi, M, l)
        got = float(btz.btz_drag_integral_reflected(
            jnp.float32(ra), jnp.float32(rb), jnp.float32(dphi),
            jnp.float32(M), jnp.float32(l)))
        assert want > 0
        np.testing.assert_allclose(got, want, rtol=3e-3)


def test_reflected_radial_limit_stable():
    """dphi -> 0: the closed form must hand over to the exact two-leg
    radial formula (out to the boundary and back) without NaNs."""
    M, l = 0.02, 0.4
    mu = np.sqrt(M)
    r_h = l * mu
    for ra, rb in [(0.2, 0.3), (0.25, 0.25), (0.1, 0.35)]:
        for dphi in (1e-6, 1e-4, 1e-3):
            got = float(btz.btz_null_delay_reflected(ra, rb, dphi, M, l))
            assert np.isfinite(got) and got > 0
        leg = lambda r: np.log((r + r_h) / (r - r_h))
        want = (l / (2 * mu)) * (leg(ra) + leg(rb))
        got = float(btz.btz_null_delay_reflected(ra, rb, 1e-4, M, l))
        np.testing.assert_allclose(got, want, rtol=1e-3)
        # ... and the quadrature agrees with that same limit
        quad = _delay_quadrature_reflected(ra, rb, 1e-3, M, l)
        np.testing.assert_allclose(quad, want, rtol=5e-3)


def test_reflected_orbit_reaches_boundary_and_endpoints():
    """Routes 2/3 sampled orbits run from the camera far out (toward the
    AdS boundary) and back to the emitter; delays grow monotonically and
    end at route_delay_xy's value."""
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=0.02, ads_l=0.4)
    cam = (0.1, -0.35)
    for q in [(0.3, 0.25), (-0.33, 0.1), (-0.2, -0.3)]:
        for route in (2, 3):
            xs, ys, dl = btz.sample_orbit(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route, 8192)
            r = np.hypot(np.asarray(xs), np.asarray(ys))
            assert r.max() > 10.0 * max(r[0], r[-1]), (q, route)
            np.testing.assert_allclose(
                [float(xs[0]), float(ys[0])], cam, atol=1e-4)
            np.testing.assert_allclose(
                [float(xs[-1]), float(ys[-1])], q, atol=1e-4)
            end = float(btz.route_delay_xy(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route))
            np.testing.assert_allclose(float(dl[-1]), end, rtol=1e-3)
            # delays from the camera grow along the path (skip the first
            # samples where the partial-BVP dphi clamp dominates)
            d = np.asarray(dl)[8:]
            assert np.all(np.diff(d) > -1e-3), (q, route)


def test_reflected_bearings_match_sampled_orbit():
    """Camera-side bearing and emitter-side direction of routes 2/3 match
    finite differences of the sampled reflected orbit."""
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=0.02, ads_l=0.4)
    cam = (0.1, -0.35)
    for q in [(0.3, 0.25), (-0.2, -0.3)]:
        for route in (2, 3):
            b, _ = btz.arrival_bearing_xy(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route)
            nex, ney = btz.emitter_direction_xy(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route)
            xs, ys, _ = btz.sample_orbit(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route, 8192)
            fd = np.arctan2(float(ys[1] - ys[0]), float(xs[1] - xs[0]))
            diff = abs(((float(b) - fd) + np.pi) % (2 * np.pi) - np.pi)
            assert diff < 0.02, (q, route, float(b), fd)
            tx = -(float(xs[-1]) - float(xs[-2]))
            ty = -(float(ys[-1]) - float(ys[-2]))
            norm = np.hypot(tx, ty)
            dot = (float(nex) * tx + float(ney) * ty) / norm
            assert dot > 0.999, (q, route, dot)


def test_btz_reflected_image_render():
    """btz_reflections=True adds image area (the boundary-echo images show
    the moving body at its OLDER positions, the bounce delay further back)
    and agrees with the geodesic-walking brute oracle."""
    body = scene.disc_softbody(4, 0, (0.25, -0.3), (0.0, 0.4))
    sb = scene.SceneBuilder()
    sb.add(body, base_color=(0.2, 0.9, 0.3))
    particles, objects = sb.build(capacity=256)
    # the bounce delay at this geometry is ~250-340 ticks (out to the AdS
    # boundary and back): the ring must reach past it for echo images
    buf = wl.create(512, particles.capacity)
    p0 = particles.pos
    for k in range(512):
        t = k * H
        buf = wl.push_frame(
            buf, dataclasses.replace(particles, pos=p0 + particles.vel * t),
            time=t)
    cam = Camera.create(pos=(-0.35, 0.0), zoom=1.4)
    base = raytrace.RenderParams(dt=H, opaque=False)
    params = dataclasses.replace(
        base, cell_px=raytrace.auto_cell_px(base, 96, 96, 1.4))
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=0.02, ads_l=0.4)
    off = np.asarray(btz.render_btz_xray(
        buf, particles.object_index, objects, cam, hole, 96, 96, params))
    pref = dataclasses.replace(params, btz_reflections=True)
    on = np.asarray(btz.render_btz_xray(
        buf, particles.object_index, objects, cam, hole, 96, 96, pref))
    n_off = (off.min(-1) < 0.9).sum()
    n_on = (on.min(-1) < 0.9).sum()
    assert n_off > 0
    assert n_on > n_off, (n_off, n_on)
    oracle = np.asarray(btz.render_btz_brute(
        buf, particles.object_index, objects, cam, hole, 96, 96, pref,
        n_samples=32))
    mismatch = np.mean(np.any(np.abs(on - oracle) > 0.05, axis=-1))
    assert mismatch < 0.03, mismatch


# ---------------------------------------------------------------------------
# Higher-winding routes (route // 4 = extra turns around the hole — the 2+1
# photon-ring analog)


def test_winding_delay_matches_quadrature():
    """The closed-form delay holds at separations beyond 2 pi (winding
    orbits): same f64 BVP + trapezoid oracle, dphi + 2 pi k."""
    rng = np.random.default_rng(23)
    M, l = 0.02, 0.4
    r_h = l * np.sqrt(M)
    for _ in range(12):
        ra = float(rng.uniform(1.5 * r_h, 6.0 * r_h))
        rb = float(rng.uniform(1.5 * r_h, 6.0 * r_h))
        base = float(rng.uniform(0.1, 2.0 * np.pi - 0.1))
        for k in (1, 2):
            dphi = base + 2.0 * np.pi * k
            want = _delay_quadrature(ra, rb, dphi, M, l, n=400_000)
            got = float(btz.btz_null_delay(
                jnp.float32(ra), jnp.float32(rb), jnp.float32(dphi),
                jnp.float32(M), jnp.float32(l)))
            np.testing.assert_allclose(got, want, rtol=2e-3)
            # each winding is strictly slower than the one below it
            below = float(btz.btz_null_delay(
                ra, rb, dphi - 2.0 * np.pi, M, l))
            assert got > below, (ra, rb, dphi)


def test_winding_orbit_wraps_hole():
    """sample_orbit on routes 4/5 (winding 1) sweeps 2 pi more than the
    base route, starts at the camera, ends at the emitter, stays outside
    the horizon, and its final delay equals route_delay_xy."""
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=0.02, ads_l=0.4)
    r_h = float(hole.r_h)
    cam = (0.1, -0.35)
    for q in [(0.3, 0.25), (-0.33, 0.1)]:
        for route in (4, 5):
            xs, ys, dl = btz.sample_orbit(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route, 8192)
            xs, ys = np.asarray(xs), np.asarray(ys)
            np.testing.assert_allclose([xs[0], ys[0]], cam, atol=1e-4)
            np.testing.assert_allclose([xs[-1], ys[-1]], q, atol=1e-4)
            r = np.hypot(xs, ys)
            assert r.min() > r_h  # winding orbits stay exterior
            # unwrapped polar sweep exceeds 2 pi (it circles the hole)
            ang = np.unwrap(np.arctan2(ys, xs))
            assert np.abs(ang[-1] - ang[0]) > 2.0 * np.pi
            end = float(btz.route_delay_xy(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route))
            np.testing.assert_allclose(float(dl[-1]), end, rtol=1e-3)
            # slower than the same-parity base route
            direct = float(btz.route_delay_xy(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route - 4))
            assert end > direct


def test_winding_reflected_orbit_single_bounce():
    """Winding + reflection (routes 6/7): the continued orbit still crosses
    u = 0 exactly once (multi-bounce is impossible — _orbit_setup), while
    sweeping more than 2 pi."""
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=0.02, ads_l=0.4)
    cam = (0.1, -0.35)
    for q in [(0.3, 0.25), (-0.2, -0.3)]:
        for route in (6, 7):
            ob = btz._orbit_setup(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route)
            mu, dphi = float(ob["mu"]), float(ob["dphi"])
            assert dphi > 2.0 * np.pi
            phi = np.linspace(0.0, dphi, 200_000)
            u = float(ob["A"]) * np.exp(mu * phi) + float(ob["B"]) * np.exp(
                -mu * phi)
            assert u[0] > 0 and u[-1] < 0
            assert np.sum(np.diff(np.sign(u)) != 0) == 1  # ONE bounce
            end = float(btz.route_delay_xy(
                jnp.float32(q[0]), jnp.float32(q[1]),
                jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route))
            assert np.isfinite(end) and end > 0


def test_winding_image_render():
    """btz_windings=1 adds photon-ring-class image area (a MOVING emitter:
    winding images show it ~700-850 ticks further back, a visibly older
    position — static emitters would alias onto the direct image) and
    agrees with the winding-aware brute oracle."""
    body = scene.disc_softbody(4, 0, (0.25, -0.3), (0.0, 0.1))
    sb = scene.SceneBuilder()
    sb.add(body, base_color=(0.2, 0.9, 0.3))
    particles, objects = sb.build(capacity=256)
    # winding-1 delays at this geometry are ~690-850 ticks (route_delay_xy):
    # the ring must reach past them or the winding images have no worldline
    buf = wl.create(1024, particles.capacity)
    p0 = particles.pos
    for k in range(1024):
        t = k * H
        buf = wl.push_frame(
            buf, dataclasses.replace(particles, pos=p0 + particles.vel * t),
            time=t)
    cam = Camera.create(pos=(-0.35, 0.0), zoom=1.4)
    base = raytrace.RenderParams(dt=H, opaque=False)
    params = dataclasses.replace(
        base, cell_px=raytrace.auto_cell_px(base, 64, 64, 1.4))
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=0.02, ads_l=0.4)
    off = np.asarray(btz.render_btz_xray(
        buf, particles.object_index, objects, cam, hole, 64, 64, params))
    pwind = dataclasses.replace(params, btz_windings=1)
    on = np.asarray(btz.render_btz_xray(
        buf, particles.object_index, objects, cam, hole, 64, 64, pwind))
    n_off = (off.min(-1) < 0.9).sum()
    n_on = (on.min(-1) < 0.9).sum()
    assert n_off > 0
    assert n_on > n_off, (n_off, n_on)
    oracle = np.asarray(btz.render_btz_brute(
        buf, particles.object_index, objects, cam, hole, 64, 64, pwind,
        n_samples=32))
    mismatch = np.mean(np.any(np.abs(on - oracle) > 0.05, axis=-1))
    assert mismatch < 0.03, mismatch
