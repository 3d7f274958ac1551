"""Exact rotating-BTZ optics (ops/btz_exact.py) vs independent oracles.

Three checks: (1) J -> 0 reduction to the static closed form on all 8 route
classes; (2) an f64 RK4 Hamiltonian shooting oracle at moderate AND
near-extremal spin (this oracle floors at the TRUE outer horizon r_+ —
test_btz.py's variant uses the non-rotating l sqrt(M), which aborts
legitimate near-extremal orbits); (3) the exact solve beats the O(J^2)
slow-rotation model near extremality."""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from spacetime_tpu.ops import btz, btz_exact

M, L = 0.03, 0.45  # extremality at |J| = M l = 0.0135
H = 0.005


def _oracle_rotating_delay(rc, rq, dphi_signed, M, l, J, n_steps=2500):
    """f64 RK4 shooting through the FULL rotating metric, bisecting L/E;
    floors at the true outer horizon r_+ (valid at near-extremal J)."""
    mu = np.sqrt(M)
    r_plus = np.sqrt(l * l * (M + np.sqrt(max(M * M - J * J / (l * l), 0.0)))
                     / 2.0)

    def nsq(r):
        return r * r / (l * l) - M + J * J / (4.0 * r * r)

    def nphi(r):
        return -J / (2.0 * r * r)

    E = 1.0

    def hamil(r, pr, Lz):
        w = E + nphi(r) * Lz
        return 0.5 * (-w * w / nsq(r) + Lz * Lz / (r * r) + nsq(r) * pr * pr)

    def rhs(state, Lz):
        t, r, phi, pr = state
        w = E + nphi(r) * Lz
        tdot = w / nsq(r)
        phidot = Lz / (r * r) - nphi(r) * tdot
        rdot = nsq(r) * pr
        dr = 1e-6 * max(r, 1e-3)
        dH = (hamil(r + dr, pr, Lz) - hamil(r - dr, pr, Lz)) / (2 * dr)
        return np.array([tdot, rdot, phidot, -dH])

    ua, ub = 1.0 / rc, 1.0 / rq
    adphi = abs(dphi_signed)
    e = np.exp(mu * adphi)
    A = (ub - ua / e) / (e - 1.0 / e)
    B = ua - A
    L0 = np.sign(dphi_signed) / np.sqrt(1.0 / l**2 - 4.0 * A * B * M)
    sigma = -np.sign(A - B) if abs(A - B) > 1e-15 else 1.0

    def shoot(Lz):
        w0 = E + nphi(rc) * Lz
        pr2 = (w0 * w0 / nsq(rc) - Lz * Lz / (rc * rc)) / nsq(rc)
        if pr2 < 0:
            return np.inf, None
        state = np.array([0.0, rc, 0.0, sigma * np.sqrt(pr2)])
        target = abs(dphi_signed)
        phidot0 = abs(Lz) / (rc * rc) - nphi(rc) * w0 / nsq(rc) * np.sign(Lz)
        dlam = target / n_steps / max(abs(phidot0), 1e-9)
        prev = state.copy()
        for _ in range(50 * n_steps):
            k1 = rhs(state, Lz)
            k2 = rhs(state + 0.5 * dlam * k1, Lz)
            k3 = rhs(state + 0.5 * dlam * k2, Lz)
            k4 = rhs(state + dlam * k3, Lz)
            prev = state.copy()
            state = state + (dlam / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            if state[1] <= r_plus * 1.005:
                return 0.0, None
            if abs(state[2]) >= target:
                f = (target - abs(prev[2])) / (abs(state[2]) - abs(prev[2]))
                return (prev[1] + f * (state[1] - prev[1]),
                        prev[0] + f * (state[0] - prev[0]))
        return 0.0, None

    sgn = np.sign(L0)
    los = his = abs(L0)
    rlo = shoot(sgn * los)[0]
    rhi = rlo
    for _ in range(60):
        if rlo < rq:
            break
        los *= 0.97
        rlo = shoot(sgn * los)[0]
    for _ in range(60):
        if rhi > rq:
            break
        his *= 1.03
        rhi = shoot(sgn * his)[0]
    assert rlo < rq < rhi, (rlo, rhi, rq)
    t_end = None
    for _ in range(44):
        mid = 0.5 * (los + his)
        rm, tm = shoot(sgn * mid)
        if rm < rq:
            los = mid
        else:
            his = mid
        if tm is not None:
            t_end = tm
    assert t_end is not None
    return t_end


def _optics(qx, qy, cx, cy, hole, route):
    return jax.jit(btz_exact.exact_route_optics_xy, static_argnums=(5,))(
        jnp.asarray(qx, jnp.float32), jnp.asarray(qy, jnp.float32),
        jnp.float32(cx), jnp.float32(cy), hole, route)


def test_exact_reduces_to_static_at_zero_spin():
    """J = 0: the exact solver must reproduce the static closed form on
    every route class (direct/back/reflected/winding), no fallbacks."""
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=M, ads_l=L,
                                   spin=0.0)
    cam = (0.1, -0.35)
    pts = np.array([(0.3, 0.25), (-0.33, 0.1), (-0.2, -0.3), (0.15, 0.3),
                    (-0.1, 0.25)], np.float32)
    for route in range(8):
        b0, d0, x0, y0 = jax.jit(btz.route_optics_xy, static_argnums=(5,))(
            jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
            jnp.float32(cam[0]), jnp.float32(cam[1]), hole, route)
        b1, d1, x1, y1, fb = _optics(pts[:, 0], pts[:, 1], cam[0], cam[1],
                                     hole, route)
        assert not np.asarray(fb).any(), route
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                                   rtol=4e-3)
        # bearings/emitter dirs agree (same orbits)
        assert np.abs(np.asarray(b1) - np.asarray(b0)).max() < 5e-3
        assert np.abs(np.asarray(x1) - np.asarray(x0)).max() < 5e-3


# oracle-friendly fixture: camera on the +x axis, emitter 1.1 rad
# counterclockwise — the geometry test_btz.py's spin test already shoots
# cleanly (wide sweeps at larger radii are integration-fragile for the
# shooter, NOT for the closed form; see the J=0 static check below)
_RC, _RQ, _DPHI = 0.30, 0.22, 1.1
_CAM = (_RC, 0.0)
_Q = (_RQ * math.cos(_DPHI), _RQ * math.sin(_DPHI))


def test_exact_matches_shooting_oracle():
    """Exact closed-form delays vs the corrected f64 RK4 shooter at
    moderate and near-extremal spin (89% of extremality).  The oracle's
    own accuracy is anchored by its J = 0 run against the static closed
    form, and that residual sets the comparison budget."""
    d_static = float(btz.route_delay_xy(
        jnp.float32(_Q[0]), jnp.float32(_Q[1]), jnp.float32(_CAM[0]),
        jnp.float32(_CAM[1]),
        btz.BTZBlackHole.create(center=(0.0, 0.0), mass=M, ads_l=L,
                                spin=0.0), 0))
    oracle0 = _oracle_rotating_delay(_RC, _RQ, _DPHI, M, L, 0.0)
    budget = abs(oracle0 - d_static) + 2e-3 * d_static
    for J in (0.004, 0.012):
        hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=M, ads_l=L,
                                       spin=J)
        _, d, _, _, fb = _optics(_Q[0], _Q[1], _CAM[0], _CAM[1], hole, 0)
        assert not bool(fb)
        # oracle shoots camera->emitter at spin J' == model at spin -J'
        # (tests/test_btz.py convention)
        want = _oracle_rotating_delay(_RC, _RQ, _DPHI, M, L, -J)
        assert abs(float(d) - want) <= budget, (J, float(d), want, budget)


def test_exact_beats_slow_rotation_near_extremal():
    """At 89% extremality the slow-rotation model's O(J^2) error is large;
    the exact solve must sit far closer to the shooting oracle."""
    J = 0.012
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=M, ads_l=L,
                                   spin=J)
    _, d_exact, _, _, fb = _optics(_Q[0], _Q[1], _CAM[0], _CAM[1], hole, 0)
    assert not bool(fb)
    d_slow = float(btz.route_delay_xy(
        jnp.float32(_Q[0]), jnp.float32(_Q[1]), jnp.float32(_CAM[0]),
        jnp.float32(_CAM[1]), hole, 0))
    want = _oracle_rotating_delay(_RC, _RQ, _DPHI, M, L, -J)
    err_exact = abs(float(d_exact) - want)
    err_slow = abs(d_slow - want)
    # the exact path must recover most of the slow-rotation residual (f32
    # bisection noise + the oracle's own integration error bound the rest)
    assert err_exact < 0.5 * err_slow, (err_exact, err_slow)
    assert err_exact < 3e-3 * want


def test_no_fallbacks_on_scene_grid():
    """Scene-like geometry grid x all 8 routes at near-extremal spin: the
    branch solve must cover everything (fallback rate 0)."""
    hole = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=M, ads_l=L,
                                   spin=0.012)
    rng = np.random.default_rng(11)
    r_h = L * math.sqrt(M)
    r = rng.uniform(2.5 * r_h, 6.0 * r_h, 24).astype(np.float32)
    th = rng.uniform(-math.pi, math.pi, 24).astype(np.float32)
    qx, qy = r * np.cos(th), r * np.sin(th)
    for route in range(8):
        *_, fb = _optics(qx, qy, 0.1, -0.35, hole, route)
        assert not np.asarray(fb).any(), route


def test_exact_spin_render():
    """render_btz_xray with btz_exact_spin: identical image at J = 0,
    finite + horizon-correct at near-extremal J."""
    from spacetime_tpu import scene
    from spacetime_tpu.camera import Camera
    from spacetime_tpu.ops import raytrace
    from spacetime_tpu.ops import worldline as wl

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
    base = raytrace.RenderParams(dt=H, opaque=False)
    params = dataclasses.replace(
        base, cell_px=raytrace.auto_cell_px(base, 64, 64, 1.4))
    pex = dataclasses.replace(params, btz_exact_spin=True)

    hole0 = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=M, ads_l=L,
                                    spin=0.0)
    a = np.asarray(btz.render_btz_xray(
        buf, particles.object_index, objects, cam, hole0, 64, 64, params))
    b = np.asarray(btz.render_btz_xray(
        buf, particles.object_index, objects, cam, hole0, 64, 64, pex))
    # J = 0: same geodesics -> (near-)identical image; delay differences
    # ~1e-3 may shift one tick at capsule edges
    mismatch = np.mean(np.any(np.abs(a - b) > 0.05, axis=-1))
    assert mismatch < 0.01, mismatch

    holeJ = btz.BTZBlackHole.create(center=(0.0, 0.0), mass=M, ads_l=L,
                                    spin=0.012)
    c = np.asarray(btz.render_btz_xray(
        buf, particles.object_index, objects, cam, holeJ, 64, 64, pex))
    assert np.isfinite(c).all()
    assert (c.min(-1) < 0.9).sum() > 0  # images drawn
    # near-extremal frame dragging visibly moves image area vs J = 0 exact
    assert np.mean(np.any(np.abs(c - b) > 0.05, axis=-1)) > 0.0
