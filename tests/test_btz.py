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
