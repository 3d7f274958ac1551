"""Conical-defect renderer tests (BASELINE config 5)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from spacetime_tpu import scene
from spacetime_tpu.camera import Camera
from spacetime_tpu.ops import curved, raytrace
from spacetime_tpu.ops import worldline as wl

H = 0.005
PARAMS = raytrace.RenderParams(dt=H, num_rays=128, opaque=False)


def fitted(params, w, h, zoom):
    return dataclasses.replace(
        params, cell_px=raytrace.auto_cell_px(params, w, h, zoom)
    )


def _static_blob_buffer(offset, n_ticks=96, radius=2):
    body = scene.disc_softbody(radius, 0, offset, (0.0, 0.0))
    sb = scene.SceneBuilder()
    sb.add(body, base_color=(0.2, 0.9, 0.3))
    particles, objects = sb.build(capacity=256)
    buf = wl.create(n_ticks, particles.capacity)
    for k in range(n_ticks):
        buf = wl.push_frame(buf, particles, time=k * H)
    return buf, particles, objects


def test_geodesic_lengths_zero_deficit():
    d = curved.ConicalDefect.create(center=(0.0, 0.0), deficit=0.0)
    a = jnp.array([[0.3, 0.0]], jnp.float32)
    b = jnp.array([[-0.2, 0.0]], jnp.float32)
    l1, l2, v2 = curved.geodesic_lengths(a, b, d)
    np.testing.assert_allclose(l1[0], 0.5, rtol=1e-6)
    # back route spans 2*pi - pi = pi -> not a valid geodesic (boundary)
    assert not bool(v2[0])


def test_geodesic_triangle_law():
    # 90-degree separation, deficit 0.5: back route angle = (2pi-0.5) - pi/2
    d = curved.ConicalDefect.create(center=(0.0, 0.0), deficit=4.0)
    a = jnp.array([[0.3, 0.0]], jnp.float32)
    b = jnp.array([[0.0, 0.4]], jnp.float32)
    l1, l2, v2 = curved.geodesic_lengths(a, b, d)
    np.testing.assert_allclose(l1[0], 0.5, rtol=1e-6)
    back = (2 * np.pi - 4.0) - np.pi / 2
    want = np.sqrt(0.09 + 0.16 - 2 * 0.3 * 0.4 * np.cos(back))
    assert bool(v2[0])
    np.testing.assert_allclose(l2[0], want, rtol=1e-5)


def test_zero_deficit_matches_flat_renderer():
    buf, particles, objects = _static_blob_buffer((0.18, 0.02))
    cam = Camera.create(pos=(0.0, 0.0), zoom=0.7)
    defect = curved.ConicalDefect.create(center=(-5.0, -5.0), deficit=0.0)
    p64 = fitted(PARAMS, 64, 64, 0.7)
    img_c = np.asarray(
        curved.render_retarded_conical(
            buf, particles.object_index, objects, cam, defect, 64, 64, p64
        )
    )
    img_f = np.asarray(
        raytrace.render_retarded(
            buf, particles.object_index, objects, cam, 64, 64, p64
        )
    )
    mismatch = np.mean(np.any(np.abs(img_c - img_f) > 1e-3, axis=-1))
    assert mismatch < 0.01


def test_double_image_around_defect():
    """A MOVING blob near a large-deficit defect shows two images: the two
    geodesic routes have different lengths, hence different retarded times,
    hence different retarded positions.  (A static blob renders identically
    in the map view — both routes illuminate the same chart point.)"""
    body = scene.disc_softbody(4, 0, (0.25, -0.3), (0.0, 0.4))
    sb = scene.SceneBuilder()
    sb.add(body, base_color=(0.2, 0.9, 0.3))
    particles, objects = sb.build(capacity=256)
    buf = wl.create(256, particles.capacity)
    p0 = particles.pos
    for k in range(256):
        t = k * H
        buf = wl.push_frame(
            buf, dataclasses.replace(particles, pos=p0 + particles.vel * t), time=t
        )
    cam = Camera.create(pos=(-0.35, 0.0), zoom=1.4)
    params = fitted(
        PARAMS, 128, 128, 1.4
    )
    flat = np.asarray(
        raytrace.render_retarded(
            buf, particles.object_index, objects, cam, 128, 128, params
        )
    )
    defect = curved.ConicalDefect.create(center=(0.0, 0.0), deficit=5.0)
    img = np.asarray(
        curved.render_retarded_conical(
            buf, particles.object_index, objects, cam, defect, 128, 128, params
        )
    )
    n_flat = (flat.min(-1) < 0.9).sum()
    n_curved = (img.min(-1) < 0.9).sum()
    assert n_flat > 0
    assert n_curved > n_flat * 1.5, (n_flat, n_curved)
    # the second image is displaced along the motion axis (rows)
    rows_flat = np.nonzero(flat.min(-1) < 0.9)[0]
    rows_curved = np.nonzero(img.min(-1) < 0.9)[0]
    assert rows_curved.max() - rows_curved.min() > rows_flat.max() - rows_flat.min()


def test_conical_opaque_matches_oracle():
    """VERDICT r1 #9: curved mode is no longer x-ray only — opaque rendering
    (per-route occlusion retinas) must match the exhaustive per-pixel oracle
    within the same budget as the flat opaque test."""
    body = scene.disc_softbody(4, 0, (0.25, -0.28), (0.0, 0.35))
    sb = scene.SceneBuilder()
    sb.add(body, base_color=(0.2, 0.9, 0.3))
    # second blob to create occluders between camera and the first
    sb.add(scene.disc_softbody(3, 1, (-0.18, -0.05), (0.05, 0.0)),
           base_color=(0.9, 0.4, 0.2))
    particles, objects = sb.build(capacity=256)
    from spacetime_tpu.models.softbody import SoftbodyModel

    model = SoftbodyModel(capacity=particles.capacity)
    buf = wl.create(128, particles.capacity)
    p = particles
    t = 0.0
    for _ in range(80):
        p, _ = model.step(p)
        t += H
        buf = wl.push_frame(buf, p, t)
    cam = Camera.create(pos=(-0.35, 0.0), zoom=1.2)
    defect = curved.ConicalDefect.create(center=(0.0, 0.0), deficit=5.0)
    params = fitted(
        dataclasses.replace(PARAMS, opaque=True, num_rays=1024), 96, 96, 1.2
    )
    fast = np.asarray(
        curved.render_retarded_conical(
            buf, p.object_index, objects, cam, defect, 96, 96, params
        )
    )
    oracle = np.asarray(
        curved.render_conical_brute(
            buf, p.object_index, objects, cam, defect, 96, 96, params
        )
    )
    mismatch = np.mean(np.any(np.abs(fast - oracle) > 0.05, axis=-1))
    assert mismatch < 0.03, mismatch
    # occlusion actually does something: opaque differs from x-ray
    xray = np.asarray(
        curved.render_retarded_conical(
            buf, p.object_index, objects, cam, defect, 96, 96,
            dataclasses.replace(params, opaque=False),
        )
    )
    assert np.any(np.abs(fast - xray) > 0.05)


def test_conical_opaque_zero_deficit_matches_flat_opaque():
    buf, particles, objects = _static_blob_buffer((0.18, 0.02))
    cam = Camera.create(pos=(0.0, 0.0), zoom=0.7)
    defect = curved.ConicalDefect.create(center=(-5.0, -5.0), deficit=0.0)
    p64 = fitted(dataclasses.replace(PARAMS, opaque=True, num_rays=512),
                 64, 64, 0.7)
    img_c = np.asarray(
        curved.render_retarded_conical(
            buf, particles.object_index, objects, cam, defect, 64, 64, p64
        )
    )
    img_f = np.asarray(
        raytrace.render_retarded(
            buf, particles.object_index, objects, cam, 64, 64, p64
        )
    )
    mismatch = np.mean(np.any(np.abs(img_c - img_f) > 1e-2, axis=-1))
    assert mismatch < 0.02


def test_single_defect_tuple_identical():
    buf, particles, objects = _static_blob_buffer((0.18, 0.02))
    cam = Camera.create(pos=(0.0, 0.0), zoom=0.7)
    defect = curved.ConicalDefect.create(center=(0.05, -0.3), deficit=1.0)
    p64 = fitted(PARAMS, 64, 64, 0.7)
    a = np.asarray(curved.render_retarded_conical(
        buf, particles.object_index, objects, cam, defect, 64, 64, p64))
    b = np.asarray(curved.render_retarded_conical(
        buf, particles.object_index, objects, cam, (defect,), 64, 64, p64))
    np.testing.assert_array_equal(a, b)


def test_multi_defect_opaque_matches_oracle():
    """Two defects: single-scattering superposition — fast renderer vs the
    exhaustive per-pixel oracle (both enumerate direct + 2 back routes)."""
    body = scene.disc_softbody(4, 0, (0.25, -0.28), (0.0, 0.35))
    sb = scene.SceneBuilder()
    sb.add(body, base_color=(0.2, 0.9, 0.3))
    sb.add(scene.disc_softbody(3, 1, (-0.18, -0.05), (0.05, 0.0)),
           base_color=(0.9, 0.4, 0.2))
    particles, objects = sb.build(capacity=256)
    from spacetime_tpu.models.softbody import SoftbodyModel

    model = SoftbodyModel(capacity=particles.capacity)
    buf = wl.create(128, particles.capacity)
    p = particles
    t = 0.0
    for _ in range(80):
        p, _ = model.step(p)
        t += H
        buf = wl.push_frame(buf, p, t)
    cam = Camera.create(pos=(-0.35, 0.0), zoom=1.2)
    defects = (
        curved.ConicalDefect.create(center=(0.0, 0.0), deficit=5.0),
        curved.ConicalDefect.create(center=(0.15, 0.2), deficit=4.5),
    )
    params = fitted(
        dataclasses.replace(PARAMS, opaque=True, num_rays=1024), 96, 96, 1.2
    )
    fast = np.asarray(curved.render_retarded_conical(
        buf, p.object_index, objects, cam, defects, 96, 96, params))
    oracle = np.asarray(curved.render_conical_brute(
        buf, p.object_index, objects, cam, defects, 96, 96, params))
    mismatch = np.mean(np.any(np.abs(fast - oracle) > 0.05, axis=-1))
    assert mismatch < 0.03, mismatch


def test_multi_defect_adds_images():
    """A second defect adds its own around-the-back image of a moving blob."""
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
    params = fitted(PARAMS, 128, 128, 1.4)
    one = curved.ConicalDefect.create(center=(0.0, 0.0), deficit=5.0)
    two = curved.ConicalDefect.create(center=(0.05, 0.35), deficit=5.2)
    img1 = np.asarray(curved.render_retarded_conical(
        buf, particles.object_index, objects, cam, (one,), 128, 128, params))
    img2 = np.asarray(curved.render_retarded_conical(
        buf, particles.object_index, objects, cam, (one, two), 128, 128,
        params))
    n1 = (img1.min(-1) < 0.9).sum()
    n2 = (img2.min(-1) < 0.9).sum()
    assert n1 > 0
    assert n2 > n1 * 1.2, (n1, n2)


def test_engine_defect_motion_quasi_static():
    import jax.numpy as jnp

    from spacetime_tpu.engine import Engine
    from spacetime_tpu.utils.config import get_config

    cfg = get_config("conical_defect")
    cfg = dataclasses.replace(
        cfg, width=48, height=48, history=32,
        defect_vel=((0.1, -0.05),),
    )
    eng = Engine(cfg)
    (d0,) = eng._defects()
    c0 = np.asarray(d0.center)
    for _ in range(4):
        eng.run_frame()
    (d1,) = eng._defects()
    c1 = np.asarray(d1.center)
    expect = c0 + np.asarray([0.1, -0.05]) * eng.time
    np.testing.assert_allclose(c1, expect, rtol=1e-5, atol=1e-7)
    assert eng.time > 0


def _small_conical_cfg(**over):
    from spacetime_tpu.utils.config import get_config

    cfg = get_config("conical_defect")
    # history must cover the ~90-tick light delay from the bodies to the
    # camera or the cone never crosses stored ticks (pairs_used == 0)
    return dataclasses.replace(
        cfg, width=48, height=48, history=128,
        scene=dataclasses.replace(
            cfg.scene,
            bodies=(
                ("disc", 60, (0.25, 0.50), (0.0, 0.2), (0.2, 0.3, 1.0)),
                ("disc", 60, (0.75, 0.50), (0.0, -0.2), (1.0, 0.3, 0.2)),
            ),
        ),
        **over,
    )


def test_conical_fused_matches_unfused():
    """The fused single-program conical frame (VERDICT r2 #4: conical/btz
    now admitted to _can_fuse) renders the same image as the split
    step/push/render path."""
    from spacetime_tpu.engine import Engine

    cfg = _small_conical_cfg()
    eng_f = Engine(cfg)
    assert eng_f._can_fuse()
    eng_u = Engine(dataclasses.replace(cfg, stage_timing=True))
    assert not eng_u._can_fuse()
    for _ in range(3):
        img_f = eng_f.run_frame()
        img_u = eng_u.run_frame()
    np.testing.assert_allclose(
        np.asarray(img_f), np.asarray(img_u), atol=2e-5
    )
    assert eng_f.last_diag is not None
    assert int(eng_f.last_diag.pairs_used) > 0


def test_conical_pair_budget_overflow_warns_and_adapts():
    """An overloaded pair_budget on a conical scene fires a warning and
    doubles the budget (recompile), mirroring the bin-capacity adaptation
    (ADVICE r2 medium: this overflow used to be silent)."""
    import logging

    from spacetime_tpu.engine import Engine

    cfg = _small_conical_cfg(diag_every=1)
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, pair_budget=64)
    )
    eng = Engine(cfg)
    records = []

    class _Catch(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    eng.log.addHandler(_Catch())  # project logger has propagate=False
    try:
        eng.run_frame()
        eng.run_frame()
    finally:
        eng.log.handlers = [
            h for h in eng.log.handlers if not isinstance(h, _Catch)
        ]
    assert eng._pair_boost >= 1
    assert any("pair_budget" in m for m in records)
    # the boost is live in the next frame's params
    assert eng._render_params().pair_budget == 64 << eng._pair_boost


def test_retarded_defect_motion_matches_static_at_retarded_position():
    """defect_retarded=True places a moving defect at its retarded position
    on the camera's past light cone — by construction the image must equal a
    STATIC defect pinned at that exact position (round-3 stretch: geometry
    changes propagate at c instead of instantly)."""
    from spacetime_tpu.engine import Engine
    from spacetime_tpu.utils.config import get_config

    v = (0.4, -0.2)
    cfg = _small_conical_cfg(defect_vel=(v,), defect_retarded=True)
    eng = Engine(cfg)
    for _ in range(4):
        img_r = eng.run_frame()
    t = eng.time
    (d_used,) = eng._defects(t)
    c_used = np.asarray(d_used.center)

    # hand-solve the retarded time and check the light-cone condition
    (c0, deficit) = cfg.defect
    cam = np.asarray(eng.camera.pos)
    q = np.asarray(c0) - cam
    vv = np.asarray(v)
    a = vv @ vv - 1.0
    b = 2.0 * (q @ vv + t)
    c_ = q @ q - t * t
    t_r = (-b + np.sqrt(b * b - 4 * a * c_)) / (2 * a)
    assert t_r <= t
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(c0) + vv * t_r - cam), t - t_r, rtol=1e-5
    )
    np.testing.assert_allclose(c_used, np.asarray(c0) + vv * t_r, rtol=1e-5)
    # retarded position lags the quasi-static one (defect moving away from
    # its past cone position)
    eng_q = Engine(_small_conical_cfg(defect_vel=(v,)))
    for _ in range(4):
        img_q = eng_q.run_frame()
    (d_q,) = eng_q._defects(eng_q.time)
    assert not np.allclose(c_used, np.asarray(d_q.center), atol=1e-6)

    # definition equality: static defect pinned at the retarded position
    cfg_s = _small_conical_cfg()
    cfg_s = dataclasses.replace(cfg_s, defect=(tuple(c_used), deficit))
    eng_s = Engine(cfg_s)
    # same particle history: replay the same number of frames
    for _ in range(4):
        img_s = eng_s.run_frame()
    np.testing.assert_allclose(
        np.asarray(img_r), np.asarray(img_s), atol=2e-5
    )
