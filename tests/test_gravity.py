"""Matter-sourced conical defects (ops/gravity.py): energy centroids,
retarded centroid tracks, and engine integration."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from spacetime_tpu import scene
from spacetime_tpu.camera import Camera
from spacetime_tpu.ops import curved, gravity, raytrace
from spacetime_tpu.ops import worldline as wl


def _two_blob_state(v0=(0.2, 0.0), v1=(-0.1, 0.05)):
    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(4, 0, (0.3, 0.5), v0), base_color=(0, 0, 1))
    sb.add(scene.disc_softbody(4, 1, (0.7, 0.5), v1), base_color=(1, 0, 0))
    return sb.build()


def test_object_energy_com_matches_numpy():
    particles, objects = _two_blob_state()
    for obj in (0, 1):
        cx, cy, en = gravity.object_energy_com(particles, obj)
        act = np.asarray(particles.active) & (
            np.asarray(particles.object_index) == obj
        )
        v = np.asarray(particles.vel, np.float64)[act]
        m = np.asarray(particles.rest_mass, np.float64)[act]
        g = 1.0 / np.sqrt(1.0 - (v**2).sum(-1))
        w = m * g
        p = np.asarray(particles.pos, np.float64)[act]
        np.testing.assert_allclose(float(cx), (w * p[:, 0]).sum() / w.sum(),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(cy), (w * p[:, 1]).sum() / w.sum(),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(en), w.sum(), rtol=1e-5)


def test_com_history_inertial_track():
    """Uniform-velocity object: the centroid track is exactly linear."""
    particles, _ = _two_blob_state(v0=(0.15, -0.1))
    h = 0.005
    buf = wl.create(64, particles.capacity)
    buf = wl.prefill_inertial(
        buf, particles.pos, particles.vel, particles.active,
        jnp.float32(0.0), jnp.float32(h),
    )
    com_x, com_y, tot, age = gravity.com_history(
        buf, particles.object_index, particles.rest_mass, particles.active, 0
    )
    cx0, cy0, en0 = gravity.object_energy_com(particles, 0)
    ages = np.asarray(age, np.float64)
    np.testing.assert_allclose(
        np.asarray(com_x), float(cx0) + 0.15 * (-ages) * h, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(com_y), float(cy0) - 0.1 * (-ages) * h, atol=1e-5
    )
    # uniform velocity: energy constant along the track
    np.testing.assert_allclose(np.asarray(tot), float(en0), rtol=1e-6)


def test_retarded_com_matches_linear_closed_form():
    """Inertial motion: retarded_com must agree with the closed-form
    retarded-time quadratic the engine uses for prescribed linear defects."""
    vx, vy = 0.2, -0.05
    particles, _ = _two_blob_state(v0=(vx, vy))
    h = 0.005
    t_cap = 256
    buf = wl.create(t_cap, particles.capacity)
    buf = wl.prefill_inertial(
        buf, particles.pos, particles.vel, particles.active,
        jnp.float32(0.0), jnp.float32(h),
    )
    cam_x, cam_y = 0.9, 0.1
    cx, cy, en = gravity.retarded_com(
        buf, particles.object_index, particles.rest_mass, particles.active,
        0, cam_x, cam_y, h,
    )
    # closed form: c(t) = c0 + v t (t = 0 now), |c(t_r) - cam| = -t_r
    c0x, c0y, _ = gravity.object_energy_com(particles, 0)
    qx, qy = float(c0x) - cam_x, float(c0y) - cam_y
    a = vx * vx + vy * vy - 1.0
    b = 2.0 * (qx * vx + qy * vy)
    c_ = qx * qx + qy * qy
    t_r = (-b + np.sqrt(b * b - 4 * a * c_)) / (2 * a)  # <= 0 root
    assert t_r < 0
    # sub-tick linear interpolation of |.|: curvature error << one tick
    np.testing.assert_allclose(float(cx), float(c0x) + vx * t_r, atol=5e-5)
    np.testing.assert_allclose(float(cy), float(c0y) + vy * t_r, atol=5e-5)


def test_retarded_com_clamps_to_short_history():
    """Camera far beyond the stored track: oldest usable tick, no NaN."""
    particles, _ = _two_blob_state()
    h = 0.005
    buf = wl.create(16, particles.capacity)  # 16 ticks = 0.08 ls of history
    buf = wl.prefill_inertial(
        buf, particles.pos, particles.vel, particles.active,
        jnp.float32(0.0), jnp.float32(h),
    )
    cx, cy, en = gravity.retarded_com(
        buf, particles.object_index, particles.rest_mass, particles.active,
        0, 50.0, 0.0, h,  # ~50 ls away: cone crossing far outside the ring
    )
    assert np.isfinite([float(cx), float(cy), float(en)]).all()


def test_source_defects_render_exact_vs_manual():
    """A sourced defect renders IDENTICALLY to a manual defect placed at the
    same (jax-computed) centroid — sourcing changes where the defect comes
    from, not the optics."""
    particles, objects = _two_blob_state(v0=(0.0, 0.0), v1=(0.0, 0.0))
    h = 0.005
    buf = wl.create(64, particles.capacity)
    buf = wl.prefill_inertial(
        buf, particles.pos, particles.vel, particles.active,
        jnp.float32(0.0), jnp.float32(h),
    )
    cam = Camera.create(pos=(0.5, 0.3), zoom=0.7)
    params = raytrace.RenderParams(num_rays=128, dt=h)
    params = dataclasses.replace(
        params, cell_px=raytrace.auto_cell_px(params, 64, 64, 0.6)
    )
    g_c = 1.0 / (8.0 * np.pi * 40.0)
    sourced = gravity.source_defects(
        ((0, None),), particles, buf, cam, h, g_c, retarded=False
    )
    manual = (curved.ConicalDefect(center=sourced[0].center,
                                   deficit=sourced[0].deficit),)
    img_s = curved.render_retarded_conical(
        buf, particles.object_index, objects, cam, sourced, 64, 64, params
    )
    img_m = curved.render_retarded_conical(
        buf, particles.object_index, objects, cam, manual, 64, 64, params
    )
    assert (np.asarray(img_s) < 0.999).any(), "scene rendered all-white"
    np.testing.assert_array_equal(np.asarray(img_s), np.asarray(img_m))
    # derived deficit = 8*pi*G*energy
    _, _, en = gravity.object_energy_com(particles, 0)
    np.testing.assert_allclose(
        float(sourced[0].deficit), 8 * np.pi * g_c * float(en), rtol=1e-6
    )


def _small_selfgravity_config():
    from spacetime_tpu.utils.config import EngineConfig, SceneSpec

    return EngineConfig(
        scene=SceneSpec(bodies=(
            ("disc", 40, (0.35, 0.5), (0.15, 0.0), (0.0, 0.0, 1.0)),
            ("disc", 40, (0.65, 0.5), (-0.15, 0.0), (1.0, 0.0, 0.0)),
        )),
        width=64, height=64, history=64,
        cam_pos=(0.5, 0.3), cam_zoom=0.7,
        render_mode="conical",
        defect_source=((0, None), (1, None)),
        defect_G=1.0 / (8.0 * np.pi * 40.0),
        defect_retarded=True,
        render=raytrace.RenderParams(num_rays=128),
    )


def test_engine_selfgravity_fused_frames():
    from spacetime_tpu.engine import Engine

    eng = Engine(_small_selfgravity_config())
    assert eng._can_fuse()
    img = None
    for _ in range(3):
        img = eng.run_frame()
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert (a < 0.999).any(), "self-gravity scene rendered all-white"
    # the sourced defects sit at the blobs' centroids
    defects = eng._defects()
    assert len(defects) == 2
    cx0 = float(defects[0].center[0])
    cx1 = float(defects[1].center[0])
    assert 0.2 < cx0 < 0.55 < cx1 < 0.8


def test_engine_conical_requires_defect_or_source():
    from spacetime_tpu.engine import Engine

    cfg = dataclasses.replace(
        _small_selfgravity_config(), defect_source=None
    )
    eng = Engine(cfg)
    with pytest.raises(ValueError, match="defect"):
        eng.run_frame()
