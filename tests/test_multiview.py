"""Multi-observer batched rendering (raytrace.render_views): B cameras over
one worldline ring in one traced program must reproduce the single-camera
renders exactly.  The reference has no multi-view counterpart (one window,
one camera: /root/reference/src/main.rs:179-352) — this is the serving path
for many observers / camera sweeps over a stored history."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from spacetime_tpu import scene
from spacetime_tpu.camera import Camera, stack_cameras
from spacetime_tpu.engine import Engine
from spacetime_tpu.ops import raytrace
from spacetime_tpu.ops import worldline as wl
from spacetime_tpu.utils.config import get_config

H = 0.005

PARAMS = raytrace.RenderParams(dt=H, bin_capacity=64, num_rays=512)


def _history(n_ticks=48, capacity=256):
    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(5, 0, (0.45, 0.5), (0.3, 0.0)),
           base_color=(0.2, 0.9, 0.3))
    sb.add(scene.disc_softbody(4, 1, (0.62, 0.52), (-0.2, 0.1)),
           base_color=(0.9, 0.2, 0.3))
    particles, objects = sb.build(capacity=capacity)
    buf = wl.create(n_ticks, particles.capacity)
    p0 = particles.pos
    for k in range(n_ticks):
        t = k * H
        shifted = dataclasses.replace(particles, pos=p0 + particles.vel * t)
        buf = wl.push_frame(buf, shifted, time=t)
    return buf, particles, objects


def test_render_views_matches_single_camera_renders():
    buf, particles, objects = _history()
    w = h = 64
    cams = [
        Camera.create(pos=(0.5, 0.5), zoom=0.6),
        Camera.create(pos=(0.42, 0.55), zoom=0.4),
        Camera.create(pos=(0.6, 0.45), zoom=0.8, vel=(0.3, 0.0)),
    ]
    params = dataclasses.replace(
        PARAMS, cell_px=raytrace.auto_cell_px(PARAMS, w, h, 0.6)
    )
    batch = raytrace.render_views(
        buf, particles.object_index, objects, stack_cameras(cams), w, h,
        params,
    )
    assert batch.shape == (3, h, w, 3)
    for i, cam in enumerate(cams):
        single = raytrace.render_retarded(
            buf, particles.object_index, objects, cam, w, h, params
        )
        np.testing.assert_array_equal(np.asarray(batch[i]), np.asarray(single))


def test_render_views_boundary_and_planar():
    buf, particles, objects = _history()
    w = h = 48
    boundary = wl.boundary_mask(particles)
    cams = stack_cameras([
        Camera.create(pos=(0.5, 0.5), zoom=0.5),
        Camera.create(pos=(0.55, 0.5), zoom=0.5),
    ])
    params = dataclasses.replace(
        PARAMS, cell_px=raytrace.auto_cell_px(PARAMS, w, h, 0.5),
        retina_budget=2048,
    )
    batch = raytrace.render_views(
        buf, particles.object_index, objects, cams, w, h, params,
        planar=True, boundary=boundary,
    )
    assert batch.shape == (2, 3, h, w)
    single = raytrace.render_retarded(
        buf, particles.object_index, objects,
        Camera.create(pos=(0.55, 0.5), zoom=0.5), w, h, params,
        planar=True, boundary=boundary,
    )
    np.testing.assert_array_equal(np.asarray(batch[1]), np.asarray(single))


def test_engine_render_views():
    cfg = get_config("single_blob")
    cfg = dataclasses.replace(cfg, width=48, height=48, history=32)
    eng = Engine(cfg)
    for _ in range(3):
        eng.run_frame()
    cams = [eng.camera,
            Camera.create(pos=(0.52, 0.5), zoom=float(eng.camera.zoom))]
    batch = eng.render_views(cams)
    assert batch.shape == (2, 48, 48, 3)
    # view 0 is the engine's own camera: must match the engine's render()
    single = eng.render()
    np.testing.assert_array_equal(np.asarray(batch[0]), np.asarray(single))


def test_engine_render_views_rejects_curved_modes():
    cfg = get_config("single_blob")
    cfg = dataclasses.replace(cfg, width=32, height=32, history=16,
                              render_mode="points")
    eng = Engine(cfg)
    try:
        eng.render_views([eng.camera])
    except ValueError as e:
        assert "render_views" in str(e)
    else:
        raise AssertionError("expected ValueError for points mode")
