"""Retina view tests: aberration compresses the forward view; Doppler boost.
(BASELINE config 4: beaming + headlight effect for a moving observer.)"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from spacetime_tpu import scene
from spacetime_tpu.camera import Camera
from spacetime_tpu.ops import raytrace
from spacetime_tpu.ops import worldline as wl

H = 0.005
PARAMS = raytrace.RenderParams(dt=H, num_rays=512)


def _static_ring_buffer(n_ticks=128):
    """A ring of small blobs around the origin (static), so the panorama has
    structure at every angle."""
    sb = scene.SceneBuilder()
    for i, ang in enumerate(np.linspace(0, 2 * np.pi, 8, endpoint=False)):
        sb.add(
            scene.disc_softbody(
                2, i % 2, (0.3 * np.cos(ang), 0.3 * np.sin(ang)), (0.0, 0.0)
            ),
            base_color=(0.2, 0.9, 0.3) if i % 2 == 0 else (0.9, 0.3, 0.2),
        )
    particles, objects = sb.build(capacity=512)
    buf = wl.create(n_ticks, particles.capacity)
    for k in range(n_ticks):
        buf = wl.push_frame(buf, particles, time=k * H)
    return buf, particles, objects


def _strip(buf, particles, objects, cam):
    img = raytrace.render_retina(
        buf, particles.object_index, objects, cam, PARAMS, height=4
    )
    return np.asarray(img)[0]  # (R, 3)


def test_static_camera_sees_ring():
    buf, particles, objects = _static_ring_buffer()
    cam = Camera.create(pos=(0.0, 0.0), zoom=1.0)
    strip = _strip(buf, particles, objects, cam)
    hit = strip.min(-1) < 0.9
    # 8 blobs -> 8 distinct hit runs around the panorama
    runs = np.sum(hit & ~np.roll(hit, 1))
    assert runs == 8, runs


def test_aberration_compresses_forward_view():
    """A fast camera sees MORE of the scene bunched toward its motion
    direction: hit pixels concentrate in the forward hemisphere."""
    buf, particles, objects = _static_ring_buffer()
    cam = Camera.create(pos=(0.0, 0.0), zoom=1.0, vel=(0.8, 0.0))
    strip = _strip(buf, particles, objects, cam)
    hit = strip.min(-1) < 0.9
    n = len(hit)
    theta = -np.pi + (np.arange(n) + 0.5) * 2 * np.pi / n
    # count IMAGE POSITIONS (run starts): the isotropic 8-blob ring should
    # appear mostly in the forward hemisphere for a fast camera (each image
    # also subtends less angle — solid-angle compression — so pixel-count
    # fractions are the wrong metric)
    runs = np.nonzero(hit & ~np.roll(hit, 1))[0]
    fwd_images = int(np.sum(np.abs(theta[runs]) < np.pi / 2))
    assert len(runs) >= 6
    assert fwd_images >= len(runs) - 2, (fwd_images, len(runs), theta[runs])


def test_forward_blueshift_for_moving_camera():
    buf, particles, objects = _static_ring_buffer()
    cam = Camera.create(pos=(0.0, 0.0), zoom=1.0, vel=(0.6, 0.0))
    strip = _strip(buf, particles, objects, cam)
    n = len(strip)
    theta = -np.pi + (np.arange(n) + 0.5) * 2 * np.pi / n
    hit = strip.min(-1) < 0.9
    fwd = hit & (np.abs(theta) < np.pi / 4)
    back = hit & (np.abs(theta) > 3 * np.pi / 4)
    assert fwd.any() and back.any()
    # forward hits brighter than backward (headlight boost D^3)
    assert strip[fwd].sum(-1).mean() > strip[back].sum(-1).mean() * 1.3
