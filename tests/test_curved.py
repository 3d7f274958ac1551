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
