"""Parity: the fused Pallas band-search/window kernel (ops/band_pallas.py,
interpret mode on CPU) vs the XLA dense cone sweep."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from spacetime_tpu import scene
from spacetime_tpu.camera import Camera
from spacetime_tpu.models.softbody import SoftbodyModel
from spacetime_tpu.ops import raytrace
from spacetime_tpu.ops import worldline as wl


def _setup(history=128, capacity=512):
    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(5, 0, (0.42, 0.48), (0.12, 0.05),
                               lattice_pad=True), base_color=(0, 0, 1))
    sb.add(scene.disc_softbody(4, 1, (0.62, 0.55), (-0.1, 0.0),
                               lattice_pad=True), base_color=(1, 0, 0))
    particles, objects = sb.build(capacity=capacity)
    model = SoftbodyModel(capacity=capacity, use_pallas=False)
    buf = wl.create(history, capacity)
    buf = wl.prefill_inertial(
        buf, particles.pos, particles.vel, particles.active,
        jnp.float32(0.0), jnp.float32(model.params.h),
    )
    t = 0.0
    p = particles
    for _ in range(7):  # advance so the ring cursor wraps off the prefill
        p, _ = model.step(p)
        t += model.params.h
        buf = wl.push_frame(buf, p, t)
    return p, objects, buf


def test_band_kernel_matches_xla_sweep(monkeypatch):
    p, objects, buf = _setup()
    cam = Camera.create(pos=(0.5, 0.5), zoom=0.6)
    t_now = buf.times[buf.cursor]
    base = raytrace.RenderParams(band=6, max_age=128, band_kernel=True)

    # guard against silent fallback: the kernel branch must actually engage
    from spacetime_tpu.ops import band_pallas

    calls = []
    orig = band_pallas.cone_band_window_pallas
    monkeypatch.setattr(
        band_pallas, "cone_band_window_pallas",
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1],
    )

    pairs_x, trunc_x, _ = raytrace._band_pairs(
        buf, p.object_index, objects, cam, t_now, 64, 64,
        dataclasses.replace(base, backend="xla"),
    )
    pairs_k, trunc_k, _ = raytrace._band_pairs(
        buf, p.object_index, objects, cam, t_now, 64, 64,
        dataclasses.replace(base, backend="pallas_interpret"),
    )
    assert calls, "Pallas band kernel was not engaged (gating fell back)"
    assert int(trunc_x) == int(trunc_k)
    vx = np.asarray(pairs_x.pair_valid)
    vk = np.asarray(pairs_k.pair_valid)
    np.testing.assert_array_equal(vx, vk)
    assert vx.sum() > 0, "scene must produce cone crossings"
    px = np.asarray(pairs_x.pdata)
    pk = np.asarray(pairs_k.pdata)
    np.testing.assert_allclose(px[vx], pk[vx], rtol=1e-6, atol=1e-7)


def test_band_kernel_partial_history_ramp():
    """Fresh ring without full prefill: frames_in_use < capacity exercises
    the hi0 clamp identically on both paths."""
    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(4, 0, (0.48, 0.5), (0.1, 0.0),
                               lattice_pad=True), base_color=(0, 0, 1))
    particles, objects = sb.build(capacity=256)
    model = SoftbodyModel(capacity=256, use_pallas=False)
    buf = wl.create(128, 256)
    t = 0.0
    p = particles
    for _ in range(21):
        p, _ = model.step(p)
        t += model.params.h
        buf = wl.push_frame(buf, p, t)
    cam = Camera.create(pos=(0.52, 0.5), zoom=0.3)
    t_now = buf.times[buf.cursor]
    base = raytrace.RenderParams(band=4, max_age=128, band_kernel=True)
    pairs_x, _, _sd = raytrace._band_pairs(
        buf, p.object_index, objects, cam, t_now, 48, 48,
        dataclasses.replace(base, backend="xla"),
    )
    pairs_k, _, _sd2 = raytrace._band_pairs(
        buf, p.object_index, objects, cam, t_now, 48, 48,
        dataclasses.replace(base, backend="pallas_interpret"),
    )
    vx = np.asarray(pairs_x.pair_valid)
    np.testing.assert_array_equal(vx, np.asarray(pairs_k.pair_valid))
    assert vx.sum() > 0
    np.testing.assert_allclose(
        np.asarray(pairs_x.pdata)[vx], np.asarray(pairs_k.pdata)[vx],
        rtol=1e-6, atol=1e-7,
    )
