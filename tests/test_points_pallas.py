"""Parity tests for the Pallas point rasterizer (interpret mode on CPU)
against the XLA scatter path (ops/rasterize.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spacetime_tpu import scene
from spacetime_tpu.camera import Camera, world_to_pixel
from spacetime_tpu.ops import points_pallas, rasterize


def _scene(n_bodies=2, seed=0):
    sb = scene.SceneBuilder()
    rng = np.random.default_rng(seed)
    for i in range(n_bodies):
        c = tuple(rng.uniform(0.2, 0.8, 2))
        sb.add(
            scene.disc_softbody(5, i, c, (0.05, -0.02)),
            base_color=tuple(rng.uniform(0.1, 1.0, 3)),
        )
    return sb.build()


def _winners(particles, objects, cam, w, h):
    """Per covered pixel, the set of particle colors landing there."""
    px = np.asarray(world_to_pixel(particles.pos, w, h, cam))
    xi = np.round(px[:, 0]).astype(int)
    yi = np.round(px[:, 1]).astype(int)
    act = np.asarray(particles.active)
    colors = np.asarray(objects.base_color)[np.asarray(particles.object_index)]
    table = {}
    for i in range(len(xi)):
        if act[i] and 0 <= xi[i] < w and 0 <= yi[i] < h:
            table.setdefault((yi[i], xi[i]), []).append(colors[i])
    return table


@pytest.mark.parametrize("wh", [(256, 128), (200, 100), (130, 50)])
def test_matches_scatter_renderer(wh):
    w, h = wh
    particles, objects = _scene()
    cam = Camera.create(pos=(0.5, 0.5), zoom=1.2)
    ref = np.asarray(
        rasterize.render_points(particles, objects, cam, w, h)
    )
    img, diag = points_pallas.render_points_pallas(
        particles, objects, cam, w, h, interpret=True
    )
    img = np.asarray(img)
    assert img.shape == (h, w, 3)
    assert int(diag.window_truncated) == 0

    table = _winners(particles, objects, cam, w, h)
    # coverage must match the scatter renderer exactly
    cov_ref = np.any(ref != 1.0, axis=-1) | np.array(
        [[(y, x) in table for x in range(w)] for y in range(h)]
    )
    cov = np.any(img != 1.0, axis=-1)
    # white-colored objects would foil the != 1.0 test; colors here aren't 1
    np.testing.assert_array_equal(cov, np.array(
        [[(y, x) in table for x in range(w)] for y in range(h)]
    ))
    assert cov_ref.sum() == cov.sum()
    # every covered pixel shows ONE of the particles that landed there
    # (stable sort -> lowest index; scatter -> last index: both valid)
    for (y, x), cands in table.items():
        assert any(
            np.allclose(img[y, x], c, atol=1e-6) for c in cands
        ), (y, x)


def test_exact_on_unique_pixels():
    """With no overlapping pixels both renderers must agree exactly."""
    particles, objects = _scene(1)
    cam = Camera.create(pos=(0.5, 0.5), zoom=3.0)  # zoomed: spread out
    w, h = 256, 256
    table = _winners(particles, objects, cam, w, h)
    if any(len(v) > 1 for v in table.values()):
        pytest.skip("scene produced overlaps at this zoom")
    ref = np.asarray(rasterize.render_points(particles, objects, cam, w, h))
    img, _ = points_pallas.render_points_pallas(
        particles, objects, cam, w, h, interpret=True
    )
    np.testing.assert_allclose(np.asarray(img), ref, atol=1e-6)


def test_inactive_and_offscreen_excluded():
    particles, objects = _scene(1)
    # deactivate half; camera shifted so some points fall off-screen
    import dataclasses

    act = np.asarray(particles.active).copy()
    act[: len(act) // 2] = False
    particles = dataclasses.replace(particles, active=jnp.asarray(act))
    cam = Camera.create(pos=(0.9, 0.9), zoom=2.0)
    w, h = 128, 64
    ref = np.asarray(rasterize.render_points(particles, objects, cam, w, h))
    img, _ = points_pallas.render_points_pallas(
        particles, objects, cam, w, h, interpret=True
    )
    cov_ref = np.any(ref != 1.0, axis=-1)
    cov = np.any(np.asarray(img) != 1.0, axis=-1)
    np.testing.assert_array_equal(cov, cov_ref)


def test_truncation_diag_fires():
    # zoomed way out: every particle lands in a handful of pixels of one
    # tile, so a 1-chunk (256-entry) window cap must drop entries
    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(12, 0, (0.5, 0.5), (0.0, 0.0)))
    particles, objects = sb.build()
    # zoom 2.0 at 256 px: the whole ~440-particle disc lands on a few
    # pixels of one tile, far beyond a 1-chunk (256-entry) window cap
    cam = Camera.create(pos=(0.5, 0.5), zoom=2.0)
    img, diag = points_pallas.render_points_pallas(
        particles, objects, cam, 256, 128, G=1, wmax=1, interpret=True
    )
    assert int(diag.window_truncated) > 0


def test_sentinels_not_truncated():
    """Inactive/offscreen sentinels must sort past the LAST padded group's
    window (regression: sentinel = n_tiles*1024 landed inside it and 98k
    inactive slots at the 116k demo were reported as truncation)."""
    import dataclasses

    particles, objects = _scene(1)
    # half inactive + a camera that pushes some actives offscreen; a
    # non-multiple-of-G tile count so the last group IS padded
    act = np.asarray(particles.active).copy()
    act[: len(act) // 2] = False
    particles = dataclasses.replace(particles, active=jnp.asarray(act))
    cam = Camera.create(pos=(0.95, 0.95), zoom=1.0)
    w, h = 3 * 128, 5 * 8  # 15 tiles, G=4 -> n_inst=4, last group 3 tiles
    img, diag = points_pallas.render_points_pallas(
        particles, objects, cam, w, h, G=4, wmax=96, interpret=True
    )
    assert int(diag.window_truncated) == 0
    ref = np.asarray(rasterize.render_points(particles, objects, cam, w, h))
    np.testing.assert_array_equal(
        np.any(np.asarray(img) != 1.0, axis=-1), np.any(ref != 1.0, axis=-1)
    )


def test_planar_layout():
    particles, objects = _scene(1)
    cam = Camera.create(pos=(0.5, 0.5), zoom=1.2)
    a, _ = points_pallas.render_points_pallas(
        particles, objects, cam, 128, 64, interpret=True
    )
    b, _ = points_pallas.render_points_pallas(
        particles, objects, cam, 128, 64, interpret=True, planar=True
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b).transpose(1, 2, 0))
