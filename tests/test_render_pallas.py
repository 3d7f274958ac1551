"""Pallas pixel-pass kernel parity vs the XLA block-map path.

The two backends implement the same math (occupancy, first-min winner,
Doppler/beaming shading, retina occlusion, composition) over the same
candidate tables, so images must match to float tolerance in every mode
(SURVEY.md §4: interpret-mode testing strategy)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from spacetime_tpu import scene
from spacetime_tpu.camera import Camera
from spacetime_tpu.models.softbody import SoftbodyModel
from spacetime_tpu.ops import raytrace as rt
from spacetime_tpu.ops import worldline as wl


@pytest.fixture(scope="module")
def small_scene():
    sb = scene.SceneBuilder()
    sb.add(scene.disc_softbody(6, 0, (0.40, 0.42), (0.3, 0.1)),
           base_color=(0.25, 0.35, 1.0))
    sb.add(scene.disc_softbody(6, 1, (0.60, 0.55), (-0.3, -0.1)),
           base_color=(1.0, 0.3, 0.25))
    p, objects = sb.build(capacity=256)
    model = SoftbodyModel(capacity=p.capacity)
    buf = wl.create(64, p.capacity)
    t = 0.0
    for _ in range(40):
        p, _ = model.step(p)
        t += model.params.h
        buf = wl.push_frame(buf, p, jnp.float32(t))
    cam = Camera.create(pos=(0.5, 0.5), zoom=0.6, vel=(0.1, 0.05))
    return p, objects, model, buf, cam


@pytest.mark.parametrize(
    "opaque,retarded", [(True, True), (False, True), (True, False)]
)
def test_pallas_kernel_matches_xla(small_scene, opaque, retarded):
    p, objects, model, buf, cam = small_scene
    base = rt.RenderParams(
        dt=model.params.h, num_rays=512, bin_capacity=32, cell_px=16,
        pair_budget=0, opaque=opaque, retarded=retarded,
    )
    img_x = rt.render_retarded(
        buf, p.object_index, objects, cam, 64, 64,
        dataclasses.replace(base, backend="xla"),
    )
    img_p = rt.render_retarded(
        buf, p.object_index, objects, cam, 64, 64,
        dataclasses.replace(base, backend="pallas_interpret"),
    )
    assert img_p.shape == img_x.shape == (64, 64, 3)
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_x), atol=1e-5
    )


def test_pallas_kernel_odd_cell_px(small_scene):
    """The kernel handles non-power-of-two cell sizes (k2 = full-dim)."""
    p, objects, model, buf, cam = small_scene
    base = rt.RenderParams(
        dt=model.params.h, num_rays=512, bin_capacity=32, cell_px=9,
        pair_budget=0,
    )
    img_x = rt.render_retarded(
        buf, p.object_index, objects, cam, 63, 45,
        dataclasses.replace(base, backend="xla"),
    )
    img_p = rt.render_retarded(
        buf, p.object_index, objects, cam, 63, 45,
        dataclasses.replace(base, backend="pallas_interpret"),
    )
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_x), atol=1e-5
    )

