"""Aloofbody tests: contraction, trajectories, engine integration
(completes the reference stub: src/twoplusone/aloofbody/mod.rs)."""

import numpy as np

from spacetime_tpu.engine import Engine
from spacetime_tpu.models.aloofbody import (
    AloofBody,
    box_template,
    circular_trajectory,
    disc_template,
    linear_trajectory,
    text_template,
)
from spacetime_tpu.ops.raytrace import RenderParams
from spacetime_tpu.utils.config import EngineConfig, SceneSpec


def test_lorentz_contraction_along_motion():
    tpl = box_template(11, 11)
    body = AloofBody(tpl, linear_trajectory((0.0, 0.0), (0.8, 0.0)))
    pos, vel = body.state_at(0.0)
    # extents: x contracted by 1/gamma = 0.6, y unchanged
    ext_rest = tpl[:, 0].max() - tpl[:, 0].min()
    ext_x = pos[:, 0].max() - pos[:, 0].min()
    ext_y = pos[:, 1].max() - pos[:, 1].min()
    np.testing.assert_allclose(ext_x, 0.6 * ext_rest, rtol=1e-5)
    np.testing.assert_allclose(ext_y, ext_rest, rtol=1e-5)
    assert np.all(vel == np.float32([0.8, 0.0]))


def test_circular_trajectory_speed():
    body = AloofBody(disc_template(2), circular_trajectory((0.5, 0.5), 0.2, 0.4))
    for t in (0.0, 0.3, 0.7):
        pos, vel = body.state_at(t)
        np.testing.assert_allclose(np.linalg.norm(vel[0]), 0.4, rtol=1e-5)
        np.testing.assert_allclose(
            np.linalg.norm(pos.mean(0) - [0.5, 0.5]), 0.2, atol=2e-3
        )


def test_text_template_nonempty():
    pts = text_template("HI")
    assert pts.shape[0] > 10
    np.testing.assert_allclose(pts.mean(0), 0.0, atol=1e-6)


def test_engine_renders_aloofbody():
    cfg = EngineConfig(
        scene=SceneSpec(
            bodies=(("disc", 30, (0.42, 0.42), (0.0, 0.0), (0.2, 0.2, 1.0)),),
            capacity=256,
        ),
        render=RenderParams(num_rays=256),
        width=48,
        height=48,
        history=32,
        render_mode="instant",
        cam_zoom=0.3,  # 0.00625 ls/px: aloof at +0.05 -> ~8 px right of center
    )
    aloof = AloofBody(
        disc_template(2), linear_trajectory((0.55, 0.5), (0.0, 0.0)), object_index=5
    )
    eng = Engine(cfg, aloof_bodies=[aloof])
    img = None
    for _ in range(3):
        img = np.asarray(eng.run_frame())
    # aloof disc at (0.55, 0.5): right of center; default object color red
    right = img[:, 27:]
    red_px = (right[..., 0] > 0.5) & (right[..., 2] < 0.5)
    assert red_px.any()
    # softbody still rendered (left of center, blue-ish)
    assert (img[:, :24].min(-1) < 0.9).any()
    # aloof slots did not enter physics
    lo, hi = eng._aloof_slice
    assert not np.asarray(eng.particles.active)[lo:hi].any()
