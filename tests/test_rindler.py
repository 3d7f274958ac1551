"""Rindler-horizon demo config: events beyond c^2/a behind an accelerating
camera freeze at a finite retarded time."""

import dataclasses

import numpy as np

from spacetime_tpu.engine import Engine
from spacetime_tpu.utils.config import get_config


def _retarded_time(eng, point):
    cam = np.asarray(eng.camera.pos)
    return eng.time - float(np.linalg.norm(cam - np.asarray(point)))


def test_trailing_retarded_time_converges_leading_diverges():
    cfg = get_config("rindler_horizon")
    eng = Engine(dataclasses.replace(cfg, width=32, height=32, history=32))
    behind, ahead = (-0.45, 0.42), (0.85, 0.42)
    dt = cfg.physics.h

    t_behind, t_ahead = [], []
    # integrate the camera kinematics alone (no rendering needed): ~4 s of
    # proper time, far past the 1/a = 0.5 s horizon timescale
    for _ in range(800):
        eng.update_camera_kinematics(dt)
        eng.time += dt
        t_behind.append(_retarded_time(eng, behind))
        t_ahead.append(_retarded_time(eng, ahead))

    tb = np.asarray(t_behind)
    ta = np.asarray(t_ahead)
    # trailing blob: retarded time converges (horizon) — late increments
    # vanish and the total late-time drift is tiny
    late = np.diff(tb[-200:])
    assert np.all(np.abs(late) < 1e-4)
    # (camera is at ~0.992c after 4 s; the residual drift rate is 1 - v)
    assert tb[-1] - tb[-200] < 0.02
    # the horizon sits at c^2/a = 0.5 ls: the frozen retarded time is finite
    # and bounded by the photon-launch window
    assert tb[-1] < 1.0
    # leading blob: while the camera still approaches it (first 0.75 s,
    # before the flyby) its retarded time advances FASTER than coordinate
    # time — no horizon in front
    assert ta[149] - ta[0] > 0.745  # > the 0.745 s of coordinate time
    assert ta[-1] > tb[-1] + 1.0


def test_rindler_config_renders():
    cfg = get_config("rindler_horizon")
    # keep the config's long history: the blobs sit ~0.9 ls out, so their
    # retarded light needs ~180 ticks of (prefilled) history to exist
    eng = Engine(dataclasses.replace(cfg, width=64, height=32, history=256))
    img = None
    for _ in range(3):
        img = eng.run_frame()
    arr = np.asarray(img)
    assert arr.shape[-1] == 3
    # both blobs visible at start (trailing blob's pre-horizon light)
    assert (arr.min(-1) < 0.9).sum() > 0
