"""Stats-overlay tests (the egui debug-panel analog, utils/overlay.py;
reference: src/debugui.rs:55-103 draws profiling text over every frame)."""

import numpy as np

from spacetime_tpu.engine import Engine
from spacetime_tpu.ops.raytrace import RenderParams
from spacetime_tpu.utils.config import EngineConfig, SceneSpec
from spacetime_tpu.utils.overlay import draw_overlay, overlay_stats, stats_lines


def _engine():
    return Engine(
        EngineConfig(
            scene=SceneSpec(
                bodies=(("disc", 50, (0.45, 0.45), (0.1, 0.0), (0.2, 0.2, 1.0)),),
                capacity=256,
            ),
            render=RenderParams(num_rays=128),
            width=200,
            height=160,
            history=32,
            render_mode="points",
        )
    )


def test_draw_overlay_pixels():
    frame = np.full((120, 320, 3), 128, np.uint8)
    out = draw_overlay(frame, ["Profiling", "Average: 1.23ms"])
    assert out.dtype == np.uint8 and out.shape == frame.shape
    # input untouched (it may be the engine's cached frame)
    assert (frame == 128).all()
    # panel background darkened where the box sits
    assert out[10, 10].max() < 128
    # glyph pixels brighter than the darkened panel
    assert out[8:40, 8:300].max() > 180
    # pixels outside the panel untouched
    assert (out[-10:, -10:] == 128).all()


def test_draw_overlay_float_input_and_clipping():
    frame = np.full((24, 32, 3), 0.5, np.float32)
    out = draw_overlay(frame, ["a long line that does not fit the tiny frame"])
    assert out.dtype == np.uint8 and out.shape == (24, 32, 3)
    # clipped panel still darkens the visible corner, no exception
    assert out[10, 10].max() < 127


def test_stats_lines_fields():
    eng = _engine()
    eng.run_frame()
    lines = stats_lines(eng)
    text = "\n".join(lines)
    # the reference debug panel's labels (debugui.rs:64-83)
    for label in ("Profiling", "Frame Duration Minimum", "Last Frame Time",
                  "Average", "1% low", "0.1% low"):
        assert label in text, label
    assert "particles 49" in text  # disc packing yields 49 from a 50 request
    assert "mode points" in text
    eng.paused = True
    assert "[paused]" in "\n".join(stats_lines(eng))


def test_overlay_stats_on_engine_frame():
    eng = _engine()
    img = eng.run_frame()
    arr = np.asarray(img)
    out = overlay_stats(arr, eng)
    assert out.shape == (160, 200, 3) and out.dtype == np.uint8
    base = np.asarray(arr)
    if base.dtype != np.uint8:
        base = (np.clip(base, 0, 1) * 255).astype(np.uint8)
    assert (out != base).any()  # the panel changed pixels
    assert (out[-5:, -5:] == base[-5:, -5:]).all()  # bottom-right untouched
