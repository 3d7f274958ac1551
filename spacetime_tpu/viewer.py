"""Optional interactive viewer.

The reference is an interactive winit window with an egui stats overlay and
WASD/zx/p controls (reference: src/main.rs, src/debugui.rs, src/keyboard.rs).
This headless-first engine exposes the same interaction surface through a
matplotlib window when a display is available; otherwise use the CLI's PNG
streaming plus the native frame sink.

Controls (matching reference keyboard.rs): a/d/w/s pan, z/x zoom, p pause,
q quit.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .engine import Engine


def run_viewer(engine: Engine, max_frames: Optional[int] = None) -> None:
    """Interactive loop; requires a GUI-capable matplotlib backend."""
    import matplotlib

    try:
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 8))
        fig.canvas.manager.set_window_title("spacetime_tpu")
    except Exception as exc:  # headless box
        raise RuntimeError(
            "no interactive display available; use `python -m spacetime_tpu "
            "--out DIR` to stream PNG frames instead"
        ) from exc

    keys = {}

    def on_key(event, down):
        if event.key in ("a",):
            keys["left"] = down
        elif event.key in ("d",):
            keys["right"] = down
        elif event.key in ("w",):
            keys["up"] = down
        elif event.key in ("s",):
            keys["down"] = down
        elif event.key in ("z", "x"):
            keys[event.key] = down
        elif event.key == "p" and down:
            keys["p"] = True
        elif event.key == "q" and down:
            keys["quit"] = True

    fig.canvas.mpl_connect("key_press_event", lambda e: on_key(e, True))
    fig.canvas.mpl_connect("key_release_event", lambda e: on_key(e, False))

    img = engine.run_frame()
    im = ax.imshow(np.asarray(img))
    ax.set_axis_off()
    title = ax.set_title("")
    plt.ion()
    plt.show()

    frame = 0
    while not keys.get("quit"):
        img = engine.run_frame(keys=dict(keys))
        keys.pop("p", None)
        im.set_data(np.asarray(img))
        summary = engine.stats.summary()
        title.set_text(
            f"frame {engine.frame}  {summary.get('fps_avg', 0):.1f} fps avg  "
            f"1% low {summary.get('low_1pct_ms', 0):.1f} ms"
            + ("  [paused]" if engine.paused else "")
        )
        fig.canvas.draw_idle()
        plt.pause(max(0.001, 1.0 / engine.config.max_fps))
        frame += 1
        if max_frames is not None and frame >= max_frames:
            break
