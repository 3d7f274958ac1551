"""Optional interactive viewer.

The reference is an interactive winit window with an egui stats overlay and
WASD/zx/p controls plus a live-editable max-FPS setting (reference:
src/main.rs, src/debugui.rs:9-23 HotswapConfig, src/keyboard.rs).  This
headless-first engine exposes the same interaction surface through a
matplotlib window when a display is available; otherwise use the CLI's PNG
streaming plus the native frame sink.

Controls (matching reference keyboard.rs, plus hotswap keys):
  a/d/w/s pan, z/x zoom, p pause, q quit,
  +/- raise/lower the live max-FPS target (debugui.rs:89-101 analog),
  [/] and {/} spin the 3D spacetime view (worldline3d mode only),
  o toggle the camera-frame (boosted observer) map view (retarded mode).

`run_viewer(engine, max_frames=N, script=fn, show=False)` drives the same
loop headlessly (Agg backend) — the scripted-key test path.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from .engine import Engine


def apply_key(keys: dict, engine: Engine, key: Optional[str], down: bool) -> None:
    """Map one key event into the engine's key dict / hotswap settings
    (reference: keyboard.rs:3-45 booleans + debugui.rs editable max-FPS).
    Accepts matplotlib names ('a', 'left') and browser KeyboardEvent.key
    names ('ArrowLeft') — the HTTP stream's /key endpoint forwards the
    latter verbatim (utils/streamsink.py poll_keys)."""
    if key in ("a", "left", "ArrowLeft"):
        keys["left"] = down
    elif key in ("d", "right", "ArrowRight"):
        keys["right"] = down
    elif key in ("w", "up", "ArrowUp"):
        keys["up"] = down
    elif key in ("s", "down", "ArrowDown"):
        keys["down"] = down
    elif key in ("z", "x"):
        keys[key] = down
    elif key == "p" and down:
        keys["p"] = True
    elif key == "q" and down:
        keys["quit"] = True
    elif key in ("+", "=") and down:
        engine.hotswap["max_fps"] = min(engine.hotswap["max_fps"] * 1.25, 1000.0)
    elif key == "-" and down:
        engine.hotswap["max_fps"] = max(engine.hotswap["max_fps"] / 1.25, 1.0)
    elif (key == "o" and down and engine.config.render_mode == "retarded"
          and engine.config.render.retarded):
        # camera-frame (boosted observer) map view toggle (ops/boost.py).
        # Part of the static RenderParams -> keyed into the fused cache, so
        # flipping back reuses the previously compiled program.
        import dataclasses

        r = engine.config.render
        engine.config = dataclasses.replace(
            engine.config,
            render=dataclasses.replace(r, camera_frame=not r.camera_frame),
        )
    elif (key in ("[", "]", "{", "}") and down
          and engine.config.render_mode == "worldline3d"):
        # spin the 3D spacetime view: azimuth [ ], elevation { }.  The view
        # params bake into the compiled frame and are part of the fused-
        # cache key — so angles are SNAPPED to exact step multiples and
        # azimuth wraps mod 2pi: after a full turn (or any backtrack) the
        # value repeats bit-exactly and the cached program is reused instead
        # of recompiling on every keypress.
        import dataclasses
        import math

        az_step, el_step = 0.2, 0.15

        def _snap(x, step):
            return round(round(x / step) * step, 10)

        w = engine.config.wl3d
        if key in ("[", "]"):
            az = w.azimuth + (az_step if key == "]" else -az_step)
            w = dataclasses.replace(
                w, azimuth=_snap(az % (2 * math.pi), az_step))
        elif key == "{":
            w = dataclasses.replace(
                w, elevation=_snap(max(w.elevation - el_step, 0.0), el_step))
        else:
            w = dataclasses.replace(
                w, elevation=_snap(min(w.elevation + el_step, math.pi / 2),
                                   el_step))
        engine.config = dataclasses.replace(engine.config, wl3d=w)


def run_viewer(
    engine: Engine,
    max_frames: Optional[int] = None,
    script: Optional[Callable[[int], list]] = None,
    show: bool = True,
    stream_port: Optional[int] = None,
    stream_bind: str = "127.0.0.1",
    overlay: bool = True,
) -> int:
    """Interactive loop; requires a GUI-capable matplotlib backend unless
    `show=False` (Agg).  `script(frame) -> [(key, down), ...]` injects
    synthetic key events each frame (headless testing/demos).
    `stream_port` additionally serves the live view as MJPEG over HTTP
    (utils/streamsink.py; 0 = any free port).  Returns the number of frames
    rendered."""
    try:
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 8))
        if show:
            fig.canvas.manager.set_window_title("spacetime_tpu")
    except Exception as exc:  # headless box without Agg either
        raise RuntimeError(
            "no matplotlib backend available; use `python -m spacetime_tpu "
            "--out DIR` to stream PNG frames instead"
        ) from exc

    keys: dict = {}

    def on_key(event, down):
        apply_key(keys, engine, event.key, down)

    fig.canvas.mpl_connect("key_press_event", lambda e: on_key(e, True))
    fig.canvas.mpl_connect("key_release_event", lambda e: on_key(e, False))

    stream = None
    img = engine.run_frame()
    arr0 = np.asarray(img)
    if stream_port is not None:
        from .utils.streamsink import StreamSink

        stream = StreamSink(stream_port, arr0.shape[1], arr0.shape[0],
                            bind=stream_bind)
        # non-loopback binds get an auto key token (utils/streamsink.py):
        # /key steers the engine, so the URL must carry the shared secret
        tok = f"?t={stream.key_token}" if stream.key_token else ""
        print(f"# live view: http://{stream_bind}:{stream.port}/{tok}")
    im = ax.imshow(arr0)
    ax.set_axis_off()
    title = ax.set_title("")
    if show:
        plt.ion()
        plt.show()

    frame = 0
    try:  # the stream server/figure must be torn down even if a frame raises
        while not keys.get("quit"):
            if script is not None:
                for key, down in script(frame):
                    apply_key(keys, engine, key, down)
            img = engine.run_frame(keys=dict(keys))
            keys.pop("p", None)
            arr = np.asarray(img)
            if stream is not None:
                if overlay:  # the egui debug panel analog (utils/overlay.py)
                    from .utils.overlay import overlay_stats

                    stream.submit(overlay_stats(arr, engine))
                else:
                    stream.submit(arr)
            im.set_data(arr)
            summary = engine.stats.summary()
            title.set_text(
                f"frame {engine.frame}  {summary.get('fps_avg', 0):.1f} fps avg  "
                f"1% low {summary.get('low_1pct_ms', 0):.1f} ms  "
                f"max_fps {engine.hotswap['max_fps']:.0f}"
                + ("  [paused]" if engine.paused else "")
            )
            fig.canvas.draw_idle()
            if show:
                plt.pause(max(0.001, 1.0 / engine.hotswap["max_fps"]))
            frame += 1
            if max_frames is not None and frame >= max_frames:
                break
    finally:
        plt.close(fig)
        if stream is not None:
            stream.close()
    return frame
