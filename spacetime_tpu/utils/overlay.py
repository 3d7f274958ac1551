"""Stats overlay drawn onto outgoing frames.

The reference renders an egui "Debug UI" window on top of every swapchain
image: frame-duration minimum, last/average frame time, 1% and 0.1% lows,
the per-stage FramePerfStats, and the live max-FPS setting (reference:
src/debugui.rs:55-103, drawn onto the image at debugui.rs:110-121).  The
headless analog composites the same panel onto frames served over MJPEG
(`--serve`) or streamed from the viewer, so a browser shows the same live
diagnostics a windowed user would.

Text is rasterized with PIL's built-in bitmap font at 1x and
nearest-upscaled, so glyphs stay crisp at any scale and nothing here touches
the device: the overlay runs on the host copy that is already being encoded
to JPEG.
"""

from __future__ import annotations

from typing import Iterable, List

import numpy as np

# panel styling (egui's default dark theme, approximately)
_FG = np.array([230, 230, 230], dtype=np.uint16)
_HEADING = np.array([255, 214, 120], dtype=np.uint16)
_BG_ALPHA = 0.62
_PAD = 6


def _render_lines(lines: Iterable[str]) -> "tuple[np.ndarray, int]":
    """Rasterize text lines to ((H, W) uint8 mask, line height in px)
    using PIL's default bitmap font at 1x (upscaled by the caller)."""
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.load_default()
    lines = [ln if ln else " " for ln in lines]
    draw0 = ImageDraw.Draw(Image.new("L", (1, 1)))
    widths, heights = [], []
    for ln in lines:
        box = draw0.textbbox((0, 0), ln, font=font)
        widths.append(box[2])
        heights.append(box[3])
    line_h = max(heights) + 2
    img = Image.new("L", (max(widths) + 1, line_h * len(lines)))
    draw = ImageDraw.Draw(img)
    for i, ln in enumerate(lines):
        draw.text((0, i * line_h), ln, fill=255, font=font)
    return np.asarray(img), line_h


def draw_overlay(
    arr: np.ndarray,
    lines: List[str],
    origin=(8, 8),
    scale: int = 1,
    heading_rows: int = 1,
) -> np.ndarray:
    """Composite a stats panel onto a frame.

    `arr` is (H, W, 3) uint8 or float [0, 1]; returns a NEW uint8 array (the
    input is never mutated — it may be the engine's cached frame).  The first
    `heading_rows` lines are tinted like egui window titles; the panel is
    clipped to the frame, so tiny test frames just show a corner of it.
    """
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0.0, 1.0) * 255.0).astype(np.uint8)
    out = a.copy()
    mask, line_h = _render_lines(lines)
    if scale > 1:
        mask = np.kron(mask, np.ones((scale, scale), dtype=np.uint8))
        line_h *= scale
    y0, x0 = origin
    h = min(mask.shape[0] + 2 * _PAD, out.shape[0] - y0)
    w = min(mask.shape[1] + 2 * _PAD, out.shape[1] - x0)
    if h <= 0 or w <= 0:
        return out
    # darken the panel box (egui translucent window background)
    box = out[y0:y0 + h, x0:x0 + w, :].astype(np.uint16)
    out[y0:y0 + h, x0:x0 + w, :] = (box * int((1 - _BG_ALPHA) * 256) >> 8).astype(
        np.uint8
    )
    # alpha-blend the glyph mask, heading lines tinted
    mh = min(mask.shape[0], h - _PAD)
    mw = min(mask.shape[1], w - _PAD)
    if mh <= 0 or mw <= 0:
        return out
    m = mask[:mh, :mw, None].astype(np.uint16)
    color = np.broadcast_to(_FG, (mh, mw, 3)).copy()
    head_px = min(heading_rows * line_h, mh)
    color[:head_px] = _HEADING
    region = out[y0 + _PAD:y0 + _PAD + mh, x0 + _PAD:x0 + _PAD + mw, :].astype(
        np.uint16
    )
    blended = (region * (255 - m) + color * m) // 255
    out[y0 + _PAD:y0 + _PAD + mh, x0 + _PAD:x0 + _PAD + mw, :] = blended.astype(
        np.uint8
    )
    return out


def stats_lines(engine) -> List[str]:
    """The debug-UI panel text for one frame (reference: debugui.rs:64-83
    labels, plus the per-stage FramePerfStats display and render settings)."""
    s = engine.stats.summary()
    # same zero guard as the engine's own pacing loop
    max_fps = max(float(engine.hotswap["max_fps"]), 1e-3)
    lines = [
        "Profiling",
        f"Frame Duration Minimum: {1000.0 / max_fps:.2f}ms (max fps {max_fps:.0f})",
        f"Last Frame Time: {s.get('frame_last_ms', 0.0):.2f}ms",
        f"Average: {s.get('frame_avg_ms', 0.0):.2f}ms"
        f" ({s.get('fps_avg', 0.0):.1f} fps)",
        f"1% low: {s.get('low_1pct_ms', 0.0):.2f}ms"
        f"   0.1% low: {s.get('low_01pct_ms', 0.0):.2f}ms",
    ]
    # per-stage attribution: host-timed splits in stage_timing mode,
    # profiler-derived device spans on the fused path (querybank.rs analog)
    stage = {
        k.removesuffix("_avg_ms").removesuffix("_dev_ms"): v
        for k, v in s.items()
        if (k.endswith("_avg_ms") or k.endswith("_dev_ms")) and not k.startswith("frame")
    }
    parts = [
        f"{name} {stage[name]:.2f}ms"
        for name in ("step", "worldline", "render")
        if stage.get(name)
    ]
    if parts:
        lines.append("Stages: " + "  ".join(parts))
    # active-count readback is a blocking device->host transfer of the full
    # mask; the count changes rarely (bond breaking only detaches, never
    # deactivates) — cache and refresh every 30 frames to keep it out of
    # the per-frame hot loop
    cache = getattr(engine, "_overlay_nactive", None)
    if cache is None or engine.frame - cache[0] >= 30:
        cache = (engine.frame, int(np.asarray(engine.particles.active).sum()))
        engine._overlay_nactive = cache
    n = cache[1]
    lines.append(
        f"frame {engine.frame}  particles {n}  mode {engine.config.render_mode}"
        + ("  [paused]" if engine.paused else "")
    )
    return lines


def overlay_stats(arr: np.ndarray, engine, scale: int = 1) -> np.ndarray:
    """One-call helper: frame + engine -> frame with the debug panel."""
    return draw_overlay(arr, stats_lines(engine), scale=scale)
