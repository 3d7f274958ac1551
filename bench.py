"""Headline benchmark: 10k-particle softbody step + 1080p retarded-time
render, fused, on one chip (BASELINE.json config 3 / north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured fps / 60 (the north-star target: >= 60 fps for
step + 1080p retarded render on a single v5e — the reference publishes no
numbers of its own, BASELINE.md).

Extra sub-metrics (steps/sec physics only, Mrays/sec) go to stderr.

Replay-driven A/B regression harness (VERDICT r2 #9):
    python bench.py --record s.jsonl [--config NAME] [--frames N]
        record a deterministic scripted session + write s.jsonl.perf.json
    python bench.py --replay s.jsonl
        re-drive the EXACT recorded inputs (bit-reproducible on one
        backend), print one JSON perf line, write s.jsonl.perf.json
    python bench.py --diff a.perf.json b.perf.json
        CI-style JSON diff (pct deltas + regression flag)
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def build():
    from spacetime_tpu import scene
    from spacetime_tpu.camera import Camera
    from spacetime_tpu.models.softbody import SoftbodyModel
    from spacetime_tpu.ops import raytrace
    from spacetime_tpu.ops import worldline as wl

    width, height = 1920, 1080
    history = 1024

    sb = scene.SceneBuilder()
    # lattice_pad: regular neighbor offsets -> shifted-slice springs (see
    # ops/forces.spring_forces_shifted); costs ~1.25x capacity in dead slots
    sb.add(
        scene.disc_softbody(scene.radius_for_count(5000), 0, (0.35, 0.40), (0.25, 0.05),
                            lattice_pad=True),
        base_color=(0.25, 0.35, 1.0),
    )
    sb.add(
        scene.disc_softbody(scene.radius_for_count(5000), 1, (1.05, 0.55), (-0.25, -0.05),
                            lattice_pad=True),
        base_color=(1.0, 0.3, 0.25),
    )
    particles, objects = sb.build()
    from spacetime_tpu.ops import forces as forces_ops
    import numpy as _np

    model = SoftbodyModel(
        capacity=particles.capacity,
        spring_offsets=forces_ops.derive_spring_offsets(
            _np.asarray(particles.neighbors)
        ),
    )
    # prefill the FULL history so the renderer sees a fully-lit light cone —
    # an empty ring would make the render trivially cheap (and wrong to bench)
    buf = wl.create(history, particles.capacity)
    buf = wl.prefill_inertial(
        buf, particles.pos, particles.vel, particles.active,
        jnp.float32(0.0), jnp.float32(model.params.h),
    )
    cam = Camera.create(pos=(0.7, 0.5), zoom=1.2)
    # cell_px=16 (vs the minimal 9) trades more candidate tests for Pallas
    # kernel layouts that tile exactly: k2=256 sublanes, 120 cells/row on one
    # 128-lane grid step (see ops/render_pallas.py); bin_dropped stays 0
    params = raytrace.RenderParams(
        dt=model.params.h, num_rays=4096, pair_budget=32768, bin_capacity=64,
        cell_px=16, occlusion_downsample=2, ray_chunk=8192,
        retina_budget=8192, max_age=160,  # view corner 0.69 ls = 138 ticks
        # 111k valid splat entries measured at frame 120 (18% headroom);
        # without the slice the bin scatter + splat sort run over the full
        # 4*pair_budget = 524k rows — 1.3 ms of the 8 ms frame
        entry_budget=131072,
    )

    def frame(particles, buf, cam, t):
        particles, _aux = model.step(particles)
        buf = wl.push_frame(buf, particles, t)
        img = raytrace.render_retarded(
            buf, particles.object_index, objects, cam, width, height, params,
            planar=True, boundary=wl.boundary_mask(particles),
        )
        return particles, buf, img

    def step_only(particles):
        new, _aux = model.step(particles)
        return new

    return (
        jax.jit(frame, donate_argnums=(0, 1)),
        jax.jit(step_only),
        particles,
        buf,
        cam,
        model,
        (width, height),
    )


def main():
    frame, step_only, particles, buf, cam, model, (width, height) = build()
    h = model.params.h
    n_active = int(particles.num_active())
    print(f"# particles: {n_active}, image: {width}x{height}", file=sys.stderr)

    # static FLOP/byte counts of the fused frame (VERDICT r2 #3: anchor perf
    # in roofline numbers, not just fps) — lowered before the loop because
    # donation invalidates the concrete args afterwards
    from spacetime_tpu.utils import roofline

    frame_cost = roofline.cost_of(
        frame.lower(particles, buf, cam, jnp.float32(0.0)).compile()
    )

    # warmup / fill history past the view radius (compile included)
    t = 0.0
    p, b = particles, buf
    t0 = time.perf_counter()
    for i in range(8):
        t += h
        p, b, img = frame(p, b, cam, jnp.float32(t))
    jax.block_until_ready(img)
    print(f"# warmup+compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # timed fused frames
    n_frames = 50
    t0 = time.perf_counter()
    for i in range(n_frames):
        t += h
        p, b, img = frame(p, b, cam, jnp.float32(t))
    jax.block_until_ready(img)
    dt_frame = (time.perf_counter() - t0) / n_frames
    fps = 1.0 / dt_frame

    # physics-only steps/sec
    p2 = step_only(p)
    jax.block_until_ready(p2)
    n_steps = 100
    t0 = time.perf_counter()
    for _ in range(n_steps):
        p2 = step_only(p2)
    jax.block_until_ready(p2)
    sps = n_steps / (time.perf_counter() - t0)

    mrays = width * height * fps / 1e6
    rl = roofline.Roofline(
        flops=frame_cost[0], bytes_accessed=frame_cost[1],
        seconds=dt_frame, chip=roofline.chip_kind(),
    )
    # MEASURED roofline (VERDICT r3 weak #2 / next #4): a short profiler
    # capture of the same compiled frame gives actual device time, actual
    # HBM bytes (raw_bytes_accessed summed over ops) and the per-stage
    # split — numbers a reader can act on, reported alongside the static
    # upper bound.
    from spacetime_tpu.utils import profiling

    def _run_traced():
        nonlocal t, p, b
        img = None
        for _ in range(5):
            t += h
            p, b, img = frame(p, b, cam, jnp.float32(t))
        jax.block_until_ready(img)

    meas = {}
    try:
        meas = profiling.measured_roofline(_run_traced, 5)
    except Exception as exc:  # profiling must never kill the bench row
        print(f"# measured roofline unavailable: {exc}", file=sys.stderr)
    print(
        f"# fused frame: {dt_frame*1e3:.2f} ms ({fps:.1f} fps); "
        f"physics-only: {sps:.0f} steps/s; retarded render: {mrays:.1f} Mrays/s",
        file=sys.stderr,
    )
    print(f"# static-bound roofline: {rl.summary()}", file=sys.stderr)
    peak = roofline._PEAKS.get(rl.chip, {}).get("hbm_Bps", 0.0)
    hbm_meas_pct = None
    stage_ms = None
    if meas.get("device_s"):
        bps = meas["hbm_bytes"] / meas["device_s"]
        hbm_meas_pct = round(100.0 * bps / peak, 2) if peak else None
        stages = meas.get("stages") or {}
        stage_ms = {
            k: round(v * 1e3, 3)
            for k, v in stages.items() if k != "total"
        }
        print(
            f"# measured roofline: device {meas['device_s']*1e3:.2f} ms, "
            f"HBM {meas['hbm_bytes']/1e9:.2f} GB/frame "
            f"({bps/1e9:.0f} GB/s = {hbm_meas_pct}% of peak); "
            f"stages {stage_ms}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "fused 10k-particle step + 1080p retarded-time render",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 60.0, 3),
                "flops_per_frame": frame_cost[0],
                "hbm_bytes_per_frame": frame_cost[1],
                "mfu_pct": round(100 * rl.mfu, 3),
                "hbm_util_pct": round(100 * rl.hbm_util, 2),
                # measured (profiler-trace) counterparts: actual HBM traffic
                # over actual device time — always <= 100%, decision-grade
                "hbm_util_measured_pct": hbm_meas_pct,
                "hbm_bytes_measured": meas.get("hbm_bytes"),
                "device_ms_measured": (
                    round(meas["device_s"] * 1e3, 3)
                    if meas.get("device_s") else None
                ),
                "stage_ms_measured": stage_ms,
            }
        )
    )


def _scripted_keys(i: int):
    """Deterministic camera script: pan right, then zoom in, then pause at
    the end — enough input variety to exercise the hotswap/camera paths."""
    if i < 10:
        return {"d": True}
    if i < 20:
        return {"z": True}
    return None


def _perf_path(session: str) -> str:
    return session + ".perf.json"


def _run_session(eng, events_or_n, record_path=None):
    """Drive the engine (recording or replaying) and return the perf dict."""
    import numpy as _np

    from spacetime_tpu.utils import replay as replay_mod

    times = []
    eng.sync_per_frame = True  # honest per-frame pipelined timing

    if record_path is not None:
        rec = replay_mod.ReplayRecorder(
            record_path, config=eng.config,
            meta={"config_name": eng.config.name},
        )
        eng.recorder = rec
        for i in range(events_or_n):
            t0 = time.perf_counter()
            eng.run_frame(keys=_scripted_keys(i))
            times.append(time.perf_counter() - t0)
        rec.close()
    else:
        # canonical event interpretation lives in replay_events; time each
        # frame as the delta between successive on_frame callbacks
        t_last = [time.perf_counter()]

        def on_frame(i, img):
            now = time.perf_counter()
            times.append(now - t_last[0])
            t_last[0] = now

        replay_mod.replay_events(eng, events_or_n, on_frame=on_frame)
    jax.block_until_ready(eng._prev_img)
    # drop compile/adaptation warmup: steady state = last half
    steady = _np.asarray(times[len(times) // 2:])
    perf = {
        "frames": len(times),
        "frame_avg_ms": float(steady.mean() * 1e3),
        "fps_avg": float(1.0 / max(steady.mean(), 1e-9)),
        "low_1pct_ms": float(_np.sort(steady)[-max(1, len(steady) // 100):]
                             .mean() * 1e3),
        "config": eng.config.name,
        "backend": jax.default_backend(),
    }
    return perf


def _cmd_record(args):
    from spacetime_tpu.engine import Engine
    from spacetime_tpu.utils.config import get_config

    eng = Engine(get_config(args.config))
    perf = _run_session(eng, args.frames, record_path=args.record)
    with open(_perf_path(args.record), "w") as f:
        json.dump(perf, f, indent=2)
    print(json.dumps({
        "metric": f"recorded session {args.config}",
        "value": round(perf["fps_avg"], 2), "unit": "fps",
        "vs_baseline": round(perf["fps_avg"] / 60.0, 3),
    }))


def _cmd_replay(args):
    from spacetime_tpu.engine import Engine
    from spacetime_tpu.utils import replay as replay_mod
    from spacetime_tpu.utils.config import get_config

    header, events = replay_mod.load_full(args.replay)
    name = (header.get("meta") or {}).get("config_name")
    if not name:
        raise SystemExit("session has no meta.config_name header")
    eng = Engine(get_config(name))
    fp = replay_mod.config_fingerprint(eng.config)
    if header.get("config") not in (None, fp):
        raise SystemExit("config fingerprint mismatch: the session was "
                         "recorded under a different EngineConfig")
    perf = _run_session(eng, events)
    with open(_perf_path(args.replay), "w") as f:
        json.dump(perf, f, indent=2)
    print(json.dumps({
        "metric": f"replayed session {name} ({perf['frames']} frames)",
        "value": round(perf["fps_avg"], 2), "unit": "fps",
        "vs_baseline": round(perf["fps_avg"] / 60.0, 3),
    }))


def _cmd_diff(args):
    a = json.load(open(args.diff[0]))
    b = json.load(open(args.diff[1]))
    keys = ("frame_avg_ms", "fps_avg", "low_1pct_ms")
    deltas = {
        k: {
            "a": a.get(k), "b": b.get(k),
            "delta_pct": round(100.0 * (b[k] - a[k]) / a[k], 2)
            if a.get(k) and b.get(k) else None,
        }
        for k in keys
    }
    # regression = steady frame time worsened beyond noise; a missing
    # frame_avg_ms in either file is NOT a clean pass (a truncated/failed
    # run must not green-light a CI gate) — report unknown, exit 2
    d_frame = deltas["frame_avg_ms"]["delta_pct"]
    reg = "unknown" if d_frame is None else bool(d_frame > args.threshold)
    print(json.dumps({
        "a": args.diff[0], "b": args.diff[1],
        "config": {"a": a.get("config"), "b": b.get("config")},
        "deltas": deltas,
        "regression": reg,
        "threshold_pct": args.threshold,
    }, indent=2))
    if reg == "unknown":
        return 2
    return 1 if reg else 0


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--record", metavar="SESSION")
    ap.add_argument("--replay", metavar="SESSION")
    ap.add_argument("--diff", nargs=2, metavar=("A.perf.json", "B.perf.json"))
    ap.add_argument("--config", default="flagship_1080p")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--threshold", type=float, default=5.0,
                    help="regression threshold, pct frame-time increase")
    _args = ap.parse_args()
    if _args.record:
        _cmd_record(_args)
    elif _args.replay:
        _cmd_replay(_args)
    elif _args.diff:
        sys.exit(_cmd_diff(_args))
    else:
        try:
            main()
        except Exception as exc:
            # the driver parses stdout as ONE JSON line; a dead TPU tunnel
            # (axon init failure) must yield a parsable zero-row, not a
            # traceback (round 3: the tunnel went down mid-round)
            print(json.dumps({
                "metric": "fused 10k-particle step + 1080p retarded-time render",
                "value": 0.0,
                "unit": "fps",
                "vs_baseline": 0.0,
                "error": f"{type(exc).__name__}: {exc}"[:300],
            }))
            raise SystemExit(0)
