"""Deterministic record/replay: same inputs -> bit-exact same trajectory."""

import numpy as np
import pytest

from spacetime_tpu.engine import Engine
from spacetime_tpu.utils import replay
from spacetime_tpu.utils.config import get_config


def _tiny_engine():
    import dataclasses

    cfg = get_config("single_blob")
    cfg = dataclasses.replace(cfg, width=64, height=48, history=32)
    return Engine(cfg)


SCRIPT = [
    None,
    {"w": True},
    {"w": True, "d": True},
    None,
    {"p": True},   # pause toggle
    None,
    {"p": True},   # unpause
    {"s": True},
]


def test_record_then_replay_bit_exact(tmp_path):
    path = str(tmp_path / "session.jsonl")

    eng = _tiny_engine()
    eng.recorder = replay.ReplayRecorder(path, config=eng.config)
    eng.hotswap["max_fps"] = 30.0  # a live tweak mid-session
    last = None
    for keys in SCRIPT:
        last = eng.run_frame(keys=keys)
    eng.recorder.close()
    ref_pos = np.asarray(eng.particles.pos)
    ref_cam = np.asarray(eng.camera.pos)
    ref_img = np.asarray(last)

    eng2 = _tiny_engine()
    img2 = replay.replay(eng2, path)
    assert eng2.frame == eng.frame
    assert eng2.hotswap["max_fps"] == 30.0
    np.testing.assert_array_equal(np.asarray(eng2.particles.pos), ref_pos)
    np.testing.assert_array_equal(np.asarray(eng2.camera.pos), ref_cam)
    np.testing.assert_array_equal(np.asarray(img2), ref_img)


def test_replay_rejects_config_mismatch(tmp_path):
    import dataclasses

    path = str(tmp_path / "session.jsonl")
    eng = _tiny_engine()
    eng.recorder = replay.ReplayRecorder(path, config=eng.config)
    eng.run_frame()
    eng.recorder.close()

    cfg = dataclasses.replace(get_config("single_blob"), width=32, height=32,
                              history=32)
    other = Engine(cfg)
    with pytest.raises(ValueError, match="fingerprint"):
        replay.replay(other, path)
    # non-strict replays anyway
    replay.replay(other, path, strict=False)
    assert other.frame == 1


def test_bench_replay_harness_roundtrip(tmp_path, monkeypatch):
    """bench.py --record / --replay / --diff (VERDICT r2 #9): a recorded
    session replays the exact inputs, both runs emit comparable perf JSON,
    and the diff flags no regression between identical runs."""
    import dataclasses as dc
    import json

    import bench
    from spacetime_tpu.utils import config as config_mod

    tiny = dc.replace(
        config_mod.get_config("single_blob"),
        width=48, height=48, history=16,
    )
    monkeypatch.setitem(config_mod.CONFIGS, "tiny_replay",
                        lambda: dc.replace(tiny, name=""))

    sess = str(tmp_path / "s.jsonl")

    class A:
        record = sess
        config = "tiny_replay"
        frames = 6

    bench._cmd_record(A)
    perf_a = json.load(open(bench._perf_path(sess)))
    assert perf_a["frames"] == 6

    # replay writes a fresh perf file over the same session
    class B:
        replay = sess

    bench._cmd_replay(B)
    perf_b = json.load(open(bench._perf_path(sess)))
    assert perf_b["frames"] == 6
    assert perf_b["config"] == "tiny_replay"

    # identical sessions: the diff must not flag a regression at a high
    # threshold (wall-time jitter on 6 CPU frames can be large)
    a_path = str(tmp_path / "a.perf.json")
    json.dump(perf_a, open(a_path, "w"))

    class D:
        diff = (a_path, bench._perf_path(sess))
        threshold = 400.0

    rc = bench._cmd_diff(D)
    assert rc == 0
