"""Unit tests for the scaling-bench HLO collective parser
(tools/bench_scaling.py) — the measurement side of the multi-chip story
(test_parallel.py proves correctness; the tool reports traffic/timing).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from bench_scaling import _shape_bytes, collective_bytes  # noqa: E402


def test_shape_bytes_scalar_kinds():
    assert _shape_bytes("f32[2048,32]{1,0}") == 2048 * 32 * 4
    assert _shape_bytes("bf16[128]{0}") == 128 * 2
    assert _shape_bytes("s32[8,8,2]{2,1,0}") == 8 * 8 * 2 * 4
    # tuple shapes sum their elements
    assert _shape_bytes("(f32[8]{0}, s32[8]{0})") == 8 * 4 + 8 * 4
    # unknown dtypes are skipped rather than crashing
    assert _shape_bytes("token[]") == 0


def test_collective_bytes_sync_and_async_forms():
    hlo = "\n".join([
        "  %ag = f32[1024,4]{1,0} all-gather(f32[128,4]{1,0} %x), dims={0}",
        "  %ar.1 = bf16[256]{0} all-reduce-start(bf16[256]{0} %y)",
        "  %ar.2 = bf16[256]{0} all-reduce-done(bf16[256]{0} %ar.1)",
        "  %rs = f32[64]{0} reduce-scatter(f32[512]{0} %z), dims={0}",
        "  %cp = u32[16]{0} collective-permute(u32[16]{0} %w)",
        "  %noise = f32[9]{0} add(f32[9]{0} %a, f32[9]{0} %b)",
    ])
    got = collective_bytes(hlo)
    assert got["all-gather"] == 1024 * 4 * 4
    # -start counted once; -done NOT double counted
    assert got["all-reduce"] == 256 * 2
    assert got["reduce-scatter"] == 64 * 4
    assert got["collective-permute"] == 16 * 4
    assert got["total"] == sum(v for k, v in got.items() if k != "total")


def test_collective_bytes_empty_on_collective_free_hlo():
    assert collective_bytes("%r = f32[4]{0} add(%a, %b)") == {"total": 0}
