"""Roofline / MFU accounting for compiled XLA programs.

The reference instruments per-stage GPU time (reference: src/querybank.rs)
but never anchors it to hardware capability.  Here every headline bench row
carries achieved FLOP/s and HBM bandwidth as fractions of the chip's peak,
from `compiled.cost_analysis()` (XLA's static per-program cost model) divided
by measured wall time.

Peaks are per-chip datasheet numbers; the default table covers the v5e
(TPU v5 lite) this project benches on.  XLA's flop count is the *algorithmic*
count of the compiled HLO (post-fusion, pre-padding), so mfu here is a lower
bound: lane-padding waste makes the hardware do more raw work than counted.
Conversely "bytes accessed" is the cost model's static operand count, which
still bills accesses that fusion keeps VMEM-resident — an UPPER bound on true
HBM traffic, so hbm_util can legitimately read above 100% on heavily fused
programs (it means "the program reuses more data than HBM could stream", not
a measurement error).  Trace-derived per-op times remain the ground truth.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

# per-chip peaks: (name, peak FLOP/s dense matmul bf16, peak FLOP/s fp32
# vector, HBM bytes/s).  v5e: 197 TFLOP/s bf16 MXU, ~0.9 TFLOP/s-class VPU
# per-lane estimate is not published — we report against the bf16 MXU peak
# (the honest "how far from the chip's absolute ceiling" number) AND HBM.
_PEAKS = {
    "v5e": {"flops_bf16": 197e12, "hbm_Bps": 819e9},
    "v5p": {"flops_bf16": 459e12, "hbm_Bps": 2765e9},
    "v4": {"flops_bf16": 275e12, "hbm_Bps": 1228e9},
    "cpu": {"flops_bf16": 1e11, "hbm_Bps": 5e10},  # placeholder for tests
}


def chip_kind() -> str:
    """Chip key for the `_PEAKS` table.  Unrecognized TPU kinds rate
    against the v5e row (this project's bench chip — a stated assumption,
    not a silent one: summary() prints the chip name).  Anything that is
    neither a TPU nor a CPU (e.g. a GPU backend) returns "unknown", and
    mfu/hbm_util report 0 rather than rating the wrong chip's peaks."""
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "") or ""
    k = kind.lower()
    if "v5 lite" in k or "v5e" in k or "v5lite" in k:
        return "v5e"
    if "v5p" in k or "v5 pod" in k:
        return "v5p"
    if "v4" in k:
        return "v4"
    if d.platform == "cpu":
        return "cpu"
    if d.platform == "tpu" or "tpu" in k:
        return "v5e"  # assumed: the only TPU this repo benches on
    return "unknown"


class Roofline(NamedTuple):
    flops: float  # algorithmic FLOPs per program execution (XLA count)
    bytes_accessed: float  # HBM bytes per execution (XLA count)
    seconds: float  # measured wall time per execution
    chip: str

    @property
    def achieved_flops(self) -> float:
        return self.flops / self.seconds if self.seconds else 0.0

    @property
    def achieved_Bps(self) -> float:
        return self.bytes_accessed / self.seconds if self.seconds else 0.0

    @property
    def mfu(self) -> float:
        """Fraction of the chip's dense-matmul peak (absolute ceiling);
        0 when the chip has no peak table entry."""
        peaks = _PEAKS.get(self.chip)
        return self.achieved_flops / peaks["flops_bf16"] if peaks else 0.0

    @property
    def hbm_util(self) -> float:
        peaks = _PEAKS.get(self.chip)
        return self.achieved_Bps / peaks["hbm_Bps"] if peaks else 0.0

    @property
    def arithmetic_intensity(self) -> float:
        """FLOPs per HBM byte; compare to peak_flops/peak_BW (~240 for v5e
        bf16) to see which wall the program is against."""
        return self.flops / self.bytes_accessed if self.bytes_accessed else 0.0

    def summary(self) -> str:
        if self.chip not in _PEAKS:
            return (
                f"{self.flops/1e9:.2f} GFLOP, {self.bytes_accessed/1e9:.2f} GB "
                f"per frame | achieved {self.achieved_flops/1e12:.3f} TFLOP/s, "
                f"HBM {self.achieved_Bps/1e9:.0f} GB/s "
                f"(no peak table for chip '{self.chip}' — utilization unrated)"
            )
        return (
            f"{self.flops/1e9:.2f} GFLOP, {self.bytes_accessed/1e9:.2f} GB "
            f"per frame | achieved {self.achieved_flops/1e12:.3f} TFLOP/s "
            f"({100*self.mfu:.2f}% of {self.chip} bf16 peak), "
            f"HBM {self.achieved_Bps/1e9:.0f} GB/s "
            f"({100*self.hbm_util:.1f}% of peak; static-count bytes — "
            f"VMEM-resident reuse included, may exceed 100%), "
            f"intensity {self.arithmetic_intensity:.1f} flop/B"
        )


def cost_of(compiled) -> tuple[float, float]:
    """(flops, bytes_accessed) from a compiled function's cost analysis."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    by = ca.get("bytes accessed", None)
    if by is None:
        by = sum(v for k, v in ca.items()
                 if isinstance(v, (int, float)) and k.startswith("bytes accessed"))
    return flops, float(by or 0.0)


def measure(jitted_fn, args, seconds: float) -> Roofline:
    """Roofline stats for a jitted function already traced with `args`
    (AOT-lowered here; reuses the compilation cache) at measured `seconds`
    per execution."""
    compiled = jitted_fn.lower(*args).compile()
    flops, by = cost_of(compiled)
    return Roofline(flops=flops, bytes_accessed=by, seconds=seconds,
                    chip=chip_kind())
