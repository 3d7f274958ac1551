"""Device-level profiling hooks.

The reference brackets GPU work with timestamp queries
(reference: src/querybank.rs, boilerplate.rs:210-240).  The TPU-native
equivalents here (SURVEY.md §5):

  * `trace(logdir)` — capture a jax.profiler trace (XLA op-level timeline,
    viewable in TensorBoard/Perfetto) around a block of frames.
  * `annotate(name)` — named TraceAnnotation so engine stages (step /
    worldline / render) show up as spans inside the trace.
  * `device_memory_stats()` — HBM usage snapshot (peak/current), the analog
    of watching the Vulkan allocator.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a profiler trace (and in Python profilers)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> Dict[str, int]:
    """Bytes in use / peak / limit for one device (empty if unsupported)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    keep = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: int(v) for k, v in stats.items() if k in keep}
