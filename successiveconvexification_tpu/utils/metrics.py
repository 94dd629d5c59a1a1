"""Metrics, logging and profiling (SURVEY.md §5 observability).

Host-callback-free: jitted sweep steps return a small metrics pytree; this
module appends them to JSONL and wraps jax.profiler trace capture plus
compiled-cost (speed-of-light) accounting for the kernel-SoL reporting the
BASELINE demands.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


class JsonlLogger:
    """Append-only JSONL metrics writer with a run manifest."""

    def __init__(self, path: str, manifest: Optional[Dict[str, Any]] = None):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)
        if manifest is not None:
            self.log({"_manifest": manifest, "_t": time.time()})

    def log(self, record: Dict[str, Any]) -> None:
        def conv(v):
            if isinstance(v, (np.ndarray, jax.Array)):
                return np.asarray(v).tolist()
            if isinstance(v, (np.floating, np.integer)):
                return v.item()
            return v

        self._f.write(json.dumps({k: conv(v) for k, v in record.items()}) + "\n")

    def close(self):
        self._f.close()


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace (view in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args, **kwargs) -> Dict[str, float]:
    """Compiled-cost analysis of a jitted function on example args.

    Returns XLA's flops/bytes estimates — compare against chip peak for the
    speed-of-light fraction (SURVEY §5 tracing/profiling).
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns a list per-device
        ca = ca[0] if ca else {}
    keep = {}
    for k in ("flops", "bytes accessed", "transcendentals"):
        if k in ca:
            keep[k.replace(" ", "_")] = float(ca[k])
    return keep


def sol_fraction(flops: float, seconds: float, peak_flops: float) -> float:
    """Speed-of-light fraction for a measured kernel/step."""
    if seconds <= 0 or peak_flops <= 0:
        return 0.0
    return (flops / seconds) / peak_flops


# Rough per-chip peaks for SoL accounting (dense f32/bf16 matmul peak, HBM BW).
CHIP_PEAKS = {
    "v5e": {"bf16_flops": 394e12, "f32_flops": 197e12, "hbm_gbps": 819e9},
    "v5p": {"bf16_flops": 459e12, "f32_flops": 229e12, "hbm_gbps": 2765e9},
}
