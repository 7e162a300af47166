"""Tracing / profiling helpers.

The reference has no tracer — it hand-rolls pynvml VRAM reads
(`strategies/fsdp.py:39-41`), `torch.cuda.max_memory_allocated`, and ad-hoc
`time.time()` phase logs (`neurons/miner.py:514,588-610`) — SURVEY.md §5.
TPU-native equivalents:

* PhaseTimer — named wall-clock phases with a JSON dump (the phase-log analog)
* device_memory() — HBM stats (the pynvml analog)
* trace() — jax.profiler context writing a TensorBoard-loadable trace
* annotate() — TraceAnnotation for device-timeline labels
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulating named phase timer.

    with timer.phase("denoise"): ...
    timer.report() -> {"denoise": {"total_s":..., "count":...}, ...}
    """

    def __init__(self):
        self.phases: Dict[str, Dict[str, float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block:
                try:
                    jax.effects_barrier()
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            entry = self.phases.setdefault(name, {"total_s": 0.0, "count": 0,
                                                  "max_s": 0.0})
            entry["total_s"] += dt
            entry["count"] += 1
            entry["max_s"] = max(entry["max_s"], dt)

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: dict(v) for k, v in self.phases.items()}

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)


def device_memory(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Per-device memory stats in MB (peak/current) — the vram_mb() analog."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "peak_mb": stats.get("peak_bytes_in_use", 0) / 2**20,
        "in_use_mb": stats.get("bytes_in_use", 0) / 2**20,
        "limit_mb": stats.get("bytes_limit", 0) / 2**20,
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace (view in TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region on the device timeline."""
    return jax.profiler.TraceAnnotation(name)
