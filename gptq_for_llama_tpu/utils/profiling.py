"""Tracing and phase timing.

The reference's observability is wall-clock deltas around phases
(reference: llama.py:491-493, gptq.py:138,221) plus per-token latency lists
(llama.py:419-435). This module keeps that surface and adds the TPU-native
device tracer (jax.profiler -> TensorBoard/Perfetto)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulates wall-clock per named phase; print() gives a summary table."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        from .metrics import ascii_table
        rows = [[n, self.counts[n], round(self.totals[n], 3),
                 round(self.totals[n] / max(self.counts[n], 1), 4)]
                for n in sorted(self.totals, key=self.totals.get, reverse=True)]
        return ascii_table(["phase", "calls", "total_s", "mean_s"], rows)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device profile (view with TensorBoard's profile plugin).

    Usage:
        with device_trace("/tmp/trace"):
            run_decode_steps()
    """
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Per-device memory telemetry (reference torch.cuda.memory_allocated)."""
    import jax
    out = {}
    for d in jax.local_devices():
        try:
            out[str(d)] = d.memory_stats() or {}
        except Exception:
            out[str(d)] = {}
    return out
