"""Profiling and RTF accounting.

The reference's only tracing is wall-clock RTF prints
(fullsubnet_plus/inferencer/inferencer.py:149-163); the TPU-native upgrade
is jax.profiler device traces (viewable in TensorBoard/Perfetto) plus the
audio-seconds/s/chip counters the bench reports.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RtfMeter:
    """Accumulates (wall seconds, audio seconds) and reports RTF and
    audio-s/s throughput — the reference's per-utterance RTF, batched."""

    def __init__(self, sr: int = 16000):
        self.sr = sr
        self.wall = 0.0
        self.audio = 0.0

    @contextlib.contextmanager
    def measure(self, num_samples: int):
        t0 = time.perf_counter()
        yield
        self.wall += time.perf_counter() - t0
        self.audio += num_samples / self.sr

    @property
    def rtf(self) -> float:
        return self.wall / self.audio if self.audio else float("nan")

    @property
    def throughput(self) -> float:
        return self.audio / self.wall if self.wall else float("nan")
