"""Profiling / timing utilities.

Beyond the reference's accumulating ``Timer`` context manager
(``/root/reference/utils/__init__.py:235-250``), first-class TPU profiling:
``jax.profiler`` trace capture and a step-throughput meter reporting the
BASELINE north-star unit (audio-seconds synthesized per second per chip).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class Timer:
    """Accumulating named timer (``with Timer('x'):`` blocks sum up)."""

    timer_map: Dict[str, float] = defaultdict(float)

    def __init__(self, name: str, enable: bool = True, print_time: bool = False):
        self.name = name
        self.enable = enable
        self.print_time = print_time

    def __enter__(self):
        if self.enable:
            self.t = time.time()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if self.enable:
            Timer.timer_map[self.name] += time.time() - self.t
            if self.print_time:
                print(self.name, Timer.timer_map[self.name])

    @staticmethod
    def report():
        return dict(Timer.timer_map)


@contextlib.contextmanager
def xla_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace viewable in TensorBoard / Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        print(f"| profiler trace written to {log_dir}")


class ThroughputMeter:
    """audio-seconds synthesized (or trained) per second per chip."""

    def __init__(self, sample_rate: int = 44100, hop_size: int = 512,
                 num_chips: int = 1):
        self.frames = 0
        self.t0: Optional[float] = None
        self.sample_rate = sample_rate
        self.hop_size = hop_size
        self.num_chips = num_chips

    def start(self):
        self.t0 = time.perf_counter()
        self.frames = 0

    def add_frames(self, n: int):
        self.frames += n

    def rate(self) -> float:
        dt = time.perf_counter() - (self.t0 or time.perf_counter())
        audio_s = self.frames * self.hop_size / self.sample_rate
        return audio_s / max(dt, 1e-9) / self.num_chips
