"""Profiling and throughput observability.

The reference's only instrumentation is a GUI FPS overlay
(ImageVisualizer.java:141-154) and an unthrottled-replay compile flag. Here:
  - profile_trace: context manager around jax.profiler for device traces of
    the jitted step (view with tensorboard / xprof);
  - IngestMeter: samples/s + frames/s rates with exponential smoothing, fed
    by the session loop or any block consumer.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class IngestMeter:
    def __init__(self, alpha: float = 0.2):
        self._alpha = alpha
        self._t = None
        self._sps = 0.0
        self._fps = 0.0
        self.total_samples = 0
        self.total_frames = 0

    def update(self, samples: int, frames: int = 0) -> None:
        now = time.monotonic()
        self.total_samples += samples
        self.total_frames += frames
        if self._t is not None:
            dt = max(now - self._t, 1e-9)
            self._sps += self._alpha * (samples / dt - self._sps)
            self._fps += self._alpha * (frames / dt - self._fps)
        self._t = now

    @property
    def samples_per_sec(self) -> float:
        return self._sps

    @property
    def frames_per_sec(self) -> float:
        return self._fps

    def __repr__(self) -> str:
        return (f"IngestMeter({self._sps/1e6:.2f} MS/s, {self._fps:.1f} fps, "
                f"total {self.total_samples/1e6:.1f} MS / {self.total_frames} frames)")
