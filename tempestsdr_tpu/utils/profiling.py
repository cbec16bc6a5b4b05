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


_FLOOR_CACHE: dict = {}


def measure_dispatch_floor(repeats: int = 3) -> float:
    """Measured per-dispatch floor of the current backend, seconds.

    The remote-TPU relay charges ~25 ms per program dispatch regardless of
    program size (bench/ROUND4_PROBE6.json: empty 32- and 128-iteration
    scans both cost 25.4-25.8 ms) — the constant that decides how many
    blocks a live session must batch per dispatch. Measured once per
    process with a trivial jitted program (min of `repeats` dispatches,
    first compile excluded); cached per backend."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    key = jax.default_backend()
    if key in _FLOOR_CACHE:
        return _FLOOR_CACHE[key]
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    x = f(x)
    _ = np.asarray(x)  # compile + first round trip outside the timing
    best = float("inf")
    for _ in range(max(repeats, 1)):
        t0 = time.monotonic()
        x = f(x)
        # a HOST FETCH, not block_until_ready: the relay acknowledges
        # readiness optimistically (CLAUDE.md), and an unfetched dispatch
        # measured 0.07 ms where the true round trip is ~25-30 ms
        # (bench/ROUND5_PROBE2.json floor_ms vs ROUND5_PROBE.json)
        _ = np.asarray(x)
        best = min(best, time.monotonic() - t0)
    _FLOOR_CACHE[key] = best
    return best


def auto_batch_blocks(config, *, latency_s: float = 0.25,
                      floor_s: float | None = None,
                      floor_ratio: float = 10.0,
                      max_batch: int = 256) -> int:
    """Pick batch_blocks for a live session from the measured dispatch
    floor vs the block's real-time duration (round-4 VERDICT weak #3: a
    batch=1 session caps at ~1/floor dispatches/s — ~40 blocks/s on the
    relay — far below real time at wideband geometry).

    Two constraints, latency winning on conflict:
      - amortization: the stream-time per dispatch should be >= floor_ratio
        x the dispatch floor (floor overhead <= ~1/floor_ratio of the
        real-time cadence);
      - control latency: a throttled (real-time) source fills a batch in
        batch * block_s seconds — that fill time plus one dispatch floor is
        the worst-case delay before an interactive control (sync shift,
        motion blur, param flip) takes effect, and must stay <= latency_s.
        (Unthrottled replay fills near-instantly and is latency-bound only
        by the dispatch wall — callers benchmarking replay should size
        batches explicitly, as bench.py does.)
    """
    if floor_s is None:
        floor_s = measure_dispatch_floor()
    block_s = config.block_samples / config.samplerate
    want = -(-floor_ratio * floor_s // block_s)  # ceil
    cap = (latency_s - floor_s) / block_s
    return int(max(1, min(want, cap, max_batch)))


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
