"""Multi-target streaming session — N independent emitters on one device
(BASELINE config 5) as a product API, not just a benchmark.

The reference's design point is "multiple independent receivers", but its
JNI layer is a hard singleton (TSDRLibraryNDK.c:24 `tsdr_instance`) — one
process, one receiver. Here N channels run inside ONE jitted program
(stream/pipeline.py make_channels_step_hybrid: unrolled per-channel
per-sample work, shared autocorr-ring write, channel-batched boundary
bodies), each with its own carried StreamState, drop accounting and frame
cadence. For pod scale, the same stacked-state signature feeds
parallel/channels.make_channel_step (shard_map over the 'ch' mesh axis).
"""

from __future__ import annotations

import threading
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..errors import TSDRError, TSDRStatus
from ..params import Params
from ..sources.base import Source
from .pipeline import StepControls, make_channels_step_hybrid
from .state import init_state


def _stack_states(config: PipelineConfig, n: int, fir_ntaps: int = 0):
    one = init_state(config, fir_ntaps)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape).copy(), one
    )


class MultiSession:
    """Drive N sources through one multi-channel step.

    on_frame(channel: int, frame: np.ndarray) fires per completed frame;
    on_plot(channel, PlotEvent) per estimation round (both autocorr
    windows), mirroring the single-channel Session's event surface.
    All sources must share the config's samplerate (one static geometry —
    independent geometries belong in separate sessions/programs).
    """

    def __init__(
        self,
        config: PipelineConfig,
        params: Params,
        sources: Sequence[Source],
        on_frame: Optional[Callable[[int, np.ndarray], None]] = None,
        on_plot=None,
        cond_mode: str = "unrolled",
    ):
        if not sources:
            raise TSDRError(TSDRStatus.ERR_PLUGIN, "no sources")
        for s in sources:
            if abs(s.samplerate() - config.samplerate) > 1e-6:
                raise TSDRError(
                    TSDRStatus.WRONG_VIDEOPARAMS,
                    f"source '{s.name()}' samplerate {s.samplerate()} != "
                    f"config {config.samplerate} (one geometry per session)",
                )
        self.config = config
        self.params = params
        self.sources = list(sources)
        self.on_frame = on_frame
        self.on_plot = on_plot
        self.n_channels = len(sources)
        self._step = jax.jit(
            make_channels_step_hybrid(config, params, self.n_channels,
                                      cond_mode=cond_mode),
            donate_argnums=0,
        )
        self.state = _stack_states(config, self.n_channels,
                                   params.fir_lowpass_taps)
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self.samples_dropped_total = [0] * self.n_channels
        self.frames_total = [0] * self.n_channels

    def run(self, max_blocks: Optional[int] = None,
            max_frames: Optional[int] = None) -> int:
        """Stream until a source ends or limits hit. max_frames counts the
        total across channels. Returns that total."""
        self._running = True
        streams = [iter(s.stream(self.config.block_samples))
                   for s in self.sources]
        mb = jnp.float32(0.0)
        sync0 = jnp.zeros((self.n_channels,), jnp.int32)
        blocks = 0
        frames = 0
        try:
            while self._running:
                raws = []
                dropped = []
                for st in streams:
                    blk = next(st, None)
                    if blk is None:
                        return frames  # a source ended: stop the group
                    raws.append(np.asarray(blk.samples))
                    dropped.append(blk.dropped)
                for c, d in enumerate(dropped):
                    self.samples_dropped_total[c] += d
                ctrl = StepControls(
                    jnp.asarray(dropped, jnp.int64),
                    sync0,
                    jnp.broadcast_to(mb, (self.n_channels,)),
                )
                self.state, out = self._step(
                    self.state, jnp.asarray(np.stack(raws)), ctrl
                )
                blocks += 1
                fv = np.asarray(out.frame_valid)
                pv = np.asarray(out.ac_plot_valid)
                # fv is (C,) for one-frame-per-block geometries, (C, K) for
                # multi-emit steps (config.frames_per_block > 1); fetch the
                # whole frame stack in ONE transfer when anything emitted
                stack = np.asarray(out.frame) if fv.any() else None
                for idx in np.argwhere(fv):
                    c = int(idx[0])
                    self.frames_total[c] += 1
                    frames += 1
                    if self.on_frame:
                        fr = stack[c] if fv.ndim == 1 else stack[c, int(idx[1])]
                        self.on_frame(c, fr)
                if self.on_plot and pv.any():
                    from ..events import PLOT_ID, PlotEvent

                    f_off, _ = self.config.ac_frame_window
                    l_off, _ = self.config.ac_line_window
                    sr = self.config.samplerate
                    for c in np.nonzero(pv)[0]:
                        c = int(c)
                        self.on_plot(c, PlotEvent(
                            PLOT_ID.FRAME, f_off,
                            np.asarray(out.ac_frame_plot[c]), sr))
                        self.on_plot(c, PlotEvent(
                            PLOT_ID.LINE, l_off,
                            np.asarray(out.ac_line_plot[c]), sr))
                if max_blocks is not None and blocks >= max_blocks:
                    break
                if max_frames is not None and frames >= max_frames:
                    break
        finally:
            self._running = False
            for s in self.sources:
                s.stop()
        return frames

    def start_async(self, **kw) -> None:
        self._thread = threading.Thread(target=self.run, kwargs=kw, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    @property
    def is_running(self) -> bool:
        return self._running
