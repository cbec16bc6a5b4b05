"""StreamState — the scan carry that replaces every piece of mutable state in
the reference core (internaldefinitions.h:30-65 tsdr_lib_t + the per-thread
locals): resampler phase (dsp.h:79-82), fold fill, drop-compensation residues
(dsp.c:313-368), motion-blur screen buffer (dsp.h:49), autogain bounds
(dsp.h:56-60), sync positions/velocities (syncdetector.h:16-30), PLL average,
and the autocorrelation accumulation (frameratedetector.c / extbuffer calls
counter).

Because it is one pytree, checkpoint/resume (absent in the reference,
SURVEY.md §5.4) is trivial: serialize the pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import PipelineConfig
from ..ops.sync import SweetspotState, PLLState


class StreamState(NamedTuple):
    # --- resampler (dsp_resample_t) ---
    phase_fix: jnp.ndarray  # i64 — fixed-point phase; > 0 while draining a
    # drop-compensation sample skip, else in (-inv, 0]
    tail: jnp.ndarray  # f32[taps] — previous block's last envelope samples
    fir_tail: jnp.ndarray  # f32[max(fir_ntaps-1,1)] — FIR overlap-save carry
    # --- drop / sync-shift compensation (dsp_dropped_compensation_t x2) ---
    skip_pixels: jnp.ndarray  # i32 — manual-sync pixel skip (mod frame)
    # --- frame fold ---
    fill: jnp.ndarray  # i32 — write position within current frame
    framebuf: jnp.ndarray  # f32[framebuf_len(config)]
    # --- post-processing ---
    screenbuffer: jnp.ndarray  # f32[H, W] — motion-blur IIR state
    ag_min: jnp.ndarray  # f32
    ag_max: jnp.ndarray  # f32
    ag_snr: jnp.ndarray  # f32
    sync_x: SweetspotState
    sync_y: SweetspotState
    pll: PLLState
    runs: jnp.ndarray  # i32 — autogain report cadence (dsp.c:231)
    frame_count: jnp.ndarray  # i64
    # --- autocorrelation estimator ---
    ac_buf: jnp.ndarray  # f32[ac_round + block]
    ac_fill: jnp.ndarray  # i32
    ac_avg_frame: jnp.ndarray  # f32[frame_window]
    ac_avg_line: jnp.ndarray  # f32[line_window]
    ac_calls: jnp.ndarray  # i32 — extbuffer-style round counter
    ac_last_full: jnp.ndarray  # f32[ac_fft//2] — latest round's raw |R(j)|
    # half-range, for the full CSV dump (dump_autocorrect
    # frameratedetector.c:64-85 dumps the raw current-round autocorrelation,
    # not the running average)


class StepOutputs(NamedTuple):
    frame: jnp.ndarray  # f32[H, W] (config.frames_per_block == 1) or
    # f32[K, H, W] (multi-emit step: up to K frames per block)
    frame_valid: jnp.ndarray  # bool — a frame completed this step; (K,) mask
    # of completed frame slots for the multi-emit step
    n_pixels: jnp.ndarray  # i32 — resampled pixels produced this step
    # value-callback channel (TSDRLibrary.h:45-50)
    refreshrate: jnp.ndarray  # f32 — nominal + PLL delta (VALUE_ID_PLL_FRAMERATE)
    pll_locked: jnp.ndarray  # bool
    ag_min: jnp.ndarray  # f32 (VALUE_ID_AUTOGAIN_VALUES)
    ag_max: jnp.ndarray  # f32
    ag_snr: jnp.ndarray  # f32 (VALUE_ID_SNR)
    sync_dx: jnp.ndarray  # i32 — horizontal sync position
    sync_dy: jnp.ndarray  # i32 — vertical sync position
    # plot-callback channel (PLOT_ID_FRAME / PLOT_ID_LINE)
    ac_frame_plot: jnp.ndarray  # f32[frame_window]
    ac_line_plot: jnp.ndarray  # f32[line_window]
    ac_plot_valid: jnp.ndarray  # bool — an estimation round completed
    ac_calls: jnp.ndarray  # i32 (VALUE_ID_AUTOCORRECT_FRAMES_COUNT)


def framebuf_len(config: PipelineConfig) -> int:
    """Fold-buffer length. K == 1: frame + one block's pixels (the original
    layout, bit-compatible with round-1..3 checkpoints). K > 1: must also
    cover the multi-emit shift's fp-length read at offset emitted*fp
    (emitted <= K), i.e. (K+1)*fp."""
    fp, mp = config.frame_pixels, config.max_block_pixels
    k = config.frames_per_block
    return fp + mp if k == 1 else max(fp + mp, (k + 1) * fp)


def init_state(config: PipelineConfig, fir_ntaps: int = 0) -> StreamState:
    h, w = config.height, config.width
    fw = config.ac_frame_window[1] if config.autocorr else 1
    lw = config.ac_line_window[1] if config.autocorr else 1
    ac_cap = (config.ac_round_samples + config.block_samples) if config.autocorr else 1
    return StreamState(
        phase_fix=jnp.int64(0),
        tail=jnp.zeros((config.resample_taps,), jnp.float32),
        fir_tail=jnp.zeros((max(fir_ntaps - 1, 1),), jnp.float32),
        skip_pixels=jnp.int32(0),
        fill=jnp.int32(0),
        framebuf=jnp.zeros((framebuf_len(config),), jnp.float32),
        screenbuffer=jnp.zeros((h, w), jnp.float32),
        ag_min=jnp.float32(0),
        ag_max=jnp.float32(0),
        ag_snr=jnp.float32(1.0),
        sync_x=SweetspotState.init(),
        sync_y=SweetspotState.init(),
        pll=PLLState.init(),
        runs=jnp.int32(0),
        frame_count=jnp.int64(0),
        ac_buf=jnp.zeros((ac_cap,), jnp.float32),
        ac_fill=jnp.int32(0),
        ac_avg_frame=jnp.zeros((fw,), jnp.float32),
        ac_avg_line=jnp.zeros((lw,), jnp.float32),
        ac_calls=jnp.int32(0),
        ac_last_full=jnp.zeros(
            (config.ac_fft_size // 2 if config.autocorr else 1,), jnp.float32
        ),
    )


def state_compatible(a: StreamState, b: StreamState) -> bool:
    """Same tree shape, leaf shapes and dtypes — safe to carry across a
    rebuilt step."""
    import jax

    fa, ta = jax.tree.flatten(a)
    fb, tb = jax.tree.flatten(b)
    return (
        ta == tb
        and len(fa) == len(fb)
        and all(x.shape == y.shape and x.dtype == y.dtype for x, y in zip(fa, fb))
    )


def reset_autocorr(state: StreamState) -> StreamState:
    """PARAM_AUTOCORR_PLOTS_RESET / retune flush
    (frameratedetector.c:97-104,197-201): clear accumulated averages."""
    return state._replace(
        ac_buf=jnp.zeros_like(state.ac_buf),
        ac_fill=jnp.int32(0),
        ac_avg_frame=jnp.zeros_like(state.ac_avg_frame),
        ac_avg_line=jnp.zeros_like(state.ac_avg_line),
        ac_calls=jnp.int32(0),
        ac_last_full=jnp.zeros_like(state.ac_last_full),
    )
