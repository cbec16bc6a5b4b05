"""Streaming windowed-sinc FIR low-pass (TPU-native addition).

The reference has no FIR stage — its box resampler is the only filtering.
This op is the anti-alias / noise-shaping low-pass called for by the build
plan (SURVEY.md §7.1) and the overlap-save unit used for time-sharded
wideband streaming (BASELINE.json config 4): the block convolution carries
(ntaps-1) tail samples across block (or shard) boundaries, which becomes the
ppermute halo in the sharded path (..parallel.timeshard).

The convolution is expressed as lax.conv_general_dilated so XLA lowers it
onto the MXU/VPU (probe-measured at the roofline for this op class; the
Mosaic kernels in ..pallas cover the resampler, which dominates).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def design_lowpass_fir(ntaps: int, cutoff_norm: float) -> np.ndarray:
    """Hamming-windowed sinc, cutoff_norm = f_c / (fs/2) in (0, 1)."""
    if ntaps % 2 == 0:
        raise ValueError("ntaps must be odd")
    m = np.arange(ntaps) - (ntaps - 1) / 2
    h = np.sinc(cutoff_norm * m) * cutoff_norm
    h *= np.hamming(ntaps)
    h /= h.sum()
    return h.astype(np.float32)


def fir_apply_block(x: jnp.ndarray, tail: jnp.ndarray, taps: jnp.ndarray):
    """Causal streaming FIR over one block.

    x: f32[n] new samples; tail: f32[ntaps-1] previous samples; taps: f32[ntaps].
    Returns (y f32[n], new_tail f32[ntaps-1]) where
    y[i] = sum_k taps[k] * xc[i + ntaps-1 - k], xc = concat(tail, x).
    """
    ntaps = taps.shape[0]
    xc = jnp.concatenate([tail, x])
    y = lax.conv_general_dilated(
        xc[None, None, :],
        taps[::-1][None, None, :],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[0, 0]
    return y.astype(jnp.float32), xc[xc.shape[0] - (ntaps - 1):]
