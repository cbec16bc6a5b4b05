"""FFT-based autocorrelation, matching the reference's spectral pipeline.

The reference computes R = IFFT(|FFT(x)|) — note the spectrum *magnitude*,
not the power |.|^2 of a textbook Wiener-Khinchin autocorrelation
(TempestSDR/src/fft.c:49-64 fft_autocorrelation with
fft_complex_to_absolute_complex at :34-45). Its forward FFT scales by 1/N and
the inverse is unnormalized (fft.c:167-175), which nets out to exactly
numpy-convention ifft(abs(fft(x))). The FFT size is the floor power of two of
the input length (fft.c:5-11).

The cross-round running mean over |R(j)| mirrors frameratedetector.c:34-62
`accummulate` (reference accumulates in double; we keep float32 on TPU —
validated within SNR tolerance in tests).
"""

from __future__ import annotations

import jax.numpy as jnp


def autocorrelation_magnitude(x: jnp.ndarray) -> jnp.ndarray:
    """x: f32[n] (n a power of two) -> |R(j)| f32[n], reference convention.

    Complex-in/complex-out like the reference (fft.c:49-64). An rfft/irfft
    half-spectrum form (mathematically identical — x is real so |FFT| is
    real even) measured slightly SLOWER on this TPU runtime
    (bench/REGRESS_PROFILE.json autocorr:rfft vs :cfft), so the c64 form
    stays.
    """
    spec = jnp.fft.fft(x.astype(jnp.complex64))
    r = jnp.fft.ifft(jnp.abs(spec).astype(jnp.complex64))
    return jnp.abs(r).astype(jnp.float32)


def accumulate_running_mean(avg: jnp.ndarray, new: jnp.ndarray, calls) -> jnp.ndarray:
    """Running average across estimation rounds (frameratedetector.c:44-61).

    calls: number of rounds completed *including* this one minus... the
    reference passes extbuffer `calls` which is the pre-increment round
    counter: calls==0 -> overwrite, else avg' = (avg*(calls-1) + new)/calls
    ... with the reference's convention avg' = (avg*currcalls + new)/calls
    where currcalls = calls-1. Pass calls >= 1 for that branch, calls == 0
    overwrites.
    """
    calls = jnp.asarray(calls, jnp.float32)
    blended = (avg * (calls - 1.0) + new) / jnp.maximum(calls, 1.0)
    return jnp.where(calls == 0, new, blended).astype(jnp.float32)
