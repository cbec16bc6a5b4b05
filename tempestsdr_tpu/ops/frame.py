"""Per-frame post-processing primitives: collapse, autogain, frame averaging.

Mirrors TempestSDR/src/dsp.c:
  - time_lowpass      <- dsp_timelowpass_run (dsp.c:22-33), the motion-blur
                         IIR: screen' = screen*mb + frame*(1-mb)
  - autogain_run      <- dsp_autogain_run (dsp.c:41-94): IIR-tracked min/max
                         (coeff NORMALISATION_LOWPASS_COEFF=0.1,
                         TSDRLibrary.c:37), normalize to [0,1], skip special
                         marker pixels (|v|>250), image SNR = mean/stdev
  - collapse_v_h      <- dsp_average_v_h (dsp.c:96-110): column/row sums
                         feeding sync detection

The scalar loops become reductions; XLA fuses them with neighbours. The
reference's autogain/SNR sums accumulate in double (dsp.c:52-91) while
dsp_average_v_h accumulates into plain float buffers (dsp.c:96-110) — XLA's
f32 tree reductions stay within the parity SNR bound for <=16M-pixel frames
(tested); the collapse profiles are *widened* to f64 (strictly more precise
than the reference's float accumulate) because the sync detector's
sliding-strip metric differences are tiny (syncdetector.c uses double).
"""

from __future__ import annotations

import jax.numpy as jnp

SPECIAL_THRESHOLD = 250.0  # dsp.c:57 — values beyond this are debug markers


def time_lowpass(screenbuffer: jnp.ndarray, frame: jnp.ndarray, motionblur) -> jnp.ndarray:
    """IIR frame averaging (dsp.c:22-33)."""
    mb = jnp.asarray(motionblur, jnp.float32)
    return screenbuffer * mb + frame * (1.0 - mb)


def autogain_run(frame: jnp.ndarray, lastmin, lastmax, norm: float = 0.1,
                 stats_only: bool = False):
    """Dynamic-range normalization with IIR min/max tracking (dsp.c:41-94).

    frame: f32[...]; returns (normalized, lastmin', lastmax', snr).
    Special-coloured pixels (|v| > 250) pass through unscaled and are
    excluded from min/max, matching PIXEL_SPECIAL_COLOURS_ENABLED builds.
    stats_only=True skips materializing the normalized frame (returns None
    in its slot) — for callers that fuse the normalize into a later
    elementwise pass (stream/pipeline._post_process_default_order).
    """
    f = frame
    flat0 = f.reshape(-1)[0]
    special = (f > SPECIAL_THRESHOLD) | (f < -SPECIAL_THRESHOLD)
    big = jnp.float32(3.4e38)
    # the reference seeds min=max=buffer[0] before the skip-specials loop
    # (dsp.c:50-59), so element 0 participates even when special — match it
    cur_min = jnp.minimum(jnp.min(jnp.where(special, big, f)), flat0)
    cur_max = jnp.maximum(jnp.max(jnp.where(special, -big, f)), flat0)

    one_minus = jnp.float32(1.0 - norm)
    lastmax2 = one_minus * lastmax + norm * cur_max
    lastmin2 = one_minus * lastmin + norm * cur_min
    span = jnp.where(lastmax2 == lastmin2, 1.0, lastmax2 - lastmin2)

    out = None if stats_only else jnp.where(special, f, (f - lastmin2) / span)

    # image SNR = mean/stdev (dsp.c:68-93). Reference quirk: the mean's sum
    # skips special pixels but divides by the full size (:60-68), while the
    # variance sums run over every pixel (:72-88) — match both.
    n = f.size
    mean = jnp.sum(jnp.where(special, 0.0, f), dtype=jnp.float32) / n
    d = f - mean
    sum2 = jnp.sum(d * d, dtype=jnp.float32)
    sum3 = jnp.sum(d, dtype=jnp.float32)
    var = (sum2 - sum3 * sum3 / n) / (n - 1)
    snr = mean / jnp.sqrt(jnp.maximum(var, 1e-30))
    return (None if out is None else out.astype(jnp.float32)), lastmin2, lastmax2, snr


def collapse_v_h(frame: jnp.ndarray, precise: bool = True,
                 widen: bool = True):
    """Column and row sums of an (H, W) frame (dsp.c:96-110).

    Returns (width_profile [W], height_profile [H]). The reference
    accumulates into float buffers (dsp.c:96-110); `precise=True` accumulates
    in f64 — strictly MORE precise than the reference, kept for deterministic
    CPU parity tests — but f64 is software-emulated on TPU and this is the
    only many-megapixel f64 op in the pipeline; `precise=False` accumulates
    in f32 (XLA tree reduction, closest to the reference's float loop) and,
    with `widen=True` (default), widens the ~4k-element profiles to f64 for
    the reference's double-math sync search. widen=False keeps the f32
    profiles for the fast_sync search path (Params.fast_sync).
    """
    dt = jnp.float64 if precise else jnp.float32
    out = jnp.float64 if widen else dt
    wprof = jnp.sum(frame, axis=0, dtype=dt).astype(out)
    hprof = jnp.sum(frame, axis=1, dtype=dt).astype(out)
    return wprof, hprof
