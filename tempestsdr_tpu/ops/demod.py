"""AM envelope demodulation and on-device IQ normalization.

am_demod mirrors TempestSDR/src/TSDRLibrary.c:244-262 (|I + jQ| per sample).
normalize_iq mirrors the RawFile plugin's per-format scaling
(TSDRPlugin_RawFile/src/TSDRPlugin_RawFile.c:241-261) but runs on device so
the host->HBM transfer carries the narrow raw dtype (8x less PCIe traffic for
uint8 captures than shipping float32).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from jax import lax

_PAIR_COLS = 256  # values per row in the MXU pairing formulation


@functools.lru_cache(None)
def _pairing_matrix():
    # cache the NUMPY constant only: a jnp array built during a jit trace is
    # a tracer, and caching one leaks it across transformations
    p = np.zeros((_PAIR_COLS, _PAIR_COLS // 2), np.float32)
    for i in range(_PAIR_COLS):
        p[i, i // 2] = 1.0
    return p


def am_demod(iq: jnp.ndarray) -> jnp.ndarray:
    """Envelope of interleaved IQ.

    iq: float32[2*n] interleaved I/Q, or complex64[n]. Returns float32[n].

    |I+jQ| = sqrt(I^2 + Q^2). TPU formulation (measured on a 524k-sample
    block): a stride-2 lane slice of the interleaved stream relayouts the
    whole block (~9 ms); square + stride-2 reduce_window is ~1 ms; the
    fastest form is an elementwise square followed by a pairing matmul
    against a static 0/1 matrix — the pairwise sum rides the MXU (~0.4 ms).
    The pairing is exact (each output is one I^2 plus one Q^2, no rounding
    beyond the f32 ops themselves).
    """
    if jnp.iscomplexobj(iq):
        return jnp.abs(iq).astype(jnp.float32)
    if iq.ndim == 1:
        y = iq * iq
        if y.shape[0] % _PAIR_COLS == 0:
            # Precision.HIGHEST: the TPU's default matmul rounds inputs to
            # bf16 (~0.4% error); the 3-pass f32 mode keeps the pairing exact
            e2 = jnp.dot(
                y.reshape(-1, _PAIR_COLS),
                jnp.asarray(_pairing_matrix()),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            return jnp.sqrt(e2).reshape(-1)
        power = lax.reduce_window(y, 0.0, lax.add, (2,), (2,), "VALID")
        return jnp.sqrt(power)
    i = iq[..., 0::2]
    q = iq[..., 1::2]
    return jnp.sqrt(i * i + q * q)


def normalize_iq(raw: jnp.ndarray) -> jnp.ndarray:
    """Convert raw recorded samples to float32 in [-1, 1].

    Scale factors per TSDRPlugin_RawFile.c:241-261:
      int8 /128, uint8 (x-128)/128, int16 /32767, uint16 (x-32767)/32767,
      float passthrough.
    """
    dt = raw.dtype
    if dt == jnp.float32:
        return raw
    if dt == jnp.int8:
        return raw.astype(jnp.float32) / 128.0
    if dt == jnp.uint8:
        return (raw.astype(jnp.float32) - 128.0) / 128.0
    if dt == jnp.int16:
        return raw.astype(jnp.float32) / 32767.0
    if dt == jnp.uint16:
        return (raw.astype(jnp.float32) - 32767.0) / 32767.0
    raise TypeError(f"unsupported IQ sample dtype {dt}")
