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


def demod_raw_interleaved(raw: jnp.ndarray) -> jnp.ndarray:
    """Fused normalize+demod for narrow interleaved IQ blocks.

    Bit-identical to am_demod(normalize_iq(raw)) for int8/uint8 input
    (the /128 scaling is exact in f32, sqrt is correctly rounded, and the
    pairing sum adds one exact I^2 to one exact Q^2 either way; int16's
    1/32767 scale reassociates within 1 ulp), but formed
    so the TPU never reshuffles lanes: each (I, Q) byte pair is BITCAST to
    one 16-bit lane and decoded elementwise. |I+jQ| is invariant to the
    byte order inside the pair, so no endianness fix-up is needed. Removes
    both measured demod formulations' costs (stride-2 relayout / pairing
    matmul + its HIGHEST-precision MXU pass) — the whole demod fuses into
    whatever consumes the envelope. Falls back to the generic pair for
    other dtypes. Reference: TSDRLibrary.c:244-262 + RawFile scaling
    (TSDRPlugin_RawFile.c:241-261).
    """
    dt = raw.dtype
    if raw.ndim == 1 and dt in (jnp.uint8, jnp.int8):
        x = lax.bitcast_convert_type(raw.reshape(-1, 2), jnp.uint16).astype(jnp.int32)
        lo, hi = x & 0xFF, x >> 8
        if dt == jnp.uint8:
            a = lo.astype(jnp.float32) - 128.0
            b = hi.astype(jnp.float32) - 128.0
        else:  # reinterpret each byte as signed: ((b ^ 128) - 128)
            a = (lo ^ 128).astype(jnp.float32) - 128.0
            b = (hi ^ 128).astype(jnp.float32) - 128.0
        return jnp.sqrt(a * a + b * b) * jnp.float32(1.0 / 128.0)
    if raw.ndim == 1 and dt == jnp.int16:
        x = lax.bitcast_convert_type(raw.reshape(-1, 2), jnp.int32)
        a = (((x & 0xFFFF) ^ 0x8000) - 0x8000).astype(jnp.float32)
        b = (x >> 16).astype(jnp.float32)  # arithmetic shift sign-extends
        return jnp.sqrt(a * a + b * b) * jnp.float32(1.0 / 32767.0)
    return am_demod(normalize_iq(raw))


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
