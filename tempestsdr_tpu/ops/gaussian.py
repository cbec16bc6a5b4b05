"""Circular 5-tap Gaussian smoothing of 1-D profiles.

Matches TempestSDR/src/gaussian.c: coefficients exp(-2*a^2*i^2/N^2) with
a=1, N=5, i in [-2,2], normalized (gaussian.c:14-28). The reference updates
in place with a ring of saved originals; functionally that is exactly a
circular convolution with the symmetric kernel, which is what we compute —
vectorized with rolls instead of the scalar ring loop.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp

_ALPHA = 1.0
_N = 5


@functools.lru_cache(None)
def _coeffs():
    cs = [math.exp(-2.0 * _ALPHA * _ALPHA * i * i / (_N * _N)) for i in (-2, -1, 0, 1, 2)]
    norm = sum(cs)
    return tuple(c / norm for c in cs)


def gaussian_blur_circular(profile: jnp.ndarray) -> jnp.ndarray:
    """profile: f[..., n] -> blurred f[..., n] (circular boundary)."""
    c = _coeffs()
    out = jnp.zeros_like(profile)
    for k, coeff in zip((-2, -1, 0, 1, 2), c):
        # out[j] = sum_k c_k * profile[(j+k) mod n]  (gaussian.c:52-57)
        out = out + coeff * jnp.roll(profile, -k, axis=-1)
    return out
