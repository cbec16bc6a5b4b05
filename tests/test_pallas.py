"""Pallas kernel correctness in interpreter mode (compiled-mode equivalence
is exercised on real TPU hardware by the bench/verify drives)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

from tempestsdr_tpu.config import FRAC_BITS
from tempestsdr_tpu.ops.resample import box_resample_block_chunked


@pytest.fixture()
def interpret_pallas(monkeypatch):
    import tempestsdr_tpu.pallas.resample_kernel as rk

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(rk.pl, "pallas_call", interp)
    return rk


@pytest.mark.parametrize("rate", [1.99876, 1.5123, 0.71234])
def test_pallas_resample_matches_chunked(interpret_pallas, rate):
    rk = interpret_pallas
    rng = np.random.default_rng(0)
    n = 4096
    inv = 1.0 / rate
    inv_fix = jnp.int64(round(inv * (1 << FRAC_BITS)))
    taps = int(np.ceil(inv)) + 1
    max_pix = int(n * rate) + 2
    phase = jnp.int64(-123456789)
    x_ext = jnp.asarray(
        np.concatenate([np.zeros(taps), rng.normal(size=n)]).astype(np.float32)
    )
    p1, n1, ph1 = box_resample_block_chunked(
        x_ext, phase, inv_fix, n_samples=n, max_pix=max_pix, taps=taps, inv_nominal=inv
    )
    p2, n2, ph2 = rk.box_resample_pallas(
        x_ext, phase, inv_fix, n_samples=n, max_pix=max_pix, taps=taps, inv_nominal=inv
    )
    assert int(n1) == int(n2) and int(ph1) == int(ph2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=3e-4, atol=3e-4)
