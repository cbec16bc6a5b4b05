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


@pytest.mark.parametrize("layout", ["u32", "u16"])
@pytest.mark.parametrize("dtype", ["uint8", "int8"])
def test_fused_demod_resample_matches_unfused(dtype, layout):
    """fused_demod_resample (interpret mode on CPU) == am_demod(normalize_iq)
    + box_resample_strided, for both raw byte encodings. layout="u16" is the
    measured-slower probe kept in bench/fused_u16_probe.py."""
    from tempestsdr_tpu.ops.demod import am_demod, normalize_iq
    from tempestsdr_tpu.ops.resample import box_resample_strided

    if layout == "u32":
        from tempestsdr_tpu.pallas.fused_kernel import fused_demod_resample
    else:
        # bench/ the directory is shadowed by bench.py the module: load by path
        import importlib.util
        import os

        path = os.path.join(os.path.dirname(__file__), "..", "bench",
                            "fused_u16_probe.py")
        spec = importlib.util.spec_from_file_location("fused_u16_probe", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fused_demod_resample = mod.fused_demod_resample_u16

    rng = np.random.default_rng(7)
    n = 1 << 14
    inv0 = 0.500004
    taps = 2
    max_pix = int(n / inv0 * 1.02) + 2
    raw = rng.integers(0, 256, size=2 * n).astype(dtype)
    if dtype == "int8":
        raw = (raw.astype(np.int16) - 128).astype(np.int8)
    raw = jnp.asarray(raw)
    tail = jnp.asarray(rng.normal(size=taps).astype(np.float32))
    phase = jnp.int64(-987654321)
    inv_fix = jnp.int64(round(inv0 * (1 << FRAC_BITS))) + 777

    env_ref = am_demod(normalize_iq(raw))
    px_ref, n_ref, ph_ref = box_resample_strided(
        jnp.concatenate([tail, env_ref]), phase, inv_fix,
        n_samples=n, max_pix=max_pix, taps=taps, inv_nominal=inv0,
    )
    env, px, n_out, ph = fused_demod_resample(
        raw, tail, phase, inv_fix,
        n_samples=n, max_pix=max_pix, taps=taps, inv_nominal=inv0,
    )
    assert int(n_out) == int(n_ref) and int(ph) == int(ph_ref)
    np.testing.assert_array_equal(np.asarray(env), np.asarray(env_ref))
    np.testing.assert_allclose(np.asarray(px), np.asarray(px_ref),
                               rtol=2e-5, atol=2e-5)


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
