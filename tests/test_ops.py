"""Golden-output unit tests: vectorized TPU ops vs sequential C-semantics
oracles (SURVEY.md §4 test-pyramid item (a))."""

import numpy as np
import pytest
import jax.numpy as jnp

from tempestsdr_tpu.config import FRAC_BITS
from tempestsdr_tpu.ops import (
    am_demod,
    normalize_iq,
    gaussian_blur_circular,
    autocorrelation_magnitude,
    accumulate_running_mean,
    box_resample_block,
    nn_resample_block,
    design_lowpass_fir,
    fir_apply_block,
    autogain_run,
    collapse_v_h,
    time_lowpass,
    find_best_fit,
    find_the_sweet_spot,
    SweetspotState,
)
import oracles


def test_am_demod_matches_envelope():
    rng = np.random.default_rng(0)
    iq = rng.normal(size=4096).astype(np.float32)
    out = np.asarray(am_demod(jnp.asarray(iq)))
    i, q = iq[0::2], iq[1::2]
    np.testing.assert_allclose(out, np.sqrt(i * i + q * q), rtol=1e-6)


def test_demod_raw_interleaved_bitwise_matches_generic():
    """The u16-bitcast fused demod must be bit-identical to
    am_demod(normalize_iq(.)) for every narrow format (demod.py): the /2^k
    scalings are exact in f32 and sqrt is correctly rounded."""
    from tempestsdr_tpu.ops import demod_raw_interleaved
    from tempestsdr_tpu.ops.demod import am_demod, normalize_iq

    rng = np.random.default_rng(3)
    for dt, lo, hi in ((np.uint8, 0, 256), (np.int8, -128, 128)):
        raw = jnp.asarray(rng.integers(lo, hi, size=8192, dtype=dt))
        got = np.asarray(demod_raw_interleaved(raw))
        want = np.asarray(am_demod(normalize_iq(raw)))
        np.testing.assert_array_equal(got, want)
    # int16 scales by 1/32767 (not a power of two) -> 1-ulp reassociation
    raw = jnp.asarray(rng.integers(-32768, 32768, size=8192, dtype=np.int16))
    np.testing.assert_allclose(
        np.asarray(demod_raw_interleaved(raw)),
        np.asarray(am_demod(normalize_iq(raw))), rtol=3e-7)
    # f32 falls through to the generic pair
    raw = jnp.asarray(rng.normal(size=512).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(demod_raw_interleaved(raw)),
        np.asarray(am_demod(normalize_iq(raw))),
    )


def test_normalize_iq_formats():
    # TSDRPlugin_RawFile.c:241-261 scale factors
    assert np.isclose(float(normalize_iq(jnp.asarray([-128], jnp.int8))[0]), -1.0)
    assert np.isclose(float(normalize_iq(jnp.asarray([0], jnp.uint8))[0]), -1.0)
    assert np.isclose(float(normalize_iq(jnp.asarray([32767], jnp.int16))[0]), 1.0)
    assert np.isclose(
        float(normalize_iq(jnp.asarray([65535], jnp.uint16))[0]), 32768 / 32767
    )
    x = jnp.asarray([0.25], jnp.float32)
    assert float(normalize_iq(x)[0]) == 0.25


def test_gaussian_blur_matches_oracle():
    rng = np.random.default_rng(1)
    for n in (5, 17, 444, 600):
        data = rng.normal(size=n)
        ours = np.asarray(gaussian_blur_circular(jnp.asarray(data)))
        np.testing.assert_allclose(ours, oracles.gaussian_blur(data), rtol=1e-5, atol=1e-6)


def test_autocorrelation_matches_oracle():
    rng = np.random.default_rng(2)
    x = rng.normal(size=4096).astype(np.float32) + 1.0
    ours = np.asarray(autocorrelation_magnitude(jnp.asarray(x)))
    ref = oracles.autocorrelation_magnitude(x)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3 * ref.max())


def test_accumulate_running_mean():
    rng = np.random.default_rng(3)
    rounds = [rng.normal(size=64) for _ in range(5)]
    avg = jnp.zeros(64, jnp.float32)
    for k, r in enumerate(rounds, start=1):
        avg = accumulate_running_mean(avg, jnp.asarray(r, jnp.float32), k)
    np.testing.assert_allclose(np.asarray(avg), np.mean(rounds, axis=0), rtol=1e-4, atol=1e-5)


# generic-position rates only: any rate where block_size*rate is an exact
# integer in double hits the reference's block-boundary contrib quirk (see
# test_box_resample_exact_integer_rates)
@pytest.mark.parametrize("rate", [1.987654321, 1.512345677, 0.731234567, 0.314159265, 3.214159265])
def test_box_resample_matches_oracle_streaming(rate):
    """Stream several blocks through both implementations; the fixed-point
    phase carry must reproduce the reference's double-precision offsets."""
    rng = np.random.default_rng(4)
    n_samples = 1000
    n_blocks = 7
    inv = 1.0 / rate
    inv_fix = jnp.int64(round(inv * (1 << FRAC_BITS)))
    taps = int(np.ceil(inv)) + 1
    max_pix = int(n_samples * rate) + 2

    import jax

    fn = jax.jit(
        lambda xe, ph: box_resample_block(
            xe, ph, inv_fix, n_samples=n_samples, max_pix=max_pix, taps=taps
        )
    )
    offset, contrib = 0.0, 0.0
    phase = jnp.int64(0)
    tail = jnp.zeros(taps, jnp.float32)
    for b in range(n_blocks):
        x = rng.normal(size=n_samples).astype(np.float32)
        ref, offset, contrib, n_written = oracles.resample_linear(x, offset, contrib, rate)
        x_ext = jnp.concatenate([tail, jnp.asarray(x)])
        pix, n_out, phase = fn(x_ext, phase)
        n_out = int(n_out)
        assert n_out == len(ref), f"block {b}: {n_out} vs {len(ref)}"
        # compare only pixels the C loop actually wrote (see oracle note on
        # the exact-block-boundary contrib-drop quirk)
        np.testing.assert_allclose(
            np.asarray(pix[:n_written]), ref[:n_written], rtol=2e-4, atol=2e-4
        )
        # fixed-point phase tracks the double offset
        assert abs(float(phase) / (1 << FRAC_BITS) - offset) < 1e-6
        tail = x_ext[x_ext.shape[0] - taps:]


@pytest.mark.parametrize("rate", [2.0, 1.0])
def test_box_resample_exact_integer_rates(rate):
    """At exactly pixel-aligned rates the C loop mis-emits the block-seam
    pixel (its `contrib` from the unemitted final pixel leaks into pixel 1 of
    the next block — dsp.c:288-303); the TPU implementation produces the
    mathematically correct box integral, asserted here directly."""
    import jax

    rng = np.random.default_rng(11)
    n_samples = 500
    inv_fix = jnp.int64(round((1.0 / rate) * (1 << FRAC_BITS)))
    taps = int(np.ceil(1.0 / rate)) + 1
    max_pix = int(n_samples * rate) + 2
    phase = jnp.int64(0)
    tail = jnp.zeros(taps, jnp.float32)
    for _ in range(3):
        x = rng.normal(size=n_samples).astype(np.float32)
        x_ext = jnp.concatenate([tail, jnp.asarray(x)])
        pix, n_out, phase = box_resample_block(
            x_ext, phase, inv_fix, n_samples=n_samples, max_pix=max_pix, taps=taps
        )
        n_out = int(n_out)
        assert n_out == int(n_samples * rate)
        expected = x[(np.arange(n_out) / rate).astype(np.int64)]
        np.testing.assert_allclose(np.asarray(pix[:n_out]), expected, rtol=1e-5)
        tail = x_ext[x_ext.shape[0] - taps:]


@pytest.mark.parametrize("rate", [1.987654321, 1.512345677, 0.731234567, 0.314159265, 3.214159265])
def test_box_resample_chunked_matches_exact(rate):
    """The TPU-fast chunked resampler must match the exact int64 version to
    f32 tolerance with bit-identical integer carries."""
    import jax
    from tempestsdr_tpu.ops import box_resample_block_chunked

    rng = np.random.default_rng(12)
    n_samples = 1000
    inv = 1.0 / rate
    inv_fix = jnp.int64(round(inv * (1 << FRAC_BITS)))
    taps = int(np.ceil(inv)) + 1
    max_pix = int(n_samples * rate) + 2
    f_exact = jax.jit(lambda xe, ph: box_resample_block(
        xe, ph, inv_fix, n_samples=n_samples, max_pix=max_pix, taps=taps))
    f_chunk = jax.jit(lambda xe, ph: box_resample_block_chunked(
        xe, ph, inv_fix, n_samples=n_samples, max_pix=max_pix, taps=taps,
        inv_nominal=inv))
    phase_e = phase_c = jnp.int64(0)
    tail = jnp.zeros(taps, jnp.float32)
    for _ in range(5):
        x = rng.normal(size=n_samples).astype(np.float32)
        x_ext = jnp.concatenate([tail, jnp.asarray(x)])
        pe, ne, phase_e = f_exact(x_ext, phase_e)
        pc, nc, phase_c = f_chunk(x_ext, phase_c)
        assert int(ne) == int(nc)
        assert int(phase_e) == int(phase_c)
        np.testing.assert_allclose(np.asarray(pc), np.asarray(pe), rtol=3e-4, atol=3e-4)
        tail = x_ext[x_ext.shape[0] - taps:]


def test_box_resample_strided_matches_streaming():
    """The strided (near-rational) fast path must track the chunked form
    across blocks, including PLL-perturbed rates in both directions."""
    from tempestsdr_tpu.ops import box_resample_block_chunked, box_resample_strided

    rng = np.random.default_rng(14)
    n = 1 << 14
    inv0 = 0.500004  # flagship-like 2x oversampling
    taps = 2
    max_pix = int(n / inv0 * 1.02) + 2
    for scale in (1.0, 1.001, 1 / 1.001):
        inv_fix = jnp.int64(round(inv0 * scale * (1 << FRAC_BITS)))
        ph1 = ph2 = jnp.int64(0)
        tail = jnp.zeros(taps, jnp.float32)
        for _ in range(3):
            x = jnp.concatenate([tail, jnp.asarray(rng.normal(size=n).astype(np.float32))])
            p1, n1, ph1 = box_resample_block_chunked(
                x, ph1, inv_fix, n_samples=n, max_pix=max_pix, taps=taps, inv_nominal=inv0)
            p2, n2, ph2 = box_resample_strided(
                x, ph2, inv_fix, n_samples=n, max_pix=max_pix, taps=taps, inv_nominal=inv0)
            assert int(n1) == int(n2) and int(ph1) == int(ph2)
            np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=4e-4, atol=4e-4)
            tail = x[x.shape[0] - taps:]


def test_box_resample_strided_pallas_matches_streaming():
    """The Mosaic strided kernel (interpret mode on CPU) must track the XLA
    strided form across blocks and PLL-perturbed rates, with identical
    int64 carries (pallas/strided_kernel.py)."""
    from tempestsdr_tpu.ops import box_resample_strided
    from tempestsdr_tpu.pallas.strided_kernel import box_resample_strided_pallas

    rng = np.random.default_rng(15)
    n = 1 << 14
    inv0 = 0.500004
    taps = 2
    max_pix = int(n / inv0 * 1.02) + 2
    for scale in (1.0, 1.001, 1 / 1.001):
        inv_fix = jnp.int64(round(inv0 * scale * (1 << FRAC_BITS)))
        ph1 = ph2 = jnp.int64(0)
        tail = jnp.zeros(taps, jnp.float32)
        for _ in range(3):
            x = jnp.concatenate([tail, jnp.asarray(rng.normal(size=n).astype(np.float32))])
            p1, n1, ph1 = box_resample_strided(
                x, ph1, inv_fix, n_samples=n, max_pix=max_pix, taps=taps, inv_nominal=inv0)
            p2, n2, ph2 = box_resample_strided_pallas(
                x, ph2, inv_fix, n_samples=n, max_pix=max_pix, taps=taps, inv_nominal=inv0)
            assert int(n1) == int(n2) and int(ph1) == int(ph2)
            np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=4e-4, atol=4e-4)
            tail = x[x.shape[0] - taps:]


@pytest.mark.parametrize("rate", [1.99876, 1.5123, 0.71234])
def test_box_resample_gather_variant_matches(rate):
    from tempestsdr_tpu.ops.resample import box_resample_gather_i32

    rng = np.random.default_rng(13)
    n = 4096
    inv = 1.0 / rate
    inv_fix = jnp.int64(round(inv * (1 << FRAC_BITS)))
    taps = int(np.ceil(inv)) + 1
    max_pix = int(n * rate) + 2
    x = jnp.asarray(np.concatenate([np.zeros(taps), rng.normal(size=n)]).astype(np.float32))
    kw = dict(n_samples=n, max_pix=max_pix, taps=taps, inv_nominal=inv)
    from tempestsdr_tpu.ops import box_resample_block_chunked

    p1, n1, ph1 = box_resample_block_chunked(x, jnp.int64(-12345), inv_fix, **kw)
    p2, n2, ph2 = box_resample_gather_i32(x, jnp.int64(-12345), inv_fix, **kw)
    assert int(n1) == int(n2) and int(ph1) == int(ph2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("rate", [2.0, 1.912345678, 0.712345678])
def test_nn_resample_matches_oracle(rate):
    rng = np.random.default_rng(5)
    n_samples = 1000
    inv_fix = jnp.int64(round((1.0 / rate) * (1 << FRAC_BITS)))
    max_pix = int(n_samples * rate) + 2
    offset = 0.0
    phase = jnp.int64(0)
    for _ in range(4):
        x = rng.normal(size=n_samples).astype(np.float32)
        ref, offset = oracles.resample_nn(x, offset, rate)
        pix, n_out, phase = nn_resample_block(
            jnp.asarray(x), phase, inv_fix, n_samples=n_samples, max_pix=max_pix
        )
        n_out = int(n_out)
        assert n_out == len(ref)
        np.testing.assert_allclose(np.asarray(pix[:n_out]), ref, rtol=1e-6)


def test_fir_streaming_equals_full_convolution():
    rng = np.random.default_rng(6)
    taps = jnp.asarray(design_lowpass_fir(31, 0.5))
    x = rng.normal(size=3000).astype(np.float32)
    # streaming in 3 blocks
    tail = jnp.zeros(30, jnp.float32)
    outs = []
    for b in range(3):
        y, tail = fir_apply_block(jnp.asarray(x[b * 1000 : (b + 1) * 1000]), tail, taps)
        outs.append(np.asarray(y))
    ours = np.concatenate(outs)
    ref = np.convolve(np.concatenate([np.zeros(30), x]), np.asarray(taps), mode="valid")
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_autogain_matches_oracle():
    rng = np.random.default_rng(7)
    frame = rng.normal(size=(60, 80)).astype(np.float32) * 3 + 1
    frame[5, 5] = 512.0  # special marker passes through
    lastmin = lastmax = 0.0
    ref, rmn, rmx, rsnr = oracles.autogain(frame, lastmin, lastmax)
    out, mn, mx, snr = autogain_run(jnp.asarray(frame), jnp.float32(0), jnp.float32(0))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    assert abs(float(mn) - rmn) < 1e-4 and abs(float(mx) - rmx) < 1e-4
    assert abs(float(snr) - rsnr) < 1e-2


def test_collapse_and_lowpass():
    rng = np.random.default_rng(8)
    f = rng.normal(size=(40, 50)).astype(np.float32)
    wp, hp = collapse_v_h(jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(wp), f.sum(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hp), f.sum(1), rtol=1e-5)
    s = rng.normal(size=(40, 50)).astype(np.float32)
    out = time_lowpass(jnp.asarray(s), jnp.asarray(f), 0.75)
    np.testing.assert_allclose(np.asarray(out), s * 0.75 + f * 0.25, rtol=1e-5)


def test_find_best_fit_matches_oracle():
    rng = np.random.default_rng(9)
    for n, s in ((100, 7), (444, 22), (333, 166)):
        data = rng.normal(size=n) ** 2
        rfit, rid = oracles.find_best_fit(data, s)
        fit, i = find_best_fit(jnp.asarray(data), jnp.sum(jnp.asarray(data)), s)
        assert int(i) == rid, (n, s)
        np.testing.assert_allclose(float(fit), rfit, rtol=1e-9)


def test_sweetspot_matches_oracle():
    rng = np.random.default_rng(10)
    n = 222
    # profile with a clear dark strip, like a blanking interval
    data = rng.normal(size=n) ** 2 + 10.0
    data[60:80] *= 0.1
    st = SweetspotState(jnp.int32(16), jnp.int32(0), jnp.int32(0))
    rss, rdx, rvx, _ = oracles.sweetspot(data.copy(), 16, 0, int(n * 0.05), 0.9)
    st2, _, _ = find_the_sweet_spot(st, jnp.asarray(data), int(n * 0.05), 0.9)
    assert int(st2.stripsize) == rss
    assert int(st2.dx) == rdx
    assert int(st2.vx) == rvx


def test_sweetspot_pair_matches_two_single_calls():
    """The fused two-axis search (one batched doubled-cumsum, shared
    metric/argmax — ops/sync.py find_the_sweet_spot_pair) must reproduce two
    independent find_the_sweet_spot calls bit-exactly, including when the
    axes differ in length (padding columns masked) and across several
    rounds of strip-size adaptation."""
    from tempestsdr_tpu.ops.sync import find_the_sweet_spot_pair

    rng = np.random.default_rng(11)
    for nx, ny in ((222, 222), (424, 628), (628, 424), (100, 333)):
        dx = rng.normal(size=nx) ** 2 + 10.0
        dx[nx // 3 : nx // 3 + nx // 12] *= 0.1
        dy = rng.normal(size=ny) ** 2 + 10.0
        dy[ny // 2 : ny // 2 + ny // 20] *= 0.05
        sx = SweetspotState(jnp.int32(16), jnp.int32(3), jnp.int32(0))
        sy = SweetspotState(jnp.int32(8), jnp.int32(7), jnp.int32(0))
        for _ in range(4):
            ex, bx, ix = find_the_sweet_spot(sx, jnp.asarray(dx), int(nx * 0.05), 0.9)
            ey, by, iy = find_the_sweet_spot(sy, jnp.asarray(dy), int(ny * 0.01), 0.1)
            gx, gy, (pbx, pby), (px, py) = find_the_sweet_spot_pair(
                sx, jnp.asarray(dx), int(nx * 0.05), 0.9,
                sy, jnp.asarray(dy), int(ny * 0.01), 0.1,
            )
            for want, got in ((ex, gx), (ey, gy)):
                assert int(want.stripsize) == int(got.stripsize), (nx, ny)
                assert int(want.dx) == int(got.dx), (nx, ny)
                assert int(want.vx) == int(got.vx), (nx, ny)
            assert int(ix) == int(px) and int(iy) == int(py)
            np.testing.assert_array_equal(np.asarray(bx), np.asarray(pbx))
            np.testing.assert_array_equal(np.asarray(by), np.asarray(pby))
            sx, sy = ex, ey


def test_framerate_pll_clamps_to_static_headroom():
    """The PLL delta must saturate at PLL_HEADROOM_FRAC * nominal: every
    resampler buffer (max_block_pixels, strided taps_eff) is statically
    sized for that excursion, so an unbounded unlocked walk would silently
    truncate frames (the reference instead re-derives geometry,
    set_internal_samplerate TSDRLibrary.c:540-550)."""
    from tempestsdr_tpu.config import PLL_HEADROOM_FRAC
    from tempestsdr_tpu.ops.sync import PLLState, framerate_pll

    nominal = 60.0
    lim = PLL_HEADROOM_FRAC * nominal
    pll = PLLState.init()
    # hammer with a large constant velocity: unlocked speed 1e-5 * 1000
    for _ in range(50):
        pll = framerate_pll(pll, jnp.int32(1000), enabled=True, max_delta=lim)
    assert abs(float(pll.refresh_delta)) <= lim + 1e-7
    # and the other direction
    pll = PLLState.init()
    for _ in range(50):
        pll = framerate_pll(pll, jnp.int32(-1000), enabled=True, max_delta=lim)
    assert abs(float(pll.refresh_delta)) <= lim + 1e-7
    # small velocities stay unclamped (normal tracking unaffected):
    # vx=1 from init -> avg=0.01 -> locked branch, nudge = avg*1e-6 = 1e-8
    pll = PLLState.init()
    pll = framerate_pll(pll, jnp.int32(1), enabled=True, max_delta=lim)
    assert abs(float(pll.refresh_delta)) == pytest.approx(1e-8, rel=1e-3)
