"""The dsp_post_process order matrix (dsp.c:134-239): all four combinations
of {lowpass_before_sync, autogain_after_proc} plus autoshift, validated
against a sequential numpy composition of the component oracles."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import oracles
from tempestsdr_tpu.config import PipelineConfig
from tempestsdr_tpu.params import Params
from tempestsdr_tpu.stream.pipeline import _post_process
from tempestsdr_tpu.ops.sync import PLLState, SweetspotState

H, W = 60, 222
SR = 1e6


def _mk_cfg():
    # geometry consistent with H and a refresh that derives width W
    refresh = SR / (W / 2 * H)
    return PipelineConfig(samplerate=SR, height=H, refreshrate=refresh,
                          block_samples=4096, autocorr=False)


def np_sweetspot_axis(profile, state, minsize, coeff):
    ss, dx, vx, _ = oracles.sweetspot(profile.astype(np.float64), int(state[0]),
                                      int(state[1]), minsize, coeff)
    return ss, dx, vx


def np_post_process(frame, screen, ag, sx, sy, motionblur, lowpass_before, ag_after,
                    autoshift):
    """Sequential mirror of dsp_post_process using the C-semantics oracles."""
    inp = frame
    if not ag_after:
        inp, mn, mx, snr = oracles.autogain(inp, ag[0], ag[1])
        ag = (mn, mx)

    def sync(data):
        wprof = data.sum(0, dtype=np.float64)
        hprof = data.sum(1, dtype=np.float64)
        ssx = np_sweetspot_axis(wprof, sx, int(W * np.float32(0.05)), 0.9)
        ssy = np_sweetspot_axis(hprof, sy, int(H * np.float32(0.01)), 0.1)
        out = data
        if autoshift:
            out = np.roll(data, (-ssy[1], -ssx[1]), axis=(0, 1))
        return out, ssx, ssy

    if lowpass_before:
        screen = screen * motionblur + inp * (1 - motionblur)
        syncres, ssx, ssy = sync(screen)
        result = syncres
        if ag_after:
            result, mn, mx, snr = oracles.autogain(syncres, ag[0], ag[1])
            ag = (mn, mx)
        screen_out = screen
    else:
        syncres, ssx, ssy = sync(inp)
        screen = screen * motionblur + syncres * (1 - motionblur)
        result = screen
        if ag_after:
            result, mn, mx, snr = oracles.autogain(screen, ag[0], ag[1])
            ag = (mn, mx)
        screen_out = screen
    return result, screen_out, ag, ssx, ssy


@pytest.mark.parametrize("lowpass_before", [False, True])
@pytest.mark.parametrize("ag_after", [False, True])
@pytest.mark.parametrize("autoshift", [False, True])
def test_post_process_order_matrix(lowpass_before, ag_after, autoshift):
    cfg = _mk_cfg()
    assert (cfg.height, cfg.width) == (H, W)
    params = Params(lowpass_before_sync=lowpass_before,
                    autogain_after_proc=ag_after,
                    autoshift=autoshift,
                    framerate_pll=False)
    rng = np.random.default_rng(5)
    frame = (rng.random((H, W)) * 2).astype(np.float32)
    frame[20:30] *= 0.1  # horizontal blanking band
    frame[:, 50:60] *= 0.1  # vertical blanking band
    screen = rng.random((H, W)).astype(np.float32)
    mb = 0.4

    # ours
    ag = (jnp.float32(0.1), jnp.float32(0.9), jnp.float32(1.0))
    sx = SweetspotState(jnp.int32(11), jnp.int32(3), jnp.int32(0))
    sy = SweetspotState(jnp.int32(2), jnp.int32(7), jnp.int32(0))
    pll = PLLState.init()
    f = jax.jit(lambda fr, sc: _post_process(cfg, params, fr, sc, ag, sx, sy, pll,
                                             jnp.float32(mb)))
    result, screen2, ag2, sx2, sy2, pll2 = f(jnp.asarray(frame), jnp.asarray(screen))

    # oracle composition
    r_ref, screen_ref, ag_ref, ssx, ssy = np_post_process(
        frame.copy(), screen.copy(), (0.1, 0.9), (11, 3), (2, 7), mb,
        lowpass_before, ag_after, autoshift)

    assert int(sx2.stripsize) == ssx[0] and int(sx2.dx) == ssx[1] and int(sx2.vx) == ssx[2]
    assert int(sy2.stripsize) == ssy[0] and int(sy2.dx) == ssy[1] and int(sy2.vx) == ssy[2]
    np.testing.assert_allclose(np.asarray(result), r_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(screen2), screen_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(ag2[0]), ag_ref[0], atol=1e-4)
    np.testing.assert_allclose(float(ag2[1]), ag_ref[1], atol=1e-4)


@pytest.mark.parametrize("autoshift", [False, True])
@pytest.mark.parametrize("markers", [False, True])
def test_default_order_fused_is_bit_exact(autoshift, markers):
    """_post_process_default_order (raw-frame collapse via the affine
    invariance of the sweet-spot metric + fused normalize/IIR pass) must be
    bit-identical to the general composition for the default order."""
    from tempestsdr_tpu.stream import pipeline as P
    from tempestsdr_tpu.ops.sync import PLLState as PLLS

    cfg = _mk_cfg()
    params = Params(autoshift=autoshift, debug_markers=markers,
                    framerate_pll=True)
    rng = np.random.default_rng(7)
    frame = (rng.random((H, W)) * 2).astype(np.float32)
    frame[20:30] *= 0.1
    frame[:, 50:60] *= 0.1
    screen = rng.random((H, W)).astype(np.float32)
    ag = (jnp.float32(0.1), jnp.float32(0.9), jnp.float32(1.0))
    sx = SweetspotState(jnp.int32(11), jnp.int32(3), jnp.int32(0))
    sy = SweetspotState(jnp.int32(2), jnp.int32(7), jnp.int32(0))

    def general(fr, sc):
        # the pre-fusion composition: autogain -> collapse(normalized) ->
        # sync detect -> IIR
        from tempestsdr_tpu.ops.frame import autogain_run, collapse_v_h, time_lowpass
        inp, mn, mx, snr = autogain_run(fr, ag[0], ag[1], 0.1)
        wp, hp = collapse_v_h(inp, cfg.high_precision_sync)
        syncres, sx2, sy2, pll2 = P._sync_detect(
            cfg, params, inp, sx, sy, PLLS.init(), wp, hp)
        sc2 = time_lowpass(sc, syncres, jnp.float32(0.4))
        return sc2, sc2, (mn, mx, snr), sx2, sy2, pll2

    r1 = jax.jit(general)(jnp.asarray(frame), jnp.asarray(screen))
    r2 = jax.jit(lambda fr, sc: P._post_process(
        cfg, params, fr, sc, ag, sx, sy, PLLS.init(), jnp.float32(0.4)))(
        jnp.asarray(frame), jnp.asarray(screen))
    assert int(r1[3].dx) == int(r2[3].dx) and int(r1[4].dx) == int(r2[4].dx)
    assert int(r1[3].stripsize) == int(r2[3].stripsize)
    assert int(r1[3].vx) == int(r2[3].vx)
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r2[0]))
    np.testing.assert_array_equal(np.asarray(r1[1]), np.asarray(r2[1]))
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(r1[2][i]), np.asarray(r2[2][i]))
