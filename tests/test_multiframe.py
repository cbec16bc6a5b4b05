"""Multi-emit step (config.frames_per_block > 1): blocks spanning several
frames must produce the SAME frame stream as small single-emit blocks.

The reference has no block-size ceiling at all — its decimating thread polls
0.1-frame chunks and the post-proc thread re-chunks to exact frames via ring
buffers (TSDRLibrary.c:335-386), so frame output is block-size invariant by
construction. The TPU step folds in-place with a static emit contract; these
tests pin the same invariance for the K-slot emit chain that lets big blocks
amortize the per-block fixed cost (ROOFLINE.md).

All runs here pin framerate_pll=False: the PLL's refresh-delta feeds the
resampler at BLOCK cadence (every block size, K included, since round 1),
so with the PLL actively moving, different block sizes legitimately resample
frames 2..K of a block with a delta up to K-1 frames staler than a
small-block run would — the same cadence coarsening the reference has
between its per-frame PLL nudge and the next resampler poll."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tempestsdr_tpu.config import PipelineConfig
from tempestsdr_tpu.params import Params
from tempestsdr_tpu.stream import make_step, init_state
from tempestsdr_tpu.stream.pipeline import (
    StepControls,
    make_channels_step_hybrid,
)
from tempestsdr_tpu.stream.session import Session, SessionCallbacks
from tempestsdr_tpu.sources.synthetic import (
    SyntheticSource,
    render_test_pattern,
    synth_iq,
)

LINES, TWIDTH, REFRESH, SR = 100, 200, 50.0, 1e6
SMALL, BIG = 8192, 49152  # 49152 = 6*8192 ~ 2.46 frames -> K = 3
TOTAL = 393216  # = 48 small = 8 big blocks


def _cfg(block, autocorr=False):
    return PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                          block_samples=block, autocorr=autocorr)


def _stream(noise=0.005, seed_pattern=None):
    raster = seed_pattern if seed_pattern is not None else render_test_pattern(LINES, TWIDTH)
    return synth_iq(raster, samplerate=SR, pixelclock=LINES * TWIDTH * REFRESH,
                    n_samples=TOTAL, noise=noise)


def _run(block, iq, events=None, autocorr=False, params=None):
    """Drive make_step over the same sample stream cut into `block`-sized
    chunks; `events` maps a start-sample position -> (dropped, syncoffset)."""
    cfg = _cfg(block, autocorr)
    params = params or Params(framerate_pll=False)
    step = jax.jit(make_step(cfg, params), donate_argnums=0)
    state = init_state(cfg, params.fir_lowpass_taps)
    frames, plots = [], []
    for i in range(TOTAL // block):
        raw = iq[2 * i * block: 2 * (i + 1) * block]
        dropped, sync = (events or {}).get(i * block, (0, 0))
        ctrl = StepControls(jnp.int64(dropped), jnp.int32(sync), jnp.float32(0.0))
        state, out = step(state, jnp.asarray(raw), ctrl)
        fv = np.asarray(out.frame_valid)
        if fv.ndim == 0:
            if fv:
                frames.append(np.asarray(out.frame))
        else:
            fr = np.asarray(out.frame)
            frames.extend(fr[k] for k in np.flatnonzero(fv))
        if autocorr and bool(out.ac_plot_valid):
            plots.append((np.asarray(out.ac_frame_plot),
                          np.asarray(out.ac_line_plot),
                          int(out.ac_calls)))
    return cfg, frames, plots, state


def test_frames_per_block_derivation():
    assert _cfg(SMALL).frames_per_block == 1
    cfg = _cfg(BIG)
    assert cfg.frames_per_block >= 2
    # the static bound really bounds the per-block pixel production
    assert cfg.max_block_pixels < cfg.frames_per_block * cfg.frame_pixels


def test_multiframe_step_matches_single_emit():
    """BIG blocks (K frames per step) produce bit-identical frames, in the
    same order, as SMALL single-emit blocks over the same sample stream."""
    iq = _stream()
    _, f_small, _, _ = _run(SMALL, iq)
    _, f_big, _, _ = _run(BIG, iq)
    assert len(f_small) == len(f_big) >= 18
    for a, b in zip(f_small, f_big):
        np.testing.assert_array_equal(a, b)


def test_multiframe_autocorr_rounds_match():
    """Estimator rounds (FFT + running averages) are block-size invariant
    through the multi-emit step too."""
    iq = _stream()
    _, f_small, p_small, _ = _run(SMALL, iq, autocorr=True)
    _, f_big, p_big, _ = _run(BIG, iq, autocorr=True)
    assert len(p_small) == len(p_big) >= 2
    for (af, al, ac), (bf, bl, bc) in zip(p_small, p_big):
        assert ac == bc
        np.testing.assert_array_equal(af, bf)
        np.testing.assert_array_equal(al, bl)
    assert len(f_small) == len(f_big)
    for a, b in zip(f_small, f_big):
        np.testing.assert_array_equal(a, b)


def test_multiframe_drop_and_sync_shift_match():
    """Drop compensation (whole-2-frame skip) and the manual sync-offset
    pixel skip land identically when the event block is K frames wide."""
    iq = _stream()
    # events at sample positions that are block boundaries in BOTH runs
    events = {BIG * 2: (12345, 0), BIG * 5: (0, 37)}
    _, f_small, _, _ = _run(SMALL, iq, events=events)
    _, f_big, _, _ = _run(BIG, iq, events=events)
    assert len(f_small) == len(f_big) > 0
    for a, b in zip(f_small, f_big):
        np.testing.assert_array_equal(a, b)


def test_multiframe_state_carries_identically():
    """The full carried pytree (resampler phase, fill, autogain, sync, PLL,
    estimator) matches after the same samples regardless of block size."""
    iq = _stream()
    *_, st_small = _run(SMALL, iq, autocorr=True)
    *_, st_big = _run(BIG, iq, autocorr=True)
    assert int(st_small.frame_count) == int(st_big.frame_count)
    assert int(st_small.fill) == int(st_big.fill)
    assert int(st_small.phase_fix) == int(st_big.phase_fix)
    np.testing.assert_array_equal(np.asarray(st_small.screenbuffer),
                                  np.asarray(st_big.screenbuffer))
    np.testing.assert_array_equal(np.asarray(st_small.ac_avg_frame),
                                  np.asarray(st_big.ac_avg_frame))
    assert float(st_small.ag_min) == float(st_big.ag_min)
    assert float(st_small.ag_max) == float(st_big.ag_max)


def test_multiframe_session_end_to_end():
    """A Session on a multi-frame block geometry emits every frame through
    the callback surface (per-block and batched dispatch paths)."""
    def run(batch):
        src = SyntheticSource()
        src.init(f"{LINES} {TWIDTH} {REFRESH} {SR} 0.01")
        frames = []
        sess = Session(_cfg(BIG), Params(framerate_pll=False), src,
                       SessionCallbacks(on_frame=frames.append),
                       batch_blocks=batch)
        n = sess.run(max_blocks=8 // max(batch, 1) * max(batch, 1))
        return frames, n

    f1, n1 = run(1)
    f2, n2 = run(2)
    assert n1 == len(f1) >= 8  # >1 frame per block on average
    assert n2 == len(f2) == n1
    for a, b in zip(f1, f2):
        np.testing.assert_array_equal(a, b)


def test_multiframe_hybrid_channels_matches_single():
    """The hybrid multi-channel step with K>1 blocks: each channel's frame
    stream equals its own single-channel run."""
    from tempestsdr_tpu.parallel.channels import stack_states

    cfg = _cfg(BIG)
    params = Params(framerate_pll=False)
    rasters = [render_test_pattern(LINES, TWIDTH),
               render_test_pattern(LINES, TWIDTH)[::-1].copy()]
    iqs = [_stream(seed_pattern=r) for r in rasters]

    singles = [_run(BIG, iq)[1] for iq in iqs]

    cstep = jax.jit(make_channels_step_hybrid(cfg, params, 2), donate_argnums=0)
    states = stack_states(cfg, 2)
    got = [[], []]
    for i in range(TOTAL // BIG):
        raws = jnp.stack([jnp.asarray(iq[2 * i * BIG: 2 * (i + 1) * BIG])
                          for iq in iqs])
        ctrl = StepControls(jnp.zeros((2,), jnp.int64), jnp.zeros((2,), jnp.int32),
                            jnp.zeros((2,), jnp.float32))
        states, out = cstep(states, raws, ctrl)
        fv = np.asarray(out.frame_valid)  # (C, K)
        fr = np.asarray(out.frame)        # (C, K, H, W)
        for c, k in np.argwhere(fv):
            got[c].append(fr[c, k])
    for c in range(2):
        assert len(got[c]) == len(singles[c]) > 0
        for a, b in zip(singles[c], got[c]):
            np.testing.assert_array_equal(a, b)


def test_batched_channels_step_rejects_multiframe():
    from tempestsdr_tpu.stream.pipeline import make_channels_step

    with pytest.raises(ValueError):
        make_channels_step(_cfg(BIG), Params(), 2)
    with pytest.raises(ValueError):
        make_channels_step_hybrid(_cfg(BIG), Params(), 2, cond_mode="batched")
