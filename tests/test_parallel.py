"""Multi-device tests on the 8-virtual-CPU-device mesh (SURVEY.md §4c):
sharded pipelines must reproduce the single-chip stream."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tempestsdr_tpu.config import PipelineConfig
from tempestsdr_tpu.params import Params
from tempestsdr_tpu.stream import make_step, init_state
from tempestsdr_tpu.stream.pipeline import StepControls
from tempestsdr_tpu.parallel import (
    make_mesh,
    make_channel_step,
    make_time_sharded_step,
    stack_states,
)
from tempestsdr_tpu.sources.synthetic import render_test_pattern, synth_iq

SR, LINES, TWIDTH, REFRESH = 1e6, 100, 200, 50.0


def gen_blocks(n_blocks, block_samples, noise=0.01, seed=0, lines=LINES, twidth=TWIDTH):
    raster = render_test_pattern(lines, twidth, seed=seed)
    pixclock = lines * twidth * REFRESH
    blocks = []
    pos = 0
    for _ in range(n_blocks):
        blocks.append(
            synth_iq(raster, samplerate=SR, pixelclock=pixclock,
                     n_samples=block_samples, start_sample=pos, noise=noise, seed=seed)
        )
        pos += block_samples
    return blocks


def test_time_sharded_matches_single_chip():
    """PLL off: the sharded stream must track the single-chip one to float
    tolerance with bit-exact integer carries. (With the PLL on, one-ulp
    reduction-order differences between the two XLA programs can flip the
    argmax-derived sync position by +-1 and the feedback amplifies it — see
    test_time_sharded_pll_behaviour.)"""
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=True)
    params = Params(framerate_pll=False)
    mesh = make_mesh(n_channel=1, n_time=8)

    blocks = gen_blocks(40, cfg.block_samples)
    ctrl = StepControls.default()

    step1 = jax.jit(make_step(cfg, params))
    stepT = make_time_sharded_step(cfg, params, mesh)

    s1 = init_state(cfg)
    sT = init_state(cfg)
    for b, blk in enumerate(blocks):
        raw = jnp.asarray(blk)
        s1, o1 = step1(s1, raw, ctrl)
        sT, oT = stepT(sT, raw, ctrl)
        assert int(o1.n_pixels) == int(oT.n_pixels), b
        assert bool(o1.frame_valid) == bool(oT.frame_valid), b
        if bool(o1.frame_valid):
            np.testing.assert_allclose(
                np.asarray(o1.frame), np.asarray(oT.frame), rtol=2e-3, atol=2e-3
            )
    # exact integer carries must match bit-for-bit
    assert int(s1.phase_fix) == int(sT.phase_fix)
    assert int(s1.fill) == int(sT.fill)
    assert int(s1.frame_count) == int(sT.frame_count)
    assert int(s1.ac_calls) == int(sT.ac_calls)
    np.testing.assert_allclose(
        np.asarray(s1.ac_avg_frame), np.asarray(sT.ac_avg_frame), rtol=1e-3, atol=1e-4
    )


def test_time_sharded_pll_behaviour():
    """PLL on: both implementations must stay locked near the true rate even
    though their trajectories are not bit-identical."""
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    params = Params(framerate_pll=True)
    mesh = make_mesh(n_channel=1, n_time=8)
    blocks = gen_blocks(40, cfg.block_samples)
    ctrl = StepControls.default()
    step1 = jax.jit(make_step(cfg, params))
    stepT = make_time_sharded_step(cfg, params, mesh)
    s1 = init_state(cfg)
    sT = init_state(cfg)
    for blk in blocks:
        raw = jnp.asarray(blk)
        s1, _ = step1(s1, raw, ctrl)
        sT, _ = stepT(sT, raw, ctrl)
    d1 = float(np.asarray(s1.pll.refresh_delta))
    dT = float(np.asarray(sT.pll.refresh_delta))
    # generator matches the nominal rate: deltas must stay tiny and agree
    assert abs(d1) < 2e-3 and abs(dT) < 2e-3
    assert abs(d1 - dT) < 2e-3


def test_time_sharded_with_fir_matches_single_chip():
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    params = Params(framerate_pll=False, fir_lowpass_taps=31)
    mesh = make_mesh(n_channel=1, n_time=4)
    blocks = gen_blocks(20, cfg.block_samples)
    ctrl = StepControls.default()
    step1 = jax.jit(make_step(cfg, params))
    stepT = make_time_sharded_step(cfg, params, mesh)
    s1 = init_state(cfg, params.fir_lowpass_taps)
    sT = init_state(cfg, params.fir_lowpass_taps)
    last1 = lastT = None
    for blk in blocks:
        raw = jnp.asarray(blk)
        s1, o1 = step1(s1, raw, ctrl)
        sT, oT = stepT(sT, raw, ctrl)
        if bool(o1.frame_valid):
            last1, lastT = np.asarray(o1.frame), np.asarray(oT.frame)
    assert last1 is not None
    np.testing.assert_allclose(last1, lastT, rtol=2e-3, atol=2e-3)


def test_time_sharded_nn_matches_single_chip():
    """Nearest-neighbour mode under time sharding (dsp.c:274-277): NN's
    global (n*p)//n_out mapping resamples from the gathered envelope; frames
    and integer carries must match the single-chip NN step."""
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    params = Params(framerate_pll=False, nearest_neighbour=True)
    mesh = make_mesh(n_channel=1, n_time=8)
    blocks = gen_blocks(24, cfg.block_samples)
    ctrl = StepControls.default()
    step1 = jax.jit(make_step(cfg, params))
    stepT = make_time_sharded_step(cfg, params, mesh)
    s1 = init_state(cfg)
    sT = init_state(cfg)
    frames = 0
    for b, blk in enumerate(blocks):
        raw = jnp.asarray(blk)
        s1, o1 = step1(s1, raw, ctrl)
        sT, oT = stepT(sT, raw, ctrl)
        assert int(o1.n_pixels) == int(oT.n_pixels), b
        assert bool(o1.frame_valid) == bool(oT.frame_valid), b
        if bool(o1.frame_valid):
            frames += 1
            np.testing.assert_allclose(
                np.asarray(o1.frame), np.asarray(oT.frame), rtol=2e-3, atol=2e-3
            )
    assert frames > 0
    assert int(s1.phase_fix) == int(sT.phase_fix)
    assert int(s1.fill) == int(sT.fill)


def test_box_resample_range_strided_matches_chunked():
    """The strided range form (the sharded fast path) must agree with the
    chunked range form on identical shard inputs — same windows/weights, the
    only difference is f32 residual rounding (~1e-5 sample)."""
    from tempestsdr_tpu.config import FRAC_BITS
    from tempestsdr_tpu.ops.resample import (
        box_resample_range,
        box_resample_range_strided,
        resample_counts,
    )

    rng = np.random.default_rng(3)
    inv = 0.497  # ~2x oversampled geometry -> strided plan exists
    inv_fix = jnp.int64(round(inv * (1 << FRAC_BITS)))
    taps = 2
    S, T = 8192, 4
    n = S * T
    env = rng.normal(size=n).astype(np.float32) ** 2
    tail = np.zeros(taps, np.float32)
    phase = jnp.int64(-(1 << (FRAC_BITS - 2)))
    n_out, _ = resample_counts(phase, inv_fix, n)
    max_pix_local = int(S / inv * 1.02) + 2
    x_full = np.concatenate([tail, env, np.zeros(taps, np.float32)])
    for t in range(T):
        seg = jnp.int64(t * S)
        x_local = jnp.asarray(x_full[t * S : t * S + S + 2 * taps])
        lo = -((-((seg << FRAC_BITS) - phase)) // inv_fix)  # ceil_div
        hi = -((-(((seg + S) << FRAC_BITS) - phase)) // inv_fix)
        p_start = jnp.clip(lo, 0, n_out.astype(jnp.int64))
        p_end = jnp.clip(hi, 0, n_out.astype(jnp.int64))
        a = box_resample_range(
            x_local, phase, inv_fix, p_start, p_end, seg,
            max_pix=max_pix_local, taps=taps, inv_nominal=inv,
        )
        b = box_resample_range_strided(
            x_local, phase, inv_fix, p_start, p_end, seg,
            max_pix=max_pix_local, taps=taps, inv_nominal=inv,
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_channel_dp_matches_per_channel():
    """8 channels sharded over 8 devices == 8 independent single-chip runs."""
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    params = Params(framerate_pll=False)
    mesh = make_mesh(n_channel=8, n_time=1)
    C = 8
    n_blocks = 16

    per_ch_blocks = [gen_blocks(n_blocks, cfg.block_samples, seed=c) for c in range(C)]

    stepC = make_channel_step(cfg, params, mesh)
    states = stack_states(cfg, C)
    ctrl = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (C,) + x.shape),
                        StepControls.default())
    frames_dp = [None] * C
    for b in range(n_blocks):
        raws = jnp.stack([jnp.asarray(per_ch_blocks[c][b]) for c in range(C)])
        states, outs = stepC(states, raws, ctrl)
        fv = np.asarray(outs.frame_valid)
        for c in range(C):
            if fv[c]:
                frames_dp[c] = np.asarray(outs.frame[c])

    step1 = jax.jit(make_step(cfg, params))
    for c in [0, 3, 7]:
        s = init_state(cfg)
        last = None
        for b in range(n_blocks):
            s, o = step1(s, jnp.asarray(per_ch_blocks[c][b]), StepControls.default())
            if bool(o.frame_valid):
                last = np.asarray(o.frame)
        np.testing.assert_allclose(frames_dp[c], last, rtol=1e-4, atol=1e-5)


def test_channel_dp_multiframe_matches_per_channel():
    """K>1 multi-frame emit through the sharded channels path (round-4
    VERDICT #8): make_channel_step with blocks spanning ~2.5 frames must
    reproduce independent single-chip runs frame-for-frame, in stream
    order, on the 8-device 'ch' mesh."""
    big = 49152  # ~2.46 frames at SR/REFRESH=20000 samples/frame -> K=3
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=big, autocorr=False)
    assert cfg.frames_per_block >= 2
    params = Params(framerate_pll=False)
    mesh = make_mesh(n_channel=8, n_time=1)
    C = 8
    n_blocks = 6

    per_ch_blocks = [gen_blocks(n_blocks, big, seed=c) for c in range(C)]

    stepC = make_channel_step(cfg, params, mesh)
    states = stack_states(cfg, C)
    ctrl = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (C,) + x.shape),
                        StepControls.default())
    frames_dp = {c: [] for c in range(C)}
    for b in range(n_blocks):
        raws = jnp.stack([jnp.asarray(per_ch_blocks[c][b]) for c in range(C)])
        states, outs = stepC(states, raws, ctrl)
        fv = np.asarray(outs.frame_valid)  # (C, K)
        fr = np.asarray(outs.frame)        # (C, K, H, W)
        for c in range(C):
            for k in range(fv.shape[1]):
                if fv[c, k]:
                    frames_dp[c].append(fr[c, k])

    step1 = jax.jit(make_step(cfg, params))
    for c in [0, 2, 7]:
        s = init_state(cfg)
        got = []
        for b in range(n_blocks):
            s, o = step1(s, jnp.asarray(per_ch_blocks[c][b]),
                         StepControls.default())
            fv = np.asarray(o.frame_valid)
            fr = np.asarray(o.frame)
            for k in range(fv.shape[0]):
                if fv[k]:
                    got.append(fr[k])
        assert len(got) == len(frames_dp[c]) and len(got) >= n_blocks
        for a, b2 in zip(frames_dp[c], got):
            np.testing.assert_allclose(a, b2, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(states.frame_count[c]),
                                      np.asarray(s.frame_count))


def test_channels_step_matches_per_channel():
    """The uniform-cadence multi-channel step (any()-gated heavy bodies +
    per-channel commit) must reproduce independent single-channel runs."""
    import jax.numpy as jnp
    from tempestsdr_tpu.stream.pipeline import make_channels_step

    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=True)
    params = Params(framerate_pll=True)
    C = 3
    n_blocks = 20
    per_ch = [gen_blocks(n_blocks, cfg.block_samples, seed=c) for c in range(C)]

    stepC = jax.jit(make_channels_step(cfg, params, C))
    states = stack_states(cfg, C)
    ctrl = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (C,) + x.shape),
                        StepControls.default())
    frames_c = {}
    plots_c = {}
    for b in range(n_blocks):
        raws = jnp.stack([jnp.asarray(per_ch[c][b]) for c in range(C)])
        states, outs = stepC(states, raws, ctrl)
        for c in range(C):
            if bool(outs.frame_valid[c]):
                frames_c[c] = np.asarray(outs.frame[c])
            if bool(outs.ac_plot_valid[c]):
                plots_c[c] = np.asarray(outs.ac_frame_plot[c])

    step1 = jax.jit(make_step(cfg, params))
    for c in range(C):
        s = init_state(cfg)
        last = lastp = None
        for b in range(n_blocks):
            s, o = step1(s, jnp.asarray(per_ch[c][b]), StepControls.default())
            if bool(o.frame_valid):
                last = np.asarray(o.frame)
            if bool(o.ac_plot_valid):
                lastp = np.asarray(o.ac_frame_plot)
        np.testing.assert_allclose(frames_c[c], last, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(plots_c[c], lastp, rtol=1e-4, atol=1e-5)
        # exact per-channel carries
        np.testing.assert_array_equal(np.asarray(states.phase_fix[c]), np.asarray(s.phase_fix))
        np.testing.assert_array_equal(np.asarray(states.frame_count[c]), np.asarray(s.frame_count))


def test_channels_step_unrolled_matches_gated():
    """make_channels_step_unrolled (real per-channel conds, no vmap) must be
    bit-compatible with the any()-gated vmapped channels step."""
    import jax.numpy as jnp
    from tempestsdr_tpu.stream.pipeline import (
        make_channels_step,
        make_channels_step_unrolled,
    )

    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=True)
    params = Params(framerate_pll=True)
    C = 3
    n_blocks = 16
    per_ch = [gen_blocks(n_blocks, cfg.block_samples, seed=10 + c) for c in range(C)]

    stepG = jax.jit(make_channels_step(cfg, params, C))
    stepU = jax.jit(make_channels_step_unrolled(cfg, params, C))
    sG = stack_states(cfg, C)
    sU = stack_states(cfg, C)
    ctrl = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (C,) + x.shape),
                        StepControls.default())
    for b in range(n_blocks):
        raws = jnp.stack([jnp.asarray(per_ch[c][b]) for c in range(C)])
        sG, oG = stepG(sG, raws, ctrl)
        sU, oU = stepU(sU, raws, ctrl)
        np.testing.assert_array_equal(np.asarray(oG.frame_valid),
                                      np.asarray(oU.frame_valid))
        for c in range(C):
            if bool(oG.frame_valid[c]):
                np.testing.assert_allclose(np.asarray(oU.frame[c]),
                                           np.asarray(oG.frame[c]),
                                           rtol=1e-5, atol=1e-6)
    for a, b2 in zip(jax.tree.leaves(sG), jax.tree.leaves(sU)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-5, atol=1e-6)


def test_channels_step_unrolled_desynced_cadence():
    """After a drop desynchronizes one channel's frame boundaries from the
    others (the worst case for the any()-gated step, stream/pipeline.py
    make_channels_step notes), the unrolled step must still match it
    channel-for-channel."""
    import jax.numpy as jnp
    from tempestsdr_tpu.stream.pipeline import (
        make_channels_step,
        make_channels_step_unrolled,
    )

    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    params = Params(framerate_pll=False)
    C = 3
    n_blocks = 24
    per_ch = [gen_blocks(n_blocks, cfg.block_samples, seed=30 + c) for c in range(C)]

    stepG = jax.jit(make_channels_step(cfg, params, C))
    stepU = jax.jit(make_channels_step_unrolled(cfg, params, C))
    sG = stack_states(cfg, C)
    sU = stack_states(cfg, C)
    base = StepControls.default()
    emits_u = [0] * C
    for b in range(n_blocks):
        # block 5: channel 1 reports a large hardware drop (not a multiple of
        # a block) — its frame boundaries land in different blocks afterwards
        dropped = jnp.asarray(
            [0, 37777 if b == 5 else 0, 0], jnp.int64)
        ctrl = StepControls(dropped,
                            jnp.broadcast_to(base.syncoffset, (C,)),
                            jnp.broadcast_to(base.motionblur, (C,)))
        raws = jnp.stack([jnp.asarray(per_ch[c][b]) for c in range(C)])
        sG, oG = stepG(sG, raws, ctrl)
        sU, oU = stepU(sU, raws, ctrl)
        np.testing.assert_array_equal(np.asarray(oG.frame_valid),
                                      np.asarray(oU.frame_valid))
        for c in range(C):
            if bool(oG.frame_valid[c]):
                emits_u[c] += 1
                np.testing.assert_allclose(np.asarray(oU.frame[c]),
                                           np.asarray(oG.frame[c]),
                                           rtol=1e-5, atol=1e-6)
    assert all(e > 0 for e in emits_u)
    for a, b2 in zip(jax.tree.leaves(sG), jax.tree.leaves(sU)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("cond_mode", ["batched", "unrolled"])
@pytest.mark.parametrize("with_drop", [False, True])
def test_channels_step_hybrid_matches_gated(cond_mode, with_drop):
    """make_channels_step_hybrid (unrolled pre + shared ac-ring write +
    batched-or-unrolled cond bodies) must match the any()-gated vmapped
    channels step channel-for-channel — including after a drop desyncs one
    channel's autocorr fill and frame cadence (which forces the hybrid's
    per-channel ac-write fallback)."""
    import jax.numpy as jnp
    from tempestsdr_tpu.stream.pipeline import (
        make_channels_step,
        make_channels_step_hybrid,
    )

    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=True)
    params = Params(framerate_pll=True)
    C = 3
    n_blocks = 20
    per_ch = [gen_blocks(n_blocks, cfg.block_samples, seed=50 + c) for c in range(C)]

    stepG = jax.jit(make_channels_step(cfg, params, C))
    stepH = jax.jit(make_channels_step_hybrid(cfg, params, C,
                                              cond_mode=cond_mode))
    sG = stack_states(cfg, C)
    sH = stack_states(cfg, C)
    base = StepControls.default()
    rounds = 0
    for b in range(n_blocks):
        dropped = jnp.asarray(
            [0, 37777 if (with_drop and b == 5) else 0, 0], jnp.int64)
        ctrl = StepControls(dropped,
                            jnp.broadcast_to(base.syncoffset, (C,)),
                            jnp.broadcast_to(base.motionblur, (C,)))
        raws = jnp.stack([jnp.asarray(per_ch[c][b]) for c in range(C)])
        sG, oG = stepG(sG, raws, ctrl)
        sH, oH = stepH(sH, raws, ctrl)
        np.testing.assert_array_equal(np.asarray(oG.frame_valid),
                                      np.asarray(oH.frame_valid))
        np.testing.assert_array_equal(np.asarray(oG.ac_plot_valid),
                                      np.asarray(oH.ac_plot_valid))
        rounds += int(np.asarray(oG.ac_plot_valid).sum())
        for c in range(C):
            if bool(oG.frame_valid[c]):
                np.testing.assert_allclose(np.asarray(oH.frame[c]),
                                           np.asarray(oG.frame[c]),
                                           rtol=1e-5, atol=1e-6)
    assert rounds > 0  # the autocorr rounds actually exercised the ring
    for a, b2 in zip(jax.tree.leaves(sG), jax.tree.leaves(sH)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("with_drop", [False, True])
def test_channels_step_hybrid_stacked_demod_bit_exact(with_drop):
    """demod_mode='stacked' (one normalize+pairing-matmul over all channels'
    raw blocks) must be BIT-identical to the per-channel demod — flattening
    preserves each channel's I/Q pair alignment, so the math is the same ops
    on the same values."""
    import jax.numpy as jnp
    from tempestsdr_tpu.stream.pipeline import make_channels_step_hybrid

    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=True)
    params = Params(framerate_pll=True)
    C = 3
    n_blocks = 16
    per_ch = [gen_blocks(n_blocks, cfg.block_samples, seed=70 + c) for c in range(C)]

    stepP = jax.jit(make_channels_step_hybrid(cfg, params, C))
    stepS = jax.jit(make_channels_step_hybrid(cfg, params, C,
                                              demod_mode="stacked"))
    sP = stack_states(cfg, C)
    sS = stack_states(cfg, C)
    base = StepControls.default()
    frames = 0
    for b in range(n_blocks):
        dropped = jnp.asarray(
            [0, 4444 if (with_drop and b == 4) else 0, 0], jnp.int64)
        ctrl = StepControls(dropped,
                            jnp.broadcast_to(base.syncoffset, (C,)),
                            jnp.broadcast_to(base.motionblur, (C,)))
        raws = jnp.stack([jnp.asarray(per_ch[c][b]) for c in range(C)])
        sP, oP = stepP(sP, raws, ctrl)
        sS, oS = stepS(sS, raws, ctrl)
        for a, b2 in zip(jax.tree.leaves(oP), jax.tree.leaves(oS)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
        frames += int(np.asarray(oP.frame_valid).sum())
    assert frames > 0
    for a, b2 in zip(jax.tree.leaves(sP), jax.tree.leaves(sS)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(n_channel=4, n_time=4)  # 16 > 8 devices


def test_channel_row_bounds_balanced():
    from tempestsdr_tpu.parallel.distributed import channel_row_bounds

    assert channel_row_bounds(8, 4) == [0, 2, 4, 6, 8]
    # non-divisible: remainder spreads over the first rows
    assert channel_row_bounds(10, 4) == [0, 3, 6, 8, 10]
    assert channel_row_bounds(3, 4) == [0, 1, 2, 3, 3]
    with pytest.raises(ValueError):
        channel_row_bounds(4, 0)


def test_local_channel_slice_single_host_and_mock_multi():
    from types import SimpleNamespace

    from tempestsdr_tpu.parallel.distributed import (
        local_channel_slice,
        make_global_mesh,
    )

    # real mesh on the 8 virtual devices: single process owns everything
    mesh = make_global_mesh(4, 2)
    assert local_channel_slice(mesh, 8) == slice(0, 8)
    assert local_channel_slice(mesh, 10) == slice(0, 10)  # non-divisible

    # mock 2-host mesh (duck-typed: the function only reads .devices and
    # each device's .process_index)
    me = jax.process_index()

    def fake(proc):
        return SimpleNamespace(process_index=proc)

    rows = np.array(
        [[fake(me), fake(me)], [fake(me), fake(me)],
         [fake(me + 1), fake(me + 1)], [fake(me + 1), fake(me + 1)]]
    )
    mock = SimpleNamespace(devices=rows)
    assert local_channel_slice(mock, 10) == slice(0, 6)  # rows 0-1 -> 3+3 ch
    other = SimpleNamespace(
        devices=np.array([[fake(me + 1)], [fake(me + 1)]])
    )
    assert local_channel_slice(other, 4) == slice(0, 0)  # nothing local
    # non-contiguous local rows must be rejected
    bad = SimpleNamespace(
        devices=np.array([[fake(me)], [fake(me + 1)], [fake(me)]])
    )
    with pytest.raises(ValueError):
        local_channel_slice(bad, 6)


def test_make_global_mesh_validates_device_count():
    from tempestsdr_tpu.parallel.distributed import make_global_mesh

    with pytest.raises(ValueError):
        make_global_mesh(4, 4)  # needs 16, virtual harness has 8
    m = make_global_mesh(2, 4)
    assert m.shape == {"ch": 2, "time": 4}
