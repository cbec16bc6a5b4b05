"""End-to-end streaming tests on synthetic emanations with known ground
truth (SURVEY.md §4 test-pyramid item (b); BASELINE.json configs 1-3 in
miniature)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tempestsdr_tpu.config import PipelineConfig
from tempestsdr_tpu.params import Params
from tempestsdr_tpu.stream import make_step, init_state
from tempestsdr_tpu.stream.pipeline import StepControls
from tempestsdr_tpu.stream.session import Session, SessionCallbacks
from tempestsdr_tpu.sources.synthetic import SyntheticSource, render_test_pattern, synth_iq
from tempestsdr_tpu.estimate import AutoResolution


LINES, TWIDTH, REFRESH, SR = 100, 200, 50.0, 1e6


def run_blocks(cfg, params, n_blocks, raster=None, noise=0.01, refresh_true=None,
               state=None, collect_frames=True):
    step = jax.jit(make_step(cfg, params), donate_argnums=0)
    if state is None:
        state = init_state(cfg, params.fir_lowpass_taps)
    if raster is None:
        raster = render_test_pattern(LINES, TWIDTH)
    pixclock = raster.shape[0] * raster.shape[1] * (refresh_true or cfg.refreshrate)
    ctrl = StepControls.default()
    frames, outs = [], []
    pos = 0
    for _ in range(n_blocks):
        blk = synth_iq(raster, samplerate=cfg.samplerate, pixelclock=pixclock,
                       n_samples=cfg.block_samples, start_sample=pos, noise=noise)
        pos += cfg.block_samples
        state, out = step(state, jnp.asarray(blk), ctrl)
        outs.append(jax.tree.map(np.asarray, out._replace(frame=None)))
        if collect_frames and bool(out.frame_valid):
            frames.append(np.asarray(out.frame))
    return state, frames, outs


def expected_frame(cfg, raster):
    """Ground truth: the raster box-resampled to the pipeline's pixel grid
    (pixel p covers sample-time window [p/r,(p+1)/r))."""
    pixclock = raster.shape[0] * raster.shape[1] * cfg.refreshrate
    npix_display = raster.size
    p = np.arange(cfg.frame_pixels)
    # display pixel index at our pixel centers (2x oversampling -> each of
    # our pixels is ~half a display pixel)
    t = (p + 0.5) / cfg.pixelrate
    disp = (np.floor(t * pixclock).astype(np.int64)) % npix_display
    return raster.reshape(-1)[disp].reshape(cfg.height, cfg.width)


def test_fixed_geometry_replay_recovers_raster():
    """Config-1 analog: known geometry, assert the demodulated frame is the
    raster (correlation > 0.98 after dropping the autogain transient)."""
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    params = Params(framerate_pll=False)
    raster = render_test_pattern(LINES, TWIDTH)
    state, frames, _ = run_blocks(cfg, params, 80, raster=raster, noise=0.005)
    assert len(frames) >= 30
    exp = expected_frame(cfg, raster)
    f = frames[-1]
    cc = np.corrcoef(f.ravel(), exp.ravel())[0, 1]
    assert cc > 0.98, f"correlation {cc}"
    # autogain keeps the usable range near [0,1]
    assert np.percentile(f, 1) > -0.2 and np.percentile(f, 99) < 1.2


def test_pallas_strided_step_matches_default():
    """A step built with Params(resampler="pallas_strided") (Mosaic kernel,
    interpret mode on CPU) must produce the same frames and the same frame
    cadence as the default XLA strided resampler."""
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    raster = render_test_pattern(LINES, TWIDTH)
    _, frames_ref, outs_ref = run_blocks(cfg, Params(framerate_pll=False), 40,
                                         raster=raster, noise=0.005)
    _, frames_pl, outs_pl = run_blocks(
        cfg, Params(framerate_pll=False, resampler="pallas_strided"), 40,
        raster=raster, noise=0.005)
    assert len(frames_ref) == len(frames_pl) > 0
    for a, b in zip(outs_ref, outs_pl):
        assert int(a.n_pixels) == int(b.n_pixels)
        assert bool(a.frame_valid) == bool(b.frame_valid)
    for fa, fb in zip(frames_ref, frames_pl):
        np.testing.assert_allclose(fb, fa, atol=2e-3)


def test_fused_step_matches_default():
    """A step built with Params(resampler="fused") (one Mosaic kernel doing
    byte decode + demod + resample, interpret mode on CPU) must produce the
    same frames and cadence as the default XLA chain on u8 raw blocks."""
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    raster = render_test_pattern(LINES, TWIDTH)

    def run(params):
        step = jax.jit(make_step(cfg, params), donate_argnums=0)
        state = init_state(cfg)
        pixclock = raster.shape[0] * raster.shape[1] * cfg.refreshrate
        ctrl = StepControls.default()
        frames, outs = [], []
        pos = 0
        for _ in range(40):
            blk = synth_iq(raster, samplerate=cfg.samplerate,
                           pixelclock=pixclock, n_samples=cfg.block_samples,
                           start_sample=pos, noise=0.005, dtype=np.uint8)
            pos += cfg.block_samples
            state, out = step(state, jnp.asarray(blk), ctrl)
            outs.append((int(out.n_pixels), bool(out.frame_valid)))
            if bool(out.frame_valid):
                frames.append(np.asarray(out.frame))
        return frames, outs

    frames_ref, outs_ref = run(Params(framerate_pll=False))
    frames_f, outs_f = run(Params(framerate_pll=False, resampler="fused"))
    assert outs_ref == outs_f
    assert len(frames_ref) == len(frames_f) > 0
    for fa, fb in zip(frames_ref, frames_f):
        np.testing.assert_allclose(fb, fa, atol=2e-3)


def test_stream_state_is_deterministic():
    """Same input -> bit-identical carry (the reference can't promise this
    across thread schedules; the functional design can)."""
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    params = Params()
    s1, f1, _ = run_blocks(cfg, params, 25)
    s2, f2, _ = run_blocks(cfg, params, 25)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(f1[-1], f2[-1])


def test_autocorr_estimates_mode():
    """Config-2 analog: unknown display mode recovered from the
    autocorrelation plots via the AutoResolution tracker."""
    sr = 2e6
    lines, twidth, refresh = 600, 111, 60.0
    cfg = PipelineConfig(samplerate=sr, height=400, refreshrate=55.0,  # wrong guess
                         block_samples=16384)
    params = Params(framerate_pll=False)
    raster = render_test_pattern(lines, twidth)
    step = jax.jit(make_step(cfg, params), donate_argnums=0)
    state = init_state(cfg)
    tracker = AutoResolution(sr)
    ctrl = StepControls.default()
    pos = 0
    est = None
    pixclock = lines * twidth * refresh
    for _ in range(60):
        blk = synth_iq(raster, samplerate=sr, pixelclock=pixclock,
                       n_samples=cfg.block_samples, start_sample=pos, noise=0.01)
        pos += cfg.block_samples
        state, out = step(state, jnp.asarray(blk), ctrl)
        if bool(out.ac_plot_valid):
            from tempestsdr_tpu.events import PLOT_ID, PlotEvent

            f_off, _ = cfg.ac_frame_window
            l_off, _ = cfg.ac_line_window
            tracker.feed(PlotEvent(PLOT_ID.FRAME, f_off, np.asarray(out.ac_frame_plot), sr))
            est = tracker.feed(PlotEvent(PLOT_ID.LINE, l_off, np.asarray(out.ac_line_plot), sr))
            if est:
                break
    assert est is not None, "no convergence"
    assert abs(est.refreshrate - refresh) < 0.5, est
    assert abs(est.height - lines) <= 6, est


def test_pll_pulls_refreshrate_toward_truth():
    """Config-3 analog: generator runs at 50.02 Hz, pipeline configured at
    50.00 with PLL on; the refresh delta must move toward +0.02."""
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    params = Params(framerate_pll=True)
    state, frames, outs = run_blocks(cfg, params, 400, refresh_true=50.02,
                                     noise=0.002, collect_frames=False)
    delta = float(np.asarray(state.pll.refresh_delta))
    assert delta > 0.001, f"PLL did not move toward truth: delta={delta}"
    assert delta < 0.05, f"PLL overshot: delta={delta}"


def test_manual_sync_shift_moves_image():
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    params = Params(framerate_pll=False)
    raster = render_test_pattern(LINES, TWIDTH)
    step = jax.jit(make_step(cfg, params), donate_argnums=0)
    pixclock = LINES * TWIDTH * REFRESH

    def run(shift_pixels):
        state = init_state(cfg)
        pos = 0
        last = None
        for b in range(60):
            ctrl = StepControls(jnp.int64(0),
                                jnp.int32(shift_pixels if b == 30 else 0),
                                jnp.float32(0.0))
            blk = synth_iq(raster, samplerate=SR, pixelclock=pixclock,
                           n_samples=cfg.block_samples, start_sample=pos, noise=0.0)
            pos += cfg.block_samples
            state, out = step(state, jnp.asarray(blk), ctrl)
            if bool(out.frame_valid):
                last = np.asarray(out.frame)
        return last

    base = run(0)
    shifted = run(cfg.width * 3)  # shift down 3 rows
    rolled = np.roll(base, -3, axis=0)
    # interior rows must match the rolled baseline
    cc = np.corrcoef(shifted[5:-5].ravel(), rolled[5:-5].ravel())[0, 1]
    assert cc > 0.99, cc


def test_dropped_samples_realign_to_frames():
    """Whole-frame drop policy (dsp.c:313-368): after a drop event the
    raster must stay frame-aligned."""
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    params = Params(framerate_pll=False)
    raster = render_test_pattern(LINES, TWIDTH)
    step = jax.jit(make_step(cfg, params), donate_argnums=0)
    pixclock = LINES * TWIDTH * REFRESH
    state = init_state(cfg)
    pos = 0
    frames = []
    dropped_at = 25
    drop_n = 12345
    for b in range(120):
        dropped = 0
        if b == dropped_at:
            pos += drop_n  # the generator really skips these samples
            dropped = drop_n
        blk = synth_iq(raster, samplerate=SR, pixelclock=pixclock,
                       n_samples=cfg.block_samples, start_sample=pos, noise=0.0)
        pos += cfg.block_samples
        ctrl = StepControls(jnp.int64(dropped), jnp.int32(0), jnp.float32(0.0))
        state, out = step(state, jnp.asarray(blk), ctrl)
        if bool(out.frame_valid):
            frames.append(np.asarray(out.frame))
    pre, post = frames[5], frames[-1]
    cc = np.corrcoef(pre.ravel(), post.ravel())[0, 1]
    assert cc > 0.95, f"raster lost alignment after drop: corr {cc}"


def test_session_batched_matches_unbatched():
    """batch_blocks scans k blocks per dispatch; frames must match the
    per-block path exactly (one-shot controls applied once)."""
    def run(batch):
        src = SyntheticSource()
        src.init(f"{LINES} {TWIDTH} {REFRESH} {SR} 0.01")
        cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                             block_samples=8192, autocorr=False)
        frames = []
        sess = Session(cfg, Params(framerate_pll=False), src,
                       SessionCallbacks(on_frame=frames.append),
                       batch_blocks=batch)
        sess.sync_shift(37)  # one-shot control: must apply exactly once
        sess.run(max_blocks=24)
        return frames

    f1 = run(1)
    f4 = run(4)
    assert len(f1) == len(f4) and len(f1) >= 6
    for a, b in zip(f1, f4):
        np.testing.assert_array_equal(a, b)


def test_session_batched_plots_match_unbatched():
    """Plot events through the batch path (lazy big-field fetch) must match
    the per-block path: same rounds, same window values."""
    def run(batch):
        src = SyntheticSource()
        src.init(f"{LINES} {TWIDTH} {REFRESH} {SR} 0.01")
        cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                             block_samples=8192)
        plots, frames = [], []
        sess = Session(cfg, Params(framerate_pll=False), src,
                       SessionCallbacks(on_frame=frames.append,
                                        on_plot=plots.append),
                       batch_blocks=batch)
        sess.run(max_blocks=48)
        return frames, plots

    f1, p1 = run(1)
    f4, p4 = run(4)
    assert len(p1) == len(p4) and len(p1) >= 2  # both FRAME and LINE events
    for a, b in zip(p1, p4):
        assert a.plot_id == b.plot_id and a.offset == b.offset
        np.testing.assert_array_equal(np.asarray(a.values), np.asarray(b.values))
    for a, b in zip(f1, f4):
        np.testing.assert_array_equal(a, b)


def test_live_param_toggle_mid_stream():
    """Param flags flip while streaming (reference toggles params_int live):
    the session swaps its compiled step at the next block, carried state
    survives, and the new behaviour is observable in subsequent frames."""
    src = SyntheticSource()
    src.init(f"{LINES} {TWIDTH} {REFRESH} {SR} 0.01")
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    params = Params(framerate_pll=False, debug_markers=False)
    frames = []
    sess_box = {}

    def on_frame(f):
        frames.append(f)
        if len(frames) == 6:
            sess_box["s"].set_params(params.replace(debug_markers=True))

    sess = Session(cfg, params, src, SessionCallbacks(on_frame=on_frame))
    sess_box["s"] = sess
    n = sess.run(max_frames=14)
    assert n == 14
    from tempestsdr_tpu.config import PIXEL_SPECIAL_VALUE_G

    assert not (frames[4] == PIXEL_SPECIAL_VALUE_G).any()
    assert (frames[-1] == PIXEL_SPECIAL_VALUE_G).any(), "marker toggle never applied"
    assert sess.params.debug_markers
    # carried state survived the swap: frame counter kept counting
    assert int(np.asarray(sess.state.frame_count)) == 14


def test_session_autocorr_dump(tmp_path):
    """DMP equivalent: full half-range CSV dump in the reference's "ms, dB"
    format (dump_autocorrect, frameratedetector.c:64-85): one row per lag
    from 0 to fftsize/2, t = 1000*lag/samplerate, raw current round."""
    src = SyntheticSource()
    src.init(f"{LINES} {TWIDTH} {REFRESH} {SR} 0.01")
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192)
    sess = Session(cfg, Params(framerate_pll=False), src, SessionCallbacks())
    assert not sess.dump_autocorr(str(tmp_path / "early.csv"))  # no round yet
    sess.run(max_blocks=16)  # > ac_round/block blocks -> at least one round
    p = str(tmp_path / "ac.csv")
    assert sess.dump_autocorr(p)
    lines = open(p).read().splitlines()
    assert lines[0] == "ms, dB"
    assert len(lines) == cfg.ac_fft_size // 2 + 1  # full half-range
    t0, db0 = map(float, lines[1].split(","))
    assert t0 == 0.0 and np.isfinite(db0)  # reference dump starts at lag 0
    t1, _ = map(float, lines[2].split(","))
    assert t1 == pytest.approx(1000.0 / SR)
    ts = np.array([float(l.split(",")[0]) for l in lines[1:]])
    assert np.all(np.diff(ts) > 0)
    # the dumped dB column must be exactly 10*log10(|R|) of the round's raw
    # half-range autocorrelation (dump_autocorrect's format)...
    dbs = np.array([float(l.split(",")[1]) for l in lines[1:]])
    r = np.abs(np.asarray(sess.state.ac_last_full))
    np.testing.assert_allclose(
        dbs, 10.0 * np.log10(np.maximum(r, 1e-300)), rtol=0, atol=5e-7
    )
    # ...and must carry the real signal: on this known capture the line
    # period SR/(REFRESH*LINES) = 200 must be the autocorrelation peak in
    # its neighbourhood (the 50 Hz frame lag 20000 exceeds the pow2
    # half-range 16384 at this geometry, so check line rate instead)
    line_lag = int(round(SR / (REFRESH * LINES)))
    peak_lag = 100 + int(np.argmax(dbs[100:300]))
    assert abs(peak_lag - line_lag) <= 1, peak_lag
    # TPU-native extra: the two analysis windows
    pw = str(tmp_path / "ac_windows.csv")
    assert sess.dump_autocorr(pw, windows=True)
    wlines = open(pw).read().splitlines()
    assert wlines[0] == "ms, dB"
    tw, _ = map(float, wlines[1].split(","))
    assert tw > 0  # window dump starts at the window offset, not lag 0


def test_warm_compile_step_is_reused_by_session():
    """warm_compile_step pre-builds the exact jit function a later Session
    uses: the session must reuse the warmed object (executable cache hit —
    the live-setresolution overlap, TSDRLibrary.c:552-566) and its first
    block must not add a compile entry."""
    from tempestsdr_tpu.stream.session import (
        _WARM_STEPS,
        warm_compile_step,
    )

    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    params = Params(framerate_pll=False)
    warm_compile_step(cfg, params, raw_dtype=np.float32)
    key = (cfg, params, 1)
    warmed_step = _WARM_STEPS[key][0]
    assert warmed_step._cache_size() >= 1  # executable exists before Session

    src = SyntheticSource()
    src.init(f"{LINES} {TWIDTH} {REFRESH} {SR} 0.01")
    sess = Session(cfg, params, src, SessionCallbacks())
    assert sess._step is warmed_step
    size_before = warmed_step._cache_size()
    n = sess.run(max_frames=2)
    assert n == 2
    assert warmed_step._cache_size() == size_before  # no new compile


def test_api_warm_resolution_background():
    """TSDR.warm_resolution(background=True) compiles the next geometry on a
    thread; the restarted session reuses it."""
    from tempestsdr_tpu.api import TSDR
    from tempestsdr_tpu.stream.session import _WARM_STEPS

    rx = TSDR(block_samples=8192)
    rx.load_source("synthetic", f"{LINES} {TWIDTH} {REFRESH} {SR} 0.01")
    rx.set_resolution(LINES, REFRESH)
    from tempestsdr_tpu.params import PARAM

    rx.set_param(PARAM.FRAMERATE_PLL, 0)
    t = rx.warm_resolution(LINES + 14, REFRESH, background=True)
    t.join(timeout=120)
    assert not t.is_alive()
    frames = []
    rx.set_resolution(LINES + 14, REFRESH)
    rx.start(on_frame=frames.append, max_frames=2)
    key = (rx._session.config, rx._session.params, 1)
    assert key in _WARM_STEPS and rx._session._step is _WARM_STEPS[key][0]
    assert len(frames) == 2 and frames[0].shape[0] == LINES + 14
    rx.close()


def test_multisession_independent_targets():
    """MultiSession: N sources with different content through one hybrid
    program — per-channel frames carry their OWN raster, drops stay per
    channel, plots fire per channel."""
    from tempestsdr_tpu.stream.multisession import MultiSession

    C = 3
    srcs = []
    for c in range(C):
        s = SyntheticSource()
        # different twidth per channel -> visibly different frame content
        s.init(f"{LINES} {200 + 8 * c} {REFRESH} {SR} 0.01")
        srcs.append(s)
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192)
    got = {c: [] for c in range(C)}
    plots = []
    ms = MultiSession(cfg, Params(framerate_pll=False), srcs,
                      on_frame=lambda c, f: got[c].append(f),
                      on_plot=lambda c, ev: plots.append((c, ev.plot_id)))
    total = ms.run(max_frames=4 * C + 2)
    assert total >= 4 * C
    assert all(len(got[c]) >= 3 for c in range(C))
    # channels differ: content from different rasters must not be identical
    a, b = got[0][-1], got[1][-1]
    assert a.shape == b.shape == (LINES, cfg.width)
    assert np.abs(a - b).max() > 0.05
    # each channel is self-consistent frame to frame
    for c in range(C):
        cc = np.corrcoef(got[c][-1].ravel(), got[c][-2].ravel())[0, 1]
        assert cc > 0.9, (c, cc)
    assert plots, "no estimation rounds fired"
    assert ms.frames_total[0] >= 3


def test_multisession_rejects_mismatched_samplerate():
    from tempestsdr_tpu.errors import TSDRError
    from tempestsdr_tpu.stream.multisession import MultiSession

    s1, s2 = SyntheticSource(), SyntheticSource()
    s1.init(f"{LINES} {TWIDTH} {REFRESH} {SR} 0.01")
    s2.init(f"{LINES} {TWIDTH} {REFRESH} {SR * 2} 0.01")
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    with pytest.raises(TSDRError):
        MultiSession(cfg, Params(framerate_pll=False), [s1, s2])


def test_session_runs_and_checkpoints(tmp_path):
    src = SyntheticSource()
    src.init(f"{LINES} {TWIDTH} {REFRESH} {SR} 0.01")
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    got = []
    cb = SessionCallbacks(on_frame=lambda f: got.append(f))
    sess = Session(cfg, Params(framerate_pll=False), src, cb)
    n = sess.run(max_frames=5)
    assert n == 5 and len(got) == 5
    p = str(tmp_path / "state.npz")
    sess.save_state(p)
    before = jax.tree.leaves(sess.state)
    sess.load_state(p)
    after = jax.tree.leaves(sess.state)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_session_batched_drop_applies_at_true_slot():
    """A drop reported mid-batch must be compensated at its own block's scan
    slot, not summed into slot 0 (which would fire compensation up to
    batch-1 blocks early): batched and unbatched runs over a stream with a
    mid-batch drop must agree frame-for-frame."""
    from tempestsdr_tpu.sources.base import Source, SourceBlock

    drop_block, drop_n = 5, 12345  # 5 % 4 != 0 -> lands mid-batch for k=4

    class DroppySynth(Source):
        """Deterministic synthetic stream that skips drop_n samples before
        block `drop_block` and reports them (hardware-drop semantics)."""

        def init(self, params):
            self.raster = render_test_pattern(LINES, TWIDTH)
            self.pixclock = LINES * TWIDTH * REFRESH
            self.pos = 0
            self.block = 0

        def name(self):
            return "droppy"

        def samplerate(self):
            return SR

        def stream(self, block_samples):
            while True:
                dropped = 0
                if self.block == drop_block:
                    self.pos += drop_n
                    dropped = drop_n
                blk = synth_iq(self.raster, samplerate=SR, pixelclock=self.pixclock,
                               n_samples=block_samples, start_sample=self.pos,
                               noise=0.0)
                self.pos += block_samples
                self.block += 1
                yield SourceBlock(blk, dropped)

        def stop(self):
            pass

    def run(batch):
        src = DroppySynth()
        src.init("")
        cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                             block_samples=8192, autocorr=False)
        frames = []
        sess = Session(cfg, Params(framerate_pll=False), src,
                       SessionCallbacks(on_frame=frames.append),
                       batch_blocks=batch)
        sess.run(max_blocks=24)
        return frames

    f1 = run(1)
    f4 = run(4)
    assert len(f1) == len(f4) and len(f1) >= 4
    for a, b in zip(f1, f4):
        np.testing.assert_array_equal(a, b)


def test_pick_resampler_auto_contract(monkeypatch):
    """Auto selection: the Mosaic strided kernel is chosen only on TPU
    backends, only for the m=2 (2x-oversampled) geometry, and never under
    vmap (batched=True) — batched blocked specs in ANY memory space do not
    lower (pipeline._pick_resampler)."""
    from tempestsdr_tpu.ops.resample import plan_strided
    from tempestsdr_tpu.stream import pipeline as P

    cfg = PipelineConfig(samplerate=8e6, height=628, refreshrate=60.0,
                         block_samples=8192)
    params = Params()  # resampler="auto"
    plan = plan_strided(cfg.samples_per_pixel, cfg.resample_taps)
    assert plan is not None and plan[0] == 2  # the reference's standard geometry

    # CPU (this test harness): XLA strided for both
    assert P._pick_resampler(cfg, params).__name__ == "box_resample_strided"
    assert (P._pick_resampler(cfg, params, batched=True).__name__
            == "box_resample_strided")

    # TPU: Mosaic kernel single-channel, XLA strided under vmap
    monkeypatch.setattr(P, "_on_tpu", lambda: True)
    assert (P._pick_resampler(cfg, params).__name__
            == "box_resample_strided_pallas")
    assert (P._pick_resampler(cfg, params, batched=True).__name__
            == "box_resample_strided")


def test_auto_batch_blocks_sizing():
    """batch_blocks="auto" (round-4 VERDICT weak #3): amortize the dispatch
    floor to <= ~10% of the real-time cadence, capped by control latency."""
    from tempestsdr_tpu.utils.profiling import auto_batch_blocks
    from tempestsdr_tpu.stream.session import resolve_batch_blocks

    cfg = PipelineConfig(samplerate=8e6, height=628, refreshrate=60.0,
                         block_samples=65536)
    # block_s = 8.192 ms. floor 25 ms (the relay): amortization wants
    # ceil(250/8.192) = 31, the 250 ms latency cap allows (250-25)/8.192
    # = 27.4 -> latency wins at 27
    assert auto_batch_blocks(cfg, latency_s=0.25, floor_s=0.025) == 27
    # negligible floor (local backends): no batching needed
    assert auto_batch_blocks(cfg, latency_s=0.25, floor_s=1e-4) == 1
    # tight latency cap always wins over amortization
    assert auto_batch_blocks(cfg, latency_s=0.05, floor_s=0.025) == 3
    # resolve_batch_blocks: ints pass through, "auto" measures the real
    # backend floor and returns a sane batch
    assert resolve_batch_blocks(cfg, 17) == 17
    auto = resolve_batch_blocks(cfg, "auto")
    assert isinstance(auto, int) and 1 <= auto <= 256


def test_session_auto_batch_streams():
    """A Session built with batch_blocks="auto" streams and emits frames."""
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    src = SyntheticSource()
    src.init(f"{LINES} {TWIDTH} {REFRESH} {int(SR)} 0.0")
    frames = []
    cb = SessionCallbacks(on_frame=frames.append)
    sess = Session(cfg, Params(framerate_pll=False), src, cb,
                   batch_blocks="auto")
    assert isinstance(sess.batch_blocks, int) and sess.batch_blocks >= 1
    sess.run(max_blocks=8 * max(sess.batch_blocks, 1))
    assert frames and frames[-1].shape == (LINES, cfg.width)


def test_fast_sync_matches_parity_positions():
    """Params.fast_sync (f32 sync search — the TPU speed mode) must detect
    the same strip positions and produce near-identical frames as the
    default f64 search on a real signal: f32 only changes floating-point
    near-ties between candidate strips, and a synthetic capture with real
    blanking strips has none."""
    cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                         block_samples=8192, autocorr=False)
    blocks = [synth_iq(render_test_pattern(LINES, TWIDTH),
                       samplerate=SR, pixelclock=LINES * TWIDTH * REFRESH,
                       n_samples=8192, start_sample=i * 8192, noise=0.02)
              for i in range(30)]
    outs = {}
    for fast in (False, True):
        params = Params(framerate_pll=False, autoshift=True, fast_sync=fast)
        step = jax.jit(make_step(cfg, params))
        s = init_state(cfg)
        frames, dxs = [], []
        for blk in blocks:
            s, o = step(s, jnp.asarray(blk), StepControls.default())
            if bool(o.frame_valid):
                frames.append(np.asarray(o.frame))
                dxs.append((int(o.sync_dx), int(o.sync_dy)))
        outs[fast] = (frames, dxs)
    assert len(outs[False][0]) == len(outs[True][0]) > 0
    # identical detected positions frame-for-frame
    assert outs[False][1] == outs[True][1]
    for a, b in zip(outs[False][0], outs[True][0]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
