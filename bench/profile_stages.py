"""Per-stage TPU profile of the flagship pipeline step + roofline inputs.

Answers VERDICT round-1 item 4: where does the ~1.1 ms/block go, and how far
is each stage from the v5e's HBM/VPU speed of light? Every stage is timed
the only way that is honest on this remote-TPU relay: a jitted lax.scan over
K blocks per dispatch, M timed dispatches, and a host fetch before stopping
the clock (block_until_ready is optimistic through the tunnel).

Run (one process, never concurrently with another TPU process):
    PYTHONPATH=/root/repo:/root/.axon_site python bench/profile_stages.py
Optional: --quick (fewer reps), --pallas (also try the Mosaic kernels LAST —
a Mosaic crash poisons the remote session, so XLA numbers print first).

Writes bench/PROFILE.json and prints one line per stage:
    name  ms/block  MS/s  bytes/sample  GB/s (vs ~819 GB/s v5e HBM peak)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

HBM_PEAK_GBPS = 819.0  # v5e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--channels", type=int, default=0,
                    help="profile the N-channel step instead of single-stream")
    ap.add_argument("--only", type=str, default=None,
                    help="regex: measure only matching rows (results merge "
                         "into the existing PROFILE.json)")
    args = ap.parse_args()
    only_re = re.compile(args.only) if args.only else None

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax import lax

    from tempestsdr_tpu.config import PipelineConfig
    from tempestsdr_tpu.params import Params
    from tempestsdr_tpu.ops.demod import am_demod, normalize_iq
    from tempestsdr_tpu.ops import resample as rs
    from tempestsdr_tpu.stream import make_step, init_state
    from tempestsdr_tpu.stream.pipeline import StepControls, make_channels_step
    from tempestsdr_tpu.parallel.channels import stack_states

    K = 8 if args.quick else 32   # blocks per dispatch
    M = 2 if args.quick else 6    # timed dispatches
    block = 1 << 19
    cfg = PipelineConfig(samplerate=64e6, height=628, refreshrate=60.0,
                        block_samples=block)
    results = {}
    rng = np.random.default_rng(0)

    def timeit(name, scan_fn, carry, xs, bytes_per_sample=None, samples=None):
        """scan_fn: jitted f(carry, xs) -> (carry, reduced). Times M dispatches
        of K iterations, fetches the reduced output."""
        if only_re is not None and not only_re.search(name):
            return carry
        n_samp = samples if samples is not None else K * block
        t0 = time.monotonic()
        carry, out = scan_fn(carry, xs)
        _ = np.asarray(jax.tree.leaves(out)[0])
        compile_s = time.monotonic() - t0
        t0 = time.monotonic()
        for _ in range(M):
            carry, out = scan_fn(carry, xs)
        _ = np.asarray(jax.tree.leaves(out)[0])
        dt = time.monotonic() - t0
        ms_per_block = dt / (M * K) * 1e3
        msps = M * n_samp / dt / 1e6
        row = {
            "ms_per_block": round(ms_per_block, 4),
            "MSps": round(msps, 1),
            "compile_s": round(compile_s, 1),
        }
        if bytes_per_sample:
            gbps = msps * 1e6 * bytes_per_sample / 1e9
            row["bytes_per_sample"] = bytes_per_sample
            row["GBps"] = round(gbps, 1)
            row["pct_hbm_peak"] = round(100 * gbps / HBM_PEAK_GBPS, 1)
        results[name] = row
        extra = (f"  {row.get('GBps','')} GB/s ({row.get('pct_hbm_peak','')}% peak)"
                 if bytes_per_sample else "")
        print(f"{name:28s} {ms_per_block:8.3f} ms/blk  {msps:8.1f} MS/s{extra}",
              flush=True)
        return carry

    raws = jnp.asarray(rng.integers(0, 256, size=(K, 2 * block), dtype=np.uint8))
    envs = jnp.asarray(rng.random((K, block), np.float32))

    # ---- S0: floor — scan that only reduces the raw block (u8 read only)
    @jax.jit
    def s0(c, xs):
        def body(c, x):
            return c + jnp.sum(x, dtype=jnp.int32), ()
        c, _ = lax.scan(body, c, xs)
        return c, c
    timeit("floor:sum(u8)", s0, jnp.int32(0), raws, bytes_per_sample=2)

    # ---- S1: normalize+demod (pairing matmul): read 2B u8, write 4B f32
    @jax.jit
    def s1(c, xs):
        def body(c, x):
            e = am_demod(normalize_iq(x))
            return c + e[0], ()
        c, _ = lax.scan(body, c, xs)
        return c, c
    timeit("demod:pair-matmul", s1, jnp.float32(0), raws, bytes_per_sample=2 + 4)

    # ---- S1b: demod via reduce_window
    @jax.jit
    def s1b(c, xs):
        def body(c, x):
            f = normalize_iq(x)
            y = f * f
            p = lax.reduce_window(y, 0.0, lax.add, (2,), (2,), "VALID")
            return c + jnp.sqrt(p)[0], ()
        c, _ = lax.scan(body, c, xs)
        return c, c
    timeit("demod:reduce-window", s1b, jnp.float32(0), raws, bytes_per_sample=2 + 4)

    # ---- resamplers on a precomputed envelope: read 4B, write ~8B (2 pix/sample)
    taps = cfg.resample_taps
    inv_fix = jnp.int64(cfg.inv0_fix)
    max_pix = cfg.max_block_pixels
    bps_rs = 4 + 4 * max_pix / block

    def rs_scan(fn, **kw):
        @jax.jit
        def run(carry, xs):
            def body(carry, env):
                phase, tail = carry
                x_ext = jnp.concatenate([tail, env])
                pix, n_out, phase2 = fn(
                    x_ext, phase, inv_fix, n_samples=block, max_pix=max_pix,
                    taps=taps, inv_nominal=cfg.samples_per_pixel, **kw)
                return (phase2, x_ext[x_ext.shape[0] - taps:]), pix[0] + pix[-1]
            carry, acc = lax.scan(body, carry, xs)
            return carry, acc
        return run

    carry0 = (jnp.int64(0), jnp.zeros((taps,), jnp.float32))
    for g in (8, 16, 32):
        timeit(f"resample:strided-G{g}", rs_scan(rs.box_resample_strided, G=g),
               carry0, envs, bytes_per_sample=bps_rs)
    for Lv in (256, 512, 1024):
        # smaller L shrinks the drift margin -> fewer weight-loop iterations
        # (taps_eff = taps+1+2*ceil(L*delta_cap)) at the cost of more chunks
        timeit(f"resample:strided-G8-L{Lv}",
               rs_scan(rs.box_resample_strided, G=8, L=Lv),
               carry0, envs, bytes_per_sample=bps_rs)
    timeit("resample:chunked", rs_scan(rs.box_resample_block_chunked), carry0,
           envs, bytes_per_sample=bps_rs)

    # ---- autocorr accumulate (dynamic_update_slice into the big ring) only
    ac_round = cfg.ac_round_samples

    @jax.jit
    def s_ac(carry, xs):
        def body(carry, env):
            buf, fill = carry
            buf = lax.dynamic_update_slice(buf, env, (fill,))
            fill = fill + block
            fill = jnp.where(fill >= ac_round, fill - ac_round, fill)
            return (buf, fill), env[0]
        carry, acc = lax.scan(body, carry, xs)
        return carry, acc
    timeit("accum:ac-ring-write", s_ac,
           (jnp.zeros((ac_round + block,), jnp.float32), jnp.int32(0)), envs,
           bytes_per_sample=4 + 4)

    # the production step's gated form: where(fed, dus(buf), buf) forces a
    # full-ring select pass; a cond lets XLA alias the ring in place on the
    # (overwhelmingly common) fed path — A/B the two
    @jax.jit
    def s_ac_where(carry, xs):
        def body(carry, env):
            buf, fill, fed = carry
            written = lax.dynamic_update_slice(buf, env, (fill,))
            buf = jnp.where(fed, written, buf)
            fill = fill + block
            fill = jnp.where(fill >= ac_round, fill - ac_round, fill)
            return (buf, fill, fed), env[0]
        carry, acc = lax.scan(body, carry, xs)
        return carry, acc
    timeit("accum:ac-ring-write-where", s_ac_where,
           (jnp.zeros((ac_round + block,), jnp.float32), jnp.int32(0),
            jnp.asarray(True)), envs, bytes_per_sample=4 + 4)

    @jax.jit
    def s_ac_cond(carry, xs):
        def body(carry, env):
            buf, fill, fed = carry
            buf = lax.cond(
                fed,
                lambda b: lax.dynamic_update_slice(b, env, (fill,)),
                lambda b: b,
                buf,
            )
            fill = fill + block
            fill = jnp.where(fill >= ac_round, fill - ac_round, fill)
            return (buf, fill, fed), env[0]
        carry, acc = lax.scan(body, carry, xs)
        return carry, acc
    timeit("accum:ac-ring-write-cond", s_ac_cond,
           (jnp.zeros((ac_round + block,), jnp.float32), jnp.int32(0),
            jnp.asarray(True)), envs, bytes_per_sample=4 + 4)

    # ---- fold: dynamic_update_slice of pixels into the frame buffer
    fb_len = cfg.frame_pixels + max_pix
    pixs = jnp.asarray(rng.random((K, max_pix), np.float32))

    @jax.jit
    def s_fold(carry, xs):
        def body(carry, pix):
            fb, fill = carry
            window = lax.dynamic_slice(fb, (fill,), (max_pix,))
            n_valid = max_pix - (fill % 8)  # traced bound: keeps the
            # read-modify-write select alive like the real fold
            fb = lax.dynamic_update_slice(fb, jnp.where(
                jnp.arange(max_pix) < n_valid, pix, window), (fill,))
            fill = fill + max_pix - 7
            fill = jnp.where(fill >= cfg.frame_pixels, fill - cfg.frame_pixels, fill)
            return (fb, fill), pix[0]
        carry, acc = lax.scan(body, carry, xs)
        return carry, acc
    timeit("fold:frame-write", s_fold,
           (jnp.zeros((fb_len,), jnp.float32), jnp.int32(0)), pixs,
           samples=K * block, bytes_per_sample=4 * max_pix / block * 3)

    # round-3 shipped form: plain write, no read-modify-write (pixels past
    # n_valid are zero and unobserved — see pipeline.py fold comment)
    @jax.jit
    def s_fold2(carry, xs):
        def body(carry, pix):
            fb, fill = carry
            fb = lax.dynamic_update_slice(fb, pix, (fill,))
            fill = fill + max_pix - 7
            fill = jnp.where(fill >= cfg.frame_pixels, fill - cfg.frame_pixels, fill)
            return (fb, fill), pix[0]
        carry, acc = lax.scan(body, carry, xs)
        return carry, acc
    timeit("fold:frame-write-only", s_fold2,
           (jnp.zeros((fb_len,), jnp.float32), jnp.int32(0)), pixs,
           samples=K * block, bytes_per_sample=4 * max_pix / block * 2)

    # ---- isolated per-frame post-process (the emit-cond body): one call
    # per frame, amortized over frame_pixels/pixels-per-block blocks
    from tempestsdr_tpu.stream.pipeline import _post_process
    from tempestsdr_tpu.ops.sync import PLLState, SweetspotState

    frames_per_block = block * 2.0 / cfg.frame_pixels

    for label, precise in (("post:frame-f64", True), ("post:frame-f32", False)):
        pcfg = PipelineConfig(samplerate=64e6, height=628, refreshrate=60.0,
                             block_samples=block, high_precision_sync=precise)
        pparams = Params()
        frames2d = jnp.asarray(
            rng.random((4, pcfg.height, pcfg.width), np.float32))

        @jax.jit
        def s_post(carry, xs):
            def body(carry, frame):
                screen, ag, sx, sy, pll = carry
                result, screen, ag, sx, sy, pll = _post_process(
                    pcfg, pparams, frame, screen, ag, sx, sy, pll,
                    jnp.float32(0.0))
                return (screen, ag, sx, sy, pll), result[0, 0]
            return lax.scan(body, carry, xs)
        carry = (jnp.zeros((pcfg.height, pcfg.width), jnp.float32),
                 (jnp.float32(0), jnp.float32(0), jnp.float32(1)),
                 SweetspotState.init(), SweetspotState.init(), PLLState.init())
        # samples: each frame == frame_pixels/2 input samples' worth
        timeit(label, s_post, carry, frames2d,
               samples=4 * cfg.frame_pixels // 2)

    # ---- emit-time framebuf shift (emit_fn's concat of tail + zeros):
    # scanned once per iteration == the per-FRAME cost of the shift
    fb_len2 = cfg.frame_pixels + max_pix

    @jax.jit
    def s_fbshift(carry, xs):
        def body(fb, x):
            fb = jnp.concatenate(
                [fb[cfg.frame_pixels:],
                 jnp.zeros((cfg.frame_pixels,), jnp.float32)])
            return fb, fb[0] + x
        return lax.scan(body, carry, xs)
    timeit("emit:framebuf-shift", s_fbshift,
           jnp.zeros((fb_len2,), jnp.float32),
           jnp.zeros((8,), jnp.float32), samples=8 * cfg.frame_pixels // 2)

    # round-3 replacement shipped in emit_fn: copy only the <= max_pix spill
    # to the front, leave the (never-read) tail stale
    @jax.jit
    def s_fbspill(carry, xs):
        def body(fb, x):
            fb = lax.dynamic_update_slice(fb, fb[cfg.frame_pixels:], (0,))
            return fb, fb[0] + x
        return lax.scan(body, carry, xs)
    timeit("emit:framebuf-spill", s_fbspill,
           jnp.zeros((fb_len2,), jnp.float32),
           jnp.zeros((8,), jnp.float32), samples=8 * cfg.frame_pixels // 2)

    # ---- A/B: the pre-fusion default-order composition (autogain ->
    # collapse(normalized) -> sync -> IIR with the normalized frame
    # materialized) vs the fused path measured by post:frame-* above
    from tempestsdr_tpu.ops.frame import autogain_run as _ag, collapse_v_h as _cv, time_lowpass as _tl
    from tempestsdr_tpu.stream.pipeline import _sync_detect as _sd

    for label, precise in (("post:frame-general-f64", True),
                           ("post:frame-general-f32", False)):
        pcfg = PipelineConfig(samplerate=64e6, height=628, refreshrate=60.0,
                             block_samples=block, high_precision_sync=precise)
        pparams = Params()
        frames2d = jnp.asarray(
            rng.random((4, pcfg.height, pcfg.width), np.float32))

        @jax.jit
        def s_postg(carry, xs):
            def body(carry, frame):
                screen, ag, sx, sy, pll = carry
                inp, mn, mx, snr = _ag(frame, ag[0], ag[1])
                wp, hp = _cv(inp, precise)
                syncres, sx, sy, pll = _sd(pcfg, pparams, inp, sx, sy, pll, wp, hp)
                screen = _tl(screen, syncres, jnp.float32(0.0))
                return (screen, (mn, mx, snr), sx, sy, pll), screen[0, 0]
            return lax.scan(body, carry, xs)
        carry = (jnp.zeros((pcfg.height, pcfg.width), jnp.float32),
                 (jnp.float32(0), jnp.float32(0), jnp.float32(1)),
                 SweetspotState.init(), SweetspotState.init(), PLLState.init())
        timeit(label, s_postg, carry, frames2d,
               samples=4 * cfg.frame_pixels // 2)

    # ---- post-process internals (each op isolated, scanned over frames):
    # locates where the 0.58 ms/frame goes — big-frame reductions vs the
    # many small-array sync kernels vs the autoshift roll
    from tempestsdr_tpu.ops.frame import autogain_run, collapse_v_h, time_lowpass
    from tempestsdr_tpu.ops.sync import (
        FRAMERATE_DX_LOWPASS_COEFF_WIDTH,
        find_the_sweet_spot,
        framerate_pll,
    )

    pcfg = PipelineConfig(samplerate=64e6, height=628, refreshrate=60.0,
                          block_samples=block)
    frames2d = jnp.asarray(rng.random((4, pcfg.height, pcfg.width), np.float32))
    fsamp = 4 * cfg.frame_pixels // 2

    def s_autogain(carry, xs):
        def body(c, fr):
            out, mn, mx, snr = autogain_run(fr, c[0], c[1])
            return (mn, mx), out[0, 0] + snr
        return lax.scan(body, carry, xs)
    timeit("post:autogain", jax.jit(s_autogain),
           (jnp.float32(0), jnp.float32(1)), frames2d, samples=fsamp)

    def s_iir(carry, xs):
        def body(screen, fr):
            screen = time_lowpass(screen, fr, jnp.float32(0.5))
            return screen, screen[0, 0]
        return lax.scan(body, carry, xs)
    timeit("post:iir", jax.jit(s_iir),
           jnp.zeros((pcfg.height, pcfg.width), jnp.float32), frames2d,
           samples=fsamp)

    for lbl, precise in (("post:collapse-f64", True), ("post:collapse-f32", False)):
        def s_col(carry, xs, precise=precise):
            def body(c, fr):
                wp, hp = collapse_v_h(fr, precise)
                return c, wp[0] + hp[0]
            return lax.scan(body, carry, xs)
        timeit(lbl, jax.jit(s_col), jnp.float32(0), frames2d, samples=fsamp)

    def s_syncsmall(carry, xs):
        def body(c, fr):
            sx, pll = c
            wprof = jnp.sum(fr, axis=0, dtype=jnp.float64)
            sx, _, _ = find_the_sweet_spot(
                sx, wprof, int(pcfg.width * np.float32(0.05)),
                FRAMERATE_DX_LOWPASS_COEFF_WIDTH)
            pll = framerate_pll(pll, sx.vx, enabled=True, max_delta=1.2)
            return (sx, pll), pll.refresh_delta
        return lax.scan(body, carry, xs)
    timeit("post:sync-small(1axis+pll)", jax.jit(s_syncsmall),
           (SweetspotState.init(), PLLState.init()), frames2d, samples=fsamp)

    def s_roll(carry, xs):
        def body(c, fr):
            out = jnp.roll(fr, shift=(-c[0], -c[1]), axis=(0, 1))
            return c, out[0, 0]
        return lax.scan(body, carry, xs)
    timeit("post:roll", jax.jit(s_roll),
           (jnp.int32(17), jnp.int32(333)), frames2d, samples=fsamp)

    # ---- full production step
    for label, params, hps, b in (
        ("step:full", Params(), True, 2 + 4 + 8 + 8),
        ("step:full-f32sync", Params(), False, 2 + 4 + 8 + 8),
        ("step:no-autocorr", Params(autocorr_plots_off=True), True, 2 + 4 + 8),
    ):
        scfg = PipelineConfig(samplerate=64e6, height=628, refreshrate=60.0,
                             block_samples=block, high_precision_sync=hps)
        step = make_step(scfg, params)
        ctrl = StepControls.default()

        @jax.jit
        def s_full(state, xs):
            def body(st, raw):
                st, out = step(st, raw, ctrl)
                return st, (out.frame_valid, out.n_pixels)
            return lax.scan(body, state, xs)
        timeit(label, s_full, init_state(scfg), raws, bytes_per_sample=b)

    # ---- pre-only (the step minus its two cond bodies + plumbing): the gap
    # between this and step:full is the cond/emit machinery cost
    from tempestsdr_tpu.stream.pipeline import _make_step_parts

    pcfg2 = PipelineConfig(samplerate=64e6, height=628, refreshrate=60.0,
                          block_samples=block)
    parts = _make_step_parts(pcfg2, Params())
    pre_f, _, _, _, emit_ops_of, ac_ops_of, assemble_f = parts
    ctrl0 = StepControls.default()

    @jax.jit
    def s_preonly(state, xs):
        def body(st, raw):
            inter = pre_f(st, raw, ctrl0)
            st2, outs = assemble_f(
                st, inter, ac_ops_of(st, inter), emit_ops_of(st, inter),
                jnp.zeros((pcfg2.height, pcfg2.width), jnp.float32))
            return st2, (outs.frame_valid, outs.n_pixels)
        return lax.scan(body, state, xs)
    timeit("step:pre-only", s_preonly, init_state(pcfg2), raws,
           bytes_per_sample=2 + 4 + 8 + 8)

    # ---- bigger block: amortize the per-iteration floor (max block allowed
    # by the one-frame-per-step constraint at this geometry)
    bigblock = 1_000_000
    bcfg = PipelineConfig(samplerate=64e6, height=628, refreshrate=60.0,
                         block_samples=bigblock)
    bstep = make_step(bcfg, Params())
    braws = jnp.asarray(
        rng.integers(0, 256, size=(K // 2, 2 * bigblock), dtype=np.uint8))

    @jax.jit
    def s_big(state, xs):
        def body(st, raw):
            st, out = bstep(st, raw, ctrl0)
            return st, (out.frame_valid, out.n_pixels)
        return lax.scan(body, state, xs)
    timeit("step:block1M", s_big, init_state(bcfg), braws,
           samples=(K // 2) * bigblock, bytes_per_sample=2 + 4 + 8 + 8)

    # ---- scan unroll: amortize the per-iteration overhead floor
    for unroll in (2, 4):
        scfg = PipelineConfig(samplerate=64e6, height=628, refreshrate=60.0,
                             block_samples=block, high_precision_sync=False)
        step = make_step(scfg, Params())
        ctrl = StepControls.default()

        @jax.jit
        def s_unroll(state, xs):
            def body(st, raw):
                st, out = step(st, raw, ctrl)
                return st, (out.frame_valid, out.n_pixels)
            return lax.scan(body, state, xs, unroll=unroll)
        timeit(f"step:f32sync-unroll{unroll}", s_unroll, init_state(scfg), raws,
               bytes_per_sample=2 + 4 + 8 + 8)

    if args.channels:
        C = args.channels
        cblock = 1 << 17
        ccfg = PipelineConfig(samplerate=16e6, height=628, refreshrate=60.0,
                              block_samples=cblock)
        ccfg_f32 = PipelineConfig(samplerate=16e6, height=628, refreshrate=60.0,
                                  block_samples=cblock,
                                  high_precision_sync=False)
        cstep = make_channels_step(ccfg, Params())
        cstep_f32 = make_channels_step(ccfg_f32, Params())
        craws = jnp.asarray(
            rng.integers(0, 256, size=(K, C, 2 * cblock), dtype=np.uint8))
        cenvs = jnp.asarray(rng.random((K, C, cblock), np.float32))
        ctrl = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (C,) + x.shape),
            StepControls.default())
        csamples = K * C * cblock

        @jax.jit
        def s_ch(states, xs):
            def body(st, raw):
                st, out = cstep(st, raw, ctrl)
                return st, out.frame_valid
            return lax.scan(body, states, xs)
        timeit(f"channels:{C}:full-step", s_ch, stack_states(ccfg, C), craws,
               samples=csamples, bytes_per_sample=2 + 4 + 8 + 8)

        @jax.jit
        def s_ch32(states, xs):
            def body(st, raw):
                st, out = cstep_f32(st, raw, ctrl)
                return st, out.frame_valid
            return lax.scan(body, states, xs)
        timeit(f"channels:{C}:full-f32sync", s_ch32, stack_states(ccfg_f32, C),
               craws, samples=csamples, bytes_per_sample=2 + 4 + 8 + 8)

        # pre-only channels: vmapped per-sample work + assemble, no conds
        cparts = _make_step_parts(ccfg, Params())
        cpre, _, _, _, cemit_of, cac_of, cassemble = cparts

        @jax.jit
        def s_chpre(states, xs):
            def body(st, raw):
                inter = jax.vmap(lambda s, r: cpre(s, r, StepControls.default()))(
                    st, raw)
                st2, outs = jax.vmap(cassemble)(
                    st, inter, cac_of(st, inter), cemit_of(st, inter),
                    jnp.zeros((C, ccfg.height, ccfg.width), jnp.float32))
                return st2, outs.frame_valid
            return lax.scan(body, states, xs)
        timeit(f"channels:{C}:pre-only", s_chpre, stack_states(ccfg, C), craws,
               samples=csamples, bytes_per_sample=2 + 4 + 8 + 8)

        # bigger per-channel block (non-pow2, largest the one-frame-per-step
        # constraint allows at 16 MS/s geometry)
        cblock2 = 196_608
        ccfg2 = PipelineConfig(samplerate=16e6, height=628, refreshrate=60.0,
                               block_samples=cblock2)
        cstep2 = make_channels_step(ccfg2, Params())
        craws2 = jnp.asarray(
            rng.integers(0, 256, size=(K // 2, C, 2 * cblock2), dtype=np.uint8))

        @jax.jit
        def s_ch2(states, xs):
            def body(st, raw):
                st, out = cstep2(st, raw, ctrl)
                return st, out.frame_valid
            return lax.scan(body, states, xs)
        timeit(f"channels:{C}:block192k", s_ch2, stack_states(ccfg2, C), craws2,
               samples=(K // 2) * C * cblock2, bytes_per_sample=2 + 4 + 8 + 8)

        # worst case after drop-induced desync: frame boundaries staggered
        # across channels -> the any()-gated emit body fires for every
        # channel at C times the per-channel frame cadence
        # (stream/pipeline.py make_channels_step docstring)
        desync = stack_states(ccfg, C)
        import jax.numpy as _jnp
        desync = desync._replace(
            fill=(_jnp.arange(C, dtype=_jnp.int32)
                  * (ccfg.frame_pixels // C)) % ccfg.frame_pixels)
        timeit(f"channels:{C}:full-desync", s_ch, desync, craws,
               samples=csamples, bytes_per_sample=2 + 4 + 8 + 8)

        # -- per-stage: where does the per-chip loss go? --
        @jax.jit
        def s_chd(c, xs):
            def body(c, x):
                e = jax.vmap(lambda r: am_demod(normalize_iq(r)))(x)
                return c + e[0, 0], ()
            c, _ = lax.scan(body, c, xs)
            return c, c
        timeit(f"channels:{C}:demod", s_chd, jnp.float32(0), craws,
               samples=csamples, bytes_per_sample=2 + 4)

        ctaps = ccfg.resample_taps
        cinv = jnp.int64(ccfg.inv0_fix)
        cmax_pix = ccfg.max_block_pixels

        def rs_one(x_ext, phase):
            return rs.box_resample_strided(
                x_ext, phase, cinv, n_samples=cblock, max_pix=cmax_pix,
                taps=ctaps, inv_nominal=ccfg.samples_per_pixel)

        @jax.jit
        def s_chr(carry, xs):
            def body(carry, env):
                phases, tails = carry
                x_ext = jnp.concatenate([tails, env], axis=1)
                pix, n_out, ph2 = jax.vmap(rs_one)(x_ext, phases)
                return (ph2, x_ext[:, x_ext.shape[1] - ctaps:]), pix[0, 0]
            carry, acc = lax.scan(body, carry, xs)
            return carry, acc
        # per-channel phases differ by 1 ulp-ish so the vmapped gather paths
        # stay per-channel (the real situation after any drop)
        ph0 = jnp.arange(C, dtype=jnp.int64) * 0
        timeit(f"channels:{C}:resample-vmap", s_chr,
               (ph0, jnp.zeros((C, ctaps), jnp.float32)), cenvs,
               samples=csamples, bytes_per_sample=4 + 8)

        cac_round = ccfg.ac_round_samples

        @jax.jit
        def s_cha(carry, xs):
            def body(carry, env):
                buf, fill = carry
                buf = jax.vmap(lambda b, e, f: lax.dynamic_update_slice(b, e, (f,)))(
                    buf, env, fill)
                fill = fill + cblock
                fill = jnp.where(fill >= cac_round, fill - cac_round, fill)
                return (buf, fill), env[0, 0]
            carry, acc = lax.scan(body, carry, xs)
            return carry, acc
        timeit(f"channels:{C}:ac-write-vmap", s_cha,
               (jnp.zeros((C, cac_round + cblock), jnp.float32),
                jnp.zeros((C,), jnp.int32)), cenvs,
               samples=csamples, bytes_per_sample=4 + 4)

        @jax.jit
        def s_cha2(carry, xs):
            def body(carry, env):
                buf, fill = carry
                buf = lax.dynamic_update_slice(buf, env, (jnp.int32(0), fill))
                fill = fill + cblock
                fill = jnp.where(fill >= cac_round, fill - cac_round, fill)
                return (buf, fill), env[0, 0]
            carry, acc = lax.scan(body, carry, xs)
            return carry, acc
        timeit(f"channels:{C}:ac-write-shared", s_cha2,
               (jnp.zeros((C, cac_round + cblock), jnp.float32), jnp.int32(0)),
               cenvs, samples=csamples, bytes_per_sample=4 + 4)

        cfb = ccfg.frame_pixels + cmax_pix
        cpix = jnp.asarray(rng.random((K, C, cmax_pix), np.float32))

        @jax.jit
        def s_chf(carry, xs):
            def body(carry, pix):
                fb, fill = carry
                def one(fb1, p1, f1):
                    window = lax.dynamic_slice(fb1, (f1,), (cmax_pix,))
                    nv = cmax_pix - (f1 % 8)
                    return lax.dynamic_update_slice(
                        fb1, jnp.where(jnp.arange(cmax_pix) < nv, p1, window), (f1,))
                fb = jax.vmap(one)(fb, pix, fill)
                fill = fill + cmax_pix - 7
                fill = jnp.where(fill >= ccfg.frame_pixels,
                                 fill - ccfg.frame_pixels, fill)
                return (fb, fill), pix[0, 0]
            carry, acc = lax.scan(body, carry, xs)
            return carry, acc
        timeit(f"channels:{C}:fold-vmap", s_chf,
               (jnp.zeros((C, cfb), jnp.float32), jnp.zeros((C,), jnp.int32)),
               cpix, samples=csamples,
               bytes_per_sample=4 * cmax_pix / cblock * 3)

    if args.pallas:
        # LAST: a Mosaic failure can poison the remote session
        from tempestsdr_tpu.pallas.resample_kernel import (
            box_resample_pallas, box_resample_pallas_windows)
        try:
            timeit("resample:pallas-dma", rs_scan(box_resample_pallas), carry0,
                   envs, bytes_per_sample=bps_rs)
        except Exception as e:  # noqa: BLE001
            print(f"resample:pallas-dma FAILED: {e}", flush=True)
            results["resample:pallas-dma"] = {"error": str(e)[:200]}
        try:
            timeit("resample:pallas-windows", rs_scan(box_resample_pallas_windows),
                   carry0, envs, bytes_per_sample=bps_rs)
        except Exception as e:  # noqa: BLE001
            print(f"resample:pallas-windows FAILED: {e}", flush=True)
            results["resample:pallas-windows"] = {"error": str(e)[:200]}
        # full step with the pallas resampler wired in (Params.resampler)
        try:
            step = make_step(cfg, Params(resampler="pallas"))
            ctrl = StepControls.default()

            @jax.jit
            def s_fullp(state, xs):
                def body(st, raw):
                    st, out = step(st, raw, ctrl)
                    return st, (out.frame_valid, out.n_pixels)
                return lax.scan(body, state, xs)
            timeit("step:full-pallas", s_fullp, init_state(cfg), raws,
                   bytes_per_sample=2 + 4 + 8 + 8)
        except Exception as e:  # noqa: BLE001
            print(f"step:full-pallas FAILED: {e}", flush=True)
            results["step:full-pallas"] = {"error": str(e)[:200]}

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "PROFILE.json")
    if only_re is not None and os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
