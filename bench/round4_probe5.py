"""Round-4 probe 5 — narrowband (config-1 geometry) step decomposition.

The block sweep (ROUND4_PROBE4.json) showed configs 1-3 gain only 4-9% from
block amortization: at 8 MS/s / block 450560 the step costs ~2.73 ms/blk
while the per-sample stages + fixed cost model predicts ~1.0 ms — the frame-
cadence emit machinery (3.4 frames/block here) is the dominant term. This
probe isolates each stage AT THE NARROWBAND GEOMETRY (the PROFILE.json rows
are all 64 MS/s / 2.1 Mpx frames) to find where the per-frame ~0.5 ms goes
and whether any lever remains:

  step:full / step:no-autocorr        (in-session baseline + estimator share)
  demod / resample:xla / ac-write / fold   (per-sample stages at this block)
  post:frame-f64                      (the fused emit body, per frame)
  post:sync-small / post:collapse-f64 (emit-body split: many-small-kernels
                                       sync search vs the f64 reduction)
  emit:framebuf-spill                 (per-frame leftover copy)
  resample:mosaic                     (LAST — Mosaic crash poisons sessions)

Rows flush to ROUND4_PROBE5.json as they complete.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ROUND4_PROBE5.json")


def flush(results):
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f, indent=1)
    os.replace(tmp, OUT)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax import lax

    from tempestsdr_tpu.config import PipelineConfig
    from tempestsdr_tpu.params import Params
    from tempestsdr_tpu.ops.demod import am_demod, normalize_iq
    from tempestsdr_tpu.ops import resample as rs
    from tempestsdr_tpu.ops.frame import autogain_run, collapse_v_h, time_lowpass
    from tempestsdr_tpu.ops.sync import (
        FRAMERATE_DX_LOWPASS_COEFF_WIDTH,
        PLLState,
        SweetspotState,
        find_the_sweet_spot,
        framerate_pll,
    )
    from tempestsdr_tpu.stream import make_step, init_state
    from tempestsdr_tpu.stream.pipeline import StepControls, _post_process

    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    sr, h, rr, block = 8e6, 628, 60.0, 450560
    if smoke:
        block = 65536
    cfg = PipelineConfig(samplerate=sr, height=h, refreshrate=rr,
                         block_samples=block)
    K = 4 if smoke else 18
    M = 2 if smoke else 6

    results = {"backend": jax.default_backend(),
               "geometry": f"{sr/1e6:.0f}MS/s h{h} w{cfg.width} block{block}",
               "frames_per_block": round(2.0 * block / cfg.frame_pixels, 2),
               "started": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    flush(results)
    rng = np.random.default_rng(0)

    def timeit(name, run, carry, xs, samples, per_frame=False):
        t0 = time.monotonic()
        carry, out = run(carry, xs)
        _ = np.asarray(jax.tree.leaves(out)[0]).sum()
        compile_s = time.monotonic() - t0
        dts = []
        for _ in range(M):
            t0 = time.monotonic()
            carry, out = run(carry, xs)
            _ = np.asarray(jax.tree.leaves(out)[0]).sum()
            dts.append(time.monotonic() - t0)
        best = min(dts)
        n_iter = xs.shape[0] if hasattr(xs, "shape") else len(xs)
        r = {"ms_per_block": round(best * 1e3 / n_iter, 4),
             "MSps": round(samples / best / 1e6, 1),
             "compile_s": round(compile_s, 1)}
        if per_frame:
            r["us_per_frame"] = round(best * 1e6 / n_iter, 1)
        results[name] = r
        flush(results)
        print(f"# {name}: {r}", flush=True)
        return r

    ctrl = StepControls.default()
    raws = jnp.asarray(rng.integers(0, 256, size=(K, 2 * block), dtype=np.uint8))
    envs = jnp.asarray(rng.random((K, block), np.float32))

    # ---- 1/2: the full production step, with and without the estimator
    for label, params in (("step:full", Params()),
                          ("step:no-autocorr", Params(autocorr_plots_off=True))):
        step = make_step(cfg, params)

        def body(st, raw, _step=step):
            st, out = _step(st, raw, ctrl)
            return st, jnp.any(out.frame_valid)

        @jax.jit
        def s_run(st, xs, _body=body):
            return lax.scan(_body, st, xs)

        timeit(label, s_run, init_state(cfg), raws, K * block)

    # ---- 3: demod (normalize + pairing matmul)
    @jax.jit
    def s_demod(c, xs):
        def body(c, x):
            e = am_demod(normalize_iq(x))
            return c + e[0], ()
        c, _ = lax.scan(body, c, xs)
        return c, c
    timeit("demod:pair-matmul", s_demod, jnp.float32(0), raws, K * block)

    # ---- 4: XLA strided resampler at this geometry
    taps = cfg.resample_taps
    inv_fix = jnp.int64(cfg.inv0_fix)
    max_pix = cfg.max_block_pixels

    @jax.jit
    def s_rs(carry, xs):
        def body(carry, env):
            phase, tail = carry
            x_ext = jnp.concatenate([tail, env])
            pix, n_out, phase2 = rs.box_resample_strided(
                x_ext, phase, inv_fix, n_samples=block, max_pix=max_pix,
                taps=taps, inv_nominal=cfg.samples_per_pixel)
            return (phase2, x_ext[x_ext.shape[0] - taps:]), pix[0] + pix[-1]
        return lax.scan(body, carry, xs)
    timeit("resample:xla-strided", s_rs,
           (jnp.int64(0), jnp.zeros((taps,), jnp.float32)), envs, K * block)

    # ---- 5: autocorr ring write (ring is only 1.0009 blocks here!)
    ac_round = cfg.ac_round_samples

    @jax.jit
    def s_ac(carry, xs):
        def body(carry, env):
            buf, fill = carry
            buf = lax.dynamic_update_slice(buf, env, (fill,))
            fill = fill + block
            fill = jnp.where(fill >= ac_round, fill - ac_round, fill)
            return (buf, fill), env[0]
        return lax.scan(body, carry, xs)
    timeit("accum:ac-ring-write", s_ac,
           (jnp.zeros((ac_round + block,), jnp.float32), jnp.int32(0)), envs,
           K * block)

    # ---- 6: fold write at this pixel rate (plain write, shipped form)
    fb_len = cfg.frame_pixels + max_pix
    pixs = jnp.asarray(rng.random((K, max_pix), np.float32))

    @jax.jit
    def s_fold(carry, xs):
        def body(carry, pix):
            fb, fill = carry
            fb = lax.dynamic_update_slice(fb, pix, (fill,))
            fill = fill + max_pix - 7
            fill = jnp.where(fill >= cfg.frame_pixels, fill - cfg.frame_pixels,
                             fill)
            return (fb, fill), pix[0]
        return lax.scan(body, carry, xs)
    timeit("fold:frame-write", s_fold,
           (jnp.zeros((fb_len,), jnp.float32), jnp.int32(0)), pixs, K * block)

    # ---- 7: the fused default-order post body, once per frame
    frames2d = jnp.asarray(rng.random((4, cfg.height, cfg.width), np.float32))
    fsamp = 4 * cfg.frame_pixels // 2
    params = Params()

    @jax.jit
    def s_post(carry, xs):
        def body(carry, frame):
            screen, ag, sx, sy, pll = carry
            result, screen, ag, sx, sy, pll = _post_process(
                cfg, params, frame, screen, ag, sx, sy, pll, jnp.float32(0.0))
            return (screen, ag, sx, sy, pll), result[0, 0]
        return lax.scan(body, carry, xs)
    carry = (jnp.zeros((cfg.height, cfg.width), jnp.float32),
             (jnp.float32(0), jnp.float32(0), jnp.float32(1)),
             SweetspotState.init(), SweetspotState.init(), PLLState.init())
    timeit("post:frame-f64", s_post, carry, frames2d, fsamp, per_frame=True)

    # ---- 8: post-body split — one-axis sweet-spot search + PLL ...
    @jax.jit
    def s_sync(carry, xs):
        def body(c, fr):
            sx, pll = c
            wprof = jnp.sum(fr, axis=0, dtype=jnp.float64)
            sx, _, _ = find_the_sweet_spot(
                sx, wprof, int(cfg.width * np.float32(0.05)),
                FRAMERATE_DX_LOWPASS_COEFF_WIDTH)
            pll = framerate_pll(pll, sx.vx, enabled=True, max_delta=1.2)
            return (sx, pll), pll.refresh_delta
        return lax.scan(body, carry, xs)
    timeit("post:sync-small(1axis+pll)", s_sync,
           (SweetspotState.init(), PLLState.init()), frames2d, fsamp,
           per_frame=True)

    # ---- ... vs the f64 collapse, autogain, IIR
    @jax.jit
    def s_col(carry, xs):
        def body(c, fr):
            wp, hp = collapse_v_h(fr, True)
            return c, wp[0] + hp[0]
        return lax.scan(body, carry, xs)
    timeit("post:collapse-f64", s_col, jnp.float32(0), frames2d, fsamp,
           per_frame=True)

    @jax.jit
    def s_ag(carry, xs):
        def body(c, fr):
            out, mn, mx, snr = autogain_run(fr, c[0], c[1])
            return (mn, mx), out[0, 0] + snr
        return lax.scan(body, carry, xs)
    timeit("post:autogain", s_ag, (jnp.float32(0), jnp.float32(1)), frames2d,
           fsamp, per_frame=True)

    @jax.jit
    def s_iir(carry, xs):
        def body(screen, fr):
            screen = time_lowpass(screen, fr, jnp.float32(0.5))
            return screen, screen[0, 0]
        return lax.scan(body, carry, xs)
    timeit("post:iir", s_iir,
           jnp.zeros((cfg.height, cfg.width), jnp.float32), frames2d, fsamp,
           per_frame=True)

    # ---- 9: the per-frame leftover spill copy
    fb_len2 = cfg.frame_pixels + max_pix

    @jax.jit
    def s_spill(carry, xs):
        def body(fb, x):
            fb = lax.dynamic_update_slice(fb, fb[cfg.frame_pixels:], (0,))
            return fb, fb[0] + x
        return lax.scan(body, carry, xs)
    timeit("emit:framebuf-spill", s_spill, jnp.zeros((fb_len2,), jnp.float32),
           jnp.zeros((4,), jnp.float32), fsamp, per_frame=True)

    # ---- 10 (LAST, Mosaic): the production resampler on TPU
    if not smoke:
        from tempestsdr_tpu.pallas.strided_kernel import box_resample_strided_pallas

        @jax.jit
        def s_rsm(carry, xs):
            def body(carry, env):
                phase, tail = carry
                x_ext = jnp.concatenate([tail, env])
                pix, n_out, phase2 = box_resample_strided_pallas(
                    x_ext, phase, inv_fix, n_samples=block, max_pix=max_pix,
                    taps=taps, inv_nominal=cfg.samples_per_pixel)
                return (phase2, x_ext[x_ext.shape[0] - taps:]), pix[0] + pix[-1]
            return lax.scan(body, carry, xs)
        timeit("resample:mosaic", s_rsm,
               (jnp.int64(0), jnp.zeros((taps,), jnp.float32)), envs, K * block)

    results["done"] = True
    flush(results)
    print("ROUND4_PROBE5 done")


if __name__ == "__main__":
    main()
