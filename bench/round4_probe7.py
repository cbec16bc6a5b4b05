"""Round-4 probe 7 — floor-corrected narrowband decomposition (slope method).

Probe 5's absolute stage rows were clipped by the ~25 ms dispatch floor
(ROUND4_PROBE6.json). This probe re-measures every stage at the config-1
geometry with TWO scan lengths per row and reports the SLOPE
(t(K2) - t(K1)) / (K2 - K1) — the floor cancels exactly, leaving the true
per-iteration cost. Frame-cadence rows scan 64 vs 256 frames; block-cadence
rows scan 32 vs 128 blocks.

Output: true us/frame for the emit-body pieces (post body, sync search,
collapse, autogain, IIR, spill) and true ms/block for the per-sample stages
(demod, Mosaic resample, ac write, fold) — the decomposition that decides
whether any narrowband lever remains. Rows flush to ROUND4_PROBE7.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ROUND4_PROBE7.json")


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
    from tempestsdr_tpu.ops.frame import autogain_run, collapse_v_h, time_lowpass
    from tempestsdr_tpu.ops.sync import (
        FRAMERATE_DX_LOWPASS_COEFF_WIDTH,
        PLLState,
        SweetspotState,
        find_the_sweet_spot,
        framerate_pll,
    )
    from tempestsdr_tpu.stream.pipeline import _post_process

    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    sr, h, block = 8e6, 628, 450560
    if smoke:
        block = 65536
    cfg = PipelineConfig(samplerate=sr, height=h, refreshrate=60.0,
                         block_samples=block)
    params = Params()
    M = 2 if smoke else 6
    KS_BLK = (4, 8) if smoke else (32, 128)
    KS_FRM = (4, 8) if smoke else (64, 256)

    results = {"backend": jax.default_backend(),
               "geometry": f"{sr/1e6:.0f}MS/s h{h} w{cfg.width} block{block}",
               "method": "slope between two scan lengths (floor cancels)",
               "started": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    flush(results)
    rng = np.random.default_rng(0)

    def best_dispatch(run, carry, xs):
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
        return min(dts), compile_s

    def slope_row(name, make_run, make_carry, make_xs, ks, unit_scale, unit):
        ts = {}
        compiles = 0.0
        for k in ks:
            run = make_run()
            t, c = best_dispatch(run, make_carry(), make_xs(k))
            ts[k] = t
            compiles += c
        k1, k2 = ks
        per_iter = (ts[k2] - ts[k1]) / (k2 - k1)
        r = {f"{unit}": round(per_iter * unit_scale, 2),
             "dispatch_ms": {str(k): round(ts[k] * 1e3, 2) for k in ks},
             "compile_s_total": round(compiles, 1)}
        results[name] = r
        flush(results)
        print(f"# {name}: {r}", flush=True)

    # ---- frame-cadence rows (true us/frame) ----
    def frames_xs(F):
        return jnp.asarray(rng.random((F, cfg.height, cfg.width), np.float32))

    def row_post():
        @jax.jit
        def s(carry, xs):
            def body(carry, frame):
                screen, ag, sx, sy, pll = carry
                result, screen, ag, sx, sy, pll = _post_process(
                    cfg, params, frame, screen, ag, sx, sy, pll,
                    jnp.float32(0.0))
                return (screen, ag, sx, sy, pll), result[0, 0]
            return lax.scan(body, carry, xs)
        return s

    post_carry = lambda: (jnp.zeros((cfg.height, cfg.width), jnp.float32),
                          (jnp.float32(0), jnp.float32(0), jnp.float32(1)),
                          SweetspotState.init(), SweetspotState.init(),
                          PLLState.init())
    slope_row("post:frame-f64", row_post, post_carry, frames_xs, KS_FRM,
              1e6, "us_per_frame")

    def row_sync():
        @jax.jit
        def s(carry, xs):
            def body(c, fr):
                sx, pll = c
                wprof = jnp.sum(fr, axis=0, dtype=jnp.float64)
                sx, _, _ = find_the_sweet_spot(
                    sx, wprof, int(cfg.width * np.float32(0.05)),
                    FRAMERATE_DX_LOWPASS_COEFF_WIDTH)
                pll = framerate_pll(pll, sx.vx, enabled=True, max_delta=1.2)
                return (sx, pll), pll.refresh_delta
            return lax.scan(body, carry, xs)
        return s

    slope_row("post:sync-small(1axis+pll)", row_sync,
              lambda: (SweetspotState.init(), PLLState.init()), frames_xs,
              KS_FRM, 1e6, "us_per_frame")

    def row_col():
        @jax.jit
        def s(carry, xs):
            def body(c, fr):
                wp, hp = collapse_v_h(fr, True)
                return c, wp[0] + hp[0]
            return lax.scan(body, carry, xs)
        return s

    slope_row("post:collapse-f64", row_col, lambda: jnp.float32(0), frames_xs,
              KS_FRM, 1e6, "us_per_frame")

    def row_ag():
        @jax.jit
        def s(carry, xs):
            def body(c, fr):
                out, mn, mx, snr = autogain_run(fr, c[0], c[1])
                return (mn, mx), out[0, 0] + snr
            return lax.scan(body, carry, xs)
        return s

    slope_row("post:autogain", row_ag,
              lambda: (jnp.float32(0), jnp.float32(1)), frames_xs, KS_FRM,
              1e6, "us_per_frame")

    def row_iir():
        @jax.jit
        def s(carry, xs):
            def body(screen, fr):
                screen = time_lowpass(screen, fr, jnp.float32(0.5))
                return screen, screen[0, 0]
            return lax.scan(body, carry, xs)
        return s

    slope_row("post:iir", row_iir,
              lambda: jnp.zeros((cfg.height, cfg.width), jnp.float32),
              frames_xs, KS_FRM, 1e6, "us_per_frame")

    taps = cfg.resample_taps
    inv_fix = jnp.int64(cfg.inv0_fix)
    max_pix = cfg.max_block_pixels
    fb_len = cfg.frame_pixels + max_pix

    def row_spill():
        @jax.jit
        def s(carry, xs):
            def body(fb, x):
                fb = lax.dynamic_update_slice(fb, fb[cfg.frame_pixels:], (0,))
                return fb, fb[0] + x
            return lax.scan(body, carry, xs)
        return s

    slope_row("emit:framebuf-spill", row_spill,
              lambda: jnp.zeros((fb_len,), jnp.float32),
              lambda F: jnp.zeros((F,), jnp.float32), KS_FRM, 1e6,
              "us_per_frame")

    # ---- block-cadence rows (true ms/block) ----
    def raws_xs(K):
        return jnp.asarray(rng.integers(0, 256, size=(K, 2 * block),
                                        dtype=np.uint8))

    def envs_xs(K):
        return jnp.asarray(rng.random((K, block), np.float32))

    def row_demod():
        @jax.jit
        def s(c, xs):
            def body(c, x):
                e = am_demod(normalize_iq(x))
                return c + e[0], ()
            c, _ = lax.scan(body, c, xs)
            return c, c
        return s

    slope_row("demod:pair-matmul", row_demod, lambda: jnp.float32(0),
              raws_xs, KS_BLK, 1e3, "ms_per_block")

    ac_round = cfg.ac_round_samples

    def row_ac():
        @jax.jit
        def s(carry, xs):
            def body(carry, env):
                buf, fill = carry
                buf = lax.dynamic_update_slice(buf, env, (fill,))
                fill = fill + block
                fill = jnp.where(fill >= ac_round, fill - ac_round, fill)
                return (buf, fill), env[0]
            return lax.scan(body, carry, xs)
        return s

    slope_row("accum:ac-ring-write", row_ac,
              lambda: (jnp.zeros((ac_round + block,), jnp.float32),
                       jnp.int32(0)), envs_xs, KS_BLK, 1e3, "ms_per_block")

    def pixs_xs(K):
        return jnp.asarray(rng.random((K, max_pix), np.float32))

    def row_fold():
        @jax.jit
        def s(carry, xs):
            def body(carry, pix):
                fb, fill = carry
                fb = lax.dynamic_update_slice(fb, pix, (fill,))
                fill = fill + max_pix - 7
                fill = jnp.where(fill >= cfg.frame_pixels,
                                 fill - cfg.frame_pixels, fill)
                return (fb, fill), pix[0]
            return lax.scan(body, carry, xs)
        return s

    slope_row("fold:frame-write", row_fold,
              lambda: (jnp.zeros((fb_len,), jnp.float32), jnp.int32(0)),
              pixs_xs, KS_BLK, 1e3, "ms_per_block")

    if not smoke:
        from tempestsdr_tpu.pallas.strided_kernel import (
            box_resample_strided_pallas,
        )

        def row_rs():
            @jax.jit
            def s(carry, xs):
                def body(carry, env):
                    phase, tail = carry
                    x_ext = jnp.concatenate([tail, env])
                    pix, n_out, phase2 = box_resample_strided_pallas(
                        x_ext, phase, inv_fix, n_samples=block,
                        max_pix=max_pix, taps=taps,
                        inv_nominal=cfg.samples_per_pixel)
                    return (phase2, x_ext[x_ext.shape[0] - taps:]), pix[0]
                return lax.scan(body, carry, xs)
            return s

        slope_row("resample:mosaic", row_rs,
                  lambda: (jnp.int64(0), jnp.zeros((taps,), jnp.float32)),
                  envs_xs, KS_BLK, 1e3, "ms_per_block")

    results["done"] = True
    flush(results)
    print("ROUND4_PROBE7 done")


if __name__ == "__main__":
    main()
