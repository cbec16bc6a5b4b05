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
    args = ap.parse_args()

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
    timeit("resample:strided", rs_scan(rs.box_resample_strided), carry0, envs,
           bytes_per_sample=bps_rs)
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

    # ---- full production step
    for label, params, b in (
        ("step:full", Params(), 2 + 4 + 8 + 8),
        ("step:no-autocorr", Params(autocorr_plots_off=True), 2 + 4 + 8),
    ):
        step = make_step(cfg, params)
        ctrl = StepControls.default()

        @jax.jit
        def s_full(state, xs):
            def body(st, raw):
                st, out = step(st, raw, ctrl)
                return st, (out.frame_valid, out.n_pixels)
            return lax.scan(body, state, xs)
        timeit(label, s_full, init_state(cfg), raws, bytes_per_sample=b)

    if args.channels:
        C = args.channels
        cblock = 1 << 17
        ccfg = PipelineConfig(samplerate=16e6, height=628, refreshrate=60.0,
                              block_samples=cblock)
        cstep = make_channels_step(ccfg, Params())
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
                buf = lax.dynamic_update_slice(buf, env, (0, fill))
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
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
