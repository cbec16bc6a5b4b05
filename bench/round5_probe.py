"""Round-5 probe — sync-fusion A/B, emit-chain attribution, live batching.

All rows in ONE session (cross-session A/B is meaningless on this runtime —
CLAUDE.md). Slope method between two scan lengths where the ~25 ms dispatch
floor must cancel (bench/ROUND4_PROBE6.json); absolute timing for the live
rows where the floor IS the measurement.

Rows:
  sync:two-single+pll   — round-4 program: two sequential per-axis
                          find_the_sweet_spot calls + PLL (us/frame)
  sync:pair+pll         — round-5 fused find_the_sweet_spot_pair + PLL
  post:frame-oldsync    — full default-order post body with the two-call sync
  post:frame            — full post body at HEAD (fused pair)
  step:pre-only         — config-1 step without any cond bodies (ms/block)
  step:pre+emit         — pre + the emit chain (no autocorr round cond)
  step:full             — the production step (slope also = config-1 true rate)
  live:batch1           — absolute per-dispatch stepping (the TUI's old mode)
  live:auto             — batch_blocks="auto" (floor-aware live batching)

Output flushes row-by-row to ROUND5_PROBE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ROUND5_PROBE.json")


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

    from tempestsdr_tpu.config import (
        NORMALISATION_LOWPASS_COEFF,
        PLL_HEADROOM_FRAC,
        PipelineConfig,
    )
    from tempestsdr_tpu.params import Params
    from tempestsdr_tpu.ops.frame import autogain_run, collapse_v_h, time_lowpass
    from tempestsdr_tpu.ops.sync import (
        FRAMERATE_DX_LOWPASS_COEFF_HEIGHT,
        FRAMERATE_DX_LOWPASS_COEFF_WIDTH,
        PLLState,
        SweetspotState,
        find_the_sweet_spot,
        find_the_sweet_spot_pair,
        framerate_pll,
    )
    from tempestsdr_tpu.stream import init_state, make_step
    from tempestsdr_tpu.stream.pipeline import (
        StepControls,
        _make_step_parts,
        _post_process,
        _sync_apply,
    )

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
               "geometry": f"{sr/1e6:.0f}MS/s h{h} w{cfg.width} block{block} "
                           f"K={cfg.frames_per_block}",
               "method": "slope between two scan lengths (floor cancels); "
                         "live rows absolute",
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

    # ---- sync A/B (frame cadence) ----
    minw = int(cfg.width * np.float32(0.05))
    minh = int(cfg.height * np.float32(0.01))

    def frames_xs(F):
        return jnp.asarray(rng.random((F, cfg.height, cfg.width), np.float32))

    def sync_carry():
        return (SweetspotState.init(), SweetspotState.init(), PLLState.init())

    def row_sync_old():
        @jax.jit
        def s(carry, xs):
            def body(c, fr):
                sx, sy, pll = c
                wprof = jnp.sum(fr, axis=0, dtype=jnp.float64)
                hprof = jnp.sum(fr, axis=1, dtype=jnp.float64)
                sx, _, _ = find_the_sweet_spot(
                    sx, wprof, minw, FRAMERATE_DX_LOWPASS_COEFF_WIDTH)
                sy, _, _ = find_the_sweet_spot(
                    sy, hprof, minh, FRAMERATE_DX_LOWPASS_COEFF_HEIGHT)
                pll = framerate_pll(pll, sx.vx, enabled=True, max_delta=1.2)
                return (sx, sy, pll), pll.refresh_delta
            return lax.scan(body, carry, xs)
        return s

    def row_sync_pair():
        @jax.jit
        def s(carry, xs):
            def body(c, fr):
                sx, sy, pll = c
                wprof = jnp.sum(fr, axis=0, dtype=jnp.float64)
                hprof = jnp.sum(fr, axis=1, dtype=jnp.float64)
                sx, sy, _, _ = find_the_sweet_spot_pair(
                    sx, wprof, minw, FRAMERATE_DX_LOWPASS_COEFF_WIDTH,
                    sy, hprof, minh, FRAMERATE_DX_LOWPASS_COEFF_HEIGHT)
                pll = framerate_pll(pll, sx.vx, enabled=True, max_delta=1.2)
                return (sx, sy, pll), pll.refresh_delta
            return lax.scan(body, carry, xs)
        return s

    slope_row("sync:two-single+pll", row_sync_old, sync_carry, frames_xs,
              KS_FRM, 1e6, "us_per_frame")
    slope_row("sync:pair+pll", row_sync_pair, sync_carry, frames_xs,
              KS_FRM, 1e6, "us_per_frame")

    # ---- post body A/B: HEAD vs the round-4 two-call default order ----
    def old_post(f, screen, ag, sx, sy, pll, mb):
        # round-4 _post_process_default_order with the two-call sync
        _, mn, mx, snr = autogain_run(f, ag[0], ag[1],
                                      NORMALISATION_LOWPASS_COEFF,
                                      stats_only=True)
        ag = (mn, mx, snr)
        wprof, hprof = collapse_v_h(f, cfg.high_precision_sync)
        sx, _, _ = find_the_sweet_spot(
            sx, wprof, minw, FRAMERATE_DX_LOWPASS_COEFF_WIDTH)
        sy, _, _ = find_the_sweet_spot(
            sy, hprof, minh, FRAMERATE_DX_LOWPASS_COEFF_HEIGHT)
        pll = framerate_pll(pll, sx.vx, enabled=True,
                            max_delta=PLL_HEADROOM_FRAC * cfg.refreshrate)
        span = jnp.where(mx == mn, 1.0, mx - mn)
        norm = (f - mn) / span
        syncres = _sync_apply(params, norm, sx, sy)
        screen = time_lowpass(screen, syncres, mb)
        return screen, screen, ag, sx, sy, pll

    def post_carry():
        return (jnp.zeros((cfg.height, cfg.width), jnp.float32),
                (jnp.float32(0), jnp.float32(0), jnp.float32(1)),
                SweetspotState.init(), SweetspotState.init(), PLLState.init())

    def row_post_old():
        @jax.jit
        def s(carry, xs):
            def body(carry, frame):
                screen, ag, sx, sy, pll = carry
                result, screen, ag, sx, sy, pll = old_post(
                    frame, screen, ag, sx, sy, pll, jnp.float32(0.0))
                return (screen, ag, sx, sy, pll), result[0, 0]
            return lax.scan(body, carry, xs)
        return s

    def row_post_new():
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

    slope_row("post:frame-oldsync", row_post_old, post_carry, frames_xs,
              KS_FRM, 1e6, "us_per_frame")
    slope_row("post:frame", row_post_new, post_carry, frames_xs,
              KS_FRM, 1e6, "us_per_frame")

    # ---- emit-chain attribution (block cadence at the config-1 geometry) --
    ctrl = StepControls.default()
    fp = cfg.frame_pixels

    def raws_xs(K):
        return jnp.asarray(rng.integers(0, 256, size=(K, 2 * block),
                                        dtype=np.uint8))

    def state_carry():
        return init_state(cfg)

    def make_partial_step(with_emit):
        (pre, ac_round_fn, emit_fn, no_emit_fn, emit_ops_of, ac_ops_of,
         assemble, emit_chain) = _make_step_parts(cfg, params)
        zero_frame = jnp.zeros((cfg.height, cfg.width), jnp.float32)

        def step(state, raw):
            inter = pre(state, raw, ctrl)
            ac_ops = ac_ops_of(state, inter)  # no round cond in either form
            e_ops = emit_ops_of(state, inter)
            if with_emit:
                e_ops, frames, valid = emit_chain(e_ops)
                st, out = assemble(state, inter, ac_ops, e_ops, frames, valid)
            else:
                # wrap the fill so the stream cadence stays realistic without
                # running any emit body (attribution baseline)
                e_ops = (e_ops[0], e_ops[1] % fp) + e_ops[2:]
                st, out = assemble(state, inter, ac_ops, e_ops, zero_frame,
                                   jnp.asarray(False))
            return st, out.n_pixels

        return step

    def row_step(step_fn):
        def make():
            @jax.jit
            def s(state, xs):
                def body(st, raw):
                    st, npx = step_fn(st, raw)
                    return st, npx
                return lax.scan(body, state, xs)
            return s
        return make

    slope_row("step:pre-only", row_step(make_partial_step(False)), state_carry,
              raws_xs, KS_BLK, 1e3, "ms_per_block")
    slope_row("step:pre+emit", row_step(make_partial_step(True)), state_carry,
              raws_xs, KS_BLK, 1e3, "ms_per_block")

    full = make_step(cfg, params)
    slope_row("step:full", row_step(lambda st, raw:
                                    (lambda s2, o: (s2, o.n_pixels))(
                                        *full(st, raw, ctrl))),
              state_carry, raws_xs, KS_BLK, 1e3, "ms_per_block")

    # ---- live batching (absolute; the floor IS the measurement) ----
    from tempestsdr_tpu.utils.profiling import (
        auto_batch_blocks,
        measure_dispatch_floor,
    )

    floor_s = measure_dispatch_floor()
    results["live:floor_ms"] = round(floor_s * 1e3, 2)
    flush(results)
    print(f"# live:floor_ms {results['live:floor_ms']}", flush=True)

    step1 = jax.jit(make_step(cfg, params), donate_argnums=0)
    raw1 = jnp.asarray(rng.integers(0, 256, size=(2 * block,), dtype=np.uint8))
    st = init_state(cfg)
    st, out = step1(st, raw1, ctrl)  # compile
    _ = np.asarray(out.n_pixels)
    n_live = 8 if smoke else 40
    t0 = time.monotonic()
    for _ in range(n_live):
        st, out = step1(st, raw1, ctrl)
        _ = np.asarray(out.n_pixels)  # host fetch per dispatch, like a TUI
    dt = time.monotonic() - t0
    results["live:batch1"] = {
        "dispatch_ms": round(dt / n_live * 1e3, 2),
        "ingest_MSps": round(n_live * block / dt / 1e6, 1),
        "x_realtime": round(n_live * block / dt / sr, 2),
    }
    flush(results)
    print(f"# live:batch1 {results['live:batch1']}", flush=True)

    B = auto_batch_blocks(cfg, latency_s=0.25, floor_s=floor_s)
    results["live:auto_batch_B"] = B
    if B > 1:
        def scan_B(state, raws):
            def body(s2, raw):
                s2, o = make_step(cfg, params)(s2, raw, ctrl)
                return s2, o.n_pixels
            return lax.scan(body, state, raws)

        scanB = jax.jit(scan_B, donate_argnums=0)
        rawsB = jnp.asarray(rng.integers(0, 256, size=(B, 2 * block),
                                         dtype=np.uint8))
        st = init_state(cfg)
        st, o = scanB(st, rawsB)
        _ = np.asarray(o).sum()
        n_disp = 4 if smoke else 12
        dts = []
        t0 = time.monotonic()
        for _ in range(n_disp):
            t1 = time.monotonic()
            st, o = scanB(st, rawsB)
            _ = np.asarray(o).sum()
            dts.append(time.monotonic() - t1)
        dt = time.monotonic() - t0
        results["live:auto"] = {
            "batch_blocks": B,
            "dispatch_wall_ms": round(min(dts) * 1e3, 2),
            "stream_s_per_dispatch": round(B * block / sr, 3),
            "ingest_MSps": round(n_disp * B * block / dt / 1e6, 1),
            "x_realtime": round(n_disp * B * block / dt / sr, 2),
        }
        flush(results)
        print(f"# live:auto {results['live:auto']}", flush=True)

    results["finished"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    flush(results)
    print(json.dumps({"probe": "round5", "out": OUT}))


if __name__ == "__main__":
    main()
