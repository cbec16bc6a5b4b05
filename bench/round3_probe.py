"""Round-3 TPU A/B probe — one serialized session, results flushed per
measurement to bench/ROUND3_PROBE.json (a worker crash can't erase earlier
rows). Ordered safe -> risky: the vmapped program classes that fault the
remote runtime (STATUS.md round 2) run LAST.

Measurements:
  1. config4 single-stream full step (Mosaic auto default) — the 543 MS/s
     check, now with the emit-time framebuf SPILL copy (round 3) instead of
     the full shift.
  2. emit:framebuf-shift vs emit:framebuf-spill micro A/B (per-frame cost).
  3. config5 channels step at 8x16 MS/s, block 245760:
     unrolled (round-2 workhorse) -> hybrid/unrolled-conds -> hybrid/batched
     -> (optional --vmapped) the any()-gated vmapped step.

Methodology per CLAUDE.md: lax.scan over K blocks per dispatch, host fetch
before the clock stops, best-of-M plus mean.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ROUND3_PROBE.json")


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
    from tempestsdr_tpu.parallel.channels import stack_states
    from tempestsdr_tpu.stream import make_step, init_state
    from tempestsdr_tpu.stream.pipeline import (
        StepControls,
        make_channels_step,
        make_channels_step_hybrid,
        make_channels_step_unrolled,
    )

    smoke = "--smoke" in sys.argv  # CPU path check with tiny sizes
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    results = {"backend": jax.default_backend(),
               "started": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    flush(results)
    rng = np.random.default_rng(0)

    def timed(name, run, state, raws, M, samples):
        t0 = time.monotonic()
        state, out = run(state, raws)
        _ = np.asarray(jax.tree.leaves(out)[0]).sum()
        compile_s = time.monotonic() - t0
        dts = []
        for _ in range(M):
            t0 = time.monotonic()
            state, out = run(state, raws)
            _ = np.asarray(jax.tree.leaves(out)[0]).sum()
            dts.append(time.monotonic() - t0)
        best, mean = min(dts), sum(dts) / len(dts)
        r = {"ms_per_dispatch_best": round(best * 1e3, 2),
             "MSps_best": round(samples / best / 1e6, 1),
             "MSps_mean": round(samples / mean / 1e6, 1),
             "compile_s": round(compile_s, 1)}
        results[name] = r
        flush(results)
        print(f"# {name}: {r}", flush=True)
        return r

    # ---- 1. config4 single stream (Mosaic auto; spill-copy emit) ----
    if smoke:
        cfg4 = PipelineConfig(samplerate=2e6, height=100, refreshrate=50.0,
                              block_samples=1 << 13)
        K4, M4 = 4, 2
    else:
        cfg4 = PipelineConfig(samplerate=64e6, height=628, refreshrate=60.0,
                              block_samples=1 << 19)
        K4, M4 = 48, 10
    step4 = make_step(cfg4, Params())
    ctrl1 = StepControls.default()

    def body4(st, raw):
        st, out = step4(st, raw, ctrl1)
        return st, out.frame_valid

    @jax.jit
    def run4(st, raws):
        return lax.scan(body4, st, raws)

    raws4 = jnp.asarray(rng.integers(
        0, 256, size=(K4, 2 * cfg4.block_samples), dtype=np.uint8))
    timed("config4:step-spill", run4, init_state(cfg4), raws4, M4,
          K4 * cfg4.block_samples)

    # ---- 1b. estimator cost decomposition (VERDICT #4: bound the
    # "move the FFT round off the scan" lever with numbers from ONE session:
    # total estimator cost = step-spill minus no-autocorr; FFT share =
    # ac:round-isolated / blocks-per-round) ----
    stepNA = make_step(cfg4, Params(autocorr_plots_off=True))

    def bodyNA(st, raw):
        st, out = stepNA(st, raw, ctrl1)
        return st, out.frame_valid

    @jax.jit
    def runNA(st, raws):
        return lax.scan(bodyNA, st, raws)

    timed("config4:step-no-autocorr", runNA, init_state(cfg4), raws4, M4,
          K4 * cfg4.block_samples)

    from tempestsdr_tpu.ops.autocorr import (
        accumulate_running_mean,
        autocorrelation_magnitude,
    )

    ac_fft = cfg4.ac_fft_size
    NR = 8  # rounds per dispatch

    def bodyAC(carry, x):
        avg, calls = carry
        r = autocorrelation_magnitude(x)
        avg = accumulate_running_mean(avg, r, calls + 1)
        return (avg, calls + 1), r[0]

    @jax.jit
    def runAC(carry, xs):
        return lax.scan(bodyAC, carry, xs)

    xs = jnp.asarray(rng.standard_normal((NR, ac_fft)), jnp.float32)
    ac0 = (jnp.zeros((ac_fft,), jnp.float32), jnp.int32(0))
    r = timed("ac:round-isolated", runAC, ac0, xs, M4, NR * ac_fft)
    blocks_per_round = cfg4.ac_round_samples / cfg4.block_samples
    r["ms_per_round"] = round(r["ms_per_dispatch_best"] / NR, 3)
    r["amortized_ms_per_block"] = round(
        r["ms_per_round"] / blocks_per_round, 4)
    flush(results)

    # ---- 2. framebuf shift vs spill micro A/B (per-frame cost) ----
    fb_len = cfg4.frame_pixels + cfg4.max_block_pixels
    NF = 64  # frames per dispatch

    def mk(kind):
        if kind == "shift":
            def body(fb, x):
                fb = jnp.concatenate(
                    [fb[cfg4.frame_pixels:],
                     jnp.zeros((cfg4.frame_pixels,), jnp.float32)])
                return fb, fb[0] + x
        else:
            def body(fb, x):
                fb = lax.dynamic_update_slice(fb, fb[cfg4.frame_pixels:], (0,))
                return fb, fb[0] + x

        @jax.jit
        def run(fb, xs):
            return lax.scan(body, fb, xs)

        return run

    for kind in ("shift", "spill"):
        r = timed(f"emit:framebuf-{kind}", mk(kind),
                  jnp.zeros((fb_len,), jnp.float32),
                  jnp.zeros((NF,), jnp.float32), 10, NF)
        r["us_per_frame"] = round(r["ms_per_dispatch_best"] * 1e3 / NF, 1)
        flush(results)

    # ---- 3. channels steps, safe -> risky ----
    if smoke:
        C, block = 3, 8192
        cfg5 = PipelineConfig(samplerate=2e6, height=100, refreshrate=50.0,
                              block_samples=block)
        K5, M5 = 4, 2
    else:
        C, block = 8, 245760
        cfg5 = PipelineConfig(samplerate=16e6, height=628, refreshrate=60.0,
                              block_samples=block)
        K5, M5 = 32, 5  # >= 30 blocks per dispatch (CLAUDE.md timing rule)
    raws5 = jnp.asarray(rng.integers(
        0, 256, size=(K5, C, 2 * block), dtype=np.uint8))
    ctrlC = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (C,) + x.shape),
        StepControls.default())

    makers = [
        ("channels:unrolled", lambda: make_channels_step_unrolled(cfg5, Params(), C)),
        ("channels:hybrid-unrolled-conds",
         lambda: make_channels_step_hybrid(cfg5, Params(), C, cond_mode="unrolled")),
        ("channels:hybrid-batched",
         lambda: make_channels_step_hybrid(cfg5, Params(), C, cond_mode="batched")),
    ]
    if "--vmapped" in sys.argv:
        makers.append(("channels:vmapped-gated",
                       lambda: make_channels_step(cfg5, Params(), C)))

    for name, mk5 in makers:
        try:
            step = mk5()

            def bodyC(st, raw, _step=step):
                st, out = _step(st, raw, ctrlC)
                return st, out.frame_valid

            @jax.jit
            def runC(st, raws, _b=bodyC):
                return lax.scan(_b, st, raws)

            r = timed(name, runC, stack_states(cfg5, C), raws5, M5,
                      K5 * C * block)
            r["per_channel_MSps"] = round(r["MSps_best"] / C, 2)
            flush(results)
        except Exception as e:  # a worker crash usually kills the process
            results[name] = {"error": str(e)[:300]}
            flush(results)
            print(f"# {name} FAILED: {e}", flush=True)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
