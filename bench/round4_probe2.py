"""Round-4 probe 2 — diagnose the multi-emit big-block regression.

ROUND4_PROBE.json (first emit-chain layout: framebuf carried through every
slot cond) measured big blocks SLOWER: 420.5 (786432, K=1) -> 403.9 (2^21,
K=3) -> 319.8 (3145728, K=4). Two suspects:

  (a) cond operand copies of the (K+1)*fp framebuf — fixed in the second
      layout (windows sliced outside the conds; only screen+small state in
      the carry);
  (b) estimator-round collision: at 3.15M-sample blocks an ac round fires on
      ~87% of blocks vs 22% at 786432, and the 2^21-pt FFT round loses its
      in-scan amortization (r3: isolated round costs 3.6x its marginal
      in-step cost).

Rows (one session, flushed to ROUND4_PROBE2.json):
  1. config4 786432 (K=1)          — in-session baseline
  2. config4 1048576 (K=2)         — new layout, mild round collision (29%)
  3. config4 2097152 (K=3)         — new layout, direct A/B vs probe 1's 403.9
  4. config4 786432, autocorr OFF  — estimator-free baseline
  5. config4 2097152, autocorr OFF — (5)/(4) isolates pure multi-emit
                                     overhead; (3)/(2)-vs-(5)/(4) gap is the
                                     FFT-collision share
  6. config5 8ch 516096 (K=2, new layout) — channels big-block retry
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ROUND4_PROBE2.json")


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
        make_channels_step_hybrid,
    )

    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    results = {"backend": jax.default_backend(),
               "started": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    flush(results)
    rng = np.random.default_rng(0)

    def timed(name, run, state, raws, M, samples, extra=None):
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
        if extra:
            r.update(extra)
        results[name] = r
        flush(results)
        print(f"# {name}: {r}", flush=True)
        return r

    ctrl1 = StepControls.default()

    if smoke:
        rows4 = [(8192, True), (49152, True), (8192, False), (49152, False)]
        sr4, h4, rr4 = 2e6, 100, 50.0
        total4, M4 = 8 * 49152, 2
    else:
        rows4 = [(786432, True), (1048576, True), (2097152, True),
                 (786432, False), (2097152, False)]
        sr4, h4, rr4 = 64e6, 628, 60.0
        total4, M4 = 48 * 786432, 8

    for block, ac in rows4:
        cfg = PipelineConfig(samplerate=sr4, height=h4, refreshrate=rr4,
                             block_samples=block, autocorr=ac)
        K = max(total4 // block, 2)
        step = make_step(cfg, Params())

        def body(st, raw, _step=step):
            st, out = _step(st, raw, ctrl1)
            return st, out.frame_valid

        @jax.jit
        def run(st, raws, _body=body):
            return lax.scan(_body, st, raws)

        raws = jnp.asarray(rng.integers(
            0, 256, size=(K, 2 * block), dtype=np.uint8))
        suffix = "" if ac else ":no-ac"
        timed(f"config4:block{block}{suffix}", run, init_state(cfg), raws, M4,
              K * block,
              extra={"frames_per_block": cfg.frames_per_block,
                     "scan_blocks": K, "autocorr": ac})

    # ---- config5 channels: big-block retry (new emit layout) + stacked
    # cross-channel demod A/B ----
    if smoke:
        C, c5_rows = 2, [(49152, "per-channel"), (49152, "stacked")]
        sr5, h5, rr5 = 2e6, 100, 50.0
        total5, M5 = 8 * 49152, 2
    else:
        C = 8
        # 786432 (K=4) was probe-1's best (40.62 MS/s/ch, old emit layout) —
        # and the ceiling with the estimator on (ac_round = 901818 samples)
        c5_rows = [(258048, "stacked"), (786432, "per-channel"),
                   (786432, "stacked")]
        sr5, h5, rr5 = 16e6, 628, 60.0
        total5, M5 = 32 * 258048, 4

    for block, dmode in c5_rows:
        cfg = PipelineConfig(samplerate=sr5, height=h5, refreshrate=rr5,
                             block_samples=block)
        K = max(total5 // block, 2)
        cstep = make_channels_step_hybrid(cfg, Params(), C,
                                          cond_mode="unrolled",
                                          demod_mode=dmode)
        ctrlC = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (C,) + x.shape), ctrl1)

        def bodyC(st, raw, _step=cstep, _ctrl=ctrlC):
            st, out = _step(st, raw, _ctrl)
            return st, out.frame_valid

        @jax.jit
        def runC(st, raws, _body=bodyC):
            return lax.scan(_body, st, raws)

        raws = jnp.asarray(rng.integers(
            0, 256, size=(K, C, 2 * block), dtype=np.uint8))
        r = timed(f"config5:hybrid-block{block}:{dmode}", runC,
                  stack_states(cfg, C), raws, M5, K * block * C,
                  extra={"n_channels": C, "demod_mode": dmode,
                         "frames_per_block": cfg.frames_per_block,
                         "scan_blocks": K})
        r["per_channel_MSps_best"] = round(r["MSps_best"] / C, 2)
        flush(results)

    results["done"] = True
    flush(results)
    print("ROUND4_PROBE2 done")


if __name__ == "__main__":
    main()
