"""Round-4 probe 3 — the f64-collapse question.

collapse_v_h accumulates the sync profiles in f64 by default
(high_precision_sync=True) — the ONE many-megapixel emulated-f64 op in the
pipeline. The reference itself accumulates these profiles in plain float
(dsp.c:96-110), so precise=False is both cheaper on TPU (f64 is software-
emulated) and CLOSER to the reference's arithmetic. This probe measures what
the f64 emulation actually costs in the emit body, in-session A/B:

  1. config4 786432, hps=True   (current default — in-session baseline)
  2. config4 786432, hps=False
  3. config5 8ch 786432 stacked, hps=True
  4. config5 8ch 786432 stacked, hps=False

Flushed per row to ROUND4_PROBE3.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ROUND4_PROBE3.json")


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
        sr4, h4, rr4, blk4 = 2e6, 100, 50.0, 8192
        K4, M4 = 8, 2
    else:
        sr4, h4, rr4, blk4 = 64e6, 628, 60.0, 786432
        K4, M4 = 48, 8

    for hps in (True, False):
        cfg = PipelineConfig(samplerate=sr4, height=h4, refreshrate=rr4,
                             block_samples=blk4, high_precision_sync=hps)
        step = make_step(cfg, Params())

        def body(st, raw, _step=step):
            st, out = _step(st, raw, ctrl1)
            return st, out.frame_valid

        @jax.jit
        def run(st, raws, _body=body):
            return lax.scan(_body, st, raws)

        raws = jnp.asarray(rng.integers(
            0, 256, size=(K4, 2 * blk4), dtype=np.uint8))
        timed(f"config4:hps-{hps}", run, init_state(cfg), raws, M4, K4 * blk4,
              extra={"high_precision_sync": hps})

    if smoke:
        C, sr5, h5, rr5, blk5 = 2, 2e6, 100, 50.0, 49152
        K5, M5 = 4, 2
    else:
        C, sr5, h5, rr5, blk5 = 8, 16e6, 628, 60.0, 786432
        K5, M5 = 10, 4

    for hps in (True, False):
        cfg = PipelineConfig(samplerate=sr5, height=h5, refreshrate=rr5,
                             block_samples=blk5, high_precision_sync=hps)
        cstep = make_channels_step_hybrid(cfg, Params(), C,
                                          cond_mode="unrolled",
                                          demod_mode="stacked")
        ctrlC = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (C,) + x.shape), ctrl1)

        def bodyC(st, raw, _step=cstep, _ctrl=ctrlC):
            st, out = _step(st, raw, _ctrl)
            return st, out.frame_valid

        @jax.jit
        def runC(st, raws, _body=bodyC):
            return lax.scan(_body, st, raws)

        raws = jnp.asarray(rng.integers(
            0, 256, size=(K5, C, 2 * blk5), dtype=np.uint8))
        r = timed(f"config5:hps-{hps}", runC, stack_states(cfg, C), raws, M5,
                  K5 * blk5 * C, extra={"n_channels": C,
                                        "high_precision_sync": hps})
        r["per_channel_MSps_best"] = round(r["MSps_best"] / C, 2)
        flush(results)

    results["done"] = True
    flush(results)
    print("ROUND4_PROBE3 done")


if __name__ == "__main__":
    main()
