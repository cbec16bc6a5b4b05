"""Round-3 probe #2 — block-size sweep, one serialized TPU session.

ROUND3_PROBE.json (probe #1, same day) showed the step is still
kernel-count-bound at block 2^19: removing the whole estimator buys only
10.4% and the framebuf spill/shift A/B is a wash.  The one untested lever
from ROOFLINE.md is the block size itself ("kernel-count-bound *at this
block size*"): growing the block amortizes every per-block fixed cost
(cond scaffolding, scan carry round-trips, kernel launch tax) over ~2x
the samples while the per-sample stages scale linearly.

Sweep (flagship 64 MS/s geometry, spill emit, Mosaic auto default):
  config4 @ block 524288 (control — in-session baseline vs probe #1)
  config4 @ block 786432 (1.5x)
  config4 @ block 1032192 (1.97x — largest comfortable size under the
           one-frame-boundary-per-step contract; hard cap 1040384)
  config5 hybrid/unrolled-conds @ block 258048 (vs probe-1's 245760)

Methodology per CLAUDE.md: lax.scan >= 30 blocks per dispatch, host fetch
in the clock, best-of-M + mean, results flushed per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ROUND3_PROBE2.json")


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

    ctrl1 = StepControls.default()

    blocks = [8192, 12288] if smoke else [524288, 786432, 1032192]
    for blk in blocks:
        if smoke:
            cfg = PipelineConfig(samplerate=2e6, height=100, refreshrate=50.0,
                                 block_samples=blk)
            K, M = 4, 2
        else:
            cfg = PipelineConfig(samplerate=64e6, height=628, refreshrate=60.0,
                                 block_samples=blk)
            # keep >=30 blocks and ~constant samples per dispatch across the
            # sweep so relay jitter hits all points equally
            K, M = max(30, (48 * 524288) // blk), 8
        step = make_step(cfg, Params())

        def body(st, raw, _s=step):
            st, out = _s(st, raw, ctrl1)
            return st, out.frame_valid

        @jax.jit
        def run(st, raws, _b=body):
            return lax.scan(_b, st, raws)

        raws = jnp.asarray(rng.integers(
            0, 256, size=(K, 2 * blk), dtype=np.uint8))
        timed(f"config4:block-{blk}", run, init_state(cfg), raws, M, K * blk)

    # ---- config5 hybrid/unrolled-conds at the bigger block ----
    if smoke:
        C, blk5 = 3, 8192
        cfg5 = PipelineConfig(samplerate=2e6, height=100, refreshrate=50.0,
                              block_samples=blk5)
        K5, M5 = 4, 2
    else:
        C, blk5 = 8, 258048
        cfg5 = PipelineConfig(samplerate=16e6, height=628, refreshrate=60.0,
                              block_samples=blk5)
        K5, M5 = 32, 5
    step5 = make_channels_step_hybrid(cfg5, Params(), C, cond_mode="unrolled")
    ctrlC = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (C,) + x.shape),
        StepControls.default())

    def body5(st, raw):
        st, out = step5(st, raw, ctrlC)
        return st, out.frame_valid

    @jax.jit
    def run5(st, raws):
        return lax.scan(body5, st, raws)

    raws5 = jnp.asarray(rng.integers(
        0, 256, size=(K5, C, 2 * blk5), dtype=np.uint8))
    r = timed(f"channels:hybrid-unrolled-block-{blk5}", run5,
              stack_states(cfg5, C), raws5, M5, K5 * C * blk5)
    r["per_channel_MSps"] = round(r["MSps_best"] / C, 2)
    flush(results)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
