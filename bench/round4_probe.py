"""Round-4 TPU A/B probe — multi-frame-emit block scaling, one serialized
session, per-row flush to bench/ROUND4_PROBE.json.

The round-3 sweep measured ~0.48 ms/block of fixed cost (ROOFLINE.md) and
hit the one-frame-per-block wall (config4 regressed at block 1032192 as the
emit path saturated). The multi-emit step (K frames/block) removes the wall;
this probe measures whether bigger blocks actually buy the modeled ~17-23%:

  config4 (64 MS/s, 628@60): block 786432 (K=1 r3 default, in-session
      baseline) -> 2097152 (K=3) -> 3145728 (K=4, ~2.95 frames — the
      largest block under the autocorr round, ac_round = 3.6M samples)
  config5 (8x16 MS/s hybrid-unrolled): block 258048 (K=1 r3 default)
      -> 528384 (K=3) -> 786432 (K=4)

Methodology per CLAUDE.md: jitted lax.scan over >=30 blocks per dispatch
(fewer for the giant blocks, same total samples), host fetch before the
clock stops, best-of-M + mean. In-session ratios are the signal; absolute
numbers depend on the runtime's 10-30% hourly wobble.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ROUND4_PROBE.json")


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

    smoke = "--smoke" in sys.argv  # CPU path check with tiny sizes
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

    # ---- config4 block scaling ----
    if smoke:
        c4_blocks = [8192, 49152]  # K=1, K=3 at the small geometry
        sr4, h4, rr4 = 2e6, 100, 50.0
        total4, M4 = 8 * 49152, 2
    else:
        c4_blocks = [786432, 2097152, 3145728]
        sr4, h4, rr4 = 64e6, 628, 60.0
        total4, M4 = 48 * 786432, 8  # ~37.7M samples per dispatch, all rows

    for block in c4_blocks:
        cfg = PipelineConfig(samplerate=sr4, height=h4, refreshrate=rr4,
                             block_samples=block)
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
        timed(f"config4:block{block}", run, init_state(cfg), raws, M4,
              K * block,
              extra={"frames_per_block": cfg.frames_per_block,
                     "scan_blocks": K})

    # ---- config5 (hybrid-unrolled channels) block scaling ----
    if smoke:
        C = 2
        c5_blocks = [8192, 49152]
        sr5, h5, rr5 = 2e6, 100, 50.0
        total5, M5 = 8 * 49152, 2
    else:
        C = 8
        c5_blocks = [258048, 528384, 786432]
        sr5, h5, rr5 = 16e6, 628, 60.0
        total5, M5 = 32 * 258048, 4  # ~8.26M samples/ch per dispatch

    for block in c5_blocks:
        cfg = PipelineConfig(samplerate=sr5, height=h5, refreshrate=rr5,
                             block_samples=block)
        K = max(total5 // block, 2)
        cstep = make_channels_step_hybrid(cfg, Params(), C,
                                          cond_mode="unrolled")
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
        r = timed(f"config5:hybrid-block{block}", runC, stack_states(cfg, C),
                  raws, M5, K * block * C,
                  extra={"n_channels": C,
                         "frames_per_block": cfg.frames_per_block,
                         "scan_blocks": K})
        r["per_channel_MSps_best"] = round(r["MSps_best"] / C, 2)
        flush(results)

    results["done"] = True
    flush(results)
    print("ROUND4_PROBE done")


if __name__ == "__main__":
    main()
