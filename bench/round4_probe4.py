"""Round-4 probe 4 — block-size sweep for the three narrowband configs.

Configs 1-3 still run at the round-1 blocks (2^16 / 2^17) that the old
one-frame-per-step emit contract forced (bench.py config1 note). The
multi-frame emit removed that wall, and these geometries have ~8x smaller
frames than config4 (fp 266k/533k vs 2.1M pixels), so the frame-sized HBM
passes that made K>1 LOSE at config4 (ROOFLINE.md round-4 update) are
proportionally cheap here — while the ~0.5 ms per-block fixed cost that
dominates at 0.5-1.5 ms/block amortizes linearly. Expected: configs 1-3 are
fixed-cost-bound (127-143 MS/s in BENCH_r03) and should scale with block
size until the autocorr-round cap (pipeline.py:303 requires
block <= ac_round_samples: 450,909 samples at 8 MS/s, 901,818 at 16 MS/s;
config3 runs autocorr=False and has no cap).

Rows (cheap->risky, flushed per row to ROUND4_PROBE4.json):
  geometry 1 (8 MS/s, h=628, autocorr on):  65536*, 131072, 262144, 393216, 450560
  geometry 2 (16 MS/s, h=628, autocorr on): 131072*, 393216, 786432, 901120
  geometry 3 (16 MS/s, autocorr off):       131072*, 786432, 1572864
(* = current bench.py default, the in-session baseline.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ROUND4_PROBE4.json")


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
    from tempestsdr_tpu.stream import make_step, init_state
    from tempestsdr_tpu.stream.pipeline import StepControls

    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    results = {"backend": jax.default_backend(),
               "started": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    flush(results)
    rng = np.random.default_rng(0)
    ctrl = StepControls.default()

    def row(name, sr, blk, autocorr, M=6):
        cfg = PipelineConfig(samplerate=sr, height=628, refreshrate=60.0,
                             block_samples=blk, autocorr=autocorr)
        step = make_step(cfg, Params())

        def body(st, raw, _step=step):
            st, out = _step(st, raw, ctrl)
            return st, out.frame_valid

        @jax.jit
        def run(st, raws, _body=body):
            return lax.scan(_body, st, raws)

        # ~8M samples per dispatch so every row is a multi-hundred-ms
        # sustained measurement regardless of block size
        K = max(6, int(round(8e6 / blk)))
        if smoke:
            K, M = 4, 2
        raws = jnp.asarray(rng.integers(
            0, 256, size=(K, 2 * blk), dtype=np.uint8))
        st = init_state(cfg)
        t0 = time.monotonic()
        st, out = run(st, raws)
        _ = np.asarray(out).sum()
        compile_s = time.monotonic() - t0
        dts = []
        frames = 0
        for _ in range(M):
            t0 = time.monotonic()
            st, out = run(st, raws)
            frames += int(np.asarray(out).sum())
            dts.append(time.monotonic() - t0)
        best, mean = min(dts), sum(dts) / len(dts)
        r = {"block": blk,
             "frames_per_block_K": cfg.frames_per_block,
             "MSps_best": round(K * blk / best / 1e6, 1),
             "MSps_mean": round(K * blk / mean / 1e6, 1),
             "frames_per_s": round(frames / sum(dts), 1),
             "ms_per_dispatch_best": round(best * 1e3, 2),
             "compile_s": round(compile_s, 1)}
        results[name] = r
        flush(results)
        print(f"# {name}: {r}", flush=True)
        return r

    if smoke:
        # tiny geometry shake-out of every (autocorr, K>1) combination
        row("smoke:ac-K1", 2e6, 8192, True)
        row("smoke:ac-K2", 2e6, 65536, True)
        row("smoke:noac-K2", 2e6, 65536, False)
        results["done"] = True
        flush(results)
        print("ROUND4_PROBE4 smoke done")
        return

    for blk in (65536, 131072, 262144, 393216, 450560):
        row(f"cfg1@8MSps:{blk}", 8e6, blk, True)
    for blk in (131072, 393216, 786432, 901120):
        row(f"cfg2@16MSps:{blk}", 16e6, blk, True)
    for blk in (131072, 786432, 1572864):
        row(f"cfg3-noac@16MSps:{blk}", 16e6, blk, False)

    results["done"] = True
    flush(results)
    print("ROUND4_PROBE4 done")


if __name__ == "__main__":
    main()
