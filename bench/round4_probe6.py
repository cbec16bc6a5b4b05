"""Round-4 probe 6 — the dispatch floor, measured, and the K lever.

Probe 5's stage rows exposed a confound: scans of 4 and 18 iterations all
cost ~27-32 ms per dispatch regardless of body content, and differencing
probe 4's constant-samples rows gives a per-block scan cost of only ~22 us
— i.e. the relay charges a LARGE PER-DISPATCH FLOOR D (compile-cache-warm
program launch + tiny host fetch), and every reported ingest number to date
divides samples by (D + compute). At config4's bench shape (32 blocks,
64 ms/dispatch) D would be ~42% of the measurement.

This probe measures D directly and the throughput-vs-K curve:

  floor:K32 / floor:K128       empty scan bodies, same fetch structure -> D
  cfg4:K32 / cfg4:K96          full 64 MS/s step (K32 is the bench program,
                               cache-warm) -> intercept/slope decomposition
  cfg1:K18 / cfg1:K96          full 8 MS/s step (K18 warm from probe 5)

If t(K) = D + K*c with the same D as the empty rows, the bench should scan
4-8x more blocks per dispatch: the reported number approaches the chip's
true rate 1/c, and the measurement stays honest (one sustained multi-
hundred-ms dispatch + host fetch). Production Session batching already
supports this; live-latency users simply pick smaller batches.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ROUND4_PROBE6.json")


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

    def timed(name, run, carry, xs, M, samples=None):
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
        r = {"ms_per_dispatch_best": round(best * 1e3, 2),
             "ms_per_dispatch_all": [round(d * 1e3, 1) for d in dts],
             "compile_s": round(compile_s, 1)}
        if samples:
            r["MSps_best"] = round(samples / best / 1e6, 1)
        results[name] = r
        flush(results)
        print(f"# {name}: {r}", flush=True)
        return r

    # ---- empty scans: the dispatch floor with the same fetch structure
    for K in (32, 128):
        @jax.jit
        def s_empty(c, xs):
            def body(c, x):
                return c + x, c > 0
            return lax.scan(body, c, xs)
        timed(f"floor:K{K}", s_empty, jnp.int32(0),
              jnp.ones((K,), jnp.int32), M=8)

    # ---- config4 geometry: K=32 is the bench's exact shape (cache-warm)
    if smoke:
        g4 = dict(samplerate=2e6, height=100, refreshrate=50.0, block=8192)
        ks4 = (4, 16)
    else:
        g4 = dict(samplerate=64e6, height=628, refreshrate=60.0, block=786432)
        ks4 = (32, 96)
    cfg4 = PipelineConfig(samplerate=g4["samplerate"], height=g4["height"],
                          refreshrate=g4["refreshrate"],
                          block_samples=g4["block"])
    step4 = make_step(cfg4, Params())

    def body4(st, raw):
        st, out = step4(st, raw, ctrl)
        return st, out.frame_valid

    @jax.jit
    def run4(st, xs):
        return lax.scan(body4, st, xs)

    for K in ks4:
        raws = jnp.asarray(rng.integers(
            0, 256, size=(K, 2 * g4["block"]), dtype=np.uint8))
        timed(f"cfg4:K{K}", run4, init_state(cfg4), raws, M=6,
              samples=K * g4["block"])

    # ---- config1 geometry: K=18 is probe 5's shape (cache-warm)
    if smoke:
        g1 = dict(samplerate=2e6, height=100, refreshrate=50.0, block=8192)
        ks1 = (4, 16)
    else:
        g1 = dict(samplerate=8e6, height=628, refreshrate=60.0, block=450560)
        ks1 = (18, 96)
    cfg1 = PipelineConfig(samplerate=g1["samplerate"], height=g1["height"],
                          refreshrate=g1["refreshrate"],
                          block_samples=g1["block"])
    step1 = make_step(cfg1, Params())

    def body1(st, raw):
        st, out = step1(st, raw, ctrl)
        return st, jnp.any(out.frame_valid)

    @jax.jit
    def run1(st, xs):
        return lax.scan(body1, st, xs)

    for K in ks1:
        raws = jnp.asarray(rng.integers(
            0, 256, size=(K, 2 * g1["block"]), dtype=np.uint8))
        timed(f"cfg1:K{K}", run1, init_state(cfg1), raws, M=6,
              samples=K * g1["block"])

    # ---- derived: D and true per-block cost from each pair
    def derive(tag, k1, k2, blk):
        a = results[f"{tag}:K{k1}"]["ms_per_dispatch_best"]
        b = results[f"{tag}:K{k2}"]["ms_per_dispatch_best"]
        c = (b - a) / (k2 - k1)
        d = a - k1 * c
        results[f"{tag}:derived"] = {
            "ms_per_block_true": round(c, 3),
            "dispatch_floor_ms": round(d, 1),
            "MSps_true": round(blk / c / 1e3, 1),
        }
        flush(results)
        print(f"# {tag}: true {round(blk/c/1e3,1)} MS/s, floor {round(d,1)} ms",
              flush=True)

    derive("cfg4", *ks4, g4["block"])
    derive("cfg1", *ks1, g1["block"])
    results["done"] = True
    flush(results)
    print("ROUND4_PROBE6 done")


if __name__ == "__main__":
    main()
