"""Round-5 probe 5 — fast_sync A/B at the config-4 (64 MS/s flagship) geometry.

Probe 4 measured +57% at narrowband; the wideband frame is ~4x wider, so
the f64 collapse there is a megapixel-scale emulated-f64 op per frame and
the win may differ. Same rows at the config-4 geometry.

Flushes to ROUND5_PROBE5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ROUND5_PROBE5.json")


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
    from tempestsdr_tpu.stream import init_state, make_step
    from tempestsdr_tpu.stream.pipeline import (
        StepControls,
        _post_process,
    )

    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    sr, h, block = 64e6, 628, 786432
    if smoke:
        block = 65536
    cfg = PipelineConfig(samplerate=sr, height=h, refreshrate=60.0,
                         block_samples=block)
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

    from tempestsdr_tpu.ops.sync import PLLState, SweetspotState

    def frames_xs(F):
        return jnp.asarray(rng.random((F, cfg.height, cfg.width), np.float32))

    def post_carry():
        return (jnp.zeros((cfg.height, cfg.width), jnp.float32),
                (jnp.float32(0), jnp.float32(0), jnp.float32(1)),
                SweetspotState.init(), SweetspotState.init(), PLLState.init())

    def row_post(params):
        def make():
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
        return make

    slope_row("post:frame-parity", row_post(Params()), post_carry, frames_xs,
              KS_FRM, 1e6, "us_per_frame")
    slope_row("post:frame-fastsync", row_post(Params(fast_sync=True)),
              post_carry, frames_xs, KS_FRM, 1e6, "us_per_frame")

    ctrl = StepControls.default()

    def raws_xs(K):
        return jnp.asarray(rng.integers(0, 256, size=(K, 2 * block),
                                        dtype=np.uint8))

    def row_step(params):
        step = make_step(cfg, params)

        def make():
            @jax.jit
            def s(state, xs):
                def body(st, raw):
                    st, o = step(st, raw, ctrl)
                    return st, o.n_pixels
                return lax.scan(body, state, xs)
            return s
        return make

    slope_row("step:full-parity", row_step(Params()),
              lambda: init_state(cfg), raws_xs, KS_BLK, 1e3, "ms_per_block")
    slope_row("step:full-fastsync", row_step(Params(fast_sync=True)),
              lambda: init_state(cfg), raws_xs, KS_BLK, 1e3, "ms_per_block")

    results["finished"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    flush(results)
    print(json.dumps({"probe": "round5_5", "out": OUT}))


if __name__ == "__main__":
    main()
