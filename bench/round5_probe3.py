"""Round-5 probe 3 — wideband live auto-batching, with the FIXED floor measure.

Row 1: config-4 geometry (64 MS/s, block 786432) in LIVE mode with
batch_blocks="auto": does floor-aware batching keep the flagship rate
real-time within the 250 ms control-latency cap? (batch=1 live caps at
~1/floor dispatches/s = ~31 MS/s here — below real time.)

Probe 2's floor row under-read (0.07 ms: block_until_ready is optimistic
on the relay — CLAUDE.md), so auto chose B=1 and the row became the
batch=1 wideband datum (30.4 MS/s = 0.47x real time). measure_dispatch_floor
now does a true host fetch; this rerun records the actual auto-batched
wideband live rate. Flushes to ROUND5_PROBE3.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ROUND5_PROBE3.json")


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
    from tempestsdr_tpu.stream.pipeline import StepControls
    from tempestsdr_tpu.utils.profiling import (
        auto_batch_blocks,
        measure_dispatch_floor,
    )

    smoke = "--smoke" in sys.argv
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    results = {"backend": jax.default_backend(),
               "started": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    flush(results)

    # ---- row 1: wideband live auto batching ----
    block = 65536 if smoke else 786432
    sr = 64e6
    cfg = PipelineConfig(samplerate=sr, height=628, refreshrate=60.0,
                         block_samples=block)
    params = Params()
    ctrl = StepControls.default()

    floor_s = measure_dispatch_floor()
    B = auto_batch_blocks(cfg, latency_s=0.25, floor_s=floor_s)
    results["floor_ms"] = round(floor_s * 1e3, 2)
    results["wideband_auto_B"] = B
    flush(results)

    step = make_step(cfg, params)

    def scan_B(state, raws):
        def body(s2, raw):
            s2, o = step(s2, raw, ctrl)
            return s2, o.n_pixels
        return lax.scan(body, state, raws)

    scanB = jax.jit(scan_B, donate_argnums=0)
    raws = jnp.asarray(rng.integers(0, 256, size=(max(B, 1), 2 * block),
                                    dtype=np.uint8))
    st = init_state(cfg)
    t0 = time.monotonic()
    st, o = scanB(st, raws)
    _ = np.asarray(o).sum()
    compile_s = time.monotonic() - t0
    n_disp = 3 if smoke else 20
    dts = []
    t0 = time.monotonic()
    for _ in range(n_disp):
        t1 = time.monotonic()
        st, o = scanB(st, raws)
        _ = np.asarray(o).sum()  # per-dispatch host fetch, like a live UI
        dts.append(time.monotonic() - t1)
    dt = time.monotonic() - t0
    results["live:wideband-auto"] = {
        "batch_blocks": B,
        "block_samples": block,
        "dispatch_wall_ms": round(min(dts) * 1e3, 2),
        "stream_s_per_dispatch": round(B * block / sr, 3),
        "ingest_MSps": round(n_disp * B * block / dt / 1e6, 1),
        "x_realtime": round(n_disp * B * block / dt / sr, 2),
        "compile_s": round(compile_s, 1),
    }
    flush(results)
    print(f"# live:wideband-auto {results['live:wideband-auto']}", flush=True)

    results["finished"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    flush(results)
    print(json.dumps({"probe": "round5_3", "out": OUT}))


if __name__ == "__main__":
    main()
