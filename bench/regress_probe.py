"""A/B probe: round-2 op changes vs their round-1 forms, on the real TPU.

Times each changed op in isolation (scan over K blocks + host fetch, per
CLAUDE.md methodology) so a step-level regression can be attributed:
  - demod: u16-bitcast fused vs normalize+pair-matmul
  - autocorr: rfft/irfft vs complex64 fft/ifft
  - post-process (batched sweet-spot) vs bench/PROFILE.json post:frame-f64
  - step:full for the end-to-end number

Run alone: PYTHONPATH=/root/repo:/root/.axon_site python bench/regress_probe.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

t0 = time.time()
RESULTS = {}


def log(msg):
    print(f"[{time.time() - t0:6.1f}s] {msg}", flush=True)


M = 4  # timed dispatches (amortizes the ~10 ms relay latency)


def _fetch(out):
    # block_until_ready is optimistic on this runtime (CLAUDE.md): a real
    # host fetch is the only reliable completion barrier
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "shape")]
    np.asarray(leaves[-1])


def timeit(label, fn, *args, samples):
    tc = time.time()
    _fetch(fn(*args))
    compile_s = time.time() - tc
    t1 = time.time()
    for _ in range(M):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t1) / M
    RESULTS[label] = {"ms_per_call": round(dt * 1e3, 3),
                      "MSps": round(samples / dt / 1e6, 1),
                      "compile_s": round(compile_s, 1)}
    log(f"{label:28s} {dt * 1e3:8.2f} ms  {samples / dt / 1e6:8.1f} MS/s  "
        f"(compile {compile_s:.0f}s)")


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from tempestsdr_tpu.config import PipelineConfig
    from tempestsdr_tpu.params import Params
    from tempestsdr_tpu.ops.demod import am_demod, demod_raw_interleaved, normalize_iq
    from tempestsdr_tpu.stream import init_state
    from tempestsdr_tpu.stream.pipeline import StepControls, make_step

    K = 30
    n = 1 << 19
    rng = np.random.default_rng(0)
    raws = jnp.asarray(rng.integers(0, 256, size=(K, 2 * n), dtype=np.uint8))
    log(f"devices: {jax.devices()}")

    # ---- floor: establishes whether the session itself is slow
    @jax.jit
    def s_floor(c, xs):
        def body(c, x):
            return c + jnp.sum(x, dtype=jnp.int32), jnp.int32(0)
        return lax.scan(body, c, xs)
    timeit("floor:sum(u8)", s_floor, jnp.int32(0), raws, samples=K * n)

    # ---- demod A/B
    def scan_env(f):
        @jax.jit
        def run(c, xs):
            def body(c, raw):
                e = f(raw)
                return c + e[0], e[1]
            return lax.scan(body, c, xs)
        return run
    timeit("demod:u16-bitcast", scan_env(demod_raw_interleaved),
           jnp.float32(0), raws, samples=K * n)
    timeit("demod:pair-matmul", scan_env(lambda r: am_demod(normalize_iq(r))),
           jnp.float32(0), raws, samples=K * n)

    # ---- autocorr A/B (2^21-pt, the flagship round size)
    m = 1 << 21
    x = jnp.asarray(rng.random((m,), np.float32))
    K2 = 10

    def scan_ac(f):
        @jax.jit
        def run(c, xs):
            def body(c, _):
                r = f(x + c)
                return c + r[0], r[1]
            return lax.scan(body, c, xs)
        return run

    def ac_rfft(v):
        return jnp.abs(jnp.fft.irfft(jnp.abs(jnp.fft.rfft(v)), v.shape[0]))

    def ac_cfft(v):
        return jnp.abs(jnp.fft.ifft(jnp.abs(jnp.fft.fft(v.astype(jnp.complex64))).astype(jnp.complex64)))

    timeit("autocorr:rfft", scan_ac(ac_rfft), jnp.float32(0),
           jnp.arange(K2), samples=K2 * m)
    timeit("autocorr:cfft", scan_ac(ac_cfft), jnp.float32(0),
           jnp.arange(K2), samples=K2 * m)

    # ---- post-process (batched sweet-spot now inside) — compare vs
    # PROFILE.json post:frame-f64 = 0.268 ms
    from tempestsdr_tpu.stream.pipeline import _post_process
    from tempestsdr_tpu.ops.sync import PLLState, SweetspotState

    pcfg = PipelineConfig(samplerate=64e6, height=628, refreshrate=60.0,
                          block_samples=n)
    pparams = Params()
    frames2d = jnp.asarray(rng.random((4, pcfg.height, pcfg.width), np.float32))

    @jax.jit
    def s_post(carry, xs):
        def body(carry, frame):
            screen, ag, sx, sy, pll = carry
            result, screen, ag, sx, sy, pll = _post_process(
                pcfg, pparams, frame, screen, ag, sx, sy, pll, jnp.float32(0.0))
            return (screen, ag, sx, sy, pll), result[0, 0]
        return lax.scan(body, carry, xs)
    carry = (jnp.zeros((pcfg.height, pcfg.width), jnp.float32),
             (jnp.float32(0), jnp.float32(0), jnp.float32(1)),
             SweetspotState.init(), SweetspotState.init(), PLLState.init())
    timeit("post:frame-f64", s_post, carry, frames2d,
           samples=4 * pcfg.frame_pixels // 2)

    # ---- full step (default resampler)
    step = make_step(pcfg, pparams)
    ctrl = StepControls.default()

    @jax.jit
    def s_full(state, xs):
        def body(st, raw):
            st, out = step(st, raw, ctrl)
            return st, (out.frame_valid, out.n_pixels)
        return lax.scan(body, state, xs)
    timeit("step:full", s_full, init_state(pcfg), raws, samples=K * n)

    with open("/root/repo/bench/REGRESS_PROFILE.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    log("DONE")


if __name__ == "__main__":
    main()
