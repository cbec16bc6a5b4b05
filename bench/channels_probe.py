"""Channels-step decomposition probe (config 5: where do 4.5 ms/blk go?).

Times the 8-channel step with each cond body enabled/disabled to attribute
the gap between the vmapped per-sample work (~1.9 ms) and the full step
(~6.4 ms) measured in bench/PROFILE.json.

Run alone: PYTHONPATH=/root/repo:/root/.axon_site python bench/channels_probe.py
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


M = 4  # block_until_ready is optimistic on this runtime: warm-up must
# host-fetch, and timing loops M dispatches to amortize relay latency


def _fetch(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "shape")]
    np.asarray(leaves[-1])


def timeit(label, fn, *args, samples):
    _fetch(fn(*args))
    t1 = time.time()
    for _ in range(M):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t1) / M
    RESULTS[label] = {"ms_total": round(dt * 1e3, 2),
                      "MSps": round(samples / dt / 1e6, 1)}
    log(f"{label:32s} {dt * 1e3:8.2f} ms  {samples / dt / 1e6:8.1f} MS/s")


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from tempestsdr_tpu.config import PipelineConfig
    from tempestsdr_tpu.params import Params
    from tempestsdr_tpu.stream import init_state
    from tempestsdr_tpu.stream.pipeline import (
        StepControls,
        _make_step_parts,
        _select_tree,
        make_channels_step,
    )

    C, K = 8, 30
    cblock = 1 << 17
    cfg = PipelineConfig(samplerate=16e6, height=628, refreshrate=60.0,
                         block_samples=cblock)
    params = Params()
    log(f"geometry: width={cfg.width} frame_pixels={cfg.frame_pixels} "
        f"ac_round={cfg.ac_round_samples} ac_fft={cfg.ac_fft_size} "
        f"max_pix={cfg.max_block_pixels}")
    rng = np.random.default_rng(0)
    craws = jnp.asarray(rng.integers(0, 256, size=(K, C, 2 * cblock), dtype=np.uint8))
    csamples = K * C * cblock

    def stack_states(cfg, C):
        s = init_state(cfg)
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (C,) + x.shape).copy(), s)

    ctrl = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (C,) + jnp.asarray(x).shape).copy(),
        StepControls.default(),
    )

    parts = _make_step_parts(cfg, params, batched=True)
    pre, ac_round_fn, emit_fn, no_emit_fn, emit_ops_of, ac_ops_of, assemble = parts

    def make_variant(do_ac, do_emit):
        def step(states, raws, controls):
            inter = jax.vmap(pre)(states, raws, controls)
            ac_ops = ac_ops_of(states, inter)
            if do_ac:
                rd = inter["round_done"]
                ac_ops = lax.cond(
                    jnp.any(rd),
                    lambda o: _select_tree(rd, jax.vmap(ac_round_fn)(o), o),
                    lambda o: o, ac_ops)
            em = inter["emit"]
            e_ops = emit_ops_of(states, inter)
            zero_frames = jnp.zeros((C, cfg.height, cfg.width), jnp.float32)
            if do_emit:
                def do_emit_all(o):
                    new_ops, new_frames = jax.vmap(emit_fn)(o)
                    return (_select_tree(em, new_ops, o),
                            _select_tree(em, new_frames, zero_frames))
                emit_ops, frames = lax.cond(
                    jnp.any(em), do_emit_all, lambda o: (o, zero_frames), e_ops)
            else:
                emit_ops, frames = e_ops, zero_frames
            return jax.vmap(assemble)(states, inter, ac_ops, emit_ops, frames)

        @jax.jit
        def run(states, xs):
            def body(st, raw):
                st, out = step(st, raw, ctrl)
                return st, out.frame_valid
            return lax.scan(body, states, xs)
        return run

    for label, do_ac, do_emit in (
        ("ch8:pre-only", False, False),
        ("ch8:pre+ac", True, False),
        ("ch8:pre+emit", False, True),
        ("ch8:full(rebuilt)", True, True),
    ):
        timeit(label, make_variant(do_ac, do_emit), stack_states(cfg, C), craws,
               samples=csamples)

    # production step for reference
    cstep = make_channels_step(cfg, params)

    @jax.jit
    def s_ch(states, xs):
        def body(st, raw):
            st, out = cstep(st, raw, ctrl)
            return st, out.frame_valid
        return lax.scan(body, states, xs)
    timeit("ch8:full(production)", s_ch, stack_states(cfg, C), craws,
           samples=csamples)

    # isolated vmapped bodies at their true cadence, for the math:
    # one ac round fired (8x FFT), one emit fired (8x post)
    states = stack_states(cfg, C)
    inter = jax.jit(jax.vmap(pre))(states, craws[0], ctrl)
    ac_o = ac_ops_of(states, inter)

    @jax.jit
    def one_ac(o):
        return jax.vmap(ac_round_fn)(o)
    K2 = 10

    @jax.jit
    def ac_scan(o, xs):
        def body(o, _):
            o = jax.vmap(ac_round_fn)(o)
            return o, o[3][0]
        return lax.scan(body, o, xs)
    timeit("ch8:ac-round-body-x10", ac_scan, ac_o, jnp.arange(K2),
           samples=K2 * C * cfg.ac_round_samples)

    e_o = emit_ops_of(states, inter)

    @jax.jit
    def emit_scan(o, xs):
        def body(o, _):
            o, fr = jax.vmap(emit_fn)(o)
            return o, fr[0, 0, 0]
        return lax.scan(body, o, xs)
    timeit("ch8:emit-body-x10", emit_scan, e_o, jnp.arange(K2),
           samples=K2 * C * cfg.frame_pixels // 2)

    with open("/root/repo/bench/CHANNELS_PROFILE.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    log("DONE")


if __name__ == "__main__":
    main()
