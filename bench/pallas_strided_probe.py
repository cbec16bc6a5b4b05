"""Standalone TPU probe for the Mosaic strided resampler kernel.

Run alone (never alongside another TPU process):
    PYTHONPATH=/root/repo:/root/.axon_site python bench/pallas_strided_probe.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:6.1f}s] {msg}", flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from tempestsdr_tpu.config import PipelineConfig, FRAC_BITS
    from tempestsdr_tpu.ops import resample as rs
    from tempestsdr_tpu.pallas.strided_kernel import box_resample_strided_pallas

    cfg = PipelineConfig(samplerate=64e6, height=628, refreshrate=60.0,
                         block_samples=1 << 19)
    n = cfg.block_samples
    taps = cfg.resample_taps
    inv_nom = cfg.samples_per_pixel
    max_pix = cfg.max_block_pixels
    rng = np.random.default_rng(0)
    x_ext = jnp.asarray(rng.random(n + taps).astype(np.float32))
    inv_fix = jnp.int64(round(inv_nom * (1 << FRAC_BITS)))
    phase = jnp.int64(12345678)
    kw = dict(n_samples=n, max_pix=max_pix, taps=taps, inv_nominal=inv_nom)

    log(f"devices: {jax.devices()}")

    # correctness on-device vs the XLA strided form
    f_ref = jax.jit(lambda x, p: rs.box_resample_strided(x, p, inv_fix, **kw))
    f_pl = jax.jit(lambda x, p: box_resample_strided_pallas(x, p, inv_fix, **kw))
    ref, n_ref, ph_ref = f_ref(x_ext, phase)
    log("xla strided compiled")
    got, n_got, ph_got = f_pl(x_ext, phase)
    log("pallas strided compiled")
    ref, got = np.asarray(ref), np.asarray(got)
    md = float(np.abs(ref - got).max())
    log(f"correct: n {int(n_ref)}=={int(n_got)} ph {int(ph_ref) == int(ph_got)} maxdiff {md:.2e}")
    assert int(n_ref) == int(n_got) and int(ph_ref) == int(ph_got)
    assert md < 1e-4, md

    # timing: scan over K blocks + host fetch (per CLAUDE.md methodology)
    K = 40

    def scan_of(f):
        @jax.jit
        def run(carry, xs):
            def body(carry, x):
                ph, tail = carry
                x_ext = jnp.concatenate([tail, x])
                p, n_out, ph = f(x_ext, ph, inv_fix, **kw)
                return (ph, x_ext[x_ext.shape[0] - taps:]), p[0]
            return lax.scan(body, carry, xs)
        return run

    xs = jnp.asarray(rng.random((K, n)).astype(np.float32))
    carry0 = (jnp.int64(0), jnp.zeros((taps,), jnp.float32))
    M = 4  # timed dispatches; block_until_ready is optimistic on this
    # runtime, so warm-up must HOST-FETCH and timing loops M dispatches

    def bench(name, run, c0, xxs):
        out = run(c0, xxs)
        np.asarray(out[1])
        t1 = time.time()
        for _ in range(M):
            out = run(c0, xxs)
        np.asarray(out[1])
        dt = (time.time() - t1) / M
        log(f"{name}: {dt / K * 1e3:.3f} ms/blk  {n * K / dt / 1e6:.1f} MS/s")

    for name, f in (("xla-strided", rs.box_resample_strided),
                    ("pallas-strided", box_resample_strided_pallas)):
        bench(name, scan_of(f), carry0, xs)

    # Ls sweep for the kernel: bigger chunks = fewer grid steps (less
    # per-step overhead, larger DMAs) at the cost of per-step VMEM; all
    # variants interpret-validated vs the XLA form on CPU
    for Ls in (2048, 4096, 8192, 16384, 32768):
        import functools
        f = functools.partial(box_resample_strided_pallas, Ls=Ls)
        bench(f"pallas Ls={Ls}", scan_of(f), carry0, xs)

    # full production step: default (XLA strided) vs pallas_strided
    from tempestsdr_tpu.params import Params
    from tempestsdr_tpu.stream import init_state
    from tempestsdr_tpu.stream.pipeline import StepControls, make_step

    rng2 = np.random.default_rng(1)
    raws = jnp.asarray(
        rng2.integers(0, 256, size=(K, 2 * n), dtype=np.uint8))
    ctrl = StepControls.default()
    for label, params in (("step:default", Params()),
                          ("step:pallas", Params(resampler="pallas_strided"))):
        step = make_step(cfg, params)

        @jax.jit
        def s_full(state, xxs):
            def body(st, raw):
                st, out = step(st, raw, ctrl)
                return st, (out.frame_valid, out.n_pixels)
            return lax.scan(body, state, xxs)
        st = init_state(cfg)
        out = s_full(st, raws)
        np.asarray(out[1][1])
        t1 = time.time()
        for _ in range(M):
            out = s_full(st, raws)
        np.asarray(out[1][1])
        dt = (time.time() - t1) / M
        log(f"{label}: {dt / K * 1e3:.3f} ms/blk  {n * K / dt / 1e6:.1f} MS/s")

    log("DONE")


if __name__ == "__main__":
    main()
