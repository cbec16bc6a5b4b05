"""Fused demod + strided box resampler Mosaic kernel (m = 2, u8/i8 raw IQ).

One kernel replaces three XLA stages of the per-block step — the pairing-
matmul AM demod, the tail+env concat, and the strided resampler — by
decoding the raw interleaved IQ *inside* the kernel:

  - each (I, Q) byte pair is BITCAST to one u16 lane and decoded
    elementwise (|I+jQ| is byte-order invariant, demod.py
    demod_raw_interleaved semantics — bit-identical to
    am_demod(normalize_iq(raw)) for int8/uint8);
  - the envelope is ALSO a kernel output (the autocorrelation ring feed
    needs it, frameratedetector_run TSDRLibrary.c:287-293), produced by a
    second, statically-blocked read of the same u16 array — so the step
    never materializes an intermediate that the kernel then re-reads;
  - the resample windows are DMA'd at data-dependent row offsets and
    decoded on arrival, then follow the exact strided_kernel.py pipeline
    (one dynamic lane roll + static drift-margin weight loop).

The previous block's envelope tail (x_ext[:taps]) cannot be decoded from
this block's raw bytes, so it rides in as a 128-lane f32 prefix row that
replaces window row 0 whenever the window starts at the array origin.

Same int64 fixed-point carry contract as box_resample_strided; geometry
beyond (m == 2, Ls | n, u8/i8 1-D raw, no FIR) falls back to the unfused
path in the caller. Reference: dsp_resample_process (dsp.c:256-307) +
am_demod (TSDRLibrary.c:244-262) + RawFile scaling
(TSDRPlugin_RawFile.c:241-261).

Status (2026-08-17, v5e via remote runtime): compiles and runs in-pipeline,
full-step frames BIT-EXACT vs the default path, but measured SLOWER than
the unfused pairing-matmul demod + Mosaic strided resampler chain
(1.77 ms/blk vs 0.427 in a healthy session, ROOFLINE.md round-2 update) —
the per-grid-step env in/out streams serialize against the manual window
DMAs. It stays OPT-IN via Params(resampler='fused') as the measured record
of that negative result, for retesting on future runtimes. A second
(packed-u16 window) layout that measured slower still lives in
bench/fused_u16_probe.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FRAC_BITS
from ..ops.demod import am_demod, normalize_iq
from ..ops.resample import (
    box_resample_strided,
    plan_strided,
    resample_counts,
)

LANES = 128
OFF = 128  # left pad in u16 elements: env sample k lives at u16 index k+OFF
_I0 = np.int32(0)


def _decode(u16_block, signed: bool):
    """u16 lanes -> f32 envelope: demod_raw_interleaved math (demod.py)."""
    x = u16_block.astype(jnp.int32)
    lo = x & 0xFF
    hi = x >> 8
    if signed:
        lo = lo ^ 128
        hi = hi ^ 128
    a = lo.astype(jnp.float32) - 128.0
    b = hi.astype(jnp.float32) - 128.0
    return jnp.sqrt(a * a + b * b) * jnp.float32(1.0 / 128.0)


def fused_demod_resample(
    raw,
    tail,
    phase_fix,
    inv_fix,
    *,
    n_samples: int,
    max_pix: int,
    taps: int,
    inv_nominal: float,
    Ls: int = 4096,
    margin_small: int | None = None,
    interpret: bool | None = None,
):
    """raw u8/i8[2*n] interleaved IQ + env tail -> (env[n], pixels, n_out,
    new_phase). Drop-in for am_demod(normalize_iq(raw)) +
    box_resample_strided(concat(tail, env), ...).

    Window DMAs read a u32 view (2 samples/lane, unpacked (8,128) tiles —
    arbitrary dynamic row offsets allowed) and the weight loop runs on
    even/odd sample planes. The slower packed-u16 window layout is the
    probe bench/fused_u16_probe.py."""
    return _fused_u32(
        raw, tail, phase_fix, inv_fix, n_samples=n_samples, max_pix=max_pix,
        taps=taps, inv_nominal=inv_nominal, Ls=Ls, margin_small=margin_small,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# u32-plane variant: windows ride as u32 lanes (2 samples each) so the DMA
# source has the unpacked (8, 128) tile layout, which accepts ARBITRARY
# dynamic row offsets (proven by strided_kernel.py's f32 windows) — no
# alignment over-fetch, no row-shift absorb. The weight loop runs on
# even/odd sample planes of half height; per tap exactly one plane advances
# by one element, so the roll traffic halves vs the u16 layout.
# ---------------------------------------------------------------------------

_ILV4_T = 128


@functools.lru_cache(None)
def _interleave4_matrix():
    """0/1 matrix interleaving 4 streams: row k*T+j -> col 4*j+k."""
    T = _ILV4_T
    p = np.zeros((4 * T, 4 * T), np.float32)
    for j in range(T):
        for k in range(4):
            p[k * T + j, 4 * j + k] = 1.0
    return p


def _decode_u32(v, signed: bool):
    """u32 lanes [I0,Q0,I1,Q1] (little-endian bytes) -> (E, O) f32 planes:
    E = |I0+jQ0|/128, O = |I1+jQ1|/128 (demod_raw_interleaved semantics)."""
    x = v.astype(jnp.uint32)
    i0 = (x & 0xFF).astype(jnp.int32)
    q0 = ((x >> 8) & 0xFF).astype(jnp.int32)
    i1 = ((x >> 16) & 0xFF).astype(jnp.int32)
    q1 = (x >> 24).astype(jnp.int32)
    if signed:
        i0, q0, i1, q1 = i0 ^ 128, q0 ^ 128, i1 ^ 128, q1 ^ 128
    s = jnp.float32(1.0 / 128.0)

    def mag(a, b):
        af = a.astype(jnp.float32) - 128.0
        bf = b.astype(jnp.float32) - 128.0
        return jnp.sqrt(af * af + bf * bf) * s

    return mag(i0, q0), mag(i1, q1)


def _shift1(x, lane_idx):
    """x[r, l] <- x_flat[r*128 + l + 1] (advance one element)."""
    r1 = pltpu.roll(x, jnp.int32(LANES - 1), 1)
    return jnp.where(lane_idx < LANES - 1, r1,
                     jnp.concatenate([r1[1:, :], r1[-1:, :]], axis=0))


def _kernel_u32(meta_ref, metaf_ref, env_u16, pref_e, pref_o, x_hbm, out_ref,
                env_out, win2, sems, *, w32_rows, rows_q, rows_pc, taps_eff,
                margin, n_chunks, signed):
    i = pl.program_id(0)

    def dma(slot, ci):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(meta_ref[ci, 0], w32_rows), :],
            win2.at[slot], sems.at[slot],
        )

    sl = jax.lax.rem(i, jnp.int32(2))
    nsl = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

    @pl.when(i == jnp.int32(0))
    def _():
        dma(jnp.int32(0), jnp.int32(0)).start()

    @pl.when(i + jnp.int32(1) < jnp.int32(n_chunks))
    def _():
        dma(nsl, i + jnp.int32(1)).start()

    # envelope output: straight decode of the statically-blocked u16 rows
    env_out[:, :] = _decode(env_u16[:, :], signed)

    mis = meta_ref[i, 1]
    shift = meta_ref[i, 2]
    origin = meta_ref[i, 3]
    fracp = metaf_ref[i, 0]  # frac + window-start parity (host-folded)
    inv = metaf_ref[i, 1]
    delta2 = metaf_ref[i, 2]

    # base ramps for the two sample-parity sub-grids (s = 2q + a):
    # rel_a(q) = margin + p + frac + (2q + a) * delta2
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows_q, LANES), 0)
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (rows_q, LANES), 1)
    q_local = (r_idx * LANES + l_idx).astype(jnp.float32)
    base0 = jnp.float32(margin) + fracp + q_local * (delta2 + delta2)
    base1 = base0 + delta2

    dma(sl, i).wait()
    e_full, o_full = _decode_u32(win2[sl], signed)  # (w32_rows, LANES) f32
    # row 0 of the padded u32 array decodes pad garbage; substitute the
    # planar prefixes (zeros + tail) when the window starts at the origin
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (w32_rows, LANES), 0)
    at0 = (lane_row == 0) & (origin == 1)
    e_full = jnp.where(at0, pref_e[0:1, :], e_full)
    o_full = jnp.where(at0, pref_o[0:1, :], o_full)

    # align: aligned[r, l] = full[r, (l + mis) % 128] with cross-row carry
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (w32_rows - 1, LANES), 1)

    def align(x):
        rolled = pltpu.roll(x, shift, 1)
        return jnp.where(lane_w < LANES - mis, rolled[: w32_rows - 1, :],
                         rolled[1:, :])

    cur = [align(e_full), align(o_full)]  # plane c: window element j=2u+c

    accs = [jnp.zeros((rows_q, LANES), jnp.float32) for _ in range(4)]
    for t in range(taps_eff):
        if t > 0:
            # plane needed one element further this tap: E on odd t, O on even
            c = 0 if (t % 2 == 1) else 1
            cur[c] = _shift1(cur[c], lane_w)
        tf = jnp.float32(t)

        def ovl(rel):
            return jnp.maximum(
                jnp.minimum(rel + inv, tf + 1.0) - jnp.maximum(rel, tf), 0.0
            )

        w_a0 = cur[t % 2][:rows_q, :]        # plane (a + t) & 1, a = 0
        w_a1 = cur[(t + 1) % 2][:rows_q, :]  # a = 1
        accs[0] = accs[0] + ovl(base0) * w_a0
        accs[1] = accs[1] + ovl(base0 + inv) * w_a0
        accs[2] = accs[2] + ovl(base1) * w_a1
        accs[3] = accs[3] + ovl(base1 + inv) * w_a1

    for k in range(4):
        out_ref[0, k, :, :] = accs[k]


def _fused_u32(
    raw,
    tail,
    phase_fix,
    inv_fix,
    *,
    n_samples: int,
    max_pix: int,
    taps: int,
    inv_nominal: float,
    Ls: int = 4096,
    margin_small: int | None = None,
    interpret: bool | None = None,
):
    plan = plan_strided(inv_nominal, taps)
    if plan is None or plan[0] != 2:
        raise ValueError("fused kernel requires the m=2 geometry")
    if raw.dtype not in (jnp.uint8, jnp.int8) or raw.ndim != 1:
        raise ValueError("fused kernel requires 1-D uint8/int8 raw IQ")
    if n_samples % Ls:
        raise ValueError("fused kernel requires Ls | n_samples")
    signed = raw.dtype == jnp.int8

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    n = n_samples
    n_out, new_phase = resample_counts(phase_fix, inv_fix, n)
    inv_f = inv_fix.astype(jnp.float32) * jnp.float32(2.0 ** (-FRAC_BITS))
    rate_f = jnp.float32(1 << FRAC_BITS) / inv_fix.astype(jnp.float32)

    if margin_small is None:
        margin_small = max(4, int(np.ceil(Ls * abs(2 * inv_nominal - 1.0))) + 2)
    margin = margin_small
    taps_eff = 2 * margin + 4 + 1  # +1: window start forced even (parity p)
    rows_pc = Ls // LANES          # env rows per chunk (u16 static stream)
    rows_q = (Ls // 2) // LANES    # sample-pair rows per chunk
    assert Ls % (2 * LANES) == 0
    pix_per_chunk = 2 * Ls
    n_chunks = -(-max_pix // pix_per_chunk)
    # window elements: (Ls + taps_eff + 2)/2 samples-pairs + roll carry row
    w32_rows = (Ls // 2 + taps_eff // 2 + 4 + LANES - 1) // LANES + 2
    w32_rows = -(-w32_rows // 8) * 8

    # --- u16 env view (static blocked stream; same as the u16 layout) ---
    assert margin + taps <= OFF
    n16_rows = OFF // LANES + n // LANES + 2
    raw_pad16 = jnp.concatenate([
        jnp.zeros((2 * OFF,), raw.dtype),
        raw,
        jnp.zeros((2 * (n16_rows * LANES) - 2 * OFF - 2 * n,), raw.dtype),
    ])
    x2 = jax.lax.bitcast_convert_type(
        raw_pad16.reshape(-1, 2), jnp.uint16
    ).reshape(n16_rows, LANES)[OFF // LANES:, :]
    # pad the env stream to the blocked grid
    env_rows_total = n_chunks * rows_pc
    if env_rows_total > x2.shape[0]:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((env_rows_total - x2.shape[0], LANES), jnp.uint16)]
        )

    # --- u32 window view: element OFF32 + (s >> 1) holds samples s, s+1 ---
    OFF32 = LANES  # one full pad row: samples -256..-1
    n32_rows = OFF32 // LANES + (n // 2 + LANES - 1) // LANES + w32_rows + 2
    raw_pad32 = jnp.concatenate([
        jnp.zeros((4 * OFF32,), raw.dtype),
        raw,
        jnp.zeros((4 * (n32_rows * LANES) - 4 * OFF32 - 2 * n,), raw.dtype),
    ])
    x32 = jax.lax.bitcast_convert_type(
        raw_pad32.reshape(-1, 4), jnp.uint32
    ).reshape(n32_rows, LANES)

    # planar prefixes: window row 0 = env samples [-256, 0)
    full_pref = jnp.concatenate(
        [jnp.zeros((2 * OFF32 - taps,), jnp.float32), tail.astype(jnp.float32)]
    )
    pref_e = full_pref[0::2].reshape(1, LANES)
    pref_o = full_pref[1::2].reshape(1, LANES)

    # exact per-chunk bases
    c = jnp.arange(n_chunks, dtype=jnp.int64)
    base = phase_fix + (c * pix_per_chunk) * inv_fix
    start = (base >> FRAC_BITS).astype(jnp.int32)
    frac = (base - (start.astype(jnp.int64) << FRAC_BITS)).astype(
        jnp.float32
    ) * jnp.float32(2.0 ** (-FRAC_BITS))
    ps = start + (2 * OFF32 - margin)  # window start, padded-sample coords
    par = ps & 1                       # forced-even residual
    e0 = ps >> 1
    row0 = jnp.clip(e0 // LANES, 0, n32_rows - w32_rows)
    mis = jnp.clip(e0 - row0 * LANES, 0, LANES - 1)
    origin = (e0 // LANES <= 0).astype(jnp.int32)
    delta2_f = (2.0 * inv_fix.astype(jnp.float64) * 2.0 ** (-FRAC_BITS)
                - 1.0).astype(jnp.float32)
    meta = jnp.stack([row0, mis, (LANES - mis) % LANES, origin], axis=1)
    metaf = jnp.stack(
        [frac + par.astype(jnp.float32),
         jnp.broadcast_to(inv_f, frac.shape),
         jnp.broadcast_to(delta2_f, frac.shape)],
        axis=1,
    )

    env_rows = n // LANES

    def pallas_outputs(operands):
        x2_, x32_, meta_, metaf_, pe_, po_ = operands
        out, env_pad = pl.pallas_call(
            functools.partial(_kernel_u32, w32_rows=w32_rows, rows_q=rows_q,
                              rows_pc=rows_pc, taps_eff=taps_eff,
                              margin=margin, n_chunks=n_chunks,
                              signed=signed),
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(meta_.shape, lambda i: (_I0, _I0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(metaf_.shape, lambda i: (_I0, _I0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((rows_pc, LANES), lambda i: (i, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (_I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (_I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(x32_.shape, lambda i: (_I0, _I0),
                             memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((1, 4, rows_q, LANES),
                             lambda i: (i, _I0, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows_pc, LANES), lambda i: (i, _I0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_chunks, 4, rows_q, LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((n_chunks * rows_pc, LANES),
                                     jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, w32_rows, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(meta_, metaf_, x2_, pe_, po_, x32_)

        # stream k = 2a + b at pixel p = c*4Ls + 4q + 2a + b
        parts = [out[:, k].reshape(-1, _ILV4_T) for k in range(4)]
        inter = jnp.dot(
            jnp.concatenate(parts, axis=1),
            jnp.asarray(_interleave4_matrix()),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        pixels = inter.reshape(-1)[:max_pix] * rate_f
        env = env_pad[:env_rows].reshape(-1)[:n]
        return pixels, env

    def xla_outputs(operands):
        env = am_demod(normalize_iq(raw))
        px, _, _ = box_resample_strided(
            jnp.concatenate([tail.astype(jnp.float32), env]),
            phase_fix, inv_fix, n_samples=n, max_pix=max_pix,
            taps=taps, inv_nominal=inv_nominal,
        )
        return px, env

    margin_act = jnp.ceil(
        jnp.float32(Ls) * jnp.abs(delta2_f)
    ).astype(jnp.int32) + 1
    pixels, env = jax.lax.cond(
        margin_act <= margin_small, pallas_outputs, xla_outputs,
        (x2, x32, meta, metaf, pref_e, pref_o),
    )
    valid = jnp.arange(max_pix, dtype=jnp.int32) < n_out
    pixels = jnp.where(valid, pixels, 0.0).astype(jnp.float32)
    return env, pixels, n_out, new_phase
