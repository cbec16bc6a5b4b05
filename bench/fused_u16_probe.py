"""Packed-u16 layout of the fused demod+resample kernel — measured A/B probe.

This is the round-2 fused kernel's FIRST window layout, moved out of the
package (VERDICT r2 weak #8): windows ride as packed u16 lanes (one sample
per lane), but Mosaic requires dynamic row offsets on packed-16-bit memrefs
to be provably tile-aligned, forcing a 16-row-aligned DMA base + 16-row
over-fetch + in-kernel binary row-shift absorb. That absorb made it measure
SLOWER than both the unfused chain and the package's u32-plane layout
(2.13 ms/blk vs 1.30 strided-Mosaic, ROOFLINE.md round-2 update), so it
lives here purely as the reproducible record of that negative result.

Run the A/B via tests/test_pallas.py (interpret mode) or on hardware with
bench/pallas_strided_probe.py-style timing. Same contract as
tempestsdr_tpu.pallas.fused_kernel.fused_demod_resample.

Reference semantics: dsp_resample_process (dsp.c:256-307) + am_demod
(TSDRLibrary.c:244-262) + RawFile scaling (TSDRPlugin_RawFile.c:241-261).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tempestsdr_tpu.config import FRAC_BITS
from tempestsdr_tpu.ops.demod import am_demod, normalize_iq
from tempestsdr_tpu.ops.resample import (
    _ILV_T,
    _interleave_matrix,
    box_resample_strided,
    plan_strided,
    resample_counts,
)
from tempestsdr_tpu.pallas.fused_kernel import LANES, OFF, _I0, _decode


def _kernel(meta_ref, metaf_ref, env_u16, prefix_ref, x_hbm, out_ref,
            env_out, win2, sems, *, w_rows, w_rows_dma, rows_pc, taps_eff,
            margin, n_chunks, signed):
    i = pl.program_id(0)

    def dma(slot, ci):
        # packed-u16 memrefs require the dynamic row offset to be provably
        # tile-aligned: meta[ci,0] is idx0//(16*LANES) (clipped), so *16 is
        # divisible by 16 by construction — the 0..15 row residual is
        # absorbed post-decode below
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(meta_ref[ci, 0] * jnp.int32(16), w_rows_dma), :],
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

    # envelope output: straight decode of the statically-blocked rows
    env_out[:, :] = _decode(env_u16[:, :], signed)

    row_off = meta_ref[i, 1]
    mis = meta_ref[i, 2]
    shift = meta_ref[i, 3]
    origin = meta_ref[i, 4]  # 1 iff the window starts at the array origin
    frac = metaf_ref[i, 0]
    inv = metaf_ref[i, 1]
    delta2 = metaf_ref[i, 2]

    r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows_pc, LANES), 0)
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (rows_pc, LANES), 1)
    s_local = (r_idx * LANES + l_idx).astype(jnp.float32)
    base_rel = jnp.float32(margin) + frac + s_local * delta2

    dma(sl, i).wait()
    wfull = _decode(win2[sl], signed)  # (w_rows_dma, LANES) f32
    # absorb the 0..15-row DMA residual with binary row-shift selects
    for bit in (8, 4, 2, 1):
        take = (row_off & jnp.int32(bit)) != 0
        hi = wfull[bit : bit + wfull.shape[0] - bit, :]
        lo = wfull[: wfull.shape[0] - bit, :]
        wfull = jnp.where(take, hi, lo)
    win = wfull[:w_rows, :]
    # row 0 of the padded array is [zeros, tail] — decoded pad bytes are
    # garbage (u8 zero decodes to sqrt(2)), so substitute the f32 prefix
    # whenever the window actually starts at the origin
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (w_rows, LANES), 0)
    win = jnp.where((lane_row == 0) & (origin == 1), prefix_ref[0:1, :], win)

    rolled = pltpu.roll(win, shift, 1)
    carry = rolled[1:, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (w_rows - 1, LANES), 1)
    w0 = jnp.where(lane < LANES - mis, rolled[: w_rows - 1, :], carry)

    acc_e = jnp.zeros((rows_pc, LANES), jnp.float32)
    acc_o = jnp.zeros((rows_pc, LANES), jnp.float32)
    wt = w0
    lane_pc = jax.lax.broadcasted_iota(jnp.int32, (w_rows - 1, LANES), 1)
    for t in range(taps_eff):
        if t > 0:
            r1 = pltpu.roll(wt, jnp.int32(LANES - 1), 1)
            wt = jnp.where(lane_pc < LANES - 1, r1,
                           jnp.concatenate([r1[1:, :], r1[-1:, :]], axis=0))
        tf = jnp.float32(t)
        we = jnp.maximum(
            jnp.minimum(base_rel + inv, tf + 1.0) - jnp.maximum(base_rel, tf),
            0.0,
        )
        rel_o = base_rel + inv
        wo = jnp.maximum(
            jnp.minimum(rel_o + inv, tf + 1.0) - jnp.maximum(rel_o, tf), 0.0
        )
        acc_e = acc_e + we * wt[:rows_pc, :]
        acc_o = acc_o + wo * wt[:rows_pc, :]

    out_ref[0, 0, :, :] = acc_e
    out_ref[0, 1, :, :] = acc_o


def fused_demod_resample_u16(
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
    assert margin + taps <= OFF
    taps_eff = 2 * margin + 4
    rows_pc = Ls // LANES
    assert Ls % LANES == 0
    pix_per_chunk = 2 * Ls
    n_chunks = -(-max_pix // pix_per_chunk)
    w_rows = rows_pc + -(-(taps_eff + 1) // LANES) + 2
    w_rows = -(-w_rows // 16) * 16  # u16 VMEM tiles are (16, 128)
    # DMA over-fetch: the copy starts at a 16-row-aligned base (packed-u16
    # tile alignment is a hard Mosaic requirement for dynamic offsets) and
    # the 0..15-row residual is absorbed in-kernel
    w_rows_dma = w_rows + 16

    # pad the raw bytes so u16 element k+OFF holds env sample k, with right
    # slack covering both the env blocks (n_chunks * rows_pc) and any
    # clamped window DMA; keep the total row count 16-aligned so the clipped
    # DMA base stays tile-aligned
    n16_rows = OFF // LANES + max(n_chunks * rows_pc, n // LANES) + w_rows_dma + 1
    n16_rows = -(-n16_rows // 16) * 16
    raw_pad = jnp.concatenate([
        jnp.zeros((2 * OFF,), raw.dtype),
        raw,
        jnp.zeros((2 * (n16_rows * LANES) - 2 * OFF - 2 * n,), raw.dtype),
    ])
    x2 = jax.lax.bitcast_convert_type(
        raw_pad.reshape(-1, 2), jnp.uint16
    ).reshape(n16_rows, LANES)

    # prefix row: env coords [-OFF, 0) = [zeros(OFF - taps), tail]
    prefix = jnp.concatenate(
        [jnp.zeros((OFF - taps,), jnp.float32), tail.astype(jnp.float32)]
    ).reshape(1, OFF)

    # exact per-chunk bases (start is in env coords)
    c = jnp.arange(n_chunks, dtype=jnp.int64)
    base = phase_fix + (c * pix_per_chunk) * inv_fix
    start = (base >> FRAC_BITS).astype(jnp.int32)
    frac = (base - (start.astype(jnp.int64) << FRAC_BITS)).astype(
        jnp.float32
    ) * jnp.float32(2.0 ** (-FRAC_BITS))
    idx0 = start + (OFF - margin)
    row0_div = jnp.clip(idx0 // (16 * LANES), 0, (n16_rows - w_rows_dma) // 16)
    row_off = jnp.clip(idx0 // LANES - row0_div * 16, 0, 15)
    mis = jnp.clip(idx0 - (row0_div * 16 + row_off) * LANES, 0, LANES - 1)
    origin = (idx0 // LANES <= 0).astype(jnp.int32)
    delta2_f = (2.0 * inv_fix.astype(jnp.float64) * 2.0 ** (-FRAC_BITS)
                - 1.0).astype(jnp.float32)
    meta = jnp.stack(
        [row0_div, row_off, mis, (LANES - mis) % LANES, origin], axis=1
    )
    metaf = jnp.stack(
        [frac,
         jnp.broadcast_to(inv_f, frac.shape),
         jnp.broadcast_to(delta2_f, frac.shape)],
        axis=1,
    )

    env_rows = n // LANES

    def _env_view(x2_):
        # rows shifted so block i starts at env sample i*Ls: drop the OFF pad
        # row so the blocked index map stays a plain multiple of rows_pc
        return x2_[OFF // LANES:, :]

    def pallas_outputs(operands):
        x2_, meta_, metaf_, prefix_ = operands
        out, env_pad = pl.pallas_call(
            functools.partial(_kernel, w_rows=w_rows, w_rows_dma=w_rows_dma,
                              rows_pc=rows_pc, taps_eff=taps_eff,
                              margin=margin, n_chunks=n_chunks,
                              signed=signed),
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(meta_.shape, lambda i: (_I0, _I0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(metaf_.shape, lambda i: (_I0, _I0),
                             memory_space=pltpu.SMEM),
                # env decode stream: statically blocked rows of the u16 view
                # (_env_view drops the OFF pad row, so blocked row i*rows_pc
                # is exactly env sample i*Ls)
                pl.BlockSpec((rows_pc, LANES), lambda i: (i, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES), lambda i: (_I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(x2_.shape, lambda i: (_I0, _I0),
                             memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((1, 2, rows_pc, LANES),
                             lambda i: (i, _I0, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rows_pc, LANES), lambda i: (i, _I0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_chunks, 2, rows_pc, LANES),
                                     jnp.float32),
                jax.ShapeDtypeStruct((n_chunks * rows_pc, LANES),
                                     jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, w_rows_dma, LANES), jnp.uint16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(meta_, metaf_, _env_view(x2_), prefix_, x2_)

        evens = out[:, 0].reshape(-1, _ILV_T)
        odds = out[:, 1].reshape(-1, _ILV_T)
        inter = jnp.dot(
            jnp.concatenate([evens, odds], axis=1),
            jnp.asarray(_interleave_matrix()),
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
        (x2, meta, metaf, prefix),
    )
    valid = jnp.arange(max_pix, dtype=jnp.int32) < n_out
    pixels = jnp.where(valid, pixels, 0.0).astype(jnp.float32)
    return env, pixels, n_out, new_phase
