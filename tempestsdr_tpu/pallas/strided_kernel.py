"""Mosaic kernel for the strided box resampler (m = 2 pixels per sample).

Replaces the two measured TPU cost centers of the XLA strided form
(ops.resample.box_resample_strided) that together dominate its ~0.3 ms/block:

  - the G-row window GATHER: here each chunk's sample window is DMA'd
    HBM->VMEM from an (n_rows, 128) view at an arbitrary row offset — DMA
    engines do this at full bandwidth, no gather;
  - the +G misalignment absorb in the overlap-weight loop: the sub-row
    misalignment (0..127 lanes) is removed by ONE dynamic lane roll
    (pltpu.roll with a traced shift) plus a row-carry select, so the weight
    loop runs only the drift margin (taps_eff ~ 2*margin+4 iterations).

Math is the same strided decomposition as the XLA form (exact int64
fixed-point chunk bases on the host; in-chunk f32 residual ramp):

  pixel p = c*2*Ls + 2*s + b   (chunk c, sample s in chunk, parity b)
  window W[j] = x[start_c - margin + j]   (aligned by the roll)
  rel(p) = margin + frac_c + b*inv + s*(2*inv - 1)    in [0, 2*margin+2)
  out[p] = rate * sum_t overlap([rel, rel+inv), [t, t+1)) * W[s + t]

W[s + t] in the (rows, 128) sample-major layout is a static shift-by-t of
the aligned window, built iteratively (one static roll + row-carry select
per t). Everything stays lane-aligned; the VPU sees only elementwise ops.

Same contract and carries as box_resample_strided (m == 2 geometries; the
caller falls back to the XLA form otherwise). Reference semantics:
dsp_resample_process (TempestSDR/src/dsp.c:256-307).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FRAC_BITS
from ..ops.resample import plan_strided, resample_counts, _interleave_matrix, _ILV_T

_FIX24 = float(1 << 24)
LANES = 128


def _kernel(row0_ref, mis_ref, frac24_ref, par_ref, x_hbm, out_ref, win, sem,
            *, w_rows, rows_pc, taps_eff, margin):
    r0 = row0_ref[0, 0]
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(r0, w_rows), :], win, sem)
    cp.start()

    inv = jax.lax.bitcast_convert_type(par_ref[0, 0], jnp.float32)
    delta2 = jax.lax.bitcast_convert_type(par_ref[0, 1], jnp.float32)
    frac = jax.lax.bitcast_convert_type(frac24_ref[0, 0], jnp.float32)
    mis = mis_ref[0, 0]

    # rel ramp: depends on the in-chunk sample index only through the drift
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows_pc, LANES), 0)
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (rows_pc, LANES), 1)
    s_local = (r_idx * LANES + l_idx).astype(jnp.float32)
    base_rel = jnp.float32(margin) + frac + s_local * delta2  # (rows_pc, 128)

    cp.wait()
    # align the window: rolled[r, l] = win[r, (l + mis) % 128]; the linear
    # (cross-row) shift needs the next row's lanes where l + mis >= 128
    rolled = pltpu.roll(win[:], (LANES - mis) % LANES, 1)
    carry = rolled[1:, :]  # row r takes row r+1's rolled lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, (w_rows - 1, LANES), 1)
    w0 = jnp.where(lane < LANES - mis, rolled[: w_rows - 1, :], carry)

    acc_e = jnp.zeros((rows_pc, LANES), jnp.float32)
    acc_o = jnp.zeros((rows_pc, LANES), jnp.float32)
    wt = w0
    lane_pc = jax.lax.broadcasted_iota(jnp.int32, (w_rows - 1, LANES), 1)
    for t in range(taps_eff):
        if t > 0:
            # shift-by-one: wt[r, l] <- wt_flat[r*128 + l + 1]
            r1 = pltpu.roll(wt, LANES - 1, 1)
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


def box_resample_strided_pallas(
    x_ext,
    phase_fix,
    inv_fix,
    *,
    n_samples: int,
    max_pix: int,
    taps: int,
    inv_nominal: float,
    Ls: int = 2048,
    interpret: bool | None = None,
):
    """Drop-in replacement for box_resample_strided (m == 2 only)."""
    plan = plan_strided(inv_nominal, taps)
    if plan is None or plan[0] != 2:
        raise ValueError("pallas strided kernel requires the m=2 geometry")

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    n_out, new_phase = resample_counts(phase_fix, inv_fix, n_samples)
    inv_f = inv_fix.astype(jnp.float32) * jnp.float32(2.0 ** (-FRAC_BITS))
    rate_f = jnp.float32(1 << FRAC_BITS) / inv_fix.astype(jnp.float32)

    # drift margin over one chunk of Ls samples (PLL headroom included via
    # plan_strided's budget): |s*(2*inv-1)| <= Ls * delta_cap
    from ..config import PLL_HEADROOM_FRAC

    delta_cap = abs(2 * inv_nominal - 1.0) + 2 * inv_nominal * PLL_HEADROOM_FRAC
    margin = int(np.ceil(Ls * delta_cap)) + 1
    taps_eff = 2 * margin + 4  # covers rel+2*inv < margin + 1 + 2inv + margin
    rows_pc = Ls // LANES
    assert Ls % LANES == 0
    pix_per_chunk = 2 * Ls
    n_chunks = -(-max_pix // pix_per_chunk)
    w_rows = rows_pc + -(-(taps_eff + 1) // LANES) + 2  # +1 roll carry row

    # pad so absolute window indices are nonnegative and DMAs stay in bounds
    left = margin + 1
    x_pad = jnp.concatenate(
        [jnp.zeros((left,), x_ext.dtype), x_ext,
         jnp.zeros(((w_rows + 1) * LANES,), x_ext.dtype)]
    )
    n_rows = -(-x_pad.shape[0] // LANES)
    x2 = jnp.concatenate(
        [x_pad, jnp.zeros((n_rows * LANES - x_pad.shape[0],), x_pad.dtype)]
    ).reshape(n_rows, LANES)

    # exact per-chunk bases (int64 on n_chunks elements only)
    c = jnp.arange(n_chunks, dtype=jnp.int64)
    base = phase_fix + (c * pix_per_chunk) * inv_fix
    start = (base >> FRAC_BITS).astype(jnp.int32)
    frac = (base - (start.astype(jnp.int64) << FRAC_BITS)).astype(jnp.float32) * jnp.float32(
        2.0 ** (-FRAC_BITS)
    )
    # window anchor: absolute sample (start - margin); x_ext sample s lives
    # at x_pad[left + taps + s]
    idx0 = start + (taps + left - margin)
    row0 = idx0 // LANES
    mis = idx0 - row0 * LANES
    # ship f32 values through SMEM as int32 bit patterns (exact — avoids
    # quantizing the tiny drift slope delta2 ~ 1e-5 to a fixed grid)
    frac24 = jax.lax.bitcast_convert_type(frac, jnp.int32)
    delta2_f = (2.0 * inv_fix.astype(jnp.float64) * 2.0 ** (-FRAC_BITS) - 1.0).astype(
        jnp.float32
    )
    par = jax.lax.bitcast_convert_type(
        jnp.stack([inv_f, delta2_f]), jnp.int32
    )
    par2 = jnp.broadcast_to(par[None, :], (n_chunks, 2))

    out = pl.pallas_call(
        functools.partial(_kernel, w_rows=w_rows, rows_pc=rows_pc,
                          taps_eff=taps_eff, margin=margin),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 2, rows_pc, LANES),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks, 2, rows_pc, LANES),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((w_rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(row0[:, None], mis[:, None], frac24[:, None], par2, x2)

    # (c, b, s) -> pixel order p = c*2Ls + 2s + b on the MXU
    evens = out[:, 0].reshape(-1, _ILV_T)
    odds = out[:, 1].reshape(-1, _ILV_T)
    inter = jnp.dot(
        jnp.concatenate([evens, odds], axis=1),
        jnp.asarray(_interleave_matrix()),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    pixels = inter.reshape(-1)[:max_pix] * rate_f
    valid = jnp.arange(max_pix, dtype=jnp.int32) < n_out
    return jnp.where(valid, pixels, 0.0).astype(jnp.float32), n_out, new_phase
