"""Mosaic kernel for the strided box resampler (m = 2 pixels per sample).

Replaces the two measured TPU cost centers of the XLA strided form
(ops.resample.box_resample_strided):

  - the G-row window GATHER: each chunk's sample window is DMA'd HBM->VMEM
    from an (n_rows, 128) view at an arbitrary row offset, double-buffered
    across grid steps so the copy engine runs ahead of the VPU — DMA does
    arbitrary-offset rows at full bandwidth, no gather;
  - the +G misalignment absorb in the overlap-weight loop: the sub-row
    misalignment (0..127 lanes) is removed by ONE dynamic lane roll
    (pltpu.roll with a traced shift) plus a row-carry select, so the weight
    loop runs only the drift margin.

The weight loop is STATIC and sized for the small-drift steady state
(margin_small), not the full PLL excursion budget: a locked PLL holds
|2*inv - 1| ~ 1e-5, so a handful of taps covers the in-chunk drift. Blocks
whose realized rate needs more margin (PLL transients near the clamp) fall
back to the XLA strided form under a traced lax.cond — only the taken
branch executes on TPU, so the steady state never pays for the excursion
case. (A dynamic fori_loop trip count was measured SLOWER than the static
worst-case unroll — Mosaic does not pipeline dynamic loops; see
bench/PROFILE.json history.)

Math is the same strided decomposition as the XLA form (exact int64
fixed-point chunk bases in the prelude; in-chunk f32 residual ramp):

  pixel p = c*2*Ls + 2*s + b   (chunk c, sample s in chunk, parity b)
  window W[j] = x[start_c - margin + j]   (aligned by the roll)
  rel(p) = margin + frac_c + b*inv + s*(2*inv - 1)
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
from ..ops.resample import (
    _ILV_T,
    _interleave_matrix,
    box_resample_strided,
    plan_strided,
    resample_counts,
)

LANES = 128
_I0 = np.int32(0)  # index-map zero: python 0 traces to i64 under x64


def _kernel(meta_ref, metaf_ref, x_hbm, out_ref, win2, sems,
            *, w_rows, rows_pc, taps_eff, margin, n_chunks):
    i = pl.program_id(0)

    def dma(slot, ci):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(meta_ref[ci, 0], w_rows), :],
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

    mis = meta_ref[i, 1]
    shift = meta_ref[i, 2]  # (LANES - mis) % LANES, precomputed host-side
    frac = metaf_ref[i, 0]
    inv = metaf_ref[i, 1]
    delta2 = metaf_ref[i, 2]

    # rel ramp: depends on the in-chunk sample index only through the drift
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows_pc, LANES), 0)
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (rows_pc, LANES), 1)
    s_local = (r_idx * LANES + l_idx).astype(jnp.float32)
    base_rel = jnp.float32(margin) + frac + s_local * delta2  # (rows_pc, 128)

    dma(sl, i).wait()
    win = win2[sl]
    # align the window: rolled[r, l] = win[r, (l + mis) % 128]; the linear
    # (cross-row) shift needs the next row's lanes where l + mis >= 128
    rolled = pltpu.roll(win, shift, 1)
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


def box_resample_strided_pallas(
    x_ext,
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
    """Drop-in replacement for box_resample_strided (m == 2 only)."""
    plan = plan_strided(inv_nominal, taps)
    if plan is None or plan[0] != 2:
        raise ValueError("pallas strided kernel requires the m=2 geometry")

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    n_out, new_phase = resample_counts(phase_fix, inv_fix, n_samples)
    inv_f = inv_fix.astype(jnp.float32) * jnp.float32(2.0 ** (-FRAC_BITS))
    rate_f = jnp.float32(1 << FRAC_BITS) / inv_fix.astype(jnp.float32)

    # static steady-state drift margin: nominal drift over a chunk plus
    # slack for small locked-PLL excursions (|delta| <~ margin/Ls of the
    # pixel rate). Blocks needing more fall back to the XLA form below.
    if margin_small is None:
        margin_small = max(4, int(np.ceil(Ls * abs(2 * inv_nominal - 1.0))) + 2)
    margin = margin_small
    taps_eff = 2 * margin + 4  # covers rel+2*inv < margin + 1 + 2inv + margin
    rows_pc = Ls // LANES
    assert Ls % LANES == 0
    pix_per_chunk = 2 * Ls
    n_chunks = -(-max_pix // pix_per_chunk)
    w_rows = rows_pc + -(-(taps_eff + 1) // LANES) + 2  # +1 roll carry row
    w_rows = -(-w_rows // 8) * 8  # f32 VMEM tiles are (8, 128): keep the
    # scratch and the DMA row count sublane-aligned (odd counts fault)

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
    # at x_pad[left + taps + s]. Clamp the DMA base row into bounds: chunks
    # past n_out (and pathological phases) would otherwise fault the DMA
    # engine — their pixels are masked by `valid` below, values don't matter.
    idx0 = start + (taps + left - margin)
    row0 = jnp.clip(idx0 // LANES, 0, n_rows - w_rows)
    mis = jnp.clip(idx0 - row0 * LANES, 0, LANES - 1)
    # ship the per-chunk scalars through two whole-array SMEM inputs indexed
    # by program_id (blocked SMEM specs must be (8,128)-divisible on this
    # lowering, and Mosaic has no scalar bitcast — so ints and floats ride
    # in separate arrays of their own dtype)
    delta2_f = (2.0 * inv_fix.astype(jnp.float64) * 2.0 ** (-FRAC_BITS) - 1.0).astype(
        jnp.float32
    )
    meta = jnp.stack([row0, mis, (LANES - mis) % LANES], axis=1)
    metaf = jnp.stack(
        [frac,
         jnp.broadcast_to(inv_f, frac.shape),
         jnp.broadcast_to(delta2_f, frac.shape)],
        axis=1,
    )

    def pallas_pixels(operands):
        x2_, meta_, metaf_ = operands
        out = pl.pallas_call(
            functools.partial(_kernel, w_rows=w_rows, rows_pc=rows_pc,
                              taps_eff=taps_eff, margin=margin,
                              n_chunks=n_chunks),
            grid=(n_chunks,),
            in_specs=[
                # explicit int32 index maps: the defaults trace to i64 under
                # jax_enable_x64 and Mosaic fails to legalize them
                pl.BlockSpec(meta_.shape, lambda i: (_I0, _I0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(metaf_.shape, lambda i: (_I0, _I0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(x2_.shape, lambda i: (_I0, _I0),
                             memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 2, rows_pc, LANES),
                                   lambda i: (i, _I0, _I0, _I0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_chunks, 2, rows_pc, LANES),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, w_rows, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(meta_, metaf_, x2_)

        # (c, b, s) -> pixel order p = c*2Ls + 2s + b on the MXU
        evens = out[:, 0].reshape(-1, _ILV_T)
        odds = out[:, 1].reshape(-1, _ILV_T)
        inter = jnp.dot(
            jnp.concatenate([evens, odds], axis=1),
            jnp.asarray(_interleave_matrix()),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return inter.reshape(-1)[:max_pix] * rate_f

    def xla_pixels(operands):
        # PLL excursion beyond the steady-state margin: defer to the XLA
        # strided form (its plan budgets the full clamp range)
        px, _, _ = box_resample_strided(
            x_ext, phase_fix, inv_fix, n_samples=n_samples, max_pix=max_pix,
            taps=taps, inv_nominal=inv_nominal,
        )
        return px

    margin_act = jnp.ceil(jnp.float32(Ls) * jnp.abs(delta2_f)).astype(jnp.int32) + 1
    pixels = jax.lax.cond(
        margin_act <= margin_small, pallas_pixels, xla_pixels, (x2, meta, metaf)
    )
    valid = jnp.arange(max_pix, dtype=jnp.int32) < n_out
    return jnp.where(valid, pixels, 0.0).astype(jnp.float32), n_out, new_phase
