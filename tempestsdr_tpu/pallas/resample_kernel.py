"""Pallas TPU kernel for the fractional box resampler.

Same math as ops.resample.box_resample_block_chunked (area-weighted box
integral with exact int64 fixed-point phase), but the per-tile sample window
is DMA'd HBM->VMEM explicitly and the overlap-weight matrix lives only in
VMEM — nothing is materialized to HBM:

    out[p] = rate * sum_j W[j, p] * window[j]
    W[j, p] = overlap([pos_p, pos_p+inv), [j, j+1))

Layout is chosen for Mosaic: pixels ride the lane dimension, window samples
the sublane dimension, so the weighted reduction is a plain cross-sublane sum
on the VPU. The exact int64 work (per-tile window starts + fractional
phases) happens outside in XLA on a tiny (n_tiles,) array; scalar-prefetch
operands are int32 (fracs/inv as 24-bit fixed point).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FRAC_BITS
from ..ops.resample import resample_counts

TILE_P = 256  # pixels per grid tile
_FIX24 = float(1 << 24)


def _kernel(starts_ref, fracs24_ref, inv24_ref, x_hbm, out_ref, x_win, sem, *, w_in):
    i = pl.program_id(0)
    start = starts_ref[i]
    dma = pltpu.make_async_copy(x_hbm.at[pl.ds(start, w_in), :], x_win, sem)
    dma.start()

    inv = inv24_ref[0].astype(jnp.float32) * jnp.float32(1.0 / _FIX24)
    frac = fracs24_ref[i].astype(jnp.float32) * jnp.float32(1.0 / _FIX24)
    # pixels on lanes, window samples on sublanes
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_P), 1).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (w_in, TILE_P), 0).astype(jnp.float32)
    pos = frac + p_idx * inv  # (1, TILE_P)
    lo = jnp.maximum(pos, jj)
    hi = jnp.minimum(pos + inv, jj + 1.0)
    w = jnp.maximum(hi - lo, 0.0)  # (w_in, TILE_P)

    dma.wait()
    out_ref[0, 0, :] = jnp.sum(w * x_win[:], axis=0)


_G = 8  # tiles per kernel invocation (sublane-aligned output block)


def _kernel_w(fracs_ref, inv_ref, win_ref, out_ref, *, w_in):
    inv = inv_ref[0, 0]
    frac = fracs_ref[:]  # (G, 1)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (_G, 1, TILE_P), 2).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (_G, w_in, TILE_P), 1).astype(jnp.float32)
    pos = frac[:, :, None] + p_idx * inv  # (G, 1, TILE_P)
    lo = jnp.maximum(pos, jj)
    hi = jnp.minimum(pos + inv, jj + 1.0)
    w = jnp.maximum(hi - lo, 0.0)  # (G, w_in, TILE_P)
    out_ref[:] = jnp.sum(w * win_ref[:][:, :, None], axis=1)


def box_resample_pallas_windows(
    x_ext, phase_fix, inv_fix, *, n_samples: int, max_pix: int, taps: int, inv_nominal: float
):
    """Variant where XLA gathers the per-tile windows and the kernel only
    fuses the weight computation + reduction (no manual DMA / ANY memory —
    the most portable Pallas form)."""
    n_out, new_phase = resample_counts(phase_fix, inv_fix, n_samples)

    n_tiles = -(-max_pix // (TILE_P * _G)) * _G
    w_in = int(np.ceil(TILE_P * inv_nominal * 1.02)) + taps + 2
    w_in = -(-w_in // 8) * 8  # sublane-align: odd widths crash Mosaic
    x_pad = jnp.concatenate([x_ext, jnp.zeros((w_in,), x_ext.dtype)])

    t = jnp.arange(n_tiles, dtype=jnp.int64)
    base = phase_fix + (t * TILE_P) * inv_fix
    start = (base >> FRAC_BITS).astype(jnp.int32)
    frac = (base - (start.astype(jnp.int64) << FRAC_BITS)).astype(jnp.float32) * jnp.float32(
        2.0 ** (-FRAC_BITS)
    )
    idx0 = jnp.clip(start + taps, 0, x_pad.shape[0] - w_in)
    frac = (frac + (start + taps - idx0).astype(jnp.float32)).reshape(n_tiles, 1)
    windows = x_pad[idx0[:, None] + jnp.arange(w_in, dtype=jnp.int32)[None, :]]
    inv_f = inv_fix.astype(jnp.float32) * jnp.float32(2.0 ** (-FRAC_BITS))
    rate_f = jnp.float32(1.0) / inv_f

    out = pl.pallas_call(
        functools.partial(_kernel_w, w_in=w_in),
        grid=(n_tiles // _G,),
        in_specs=[
            pl.BlockSpec((_G, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_G, w_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_G, TILE_P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, TILE_P), jnp.float32),
    )(frac, inv_f.reshape(1, 1), windows)

    pixels = out.reshape(n_tiles * TILE_P)[:max_pix] * rate_f
    valid = jnp.arange(max_pix, dtype=jnp.int32) < n_out
    return jnp.where(valid, pixels, 0.0).astype(jnp.float32), n_out, new_phase


def box_resample_pallas(
    x_ext, phase_fix, inv_fix, *, n_samples: int, max_pix: int, taps: int, inv_nominal: float
):
    """Drop-in replacement for box_resample_block_chunked (same contract)."""
    n_out, new_phase = resample_counts(phase_fix, inv_fix, n_samples)

    n_tiles = -(-max_pix // TILE_P)
    w_in = int(np.ceil(TILE_P * inv_nominal * 1.02)) + taps + 2
    w_in = -(-w_in // 8) * 8  # sublane-align: odd widths crash Mosaic
    # pad so every tile's window DMA stays in bounds; column layout so the
    # window broadcasts across the pixel (lane) dimension in the kernel
    x_pad = jnp.concatenate([x_ext, jnp.zeros((w_in,), x_ext.dtype)])[:, None]

    t = jnp.arange(n_tiles, dtype=jnp.int64)
    base = phase_fix + (t * TILE_P) * inv_fix
    start = (base >> FRAC_BITS).astype(jnp.int32)
    frac = (base - (start.astype(jnp.int64) << FRAC_BITS)).astype(jnp.float32) * jnp.float32(
        2.0 ** (-FRAC_BITS)
    )
    idx0 = jnp.clip(start + taps, 0, x_pad.shape[0] - w_in)
    frac = frac + (start + taps - idx0).astype(jnp.float32)
    frac24 = jnp.round(frac * _FIX24).astype(jnp.int32)
    inv24 = (inv_fix >> (FRAC_BITS - 24)).astype(jnp.int32).reshape(1)
    inv_f = inv_fix.astype(jnp.float32) * jnp.float32(2.0 ** (-FRAC_BITS))
    rate_f = jnp.float32(1.0) / inv_f

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 1, TILE_P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((w_in, 1), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, w_in=w_in),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, TILE_P), jnp.float32),
    )(idx0, frac24, inv24, x_pad)

    pixels = out.reshape(n_tiles * TILE_P)[:max_pix] * rate_f
    valid = jnp.arange(max_pix, dtype=jnp.int32) < n_out
    return jnp.where(valid, pixels, 0.0).astype(jnp.float32), n_out, new_phase
