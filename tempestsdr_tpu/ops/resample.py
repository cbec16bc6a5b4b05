"""Fractional resampling: samplerate -> pixelrate, vectorized for TPU.

The reference's `dsp_resample_process` (TempestSDR/src/dsp.c:256-307) is a
sequential Bresenham-style accumulator in double precision: each output pixel
value is the integral of the (piecewise-constant) input envelope over the
pixel's time window, measured in pixel units — i.e. an area-weighted box
filter — with fractional phase `offset` and partial-pixel `contrib` carried
across blocks.

TPU-native formulation: the mapping pixel -> input window is affine in the
pixel index, so every output pixel of a block is computed independently as a
small gather + weighted sum. Exactness and cross-block determinism come from
int64 fixed-point phase arithmetic (FRAC_BITS fractional bits): the carried
phase is an exact integer, so there is no floating-point drift ever, unlike
a naive f32 ramp (f32 cannot even address a 1M-pixel block to sub-sample
precision). The `contrib` carry is replaced by re-reading the previous
block's tail samples (TAPS of them), which the caller prepends.

  pixel p window (sample units): [a_p, a_p + inv),  a_p = phase + p*inv
  out[p] = (1/inv) * sum_t x[floor(a_p)+t] * overlap(window, sample)

Pixels are only emitted once complete (their window fully inside the data),
matching output_samples = floor((size - offset) * rate) at dsp.c:262; the
new phase is phase + n_out*inv - size in (-inv, 0] (dsp.c:306).

Nearest-neighbour mode matches dsp.c:274-277: out[p] = x[(size*p)/n_out]
(per-block integer mapping that ignores the fractional phase, like the
reference).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..config import FRAC_BITS


def resample_counts(phase_fix, inv_fix, n_samples: int):
    """Number of pixels completed this block and the next-block phase.

    Returns (n_out int32, new_phase_fix int64). Both exact integer math.
    phase_fix may be far positive while a drop-compensation sample skip
    drains (dsp.c:326-346 semantics folded into the phase); then n_out
    clamps to 0 and the phase is simply advanced past this block.
    """
    size_fix = jnp.int64(n_samples) << FRAC_BITS
    n_out64 = jnp.maximum((size_fix - phase_fix) // inv_fix, 0)
    new_phase = phase_fix + n_out64 * inv_fix - size_fix
    return n_out64.astype(jnp.int32), new_phase


def box_resample_block(x_ext, phase_fix, inv_fix, *, n_samples: int, max_pix: int, taps: int):
    """Area-weighted resample of one block.

    x_ext: f32[taps + n_samples] — previous block's last `taps` samples
        prepended to this block's envelope.
    phase_fix: int64 scalar in (-inv, 0] — sample-coordinate (x FRAC_BITS
        fixed point) of the next pixel's window start, relative to the first
        sample of *this* block.
    inv_fix: int64 scalar — samples-per-pixel in fixed point.

    Returns (pixels f32[max_pix], n_out int32, new_phase_fix int64).
    Entries past n_out are zero.
    """
    n_out, new_phase = resample_counts(phase_fix, inv_fix, n_samples)

    p = jnp.arange(max_pix, dtype=jnp.int64)
    a = phase_fix + p * inv_fix
    b = a + inv_fix
    i0 = (a >> FRAC_BITS).astype(jnp.int32)  # arithmetic shift == floor

    scale = jnp.float32(1 << FRAC_BITS) / inv_fix.astype(jnp.float32)  # = rate
    inv_scale = jnp.float32(2.0 ** (-FRAC_BITS))

    acc = jnp.zeros((max_pix,), jnp.float32)
    valid = p < n_out.astype(jnp.int64)
    for t in range(taps):
        idx = i0 + t
        lo = jnp.maximum(a, idx.astype(jnp.int64) << FRAC_BITS)
        hi = jnp.minimum(b, (idx + 1).astype(jnp.int64) << FRAC_BITS)
        w = jnp.maximum(hi - lo, 0).astype(jnp.float32) * inv_scale
        g = jnp.take(x_ext, jnp.clip(idx + taps, 0, x_ext.shape[0] - 1))
        acc = acc + w * g
    pixels = jnp.where(valid, acc * scale, 0.0).astype(jnp.float32)
    return pixels, n_out, new_phase


def box_resample_block_chunked(
    x_ext,
    phase_fix,
    inv_fix,
    *,
    n_samples: int,
    max_pix: int,
    taps: int,
    inv_nominal: float,
    chunk: int = 128,
):
    """TPU-fast variant of box_resample_block: identical math, restructured
    so the hot loop is f32/int32 elementwise + one dense reduction instead of
    per-pixel int64 arithmetic and per-tap gathers.

    Pixels are processed in chunks of `chunk`; the exact int64 fixed-point
    phase is evaluated once per *chunk* (tiny arrays), and within a chunk the
    pixel positions are an f32 ramp relative to the chunk's first sample
    (|pos| <= chunk*inv, so f32 keeps ~1e-5-sample accuracy — far below the
    box filter's sensitivity). Each chunk loads one contiguous sample window
    and computes overlap weights against it densely:

        out[p] = rate * sum_j clip(min(pos_p+inv, j+1) - max(pos_p, j), 0) * win[j]

    which XLA fuses into a VPU multiply-reduce — no per-pixel gather (the
    only gather is one contiguous window per chunk).

    inv_nominal: static samples-per-pixel used to size the window (2% PLL
    headroom). Returns (pixels f32[max_pix], n_out i32, new_phase i64) —
    same contract and bit-identical carries as box_resample_block.
    """
    n_out, new_phase = resample_counts(phase_fix, inv_fix, n_samples)

    inv_f = inv_fix.astype(jnp.float32) * jnp.float32(2.0 ** (-FRAC_BITS))
    rate_f = jnp.float32(1 << FRAC_BITS) / inv_fix.astype(jnp.float32)

    G = 32  # gather granularity: whole aligned rows of G samples move ~10x
    # faster than element gathers on TPU (measured 0.4 vs 4.3 ms/block)
    n_chunks = -(-max_pix // chunk)
    w_in = int(np.ceil(chunk * inv_nominal * 1.02)) + taps + 2
    w_rows = -(-(w_in + G - 1) // G) + 1
    w_pad = w_rows * G

    # exact per-chunk base coordinate (int64 on n_chunks elements only)
    c = jnp.arange(n_chunks, dtype=jnp.int64)
    base = phase_fix + (c * chunk) * inv_fix
    start = (base >> FRAC_BITS).astype(jnp.int32)  # floor; may be -1 at block start
    frac = (base - (start.astype(jnp.int64) << FRAC_BITS)).astype(jnp.float32) * jnp.float32(
        2.0 ** (-FRAC_BITS)
    )

    # G-aligned row gather: one padded window per chunk; the sub-row
    # misalignment folds into the f32 position ramp
    n_rows = -(-(x_ext.shape[0] + w_pad) // G)
    x2 = jnp.concatenate(
        [x_ext, jnp.zeros((n_rows * G - x_ext.shape[0],), x_ext.dtype)]
    ).reshape(n_rows, G)
    target = start + taps
    row0 = jnp.clip(target // G, 0, n_rows - w_rows)
    win = x2[row0[:, None] + jnp.arange(w_rows, dtype=jnp.int32)[None, :], :].reshape(
        n_chunks, w_pad
    )
    misalign = (target - row0 * G).astype(jnp.float32)

    # f32 per-pixel positions relative to the (aligned) window start sample
    r = jnp.arange(chunk, dtype=jnp.float32)
    pos = (frac + misalign)[:, None] + r[None, :] * inv_f  # (n_chunks, chunk)
    j = jnp.arange(w_pad, dtype=jnp.float32)
    lo = jnp.maximum(pos[:, :, None], j[None, None, :])
    hi = jnp.minimum(pos[:, :, None] + inv_f, j[None, None, :] + 1.0)
    w = jnp.maximum(hi - lo, 0.0)
    out = jnp.einsum("cpw,cw->cp", w, win) * rate_f

    pixels = out.reshape(n_chunks * chunk)[:max_pix]
    valid = jnp.arange(max_pix, dtype=jnp.int32) < n_out
    return jnp.where(valid, pixels, 0.0).astype(jnp.float32), n_out, new_phase


def box_resample_gather_i32(
    x_ext,
    phase_fix,
    inv_fix,
    *,
    n_samples: int,
    max_pix: int,
    taps: int,
    inv_nominal: float,
    chunk: int = 256,
):
    """Gather-form variant: like box_resample_block_chunked but it gathers
    the `taps` samples each pixel touches with int32 indices (per-pixel
    coordinates from the chunked f32 decomposition, so no per-pixel int64).

    Measured on TPU v5e this LOSES to the dense windowed form (14.6 vs 4.5
    ms per 524k-sample block at taps=2): XLA's generic gather moves ~1
    element/cycle, while the dense overlap-weight reduce rides the VPU. Kept
    as the memory-lean option for very large downsampling factors (dense
    window cost grows with chunk*inv) and as the measurement record. Same
    contract and carries."""
    n_out, new_phase = resample_counts(phase_fix, inv_fix, n_samples)

    inv_f = inv_fix.astype(jnp.float32) * jnp.float32(2.0 ** (-FRAC_BITS))
    rate_f = jnp.float32(1 << FRAC_BITS) / inv_fix.astype(jnp.float32)

    n_chunks = -(-max_pix // chunk)
    c = jnp.arange(n_chunks, dtype=jnp.int64)
    base = phase_fix + (c * chunk) * inv_fix
    start = (base >> FRAC_BITS).astype(jnp.int32)
    frac = (base - (start.astype(jnp.int64) << FRAC_BITS)).astype(jnp.float32) * jnp.float32(
        2.0 ** (-FRAC_BITS)
    )

    r = jnp.arange(chunk, dtype=jnp.float32)
    pos = frac[:, None] + r[None, :] * inv_f  # (n_chunks, chunk) relative to start
    i_loc = jnp.floor(pos).astype(jnp.int32)
    # global sample index of each pixel's first tap, offset into x_ext
    idx0 = start[:, None] + i_loc + taps
    sub = pos - i_loc.astype(jnp.float32)  # in [0, 1)

    acc = jnp.zeros((n_chunks, chunk), jnp.float32)
    limit = x_ext.shape[0] - 1
    for t in range(taps):
        # overlap of [pos, pos+inv) with sample [i0+t, i0+t+1), in sample units
        lo = jnp.maximum(sub, jnp.float32(t))
        hi = jnp.minimum(sub + inv_f, jnp.float32(t + 1))
        w = jnp.maximum(hi - lo, 0.0)
        g = jnp.take(x_ext, jnp.clip(idx0 + t, 0, limit))
        acc = acc + w * g
    out = (acc * rate_f).reshape(n_chunks * chunk)[:max_pix]
    valid = jnp.arange(max_pix, dtype=jnp.int32) < n_out
    return jnp.where(valid, out, 0.0).astype(jnp.float32), n_out, new_phase


def plan_strided(inv_nominal: float, taps: int, *, L: int | None = None,
                 pll_frac: float | None = None, max_drift: float = 6.0):
    """Feasibility plan for box_resample_strided.

    The strided form needs m pixels to advance ~exactly one sample
    (m = round(1/inv), |m*inv - 1| small) so sample indices become
    q + {0..taps_eff} with *static* shifts. taps_eff absorbs both the
    nominal drift over a chunk of L q-steps and PLL rate excursions up to
    pll_frac (relative refresh-rate error). L is chosen as large as the
    drift budget allows — longer chunks mean fewer window rows to
    extract, which dominates the cost on TPU.

    Returns (m, taps_eff, L) or None if the geometry doesn't fit (then use
    the dense chunked form).
    """
    if pll_frac is None:
        from ..config import PLL_HEADROOM_FRAC

        pll_frac = PLL_HEADROOM_FRAC  # framerate_pll clamps delta to this
    if inv_nominal <= 0 or inv_nominal > 1.0:
        return None  # downsampling: dense form
    m = max(int(round(1.0 / inv_nominal)), 1)
    delta = m * inv_nominal - 1.0
    delta_cap = abs(delta) + m * inv_nominal * pll_frac
    if L is None:
        L = int(min(max(max_drift / max(delta_cap, 1e-9), 256), 8192))
        L = 1 << (L.bit_length() - 1)  # floor pow2
    drift = L * delta_cap
    if drift > max_drift or L < 256:
        return None
    margin = int(np.ceil(drift))  # drift can be negative (PLL below nominal)
    taps_eff = taps + 1 + 2 * margin
    return m, taps_eff, L, margin


def box_resample_strided(
    x_ext,
    phase_fix,
    inv_fix,
    *,
    n_samples: int,
    max_pix: int,
    taps: int,
    inv_nominal: float,
    L: int | None = None,
    G: int = 8,
):
    """Fastest path for near-rational upsampling (the reference's standard
    2x horizontal oversampling, pixelrate ~= 2*samplerate).

    Decompose the pixel index p = (c*L + q)*m + b (m = pixels per sample
    ~= round(1/inv)). Then pixel (c,q,b)'s window start lies within a small
    static tap range of sample q *relative to the chunk's window*, because
    m*inv ~= 1 — so the per-pixel "gather" degenerates to taps_eff STATIC
    shifted slices of one G-aligned row-gathered window per chunk, with
    exact overlap weights computed from the f32 residual ramp. The final
    (q, b) -> pixel-order interleave rides the MXU as a matmul against a
    static 0/1 permutation (Precision.HIGHEST — the TPU's default matmul
    rounds inputs to bf16). Same exact int64 carries as the other forms.

    G sets the row-gather granularity: the weight loop runs taps_eff + G
    iterations (the + G absorbs the row misalignment), so G trades loop
    compute against gather efficiency — see bench/PROFILE.json for the
    measured sweep at the flagship geometry.
    """
    plan = plan_strided(inv_nominal, taps, L=L)
    if plan is None:
        raise ValueError("geometry unsuitable for the strided form; use chunked")
    n_out, new_phase = resample_counts(phase_fix, inv_fix, n_samples)
    pixels = _strided_pixels(
        x_ext, phase_fix, inv_fix, n_out, plan=plan, max_pix=max_pix,
        taps=taps, G=G,
    )
    return pixels, n_out, new_phase


def _strided_pixels(x_ext, phase_fix, inv_fix, n_valid, *, plan, max_pix: int,
                    taps: int, G: int):
    """Shared core of the strided forms: pixels for a window-start phase
    `phase_fix` (int64 fixed point, relative to x_ext's first post-tail
    sample), masked past `n_valid`. See box_resample_strided for the
    decomposition; box_resample_range_strided reuses it with a shifted
    phase for an arbitrary global pixel range."""
    from jax import lax as _lax

    m, taps_eff, L, margin = plan
    inv_f = inv_fix.astype(jnp.float32) * jnp.float32(2.0 ** (-FRAC_BITS))
    rate_f = jnp.float32(1 << FRAC_BITS) / inv_fix.astype(jnp.float32)
    # drift per q from the exact fixed-point difference (f32-ing m*inv-1
    # directly would put the rounding error on 1.0 instead of the tiny drift)
    delta_f = (m * inv_fix - (jnp.int64(1) << FRAC_BITS)).astype(jnp.float32) * jnp.float32(
        2.0 ** (-FRAC_BITS)
    )

    pix_per_chunk = m * L
    n_chunks = -(-max_pix // pix_per_chunk)
    w = L + taps_eff + 2
    w_rows = -(-(w + G - 1) // G) + 1
    w_pad = w_rows * G
    # left pad of `margin` lets the anchor window start below the chunk base
    # (negative PLL drift) without clipping
    x_pad = jnp.concatenate(
        [jnp.zeros((margin,), x_ext.dtype), x_ext, jnp.zeros((w_pad,), x_ext.dtype)]
    )

    c = jnp.arange(n_chunks, dtype=jnp.int64)
    base = phase_fix + (c * pix_per_chunk) * inv_fix
    start = (base >> FRAC_BITS).astype(jnp.int32)
    frac = (base - (start.astype(jnp.int64) << FRAC_BITS)).astype(jnp.float32) * jnp.float32(
        2.0 ** (-FRAC_BITS)
    ) + jnp.float32(margin)
    # absolute sample s lives at x_pad[s + taps + margin]; the window anchors
    # at absolute (start - margin) -> index start + taps
    n_rows = -(-x_pad.shape[0] // G)
    x2 = jnp.concatenate(
        [x_pad, jnp.zeros((n_rows * G - x_pad.shape[0],), x_pad.dtype)]
    ).reshape(n_rows, G)
    target = jnp.clip(start + taps, 0, x_pad.shape[0] - w)
    frac = frac + (start + taps - target).astype(jnp.float32)
    row0 = jnp.clip(target // G, 0, n_rows - w_rows)
    win = x2[row0[:, None] + jnp.arange(w_rows, dtype=jnp.int32)[None, :], :].reshape(
        n_chunks, w_pad
    )
    misalign = (target - row0 * G).astype(jnp.float32)

    q = jnp.arange(L, dtype=jnp.float32)
    b = jnp.arange(m, dtype=jnp.float32)
    # rel(c, b, q): pixel window start relative to (aligned) window sample q
    rel = (frac + misalign)[:, None, None] + b[None, :, None] * inv_f + q[None, None, :] * delta_f
    acc = jnp.zeros((n_chunks, m, L), jnp.float32)
    for t in range(taps_eff + G):  # + G absorbs the row misalignment
        tf = jnp.float32(t)
        lo = jnp.maximum(rel, tf)
        hi = jnp.minimum(rel + inv_f, tf + 1.0)
        wt = jnp.maximum(hi - lo, 0.0)
        acc = acc + wt * win[:, t : t + L][:, None, :]

    # (c, b, q) -> pixel order p = c*L*m + q*m + b, interleaved in T-tiles on
    # the MXU (a direct transpose of the minor dims is a slow relayout)
    if m == 2 and L % _ILV_T == 0:
        A = acc[:, 0, :].reshape(-1, _ILV_T)
        B = acc[:, 1, :].reshape(-1, _ILV_T)
        inter = jnp.dot(
            jnp.concatenate([A, B], axis=1),
            jnp.asarray(_interleave_matrix()),
            preferred_element_type=jnp.float32,
            precision=_lax.Precision.HIGHEST,
        )
        pixels = inter.reshape(-1)[:max_pix] * rate_f
    else:
        pixels = jnp.transpose(acc, (0, 2, 1)).reshape(-1)[:max_pix] * rate_f
    valid = jnp.arange(max_pix, dtype=jnp.int32) < n_valid
    return jnp.where(valid, pixels, 0.0).astype(jnp.float32)


def box_resample_range_strided(
    x_local,
    phase_fix,
    inv_fix,
    p_start,
    p_end,
    seg_offset,
    *,
    max_pix: int,
    taps: int,
    inv_nominal: float,
    L: int | None = None,
    G: int = 8,
):
    """Strided form of box_resample_range — the fast resampler for the
    time-sharded body (round-4 VERDICT missing #3: the sharded step used
    only the chunked form, leaving per-chip sharded throughput well below
    the single-chip strided step).

    Same contract as box_resample_range (shard-local samples with taps
    halos, global pixel range [p_start, p_end), seg_offset = global sample
    index of the segment start). Pixel p's window start relative to the
    local segment is phase + p*inv - (seg_offset << FRAC_BITS) — exactly
    the single-range strided problem with a shifted base phase, so the
    whole decomposition (static shifted slices of G-aligned row-gathered
    windows, MXU interleave) applies per shard unchanged. Chunks here are
    aligned to p_start rather than the global pixel grid, so per-pixel f32
    residuals can round differently from the single-chip strided form at
    the ~1e-5-sample level (same class of difference as the chunked range
    form; virtual-mesh equivalence is asserted at 1e-5 tolerance in
    tests/test_parallel.py).
    """
    plan = plan_strided(inv_nominal, taps, L=L)
    if plan is None:
        raise ValueError("geometry unsuitable for the strided form; use chunked")
    eff_phase = (
        phase_fix
        + p_start.astype(jnp.int64) * inv_fix
        - (seg_offset.astype(jnp.int64) << FRAC_BITS)
    )
    n_local = jnp.maximum(p_end - p_start, 0).astype(jnp.int32)
    return _strided_pixels(
        x_local, eff_phase, inv_fix, n_local, plan=plan, max_pix=max_pix,
        taps=taps, G=G,
    )


_ILV_T = 128


@functools.lru_cache(None)
def _interleave_matrix():
    # numpy constant only (a jnp array cached from inside a trace leaks)
    p = np.zeros((2 * _ILV_T, 2 * _ILV_T), np.float32)
    for j in range(_ILV_T):
        p[j, 2 * j] = 1.0
        p[_ILV_T + j, 2 * j + 1] = 1.0
    return p


def box_resample_range(
    x_local,
    phase_fix,
    inv_fix,
    p_start,
    p_end,
    seg_offset,
    *,
    max_pix: int,
    taps: int,
    inv_nominal: float,
):
    """Area-weighted resample of an arbitrary global pixel range — the
    time-sharded building block (BASELINE.json config 4).

    x_local: f32[taps + seg + taps] — a shard's sample segment with left and
        right halo of `taps` samples (exchanged via ppermute by the caller).
    p_start/p_end: global pixel indices this shard produces (pixel p is owned
        by the shard whose segment contains floor(a_p)).
    seg_offset: global sample index of x_local's segment start (the left halo
        sits at seg_offset - taps).

    Returns pixels f32[max_pix] (entries past p_end - p_start are zero).
    Uses the same chunked f32/int32 + G-aligned row-gather structure as
    box_resample_block_chunked (element gathers and per-pixel int64 are the
    measured TPU killers), with the traced p_start folded into the exact
    per-chunk int64 base.
    """
    inv_f = inv_fix.astype(jnp.float32) * jnp.float32(2.0 ** (-FRAC_BITS))
    rate_f = jnp.float32(1 << FRAC_BITS) / inv_fix.astype(jnp.float32)

    chunk = 128
    G = 32
    n_chunks = -(-max_pix // chunk)
    w_in = int(np.ceil(chunk * inv_nominal * 1.02)) + taps + 2
    w_rows = -(-(w_in + G - 1) // G) + 1
    w_pad = w_rows * G

    c = jnp.arange(n_chunks, dtype=jnp.int64)
    base = phase_fix + (p_start.astype(jnp.int64) + c * chunk) * inv_fix
    start = (base >> FRAC_BITS).astype(jnp.int32)
    frac = (base - (start.astype(jnp.int64) << FRAC_BITS)).astype(jnp.float32) * jnp.float32(
        2.0 ** (-FRAC_BITS)
    )

    loc = start + (taps - seg_offset)  # window start within x_local
    n_rows = -(-(x_local.shape[0] + w_pad) // G)
    x2 = jnp.concatenate(
        [x_local, jnp.zeros((n_rows * G - x_local.shape[0],), x_local.dtype)]
    ).reshape(n_rows, G)
    row0 = jnp.clip(loc // G, 0, n_rows - w_rows)
    win = x2[row0[:, None] + jnp.arange(w_rows, dtype=jnp.int32)[None, :], :].reshape(
        n_chunks, w_pad
    )
    misalign = (loc - row0 * G).astype(jnp.float32)

    r = jnp.arange(chunk, dtype=jnp.float32)
    pos = (frac + misalign)[:, None] + r[None, :] * inv_f
    j = jnp.arange(w_pad, dtype=jnp.float32)
    lo = jnp.maximum(pos[:, :, None], j[None, None, :])
    hi = jnp.minimum(pos[:, :, None] + inv_f, j[None, None, :] + 1.0)
    w = jnp.maximum(hi - lo, 0.0)
    out = jnp.einsum("cpw,cw->cp", w, win) * rate_f

    pixels = out.reshape(n_chunks * chunk)[:max_pix]
    n_local = (p_end - p_start).astype(jnp.int32)
    valid = jnp.arange(max_pix, dtype=jnp.int32) < n_local
    return jnp.where(valid, pixels, 0.0).astype(jnp.float32)


def nn_resample_block(x, phase_fix, inv_fix, *, n_samples: int, max_pix: int):
    """Nearest-neighbour mode (dsp.c:274-277): out[p] = x[(size*p)//n_out].

    The integer division by the traced n_out is computed as a float
    approximation plus exact int64 correction (int64 multiply is cheap on
    TPU, int64 divide per element is not).

    Returns (pixels f32[max_pix], n_out int32, new_phase_fix int64).
    """
    n_out, new_phase = resample_counts(phase_fix, inv_fix, n_samples)
    n_out64 = n_out.astype(jnp.int64)

    p = jnp.arange(max_pix, dtype=jnp.int64)
    num = jnp.int64(n_samples) * p
    ratio = jnp.float32(n_samples) / jnp.maximum(n_out, 1).astype(jnp.float32)
    q = (p.astype(jnp.float32) * ratio).astype(jnp.int64)
    # exact floor-correction: want largest q with q*n_out <= num
    q = jnp.where(q * n_out64 > num, q - 1, q)
    q = jnp.where((q + 1) * n_out64 <= num, q + 1, q)
    q = jnp.where(q * n_out64 > num, q - 1, q)  # second pass for safety

    valid = p < n_out64
    idx = jnp.clip(q, 0, n_samples - 1).astype(jnp.int32)
    pixels = jnp.where(valid, jnp.take(x, idx), 0.0).astype(jnp.float32)
    return pixels, n_out, new_phase


def nn_resample_range(x_full, n_out, p_start, p_end, *, n_samples: int,
                      max_pix: int):
    """Nearest-neighbour resample of a global pixel range — the time-sharded
    NN mode (dsp.c:274-277 under SURVEY §5.7 sharding).

    NN's per-block mapping out[p] = x[(size*p)//n_out] is GLOBAL in both p
    and x (it ignores the fractional phase, so the sample index can deviate
    from the box window's floor(a_p) by more than the halo width) — the
    caller passes the full gathered envelope `x_full` (the autocorr feed
    already all_gathers it) and this shard's pixel range. Same float-
    approximation + exact int64 floor-correction as nn_resample_block.

    Returns pixels f32[max_pix], entries past p_end - p_start zero.
    """
    n_out64 = jnp.maximum(n_out, 1).astype(jnp.int64)
    p = p_start.astype(jnp.int64) + jnp.arange(max_pix, dtype=jnp.int64)
    num = jnp.int64(n_samples) * p
    ratio = jnp.float32(n_samples) / jnp.maximum(n_out, 1).astype(jnp.float32)
    q = (p.astype(jnp.float32) * ratio).astype(jnp.int64)
    q = jnp.where(q * n_out64 > num, q - 1, q)
    q = jnp.where((q + 1) * n_out64 <= num, q + 1, q)
    q = jnp.where(q * n_out64 > num, q - 1, q)  # second pass for safety

    n_local = jnp.maximum(p_end - p_start, 0).astype(jnp.int32)
    valid = jnp.arange(max_pix, dtype=jnp.int32) < n_local
    idx = jnp.clip(q, 0, n_samples - 1).astype(jnp.int32)
    pixels = jnp.where(valid, jnp.take(x_full, idx), 0.0).astype(jnp.float32)
    return pixels
