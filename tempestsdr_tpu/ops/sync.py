"""Blanking-strip sync detection and the frame-rate PLL.

Mirrors TempestSDR/src/syncdetector.c:
  - find_best_fit <- findbestfit (:26-58): slide a circular strip of width s
    over a collapsed 1-D profile maximizing
    ((total-strip)/(n-s) - strip/s)^2. The reference's O(n) rolling-sum scan
    becomes one cumsum + vectorized window sums. Its candidate bookkeeping
    stores index i for the window starting at i+1 (:46-56) — an off-by-one we
    reproduce bit-for-bit so detected positions match.
  - find_the_sweet_spot <- findthesweetspot (:71-119): Gaussian-blur the
    profile, try strip sizes {curr, curr+-4, curr*2, curr/2} (:90-93), keep
    the best (sequential strict-> tie-breaking == first-wins argmax), then
    IIR-smooth the strip centre with wraparound and derive a wrap-corrected
    velocity (:101-118).
  - framerate_pll <- frameratepll (:133-153): avg = 0.99*avg + 0.01*vx,
    locked iff |avg| < 0.5, nudge refreshrate by vx*1e-5 (unlocked) or
    avg*1e-6 (locked). The nudge lands on a traced f32 *delta* against the
    static nominal refresh rate — steps are ~1e-6 of 60 Hz, far below f32
    resolution at 60.0 but well above it at 0.0.

All profile math follows the PROFILE's dtype: f64 by default (the reference
uses double — exact near-tie parity), f32 under Params.fast_sync (the
search is the dominant, emulated-f64-bound emit cost on TPU, ROOFLINE.md;
f32 changes only floating-point near-ties between candidate strips).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

FRAMERATE_DX_LOWPASS_COEFF_HEIGHT = 0.1  # syncdetector.c:15
FRAMERATE_DX_LOWPASS_COEFF_WIDTH = 0.9  # syncdetector.c:16
FRAMERATE_PLL_SPEED_HI = 1e-5  # syncdetector.c:18
FRAMERATE_PLL_SPEED_LO = 1e-6  # syncdetector.c:19
FRAMERATE_PLL_LOCKED_VALUE = 0.5  # syncdetector.c:20


class SweetspotState(NamedTuple):
    """Per-axis detector carry (syncdetector.h sweetspot_data_t)."""

    stripsize: jnp.ndarray  # i32 — adaptive strip width
    dx: jnp.ndarray  # i32 — IIR-smoothed strip-centre position
    vx: jnp.ndarray  # i32 — wrap-corrected velocity of dx

    @staticmethod
    def init() -> "SweetspotState":
        # distinct buffers — donated jit args must not alias
        return SweetspotState(jnp.int32(0), jnp.int32(0), jnp.int32(0))


class PLLState(NamedTuple):
    """Frame-rate PLL carry (syncdetector.h syncdetector_t)."""

    avg_speed: jnp.ndarray  # f64
    locked: jnp.ndarray  # bool
    refresh_delta: jnp.ndarray  # f32 — offset vs nominal refreshrate

    @staticmethod
    def init() -> "PLLState":
        return PLLState(jnp.float64(0.0), jnp.asarray(False), jnp.float32(0.0))


def _circular_window_sums(data: jnp.ndarray, stripsize) -> jnp.ndarray:
    """w[i] = sum of data[(i + k) % n] for k < stripsize, all i. f64.

    csum[i+s] over i in [0,n) is the CONTIGUOUS run csum[s:s+n]: a traced-
    start `dynamic_slice`, not a gather — element gathers are a measured TPU
    performance killer (CLAUDE.md), and f64 gathers doubly so.
    """
    n = data.shape[0]
    csum = jnp.concatenate(
        [jnp.zeros((1,), data.dtype), jnp.cumsum(jnp.concatenate([data, data]))]
    )
    hi = lax.dynamic_slice(csum, (jnp.asarray(stripsize, jnp.int32),), (n,))
    return hi - csum[:n]


def find_best_fit(data: jnp.ndarray, totalsum, stripsize):
    """Best circular strip of width `stripsize` (syncdetector.c:26-58).

    Returns (bestfit f64, bestid i32) with the reference's id-lags-window-
    by-one quirk: the winning window start j maps to id max(j-1, 0).
    """
    n = data.shape[0]
    dt = data.dtype
    s = jnp.asarray(stripsize, dt)
    w = _circular_window_sums(data, stripsize)
    m = (totalsum - w) / (jnp.asarray(n, dt) - s) - w / s
    m = m * m
    j = jnp.argmax(m).astype(jnp.int32)
    # max(m) == m[argmax(m)] bit-for-bit (no NaNs: m is squared finite f64)
    # without the dynamic-index gather — element gathers are TPU poison
    return jnp.max(m), jnp.maximum(j - 1, 0)


def _candidate_sizes(state: SweetspotState, n: int, minsize: int):
    """The reference's strip-size probe set {curr, curr±4, curr/2, curr*2}
    in probe order (syncdetector.c:88-93): (safe sizes i32[5], valid bool[5]),
    invalid slots replaced by the always-valid base size."""
    minsize = max(int(minsize), 1)
    size2 = n >> 1
    curr = jnp.clip(state.stripsize, minsize, size2)
    cand = jnp.stack(
        [curr, curr - 4, curr + 4, curr >> 1, curr << 1]
    ).astype(jnp.int32)
    valid = (cand >= minsize) & (cand < size2) & (cand != curr)
    valid = valid.at[0].set(True)  # base size always evaluated
    safe = jnp.where(valid, cand, curr)
    return safe, valid


def _iir_track(state: SweetspotState, beststripsize, beststripstart, n: int,
               lowpasscoeff: float, dt=jnp.float64) -> SweetspotState:
    """IIR strip-centre tracking with wraparound + wrap-corrected velocity
    (syncdetector.c:101-118). dt: float dtype of the smoothing arithmetic —
    f64 matches the reference's double math; f32 (fast_sync) is exact for
    the < 2^24 position magnitudes except round-half near-ties."""
    h2 = n // 2
    dxnl = (beststripstart + beststripsize // 2) % n
    rawdiff = dxnl - state.dx
    dx0 = jnp.where(rawdiff > h2, state.dx + n, state.dx)
    dxnl = jnp.where(rawdiff < -h2, dxnl + n, dxnl)
    lastx = dx0
    c = jnp.asarray(lowpasscoeff, dt)
    dx1 = (
        jnp.round(dxnl.astype(dt) * c + (jnp.asarray(1.0, dt) - c) * dx0.astype(dt))
        .astype(jnp.int64) % n
    ).astype(jnp.int32)
    rawvx = dx1 - lastx
    vx = jnp.where(
        rawvx > h2, n - rawvx, jnp.where(rawvx < -h2, -n - rawvx, rawvx)
    ).astype(jnp.int32)
    return SweetspotState(beststripsize, dx1, vx)


def find_the_sweet_spot(
    state: SweetspotState, data: jnp.ndarray, minsize: int, lowpasscoeff: float
):
    """One detection round on a collapsed profile (syncdetector.c:71-119).

    data: f64[n] profile (will be Gaussian-blurred here).
    minsize: static minimum strip size (width*0.05 / height*0.01 at call site).
    Returns (state', blurred_profile, strip_start i32) — strip_start for the
    debug markers (:98-99).
    """
    from .gaussian import gaussian_blur_circular

    n = data.shape[0]
    data = gaussian_blur_circular(data)
    totalsum = jnp.sum(data)
    safe, valid = _candidate_sizes(state, n, minsize)

    # all 5 candidate sizes share ONE doubled cumsum; each candidate's window
    # sums are csum[s:s+n] - csum[:n], i.e. a traced-start dynamic_slice per
    # candidate (contiguous, cheap). The earlier (5, n) f64 *gather* form
    # measured ~10x slower than even 5 sequential find_best_fit calls
    # (bench/REGRESS_PROFILE.json post:frame A/B) — element gathers are TPU
    # poison. Same math as find_best_fit, kept above for oracle tests.
    dt = data.dtype
    csum = jnp.concatenate(
        [jnp.zeros((1,), dt), jnp.cumsum(jnp.concatenate([data, data]))]
    )
    lo = csum[:n]
    w = (
        jnp.stack(
            [lax.dynamic_slice(csum, (safe[k],), (n,)) for k in range(5)]
        )
        - lo[None, :]
    )
    s = safe.astype(dt)[:, None]
    m = (totalsum - w) / (jnp.asarray(n, dt) - s) - w / s
    m = m * m
    j = jnp.argmax(m, axis=1).astype(jnp.int32)  # per-candidate best window
    # per-candidate best fit = row max (== m[j] bit-for-bit, gather-free)
    fits = jnp.where(valid, jnp.max(m, axis=1), -jnp.inf)
    ids = jnp.maximum(j - 1, 0)  # the reference's id-off-by-one (:46-56)
    win = jnp.argmax(fits)  # first-wins == sequential strict->
    beststripstart = ids[win]
    beststripsize = safe[win]

    state = _iir_track(state, beststripsize, beststripstart, n, lowpasscoeff,
                       dt=dt)
    return state, data, beststripstart


def find_the_sweet_spot_pair(
    state_x: SweetspotState, data_x: jnp.ndarray, minsize_x: int, coeff_x: float,
    state_y: SweetspotState, data_y: jnp.ndarray, minsize_y: int, coeff_y: float,
):
    """Both axes' detection rounds (syncdetector.c:176-186 calls
    findthesweetspot twice per frame) fused into one batched search.

    MEASURED NEGATIVE RESULT on the real TPU runtime — kept as the A/B
    variant and for CPU-bound embedders, NOT used by the production step.
    The fusion halves the kernel count (ONE doubled cumsum over a
    zero-padded (2, 2L) matrix, ten batched window slices, one shared
    metric + masked argmax over (10, L)), and wins ~25 % on CPU; but the
    padding to the longer axis grows the emulated-f64 cumsum/metric work,
    and on TPU that loses to the launch savings: +23 % on the isolated
    search (249.1 vs 202.7 us/frame) and +18 % on the full post body
    (253.9 vs 215.4), one-session A/B in bench/ROUND5_PROBE.json. The
    kernel-count hypothesis failed the same way the batched cond_mode did
    (pipeline.py make_channels_step_hybrid notes).

    Numerics: identical candidate math to find_the_sweet_spot; the only
    potential divergence is f64 summation-tree rounding inside the batched
    cumsum when the rows are padded (n < L), which can flip a strict
    near-tie between windows — the same caveat as the cumsum-vs-rolling-sum
    restructure itself (module docstring). All oracle and order-matrix
    parity tests pass bit-exact.

    Returns (state_x', state_y', (blur_x, blur_y), (start_x, start_y)).
    """
    from .gaussian import gaussian_blur_circular

    nx, ny = data_x.shape[0], data_y.shape[0]
    L = max(nx, ny)
    bx = gaussian_blur_circular(data_x)
    by = gaussian_blur_circular(data_y)
    tx, ty = jnp.sum(bx), jnp.sum(by)
    safe_x, valid_x = _candidate_sizes(state_x, nx, minsize_x)
    safe_y, valid_y = _candidate_sizes(state_y, ny, minsize_y)

    rows = jnp.zeros((2, 2 * L), jnp.float64)
    rows = rows.at[0, : 2 * nx].set(jnp.concatenate([bx, bx]))
    rows = rows.at[1, : 2 * ny].set(jnp.concatenate([by, by]))
    csum = jnp.concatenate(
        [jnp.zeros((2, 1), jnp.float64), jnp.cumsum(rows, axis=1)], axis=1
    )
    # candidate strip sizes are < n/2 <= L, so every length-L slice below
    # stays in bounds; columns past each row's n are garbage and masked out
    hi = jnp.stack(
        [lax.dynamic_slice(csum[0], (safe_x[k],), (L,)) for k in range(5)]
        + [lax.dynamic_slice(csum[1], (safe_y[k],), (L,)) for k in range(5)]
    )
    w = hi - jnp.repeat(csum[:, :L], 5, axis=0)
    s = jnp.concatenate([safe_x, safe_y]).astype(jnp.float64)[:, None]
    n_row = jnp.concatenate(
        [jnp.full((5,), float(nx), jnp.float64), jnp.full((5,), float(ny), jnp.float64)]
    )[:, None]
    t_row = jnp.concatenate(
        [jnp.broadcast_to(tx, (5,)), jnp.broadcast_to(ty, (5,))]
    )[:, None]
    m = (t_row - w) / (n_row - s) - w / s
    m = m * m
    col_ok = jnp.arange(L)[None, :] < n_row  # mask the padded columns
    m = jnp.where(col_ok, m, -jnp.inf)
    j = jnp.argmax(m, axis=1).astype(jnp.int32)
    fits = jnp.where(
        jnp.concatenate([valid_x, valid_y]), jnp.max(m, axis=1), -jnp.inf
    )
    ids = jnp.maximum(j - 1, 0)  # the reference's id-off-by-one (:46-56)
    win_x = jnp.argmax(fits[:5])  # first-wins == sequential strict->
    win_y = jnp.argmax(fits[5:])
    sx = _iir_track(state_x, safe_x[win_x], ids[win_x], nx, coeff_x)
    sy = _iir_track(state_y, safe_y[win_y], ids[5 + win_y], ny, coeff_y)
    return sx, sy, (bx, by), (ids[win_x], ids[5 + win_y])


def framerate_pll(
    pll: PLLState, vx, *, enabled: bool, max_delta: float | None = None
) -> PLLState:
    """PLL update from the horizontal-axis velocity (syncdetector.c:133-153).

    max_delta: static clamp on |refresh_delta| (Hz). The reference re-derives
    geometry on every nudge (set_internal_samplerate); here every resampler
    buffer is statically sized for a bounded excursion
    (config.PLL_HEADROOM_FRAC), so an unlocked walk tracking a mis-specified
    refresh rate must saturate rather than silently overrun the static
    n_out/taps budgets. A saturated PLL means the nominal rate is wrong —
    restart with a corrected config (the auto-resolution path does)."""
    avg = pll.avg_speed * 0.99 + 0.01 * vx.astype(jnp.float64)
    locked = (avg < FRAMERATE_PLL_LOCKED_VALUE) & (avg > -FRAMERATE_PLL_LOCKED_VALUE)
    if not enabled:
        return PLLState(avg, locked, pll.refresh_delta)
    diff = jnp.where(
        locked, avg * FRAMERATE_PLL_SPEED_LO, vx.astype(jnp.float64) * FRAMERATE_PLL_SPEED_HI
    )
    diff = jnp.where(vx == 0, 0.0, diff)
    delta = pll.refresh_delta - diff.astype(jnp.float32)
    if max_delta is not None:
        lim = jnp.float32(max_delta)
        delta = jnp.clip(delta, -lim, lim)
    return PLLState(avg, locked, delta)
