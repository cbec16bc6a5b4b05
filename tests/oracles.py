"""Sequential numpy oracles implementing the reference C library's exact
semantics (double-precision scalar loops), used as golden references for the
vectorized TPU ops. Each function documents the C source it models
(paths relative to /root/reference). These are *reimplementations of the
math*, kept intentionally scalar/naive — the JAX ops must match them."""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------- resampler
def resample_linear(x, offset, contrib, rate):
    """TempestSDR/src/dsp.c:256-307 (linear/area mode).

    x: float array (one block of envelope samples)
    offset: carried fractional phase (sample units, <= 0)
    contrib: carried partial-pixel integral
    rate: pixels per sample (upsample_by/downsample_by)
    Returns (out, new_offset, new_contrib).
    """
    size = len(x)
    n_out = int((size - offset) * rate)
    out = np.zeros(n_out + 8, dtype=np.float64)
    offset_sample = -offset * rate
    pid = 0
    outi = 0
    for i in range(size):
        idcheck = i * rate + offset_sample
        idcheck3 = idcheck + rate
        idcheck2 = idcheck3 - 1.0
        val = float(x[i])
        if pid < idcheck and pid < idcheck2:
            out[outi] = contrib + val * (1.0 - idcheck + pid)
            outi += 1
            contrib = 0.0
            pid += 1
        while pid < idcheck2:
            out[outi] = val
            outi += 1
            pid += 1
        if pid < idcheck3 and pid > idcheck:
            contrib += (idcheck3 - pid) * val
        else:
            contrib += rate * val
    offset += n_out / rate - size
    # NOTE: when a pixel boundary lands exactly on the block end (e.g. rate
    # exactly 2.0), the C loop leaves the final pixel in `contrib` and never
    # emits it, yet still reports n_out elements — pushing one uninitialized
    # pixel downstream (dsp.c:262,288-303). outi < n_out flags that case; the
    # TPU implementation emits the correct integral instead.
    return out[:n_out], offset, contrib, outi


def resample_nn(x, offset, rate):
    """dsp.c:274-277 nearest-neighbour mode + offset update (:306)."""
    size = len(x)
    n_out = int((size - offset) * rate)
    ids = (size * np.arange(n_out, dtype=np.int64)) // n_out
    out = np.asarray(x, np.float64)[ids]
    offset += n_out / rate - size
    return out, offset


# ------------------------------------------------------------ gaussian blur
def gaussian_blur(data):
    """TempestSDR/src/gaussian.c — circular 5-tap, alpha=1, N=5."""
    cs = np.array(
        [math.exp(-2.0 * i * i / 25.0) for i in (-2, -1, 0, 1, 2)], np.float64
    )
    cs /= cs.sum()
    n = len(data)
    out = np.zeros(n, np.float64)
    for j in range(n):
        for k, c in zip((-2, -1, 0, 1, 2), cs):
            out[j] += c * data[(j + k) % n]
    return out


# ------------------------------------------------------------ sync detector
def find_best_fit(data, stripsize):
    """TempestSDR/src/syncdetector.c:26-58, including the candidate-id
    off-by-one (stored id lags the evaluated window start by one)."""
    size = len(data)
    total = float(np.sum(data, dtype=np.float64))
    big = size - stripsize

    def metric(start):
        w = 0.0
        for k in range(stripsize):
            w += data[(start + k) % size]
        v = (total - w) / big - w / stripsize
        return v * v

    bestfit = metric(0)
    bestid = 0
    for i in range(size - 1):
        m = metric(i + 1)
        if m > bestfit:
            bestfit = m
            bestid = i
    return bestfit, bestid


def sweetspot(data, curr_stripsize, dx, minsize, lowpasscoeff):
    """syncdetector.c:71-119 (blur + multi-size probe + IIR dx tracking).

    Returns (new_stripsize, new_dx, vx, blurred)."""
    size = len(data)
    minsize = max(minsize, 1)
    size2 = size >> 1
    curr = min(max(curr_stripsize, minsize), size2)
    data = gaussian_blur(data)

    beststripsize = curr
    bestfit, beststripstart = find_best_fit(data, curr)
    for s in (curr - 4, curr + 4, curr >> 1, curr << 1):
        if s >= minsize and s < size2 and s != curr:
            f, i = find_best_fit(data, s)
            if f > bestfit:
                bestfit, beststripstart, beststripsize = f, i, s

    h2 = size // 2
    dxnl = (beststripstart + beststripsize // 2) % size
    rawdiff = dxnl - dx
    if rawdiff > h2:
        dx += size
    elif rawdiff < -h2:
        dxnl += size
    lastx = dx
    dx = int(round(dxnl * lowpasscoeff + (1.0 - lowpasscoeff) * dx)) % size
    rawvx = dx - lastx
    vx = (size - rawvx) if rawvx > h2 else ((-size - rawvx) if rawvx < -h2 else rawvx)
    return beststripsize, dx, vx, data


# ----------------------------------------------------------------- autogain
def autogain(frame, lastmin, lastmax, norm=0.1):
    """dsp.c:41-94 with PIXEL_SPECIAL_COLOURS_ENABLED semantics."""
    f = np.asarray(frame, np.float32).ravel()
    n = f.size
    mn = mx = float(f[0])
    s = 0.0
    for v in f:
        if v > 250.0 or v < -250.0:
            continue
        if v > mx:
            mx = v
        elif v < mn:
            mn = v
        s += float(v)
    lastmax = (1.0 - norm) * lastmax + norm * mx
    lastmin = (1.0 - norm) * lastmin + norm * mn
    span = 1.0 if lastmax == lastmin else lastmax - lastmin
    mean = s / n
    out = np.where((f > 250.0) | (f < -250.0), f, (f - lastmin) / span)
    d = f.astype(np.float64) - mean
    sum2 = float(np.sum(d * d))
    sum3 = float(np.sum(d))
    stdev = math.sqrt((sum2 - sum3 * sum3 / n) / (n - 1))
    snr = mean / stdev if stdev > 0 else float("inf")
    return out.reshape(frame.shape), lastmin, lastmax, snr


# ------------------------------------------------------------- autocorr/fft
def autocorrelation_magnitude(x):
    """fft.c:49-64: |IFFT(|FFT(x)|)| with pow2 truncation, numpy scaling."""
    n = 1 << (len(x).bit_length() - 1)
    spec = np.fft.fft(np.asarray(x[:n], np.float64))
    return np.abs(np.fft.ifft(np.abs(spec)))
