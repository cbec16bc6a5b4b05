"""Superbandwidth — frequency-hopping spectrum stitching ("superresolution").

Functional re-design of TempestSDR/src/superbandwidth.c (C10): simulate a
receiver with HOPS x the hardware bandwidth by retuning +-samplerate around
the center, recording SUPER_SAMPLES_TO_RECORD frames per hop, aligning each
hop to hop 0 by cross-correlating the derivative of their envelopes, then
concatenating the hop spectra and inverse-transforming the HOPS-wide
spectrum into a time stream at HOPS x the native rate (superbandwidth.c:
121-152). The stitched stream re-enters the normal pipeline as if captured
by a HOPS-x-rate device (TSDRLibrary.c:271-278).

The hop control state machine is host-side (it drives retunes with settle
pauses — superbandwidth.c:179-254); the alignment/stitch math is jitted.
Tuning sequence reproduces the reference: hop i>=1 is recorded after
`shiftfreq((i - HOPS/2) * samplerate)` (:241), i.e. offsets [0, -sr, 0, +sr]
for 4 hops — experimental quality, as the dissertation notes
(acs-dissertation.tex:945).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .config import floor_pow2

SUPER_HOPS_TO_MAKE = 4  # superbandwidth.c:22
SUPER_SAMPLES_TO_RECORD = 10  # frames per hop (:31)
SUPER_SECS_TO_PAUSE = 0.5  # retune settle (:33)


def _abs_diff(iq: jnp.ndarray) -> jnp.ndarray:
    """Derivative of the envelope (complex_to_abs_diff, superbandwidth.c:67-81),
    including the reference's quirk that the first 'previous' value is the
    squared magnitude."""
    mag = jnp.abs(iq)
    prev = jnp.concatenate([(jnp.abs(iq[0]) ** 2)[None], mag[:-1]])
    return (mag - prev).astype(jnp.float32)


def best_alignment(ref_iq: jnp.ndarray, other_iq: jnp.ndarray) -> jnp.ndarray:
    """Lag (complex samples) aligning `other` to `ref` by cross-correlating
    envelope derivatives (superb_bestfit, superbandwidth.c:83-119). The
    reference scans the FULL lag range [0, n) (its loop over `samples`
    complex outputs, :104-117) with a strictly-greater update — i.e.
    first-wins argmax, which jnp.argmax matches."""
    a = jnp.fft.fft(_abs_diff(ref_iq).astype(jnp.complex64))
    b = jnp.fft.fft(_abs_diff(other_iq).astype(jnp.complex64))
    # reference bin product is conj(A)*B (fft.c:80-89), peak lands at the
    # shift applied to `other`; roll(other, -lag) aligns it to ref
    # (superb_ondataready's three-memcpy left rotation, :135-138)
    xc = jnp.abs(jnp.fft.ifft(jnp.conj(a) * b))
    return jnp.argmax(xc).astype(jnp.int32)


@jax.jit
def _stitch_ri(hops_re: jnp.ndarray, hops_im: jnp.ndarray):
    """Real/imag-plane form: complex64 host<->device transfers are not
    implemented on some TPU runtimes (axon), but complex *intermediates*
    inside jit are fine — so the complex view is formed on device."""
    hops = hops_re.astype(jnp.complex64) + 1j * hops_im.astype(jnp.complex64)
    nhops, n = hops.shape
    ref = hops[0]

    def align(h):
        lag = best_alignment(ref, h)
        return jnp.roll(h, -lag)

    aligned = jnp.concatenate([ref[None], jax.vmap(align)(hops[1:])], axis=0)
    spectra = jnp.fft.fft(aligned, axis=1) / n  # reference forward scaling 1/N
    wide = spectra.reshape(nhops * n)
    out = jnp.fft.ifft(wide) * (nhops * n)  # reference inverse: unnormalized
    return out.real.astype(jnp.float32), out.imag.astype(jnp.float32)


def stitch_hops(hops) -> np.ndarray:
    """hops: complex[HOPS, n] (n a power of two), hop 0 the reference.
    Returns complex64[HOPS*n] — the stitched stream at HOPS x rate
    (superb_ondataready, superbandwidth.c:121-152)."""
    hops = np.asarray(hops)
    re, im = _stitch_ri(
        jnp.asarray(hops.real, jnp.float32), jnp.asarray(hops.imag, jnp.float32)
    )
    return (np.asarray(re) + 1j * np.asarray(im)).astype(np.complex64)


class SuperBandwidth:
    """Host-side hop state machine.

    feed(iq, dropped) consumes native-rate complex blocks and occasionally
    returns a stitched HOPS-x-rate block. `retune(offset_hz)` is called
    between hops (shiftfreq equivalent); pass the source's relative tuner.
    """

    def __init__(self, samplerate: float, refreshrate: float,
                 retune: Optional[Callable[[float], None]] = None,
                 hops: int = SUPER_HOPS_TO_MAKE):
        self.samplerate = samplerate
        self.hops = hops
        self.retune = retune or (lambda off: None)
        samples_in_frame = int(samplerate / refreshrate)
        self.samples_to_gather = SUPER_SAMPLES_TO_RECORD * samples_in_frame
        self.n = floor_pow2(self.samples_to_gather)
        self.samples_to_pause = int(SUPER_SECS_TO_PAUSE * samplerate)
        self._bufs = np.zeros((hops, self.samples_to_gather), np.complex64)
        self._hop = 0
        self._gathered = 0
        self._pausing = 0
        self._state = "gather"

    @property
    def output_samplerate(self) -> float:
        return self.hops * self.samplerate

    def reset(self) -> None:
        self._hop = 0
        self._gathered = 0
        self._state = "gather"
        self.retune(0.0)

    def feed(self, iq: np.ndarray, dropped: int = 0) -> Optional[np.ndarray]:
        """iq: complex64[k] at native rate. Returns stitched complex64
        [hops * pow2(gather)] when a full hop cycle completes, else None."""
        if self._state == "pause":
            self._pausing += len(iq)
            if self._pausing > self.samples_to_pause:
                self._pausing = 0
                self._state = "gather"
            return None
        if dropped:
            self._gathered = 0  # only contiguous data per hop (:221)
            return None
        take = min(len(iq), self.samples_to_gather - self._gathered)
        self._bufs[self._hop, self._gathered : self._gathered + take] = iq[:take]
        self._gathered += take
        if self._gathered < self.samples_to_gather:
            return None
        self._gathered = 0
        self._hop += 1
        if self._hop < self.hops:
            self.retune((self._hop - self.hops // 2) * self.samplerate)
            self._state = "pause"
            return None
        # cycle complete
        self._hop = 0
        self.retune(0.0)
        return stitch_hops(self._bufs[:, : self.n])
