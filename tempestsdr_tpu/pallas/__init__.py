"""Pallas TPU kernels for the hot per-sample ops (SURVEY.md §7.5).

Only correctness-equivalent accelerations of the jnp ops in ..ops — every
kernel has a reference implementation it is tested against (interpret mode
in CI, compiled mode on hardware).

Production status (probe-validated on v5e via the remote runtime, see
STATUS.md round 2):

- strided_kernel.box_resample_strided_pallas — the AUTO DEFAULT for
  single-channel TPU steps at the reference's m=2 geometry (543 vs 485
  MS/s full-step when measured in the same session); DMA'd windows +
  lane-roll alignment + static drift-margin weight loop.
- fused_kernel.fused_demod_resample — byte-decode + demod + resample in
  one kernel (two window layouts). Correct and bit-exact in-pipeline, but
  measured SLOWER than the pairing-matmul demod + strided kernel chain on
  this runtime, so it is opt-in via Params(resampler="fused").
- resample_kernel.box_resample_pallas[_windows] — the round-1 chunked-form
  kernels, kept for A/B probes.

Environment notes: Mosaic requires sublane-aligned block widths (odd widths
crash the remote compile helper and poison the session); dynamic row
offsets on PACKED (sub-32-bit) memrefs must be provably tile-aligned —
DMA 32-bit views instead. The round-1 "XLA gather + Mosaic call in one
program crashes the compile helper" failure no longer reproduces.
"""

from .resample_kernel import box_resample_pallas, box_resample_pallas_windows  # noqa: F401
from .strided_kernel import box_resample_strided_pallas  # noqa: F401
from .fused_kernel import fused_demod_resample  # noqa: F401
