"""Pallas TPU kernels for the hot per-sample ops (SURVEY.md §7.5).

Only correctness-equivalent accelerations of the jnp ops in ..ops — every
kernel has a reference implementation it is tested against (interpret mode
in CI, compiled mode on hardware).

Status on the current remote-TPU environment: the kernels compile and run
standalone (verified on the chip: trivial kernels, production tile shapes,
large grids — note Mosaic requires sublane-aligned block widths; odd widths
crash the compiler and poison the session), but any XLA program that mixes a
gather in the operand-producing prelude with a Mosaic custom call crashes
the environment's remote-compile helper (HTTP 500, no diagnostics) — an
axon-tunnel service limitation, bisected to exactly that combination. The
pipeline therefore defaults to ops.resample.box_resample_block_chunked
(pure-XLA, 93+ MS/s end to end); wire box_resample_pallas in on
direct-attached TPU hardware.
"""

from .resample_kernel import box_resample_pallas, box_resample_pallas_windows  # noqa: F401
