"""tempestsdr_tpu — a TPU-native TEMPEST receiver framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
martinmarinov/TempestSDR (reference at /root/reference): the full IQ-to-video
chain — AM envelope demodulation, optional FIR low-pass, fractional (box)
resampling to pixel rate, frame folding, sync detection with a frame-rate PLL,
autogain/motion-blur post-processing, and FFT-autocorrelation based automatic
refresh-rate / resolution estimation.

The reference's 4-thread + ring-buffer pipeline (TempestSDR/src/TSDRLibrary.c)
is replaced by a single jitted block-streaming step whose carry holds all
cross-block state; multi-chip scaling uses jax.sharding meshes over
{channel, time} axes instead of threads.

int64 is required for the exact fixed-point resampler phase arithmetic, so
x64 mode is enabled at import. All signal dtypes are explicitly float32;
float64 appears only in tiny per-frame profile math.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from .errors import TSDRStatus, TSDRError  # noqa: E402,F401
from .params import Params, PARAM  # noqa: E402,F401
from .config import PipelineConfig  # noqa: E402,F401
from .api import TSDR  # noqa: E402,F401

__version__ = "0.1.0"
