"""Pure-functional DSP kernels (jax.numpy; Pallas fusions live in ..pallas).

Every op is `f(args) -> out` or `f(carry, block) -> (carry', out)` with static
shapes, so the whole chain jits into one XLA program.
"""

from .demod import am_demod, demod_raw_interleaved, normalize_iq  # noqa: F401
from .gaussian import gaussian_blur_circular  # noqa: F401
from .autocorr import autocorrelation_magnitude, accumulate_running_mean  # noqa: F401
from .resample import (  # noqa: F401
    box_resample_block,
    box_resample_block_chunked,
    box_resample_gather_i32,
    box_resample_strided,
    nn_resample_block,
    plan_strided,
)
from .fir import design_lowpass_fir, fir_apply_block  # noqa: F401
from .frame import collapse_v_h, autogain_run, time_lowpass  # noqa: F401
from .sync import find_best_fit, find_the_sweet_spot, find_the_sweet_spot_pair, SweetspotState  # noqa: F401
