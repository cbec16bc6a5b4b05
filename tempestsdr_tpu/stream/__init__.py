"""Block-streaming runtime.

Replaces the reference's 4-thread pipeline + mutex/condvar circular buffers
(TempestSDR/src/TSDRLibrary.c:300-418, circbuff.c) with a single jitted step
over fixed-size IQ blocks whose carry (StreamState) holds every piece of
cross-block state. Backpressure, inter-thread rings and latent data races
disappear by construction (SURVEY.md §5.2); the host feeds blocks
asynchronously and consumes (frame, events) outputs.
"""

from .state import StreamState, StepOutputs, init_state  # noqa: F401
from .pipeline import (  # noqa: F401
    make_step,
    make_multi_step,
    make_channels_step,
    make_channels_step_unrolled,
)
from .session import Session  # noqa: F401
from .multisession import MultiSession  # noqa: F401
