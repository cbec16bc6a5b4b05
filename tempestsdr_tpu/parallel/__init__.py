"""Multi-chip scaling via jax.sharding meshes.

The reference has no distribution at all — its "communication backend" is
three mutex/condvar rings inside one process (SURVEY.md §5.8). Here the two
natural axes are:

  - channel: independent IQ channels (one per monitored emitter), pure data
    parallelism over a vmapped pipeline (BASELINE.json config 5);
  - time: one wideband stream split into time shards per block, with
    ppermute halo exchange for filter/resampler edges and a psum frame fold
    (BASELINE.json config 4 — overlap-save).
"""

from .mesh import make_mesh  # noqa: F401
from .channels import make_channel_step, stack_states  # noqa: F401
from .timeshard import make_time_sharded_step, make_grid_step  # noqa: F401
