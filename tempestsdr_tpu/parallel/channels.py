"""Channel data parallelism — config 5 (pod-scale multi-target).

Each monitored emitter is an independent IQ channel with its own carried
state; the per-channel step is vmapped and the channel axis sharded over the
mesh. No collectives are needed in steady state — exactly the reference's
"multiple independent receivers" design point, scaled across chips instead
of threads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PipelineConfig
from ..params import Params
from ..stream.pipeline import make_channels_step
from ..stream.state import StreamState, init_state


def stack_states(config: PipelineConfig, n_channels: int, fir_ntaps: int = 0) -> StreamState:
    """Per-channel StreamState stacked on a leading channel axis."""
    one = init_state(config, fir_ntaps)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_channels,) + x.shape).copy(), one
    )


def make_channel_step(config: PipelineConfig, params: Params, mesh: Mesh, n_channels: int = None):
    """Uniform-cadence channel step, sharded over the 'ch' axis.

    With jax.jit + NamedSharding the XLA SPMD partitioner keeps each
    channel's whole pipeline on its own device; carried state never moves.
    The any()-gates in make_channels_step become cheap scalar all-reduces.
    """
    step = make_channels_step(config, params)
    sharding = NamedSharding(mesh, P("ch"))

    def sharded(tree):
        return jax.tree.map(lambda _: sharding, tree)

    def run(states, raws, controls):
        return step(states, raws, controls)

    return jax.jit(
        run,
        in_shardings=(sharding, sharding, sharding),
        out_shardings=(sharding, sharding),
        donate_argnums=0,
    )
