"""Channel data parallelism — config 5 (pod-scale multi-target).

Each monitored emitter is an independent IQ channel with its own carried
state; the channel axis is sharded over the mesh with shard_map, and the
per-device body is the HYBRID channels step over that device's local
channels (unrolled per-channel `pre`, shared ac-ring write, batched cond
bodies — stream/pipeline.py make_channels_step_hybrid). No collectives run
in steady state — exactly the reference's "multiple independent receivers"
design point, scaled across chips instead of threads.

Why shard_map and not jit+NamedSharding over the vmapped step (the round-2
design): (a) the vmapped program class faults the current remote TPU
runtime at execution time (STATUS.md round 2), so a real pod would dispatch
exactly the crashing class; (b) shard_map guarantees each device runs the
TPU-proven per-channel body locally — the any()-gates are over LOCAL
channels only, with no cross-device scalar all-reduces at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import PipelineConfig
from ..params import Params
from ..stream.pipeline import make_channels_step_hybrid
from ..stream.state import StreamState, init_state


def stack_states(config: PipelineConfig, n_channels: int, fir_ntaps: int = 0) -> StreamState:
    """Per-channel StreamState stacked on a leading channel axis."""
    one = init_state(config, fir_ntaps)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_channels,) + x.shape).copy(), one
    )


def make_channel_step(config: PipelineConfig, params: Params, mesh: Mesh,
                      n_channels: int = None, *, cond_mode: str = "unrolled"):
    """Uniform-cadence channel step, sharded over the 'ch' axis.

    n_channels defaults to one per device; it must divide evenly so every
    device runs the same per-device body (n_channels // n_devices local
    channels)."""
    n_dev = mesh.shape["ch"]
    if n_channels is None:
        n_channels = n_dev
    if n_channels % n_dev:
        raise ValueError(
            f"n_channels={n_channels} must be a multiple of the mesh's "
            f"{n_dev} 'ch' devices"
        )
    per_dev = n_channels // n_dev
    body = make_channels_step_hybrid(config, params, per_dev,
                                     cond_mode=cond_mode)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("ch"), P("ch"), P("ch")),
        out_specs=(P("ch"), P("ch")),
        check_vma=False,
    )
    def run(states, raws, controls):
        return body(states, raws, controls)

    return jax.jit(run, donate_argnums=0)
