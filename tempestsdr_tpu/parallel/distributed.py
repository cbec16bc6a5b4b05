"""Multi-host bring-up (SURVEY.md §5.8 TPU equivalent).

The reference is strictly single-process; its "communication backend" is
in-process rings. Here cross-host scaling is jax.distributed + a global mesh:
each host feeds the channels whose devices it owns (config 5), or its time
shards of a wideband stream (config 4); collectives ride ICI within a slice
and DCN across hosts.

This module only wires the bring-up; the step builders in .channels /
.timeshard are mesh-agnostic and work unchanged on a multi-host mesh.
Cannot be exercised in a single-host environment — validated structurally by
dryrun_multichip on a virtual device mesh.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def init_distributed(coordinator: str, num_processes: int, process_id: int) -> None:
    """jax.distributed bring-up; call before any backend use on every host.

    coordinator: "host:port" of process 0.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(n_channel: int, n_time: int) -> Mesh:
    """Mesh over ALL processes' devices. Device order follows
    jax.devices(), which groups by process — so with n_channel >= number of
    hosts, each host's channels stay on its local chips and only the 'time'
    halos/psum leave the host."""
    devices = jax.devices()
    need = n_channel * n_time
    if len(devices) < need:
        raise ValueError(f"need {need} devices across hosts, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_channel, n_time)
    return Mesh(arr, ("ch", "time"))


def channel_row_bounds(n_channels_global: int, ch_rows: int) -> list:
    """Block distribution of channels over the 'ch' axis rows: row r owns
    channels [bounds[r], bounds[r+1]). Non-divisible counts spread the
    remainder over the first rows (standard balanced blocks)."""
    if ch_rows <= 0:
        raise ValueError("mesh has no 'ch' rows")
    per, rem = divmod(n_channels_global, ch_rows)
    bounds = [0]
    for r in range(ch_rows):
        bounds.append(bounds[-1] + per + (1 if r < rem else 0))
    return bounds


def local_channel_slice(mesh: Mesh, n_channels_global: int) -> slice:
    """Which global channel indices this host should feed: channels are
    block-distributed over the 'ch' axis in mesh order (balanced blocks,
    remainder on the first rows); a host feeds the channels whose
    row-devices are local (addressable). Raises if this host's rows are
    non-contiguous (cannot happen with jax.devices() process grouping, but
    a hand-built mesh could)."""
    ch_rows = mesh.devices.shape[0]
    bounds = channel_row_bounds(n_channels_global, ch_rows)
    local_rows = [
        r
        for r in range(ch_rows)
        if any(d.process_index == jax.process_index() for d in mesh.devices[r])
    ]
    if not local_rows:
        return slice(0, 0)
    lo, hi = min(local_rows), max(local_rows)
    if local_rows != list(range(lo, hi + 1)):
        raise ValueError(
            "this host's 'ch' rows are non-contiguous; build the mesh in "
            "jax.devices() order (make_global_mesh) so each host's channels "
            "form one block"
        )
    return slice(bounds[lo], bounds[hi + 1])
