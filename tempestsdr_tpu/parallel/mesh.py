"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_channel: int = 1, n_time: int = 1, devices=None) -> Mesh:
    """Mesh over {channel, time}. Lay the time axis innermost so its halo
    ppermutes ride neighbouring ICI links."""
    if devices is None:
        devices = jax.devices()
    need = n_channel * n_time
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_channel, n_time)
    return Mesh(arr, ("ch", "time"))
