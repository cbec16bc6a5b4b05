"""Test harness: 8 virtual CPU devices so sharded paths run without a pod,
mirroring how the reference tests without hardware via its RawFile plugin
(SURVEY.md §4).

This environment registers a remote-TPU ("axon") PJRT backend in every
Python process via sitecustomize and forces jax_platforms to "axon,cpu" —
each fresh process then claims a remote TPU session on first use (~100s).
Unit tests must be pure CPU, so re-force the platform *after* that
registration (config update beats the sitecustomize one) before any backend
initializes."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
