"""Test harness: force an 8-device virtual CPU platform.

The image's sitecustomize registers the 'axon' TPU backend and overrides
JAX_PLATFORMS at interpreter start, so the env var alone is not enough — the
config must be updated after importing jax (before any backend use).
Multi-chip sharding is validated on this virtual mesh (SURVEY.md §4);
real-TPU benchmarking happens separately via bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
