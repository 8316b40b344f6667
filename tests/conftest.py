"""Test harness: force an 8-device virtual CPU platform before JAX initializes.

Multi-chip sharding is validated on this virtual mesh (SURVEY.md §4); real-TPU
benchmarking happens separately via bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the image presets JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
