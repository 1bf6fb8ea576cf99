"""Test config: force an 8-device virtual CPU mesh before jax initializes.

Multi-device sharding tests run on CPU via
XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
