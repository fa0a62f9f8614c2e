"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding logic is validated on host CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the reference-free
TPU test strategy in SURVEY.md §4.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
