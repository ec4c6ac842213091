"""Test env: force CPU with 8 virtual devices (multi-chip sharding tests).

The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu" at
interpreter start, so plain JAX_PLATFORMS=cpu is ignored; we override the
live config before any backend is initialised. Benchmarks (bench.py) run on
the real TPU chip and do not import this.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
