"""Test env: force CPU with 8 virtual devices (multi-chip sharding tests).

Must run before jax is imported anywhere; pytest loads conftest first.
Benchmarks (bench.py) run on the real TPU chip and do not import this.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
