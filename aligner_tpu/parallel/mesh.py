"""Device mesh + sharding rules — the distributed substrate (SURVEY.md §5).

The reference's only parallel substrate is a (conditionally compiled)
OpenMP batch loop (core.pyx:44); the TPU framework scales instead via a
`jax.sharding.Mesh` with XLA collectives over ICI. Axes:

* ``data``  — batch-parallel axis. MAS paths are independent per item, so
  batch-sharded alignment needs zero cross-chip communication; the train
  step needs only the standard gradient psum (inserted by XLA).
* ``model`` — tensor-parallel axis for the encoder channel dimensions
  (embed table and conv kernels sharded on hidden/out channels).

Sequence parallelism for the lattice DP itself is documented, not built,
in v0 (SURVEY.md §5: the carry column is 512 B — a single chip handles
the baseline shapes; pipelining columns chip-to-chip over ICI only pays
past ~100k frames).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if len(devices) < need or need == 0:
        plat = devices[0].platform if devices else "none"
        raise ValueError(
            f"make_mesh needs {n_data}x{n_model}={need} devices but only "
            f"{len(devices)} are visible on platform '{plat}'. For a "
            f"virtual CPU mesh set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={need} and "
            f'jax.config.update("jax_platforms", "cpu") before any device '
            f"access (the axon plugin ignores the JAX_PLATFORMS env var).")
    devices = devices[:need]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def param_spec(path: tuple[str, ...], value) -> P:
    """Tensor-parallel partitioning rule for aligner parameters.

    Embedding tables and conv kernels are sharded on their output-channel
    (last) axis over ``model``; biases and 1-channel projections stay
    replicated. Conservative rule: only shard when the last dim divides
    evenly in typical configs (hidden dims are multiples of 8).
    """
    name = "/".join(str(p) for p in path)
    if value.ndim >= 2 and ("kernel" in name or "embedding" in name):
        return P(*([None] * (value.ndim - 1) + ["model"]))
    return P()


def shard_params(params, mesh: Mesh):
    """NamedSharding pytree for a param pytree, following `param_spec`."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def one(path, v):
        keys = tuple(getattr(k, "key", getattr(k, "idx", None))
                     for k in path)
        spec = param_spec(keys, v)
        # Refuse specs that don't divide evenly; fall back to replication.
        for dim, axis in zip(v.shape, spec):
            if axis == "model" and dim % mesh.shape["model"] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    shardings = [one(p, v) for p, v in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, shardings)
