"""Drop-in torch-facing wrapper for reference users.

The reference public API takes and returns torch tensors
(monotonic_align/__init__.py:6-21). Users migrating from it can import
`aligner_tpu.torch_compat.maximum_path` and keep their call sites
unchanged: torch in, torch out, same dtype/device contract — but the DP
runs on the JAX device (TPU) instead of a Cython CPU kernel. The lattice
is copied host-side at the torch<->JAX boundary (same cost class as the
reference's own .cpu().numpy() round trip); migrate call sites to the
native JAX `aligner_tpu.maximum_path` to eliminate the copies entirely.

torch is an optional dependency: importing this module without torch
installed raises ImportError at call time, not package-import time.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .ops.mas import maximum_path as _maximum_path_jax


def maximum_path(value, mask):
    """value, mask: torch tensors [b, t_x, t_y]. Returns a torch tensor of
    value's dtype on value's device, exactly like the reference wrapper."""
    import torch

    device = value.device
    dtype = value.dtype
    v = jnp.asarray(value.detach().cpu().to(torch.float32).numpy())
    m = jnp.asarray(mask.detach().cpu().to(torch.float32).numpy())
    path = _maximum_path_jax(v, m)
    return torch.from_numpy(np.asarray(path)).to(device=device, dtype=dtype)
