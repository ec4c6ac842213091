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
    # .copy(): JAX-backed numpy views are non-writable and share device-
    # transfer buffers; hand the caller an owning, writable tensor.
    return torch.from_numpy(np.asarray(path).copy()).to(
        device=device, dtype=dtype)


def _to_jax_f32(t):
    import torch

    return jnp.asarray(t.detach().cpu().to(torch.float32).numpy())


def forward_sum_loss(log_probs, text_lengths, mel_lengths):
    """Torch-autograd bridge to the TPU forward-sum (CTC-style) loss.

    Matches the alignment-loss contract of the OTA/RAD-TTS family that
    the reference ecosystem trains with: ``log_probs`` is a torch tensor
    [B, T_y, T_x] of per-frame log-probabilities over text tokens
    (log-softmax over the last axis, plus any prior), ``text_lengths`` /
    ``mel_lengths`` are int tensors [B]. Returns a per-item torch loss
    [B] that participates in torch autograd: when a gradient is needed,
    the forward device call also runs the backward sweep and fetches the
    alignment posterior gamma, whose negation is the analytic gradient —
    the torch backward is then a host-side scale of that saved tensor
    (no second device call). When no gradient is needed (eval loops,
    `torch.no_grad()`, non-requires-grad inputs) only the alpha sweep
    runs and gamma is never computed or fetched.

    Validity contract (same as the JAX op, ops/forward_sum.py): items
    need 1 <= text_lengths[i] <= mel_lengths[i]; items with
    text_lengths > mel_lengths (no monotonic surjective alignment
    exists) OR text_lengths < 1 (empty token sequence) get a defined
    loss of 0 with zero gradient.
    """
    from .ops.forward_sum import (forward_sum_loss as _plain_loss,
                                  forward_sum_loss_with_posteriors)

    import torch

    needs_grad = torch.is_grad_enabled() and log_probs.requires_grad
    if not needs_grad:
        loss = _plain_loss(
            _to_jax_f32(log_probs),
            jnp.asarray(text_lengths.detach().cpu().numpy().astype(np.int32)),
            jnp.asarray(mel_lengths.detach().cpu().numpy().astype(np.int32)))
        return torch.from_numpy(np.asarray(loss).copy()).to(
            device=log_probs.device, dtype=log_probs.dtype)

    class _ForwardSum(torch.autograd.Function):
        @staticmethod
        def forward(ctx, lp, t_x, t_y):
            loss, gamma = forward_sum_loss_with_posteriors(
                _to_jax_f32(lp),
                jnp.asarray(t_x.detach().cpu().numpy().astype(np.int32)),
                jnp.asarray(t_y.detach().cpu().numpy().astype(np.int32)))
            ctx.save_for_backward(
                torch.from_numpy(np.asarray(gamma).copy()))
            ctx.in_dtype = lp.dtype
            ctx.in_device = lp.device
            return torch.from_numpy(np.asarray(loss).copy()).to(
                device=lp.device, dtype=lp.dtype)

        @staticmethod
        def backward(ctx, g):
            (gamma,) = ctx.saved_tensors
            gamma = gamma.to(device=ctx.in_device, dtype=ctx.in_dtype)
            grad = -gamma * g[:, None, None].to(gamma)
            return grad, None, None

    return _ForwardSum.apply(log_probs, text_lengths, mel_lengths)


def beta_binomial_prior(text_lengths, mel_lengths, max_text: int,
                        max_mel: int, omega: float = 1.0):
    """Torch-facing beta-binomial alignment prior [B, T_y, T_x].

    Computed with the on-device pmf-ratio recurrence (ops/prior.py) and
    returned as a torch float32 tensor on text_lengths' device; add it
    to log-softmax attention before `forward_sum_loss`.
    """
    from .ops.prior import beta_binomial_log_prior

    import torch

    device = text_lengths.device
    prior = beta_binomial_log_prior(
        jnp.asarray(text_lengths.detach().cpu().numpy().astype(np.int32)),
        jnp.asarray(mel_lengths.detach().cpu().numpy().astype(np.int32)),
        max_text, max_mel, omega)
    return torch.from_numpy(np.asarray(prior).copy()).to(device=device)
