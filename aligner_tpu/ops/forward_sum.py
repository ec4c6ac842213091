"""Forward-sum (CTC-style) alignment loss — K5 of the capability inventory.

The OTA alignment objective (arXiv 2108.10447, referenced from the project
README.md:50): the marginal log-likelihood of ALL monotonic, surjective
text↔mel alignments, i.e. the log-domain forward algorithm over the same
lattice the MAS Viterbi kernel sweeps (SURVEY.md §2.3 K5, §3.4):

    alpha[x, y] = logp[x, y] + logaddexp(alpha[x, y-1], alpha[x-1, y-1])
    alpha[0, 0] = logp[0, 0];   loss = -alpha[t_x-1, t_y-1]

This is exactly the max→logsumexp relaxation of the MAS recurrence
(monotonic_align/core.pyx:17-30), sharing its column-scan structure: a
`lax.scan` over mel frames with the previous alpha column as carry.

Gradients use a custom VJP with the classical forward/backward recursions
(SURVEY.md §7.2): the backward pass runs a beta scan and returns the
posterior occupancy gamma = exp(alpha + beta - total) directly, instead of
differentiating through the forward scan — one reverse sweep, no
per-step residuals beyond the alpha lattice.

Layout: log_probs are frame-major [B, T_y, T_x] (log-softmax over the text
axis), the natural layout of the aligner's attention; `t_x`, `t_y` are
per-item lengths for ragged batches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Finite -inf stand-in: dominates any real log-prob, survives repeated
# addition in f32 without overflow, and exp(NEG) == 0 exactly.
NEG = -1e15


def _masked_logp(log_probs, t_x):
    """Mask out-of-range text tokens with NEG (ragged T_x) and clamp
    caller-supplied values to >= NEG.

    The clamp makes user -inf-masked log-probs safe: -inf becomes the
    finite NEG sentinel, which the Pallas backward kernel's dead-cell
    test (lp <= NEG/2) then classifies as an impossible cell — gamma and
    the gradient there are exactly 0 instead of NaN. Any value at or
    below NEG/2 = -5e14 is treated as "impossible" throughout."""
    B, T_y, T_x = log_probs.shape
    xs = jnp.arange(T_x, dtype=jnp.int32)
    log_probs = jnp.maximum(log_probs, NEG)  # -inf -> finite sentinel
    return jnp.where(xs[None, None, :] < t_x[:, None, None], log_probs, NEG)


def _valid_items(t_x, t_y):
    """Items violating the 1 <= t_x <= t_y contract have no monotonic
    surjective alignment; their loss is defined as 0 (with zero gradient),
    mirroring the MAS kernels' all-zero-path divergence handling."""
    return (t_x >= 1) & (t_x <= t_y)


def _alpha_scan(logp_tm, t_y):
    """logp_tm: [T_y, B, T_x] (already T_x-masked). Returns alpha lattice
    [T_y, B, T_x]."""
    T_y, B, T_x = logp_tm.shape
    xs = jnp.arange(T_x, dtype=jnp.int32)
    init = jnp.full((B, T_x), NEG, logp_tm.dtype)

    def step(prev, inputs):
        y, col = inputs
        prev_shift = jnp.concatenate(
            [jnp.full((B, 1), NEG, prev.dtype), prev[:, :-1]], axis=1)
        inner = jnp.logaddexp(prev, prev_shift)
        # First frame: paths start at token 0 with mass 1 (log 0).
        first = jnp.where(xs[None, :] == 0, 0.0, NEG)
        alpha = col + jnp.where(y == 0, first, inner)
        # Frames past t_y: freeze the carry so the final column is the
        # alpha at frame t_y - 1.
        alpha = jnp.where(y < t_y[:, None], alpha, prev)
        return alpha, alpha

    ys = jnp.arange(T_y, dtype=jnp.int32)
    _, alphas = jax.lax.scan(step, init, (ys, logp_tm))
    return alphas


def _beta_scan(logp_tm, t_x, t_y):
    """Backward recursion. beta[x, y] = log-mass of suffix paths strictly
    after (x, y), excluding logp[x, y]. Returns [T_y, B, T_x]."""
    T_y, B, T_x = logp_tm.shape
    xs = jnp.arange(T_x, dtype=jnp.int32)
    # beta at the last real frame: 0 at x == t_x - 1, NEG elsewhere.
    end_col = jnp.where(xs[None, :] == t_x[:, None] - 1, 0.0, NEG)

    def step(nxt, inputs):
        # nxt = beta[:, y+1] + logp[:, y+1] combined ("message" from y+1).
        y, col_next = inputs
        is_last = (y == t_y[:, None] - 1)
        msg = nxt + col_next  # [B, T_x]: beta[x,y+1] + logp[x,y+1]
        msg_shift = jnp.concatenate(
            [msg[:, 1:], jnp.full((B, 1), NEG, msg.dtype)], axis=1)
        beta = jnp.logaddexp(msg, msg_shift)  # stay or advance
        beta = jnp.where(is_last, end_col, beta)
        # Frames past t_y - 1: propagate unchanged (they're dead).
        beta = jnp.where(y < t_y[:, None], beta, nxt)
        return beta, beta

    ys = jnp.arange(T_y, dtype=jnp.int32)
    # col_next at step y is logp[:, y+1]; pad the top.
    logp_next = jnp.concatenate(
        [logp_tm[1:], jnp.full((1, B, T_x), NEG, logp_tm.dtype)], axis=0)
    init = jnp.full((B, T_x), NEG, logp_tm.dtype)
    _, betas = jax.lax.scan(step, init, (ys, logp_next), reverse=True)
    return betas


def _use_pallas() -> bool:
    return jax.default_backend() in ("tpu", "axon")


@jax.custom_vjp
def forward_sum_loss(log_probs, t_x, t_y):
    """Negative marginal log-likelihood of all monotonic alignments.

    log_probs: [B, T_y, T_x], log-softmax over the text axis (+ any prior).
    -inf-masked inputs are safe (clamped to a finite sentinel; see
    `_masked_logp`). t_x, t_y: [B] int32 with 1 <= t_x <= t_y per item;
    items violating that have no monotonic surjective alignment and get a
    defined loss of 0 with zero gradient. Returns per-item loss [B] (sum
    over frames; divide by t_y for a per-frame loss).

    On TPU both sweeps run as Pallas kernels (forward_sum_pallas); the
    lax.scan formulation below is the CPU path and numerical oracle.
    """
    loss, _ = _forward_sum_fwd(log_probs, t_x, t_y)
    return loss


def _total_from_alphas(alphas, t_x, t_y):
    T_y, B, T_x = alphas.shape
    xs = jnp.arange(T_x, dtype=jnp.int32)
    final_col = alphas[-1]  # carry frozen past t_y - 1
    onehot = (xs[None, :] == t_x[:, None] - 1).astype(alphas.dtype)
    return jnp.sum(final_col * onehot, axis=1)


def _forward_sum_fwd(log_probs, t_x, t_y):
    lp = _masked_logp(log_probs.astype(jnp.float32), t_x)
    lp_tm = jnp.moveaxis(lp, 0, 1)  # [T_y, B, T_x]
    if _use_pallas():
        from .forward_sum_pallas import forward_sum_alpha_pallas
        alphas, _ = forward_sum_alpha_pallas(lp_tm, t_y)
    else:
        alphas = _alpha_scan(lp_tm, t_y)
    total = _total_from_alphas(alphas, t_x, t_y)
    valid = _valid_items(t_x, t_y)
    total = jnp.where(valid, total, 0.0)
    return -total, (lp_tm, alphas, total, t_x, t_y)


def _forward_sum_bwd(res, g):
    lp_tm, alphas, total, t_x, t_y = res
    g = jnp.where(_valid_items(t_x, t_y), g, 0.0)
    T_y, B, T_x = lp_tm.shape
    if _use_pallas():
        from .forward_sum_pallas import forward_sum_grad_pallas
        gamma = forward_sum_grad_pallas(lp_tm, alphas, total, t_x, t_y)
    else:
        betas = _beta_scan(lp_tm, t_x, t_y)
        # Posterior occupancy gamma[y, b, x]; alpha includes logp, beta
        # doesn't.
        gamma = jnp.exp(alphas + betas - total[None, :, None])
        ys = jnp.arange(T_y, dtype=jnp.int32)
        xs = jnp.arange(T_x, dtype=jnp.int32)
        in_range = ((ys[:, None, None] < t_y[None, :, None])
                    & (xs[None, None, :] < t_x[None, :, None]))
        gamma = jnp.where(in_range, gamma, 0.0)
    # d(-total)/d logp = -gamma, chain with per-item cotangent g.
    grad = -gamma * g[None, :, None]
    return jnp.moveaxis(grad, 1, 0), None, None


forward_sum_loss.defvjp(_forward_sum_fwd, _forward_sum_bwd)


@jax.custom_vjp
def forward_sum_loss_with_posteriors(log_probs, t_x, t_y):
    """(loss [B], gamma [B, T_y, T_x]) in one forward-backward sweep.

    gamma is the alignment posterior — which is also exactly the loss
    gradient, so the VJP reuses it with no additional backward work.
    gamma itself is non-differentiable (its cotangent is ignored); use it
    for anchors/diagnostics under an implicit stop-gradient.
    """
    out, _ = _fs_with_post_fwd(log_probs, t_x, t_y)
    return out


def _fs_with_post_fwd(log_probs, t_x, t_y):
    lp = _masked_logp(log_probs.astype(jnp.float32), t_x)
    lp_tm = jnp.moveaxis(lp, 0, 1)
    valid = _valid_items(t_x, t_y)
    if _use_pallas():
        from .forward_sum_pallas import (forward_sum_alpha_pallas,
                                         forward_sum_grad_pallas)
        alphas, _ = forward_sum_alpha_pallas(lp_tm, t_y)
        # Mask invalid items *before* the exp in the grad kernel: their
        # raw total is ~NEG, and exp(alpha + beta - NEG) overflows.
        total = jnp.where(valid, _total_from_alphas(alphas, t_x, t_y), 0.0)
        gamma = forward_sum_grad_pallas(lp_tm, alphas, total, t_x, t_y)
    else:
        alphas = _alpha_scan(lp_tm, t_y)
        total = jnp.where(valid, _total_from_alphas(alphas, t_x, t_y), 0.0)
        betas = _beta_scan(lp_tm, t_x, t_y)
        gamma = jnp.exp(alphas + betas - total[None, :, None])
        T_y, B, T_x = lp_tm.shape
        ys = jnp.arange(T_y, dtype=jnp.int32)
        xs = jnp.arange(T_x, dtype=jnp.int32)
        in_range = ((ys[:, None, None] < t_y[None, :, None])
                    & (xs[None, None, :] < t_x[None, :, None]))
        gamma = jnp.where(in_range, gamma, 0.0)
    gamma = jnp.where(valid[None, :, None], gamma, 0.0)
    gamma_fm = jnp.moveaxis(gamma, 1, 0)
    return (-total, gamma_fm), gamma_fm


def _fs_with_post_bwd(res, cotangents):
    gamma_fm = res
    g_loss, _ = cotangents  # gamma's cotangent intentionally dropped
    return -gamma_fm * g_loss[:, None, None], None, None


forward_sum_loss_with_posteriors.defvjp(_fs_with_post_fwd,
                                        _fs_with_post_bwd)


def alignment_posteriors(log_probs, t_x, t_y):
    """Soft alignment posteriors gamma [B, T_y, T_x] (sum to 1 over text
    for each real frame) and the per-item log-marginal. Differentiable
    (plain autodiff); used for diagnostics and soft-duration extraction."""
    lp = _masked_logp(log_probs.astype(jnp.float32), t_x)
    lp_tm = jnp.moveaxis(lp, 0, 1)
    alphas = _alpha_scan(lp_tm, t_y)
    betas = _beta_scan(lp_tm, t_x, t_y)
    total = _total_from_alphas(alphas, t_x, t_y)
    gamma = jnp.exp(alphas + betas - total[None, :, None])
    ys = jnp.arange(lp_tm.shape[0], dtype=jnp.int32)
    xs = jnp.arange(lp_tm.shape[2], dtype=jnp.int32)
    in_range = ((ys[:, None, None] < t_y[None, :, None])
                & (xs[None, None, :] < t_x[None, :, None]))
    gamma = jnp.where(in_range, gamma, 0.0)
    return jnp.moveaxis(gamma, 1, 0), total
