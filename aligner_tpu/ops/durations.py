"""Duration utilities for Glow-TTS/VITS-style training — the reconstructed
caller pattern of the reference (SURVEY.md §3.3): per step, MAS produces a
hard path under stop_gradient; durations `path.sum(-1)` supervise a
duration predictor, and the path gathers the selected lattice cells for
the likelihood term.
"""
from __future__ import annotations

import jax.numpy as jnp


def durations_from_path(path, *, frame_major: bool = False):
    """0/1 path -> integer durations per token.

    path: [B, T_x, T_y] (reference layout) or [B, T_y, T_x] if
    frame_major. Returns [B, T_x] in path's dtype.
    """
    return path.sum(axis=1 if frame_major else 2)


def path_from_durations(durations, max_mel: int, mel_lengths=None):
    """Inverse: durations [B, T_x] -> 0/1 path [B, T_x, T_y]."""
    cum = jnp.cumsum(durations, axis=1)
    start = cum - durations
    ys = jnp.arange(max_mel)[None, None, :]
    path = (ys >= start[:, :, None]) & (ys < cum[:, :, None])
    if mel_lengths is not None:
        path = path & (ys < mel_lengths[:, None, None])
    return path.astype(jnp.float32)


def duration_loss(log_pred, durations, text_lengths):
    """MSE in log-duration domain (Glow-TTS/VITS convention: target is
    ``log(d + 1e-6)``, so at inference ``round(exp(pred))`` recovers the
    duration — see `durations_from_log`). Masked and averaged per real
    token. log_pred: [B, T_x] predicted log-durations; durations: [B, T_x]
    targets from MAS (non-differentiable)."""
    T_x = durations.shape[1]
    mask = (jnp.arange(T_x)[None, :] < text_lengths[:, None])
    target = jnp.log(durations.astype(jnp.float32) + 1e-6)
    err = jnp.where(mask, (log_pred - target) ** 2, 0.0)
    return err.sum() / jnp.maximum(mask.sum(), 1)


def durations_from_log(log_pred, text_lengths=None, *, min_duration: int = 1):
    """Invert `duration_loss` predictions at inference: ``round(exp(pred))``
    clamped to at least `min_duration` frames per real token (MAS paths are
    surjective, so every token gets >= 1 frame); padded tokens get 0."""
    d = jnp.round(jnp.exp(log_pred)).astype(jnp.int32)
    d = jnp.maximum(d, min_duration)
    if text_lengths is not None:
        T_x = log_pred.shape[1]
        mask = (jnp.arange(T_x)[None, :] < text_lengths[:, None])
        d = jnp.where(mask, d, 0)
    return d


def selected_loglik(value, path):
    """Sum of lattice cells on the path, per item — the likelihood term
    that flows gradients through the *selected* cells (SURVEY.md §3.3).
    value: [B, T_x, T_y] (differentiable); path: same shape, 0/1,
    stop-gradient'ed by the caller."""
    return jnp.sum(value * path, axis=(1, 2))
