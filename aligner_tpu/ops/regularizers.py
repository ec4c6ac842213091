"""Alignment-shape regularizers.

`monotonic_attention_loss` implements the Regotron-style soft
monotonicity penalty (arXiv 2204.13437, PAPERS.md): the attention
centroid over text positions should be non-decreasing across mel
frames; adjacent-frame centroid regressions beyond a slack are
penalized with a hinge. Unlike the forward-sum/MAS losses (which
operate on the full lattice DP), this is a cheap O(B*T_y*T_x)
elementwise term usable with ANY attention matrix — e.g. to coax a
Tacotron-style soft attention toward monotonicity before switching to
the hard-alignment objectives, or as an auxiliary on the OTA soft
attention.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.masks import sequence_mask


def attention_centroids(attn, text_lengths=None):
    """Per-frame attention centroid over text positions.

    attn: [B, T_y, T_x] non-negative rows (softmax posteriors; rows need
    not be re-normalised — centroids divide by the row mass). Returns
    [B, T_y] float32 centroids in token units.
    """
    attn = attn.astype(jnp.float32)
    T_x = attn.shape[-1]
    pos = jnp.arange(T_x, dtype=jnp.float32)
    if text_lengths is not None:
        tmask = sequence_mask(text_lengths, T_x).astype(jnp.float32)
        attn = attn * tmask[:, None, :]
    mass = jnp.maximum(jnp.sum(attn, axis=-1), 1e-9)
    return jnp.sum(attn * pos, axis=-1) / mass


def monotonic_attention_loss(attn, mel_lengths, text_lengths=None,
                             *, slack: float = 0.0):
    """Regotron-style monotonicity hinge on attention centroids.

    attn: [B, T_y, T_x] soft attention (rows ~ distributions over text);
    mel_lengths: [B] int32 — only adjacent pairs of *real* frames are
    penalized; text_lengths: optional [B] to exclude padded tokens from
    the centroid. slack: allowed per-frame centroid regression (tokens)
    before the hinge activates.

    Returns the scalar mean hinge over valid adjacent frame pairs:
        mean_t max(0, c_t - c_{t+1} - slack).
    Zero for any monotone alignment; differentiable elsewhere.
    """
    c = attention_centroids(attn, text_lengths)          # [B, T_y]
    T_y = c.shape[1]
    viol = jnp.maximum(c[:, :-1] - c[:, 1:] - slack, 0.0)
    # pair (t, t+1) is valid iff frame t+1 is real
    pair_mask = sequence_mask(mel_lengths - 1, T_y - 1).astype(jnp.float32)
    total = jnp.sum(viol * pair_mask)
    return total / jnp.maximum(jnp.sum(pair_mask), 1.0)
