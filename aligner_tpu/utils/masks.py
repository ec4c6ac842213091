"""Length/mask helpers shared across the framework.

The reference API derives per-item lattice lengths from a 3-D mask that is
assumed to be the outer product of a text-length mask and a mel-length mask
(reference: monotonic_align/__init__.py:18-19). We reproduce that derivation
exactly so `maximum_path(value, mask)` is a drop-in replacement, and provide
the inverse helpers for building such masks inside jitted training steps.
"""
from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths, max_length: int, dtype=jnp.float32):
    """[B] lengths -> [B, max_length] 0/1 mask."""
    pos = jnp.arange(max_length, dtype=jnp.int32)
    return (pos[None, :] < lengths[:, None]).astype(dtype)


def lattice_mask(text_lengths, mel_lengths, max_text: int, max_mel: int,
                 dtype=jnp.float32):
    """Outer-product lattice mask [B, max_text, max_mel].

    mask[b, x, y] = 1 iff x < text_lengths[b] and y < mel_lengths[b].
    This is the mask shape `maximum_path` expects (same convention as the
    reference wrapper, monotonic_align/__init__.py:11).
    """
    tm = sequence_mask(text_lengths, max_text, dtype)
    mm = sequence_mask(mel_lengths, max_mel, dtype)
    return tm[:, :, None] * mm[:, None, :]


def lengths_from_lattice_mask(mask):
    """Per-item (t_x, t_y) from a lattice mask, exactly as the reference.

    Mirrors monotonic_align/__init__.py:18-19:
      t_x = mask.sum(1)[:, 0]   (valid text tokens, counted at mel frame 0)
      t_y = mask.sum(2)[:, 0]   (valid mel frames, counted at text token 0)
    """
    t_x = mask.sum(axis=1)[:, 0].astype(jnp.int32)
    t_y = mask.sum(axis=2)[:, 0].astype(jnp.int32)
    return t_x, t_y
