"""Text / mel encoders for the alignment stack.

The OTA alignment framework (arXiv 2108.10447, README.md:50) learns
alignments from lightweight convolutional encodings of the text tokens and
the mel frames, compared in a shared key/query space. The reference repo
keeps its encoders on unmounted branches (its devcontainer is an ESPnet
image, devcontainer.json:6); these are fresh, idiomatic flax modules
following the OTA paper's aligner-encoder shape: a small stack of 1-D
convolutions with ReLU, instance-norm-free, projecting into `dim`.

All ops are batched matmuls/convs (MXU) with static shapes; padding is
masked by the caller via lengths.
"""
from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import flax.linen as nn


class ConvStack(nn.Module):
    features: Sequence[int]
    kernel_sizes: Sequence[int]
    # Computation dtype (flax convention: params stay float32; None =
    # promote inputs, i.e. float32 everywhere). bfloat16 runs the convs
    # on the MXU at double rate — pass through from the model config.
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None):
        # x: [B, T, C]; mask: [B, T] (1 = real).
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, (f, k) in enumerate(zip(self.features, self.kernel_sizes)):
            if mask is not None:
                x = x * mask[..., None].astype(x.dtype)
            x = nn.Conv(f, kernel_size=(k,), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(x)
            if i != len(self.features) - 1:
                x = nn.relu(x)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x


class TextEncoder(nn.Module):
    """Token ids [B, T_x] -> keys [B, T_x, dim]."""
    vocab_size: int
    dim: int = 192
    hidden: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, tokens, mask=None):
        x = nn.Embed(self.vocab_size, self.hidden, dtype=self.dtype,
                     name="embed")(tokens)
        return ConvStack((self.hidden, self.hidden, self.dim), (3, 3, 1),
                         dtype=self.dtype, name="convs")(x, mask)


class MelEncoder(nn.Module):
    """Mel frames [B, T_y, n_mels] -> queries [B, T_y, dim]."""
    dim: int = 192
    hidden: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, mel, mask=None):
        return ConvStack((self.hidden, self.hidden, self.dim), (3, 3, 1),
                         dtype=self.dtype, name="convs")(mel, mask)
