"""OTA-style aligner — K3/K6/K8 of the capability inventory.

Implements the "One TTS Alignment To Rule Them All" method (arXiv
2108.10447, README.md:50) that the reference project's OTA branch targets,
as a single flax module designed for one fused jitted step on TPU:

  text tokens ──TextEncoder──► keys  ─┐
                                      ├─► pairwise -L2² energies (MXU)
  mel frames ──MelEncoder───► queries ┘      │ log_softmax over text
                                             ▼
                      log-attention  (+ beta-binomial prior)
                       │                        │
          forward-sum NLL (soft, diff.)   MAS hard path (Pallas, stop-grad)
                       │                        │
                       └──── bin loss: -Σ hard·log_attn / frames ────┘

Everything — including the Viterbi binarisation — stays inside one XLA
program; there is no host round-trip anywhere in the step (the defining
fix over the reference's wrapper, monotonic_align/__init__.py:11-21).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.forward_sum import forward_sum_loss
from ..ops.mas import mas_path_frame_major
from ..ops.prior import beta_binomial_log_prior
from ..utils.masks import sequence_mask


@dataclasses.dataclass(frozen=True)
class OTAConfig:
    vocab_size: int = 256
    n_mels: int = 80
    dim: int = 192
    hidden: int = 256
    temperature: float = 0.0005   # OTA's softmax temperature on -L2²
    prior_omega: float = 1.0
    use_prior: bool = True
    mas_implementation: str = "auto"
    # Optional self-supervised auxiliary: decode mel frames from the
    # soft-attended text keys and penalise per-frame reconstruction
    # error. The forward-sum likelihood is tolerant to small boundary
    # shifts (the conv encoders smear token identity by their receptive
    # field); the per-frame reconstruction term sharpens boundaries to
    # frame accuracy (same mechanism as the MoBo/RoMo reconstruction
    # objectives). Adds loss_recon to the outputs when True.
    use_recon: bool = False


class OTAAligner(nn.Module):
    """Returns the soft/hard alignment artefacts and both losses."""
    config: OTAConfig = OTAConfig()

    @nn.compact
    def __call__(self, tokens, mel, text_lengths, mel_lengths):
        """tokens [B, T_x] int32; mel [B, T_y, n_mels];
        text_lengths, mel_lengths [B] int32."""
        from .encoders import MelEncoder, TextEncoder
        cfg = self.config
        B, T_x = tokens.shape
        T_y = mel.shape[1]
        text_mask = sequence_mask(text_lengths, T_x)
        mel_mask = sequence_mask(mel_lengths, T_y)

        keys = TextEncoder(cfg.vocab_size, cfg.dim, cfg.hidden,
                           name="text_encoder")(tokens, text_mask)
        queries = MelEncoder(cfg.dim, cfg.hidden,
                             name="mel_encoder")(mel, mel_mask)

        # Pairwise squared L2 via one MXU matmul:
        # |q|² - 2 q·k + |k|², energies = -temp * dist².
        q2 = jnp.sum(queries * queries, axis=-1, keepdims=True)   # [B,T_y,1]
        k2 = jnp.sum(keys * keys, axis=-1)[:, None, :]            # [B,1,T_x]
        qk = jnp.einsum("byd,bxd->byx", queries, keys)
        dist2 = q2 - 2.0 * qk + k2
        energies = -cfg.temperature * dist2

        # Mask padded text tokens before the softmax over text.
        energies = jnp.where(text_mask[:, None, :] > 0, energies, -1e9)
        log_attn = jax.nn.log_softmax(energies, axis=-1)          # [B,T_y,T_x]

        logp = log_attn
        if cfg.use_prior:
            logp = logp + beta_binomial_log_prior(
                text_lengths, mel_lengths, T_x, T_y, cfg.prior_omega)

        fs = forward_sum_loss(logp, text_lengths, mel_lengths)
        loss_forward_sum = jnp.mean(fs / jnp.maximum(mel_lengths, 1))

        # Hard Viterbi binarisation on the prior-augmented lattice,
        # non-differentiable by construction (reference call stack §3.3).
        hard = mas_path_frame_major(
            jax.lax.stop_gradient(logp), text_lengths, mel_lengths,
            implementation=cfg.mas_implementation)

        # Binarisation (KL) loss: cross-entropy of the soft attention
        # against the hard path, per real frame.
        ce = -jnp.sum(hard * log_attn, axis=(1, 2))
        loss_bin = jnp.mean(ce / jnp.maximum(mel_lengths, 1))

        durations = jnp.sum(hard, axis=1)                         # [B, T_x]

        loss_recon = 0.0
        if cfg.use_recon:
            decoded = nn.Dense(cfg.n_mels, name="mel_decoder")(keys)
            recon = jnp.einsum("byx,bxd->byd", jnp.exp(log_attn), decoded)
            frame_mask = mel_mask[..., None]
            loss_recon = (jnp.sum(frame_mask * (recon - mel) ** 2)
                          / jnp.maximum(frame_mask.sum(), 1.0)
                          / cfg.n_mels)

        return {
            "loss_recon": loss_recon,
            "log_attn": log_attn,
            "logp_with_prior": logp,
            "loss_forward_sum": loss_forward_sum,
            "loss_bin": loss_bin,
            "hard_path": hard,
            "durations": durations,
        }
