"""MoBoAligner model — the boundary-search alignment module (config 4).

Wraps the MoBo boundary-search ops (ops/mobo.py, arXiv 2005.08528) with the
same conv encoders as the OTA aligner: energies come from scaled dot
products between mel queries and text keys, the boundary recursion runs
under the max-duration constraint D (the reference README's stated
limitation, README.md:13), and the module returns the differentiable
boundary NLL plus soft alignments, expected durations, and the hard
Viterbi boundaries — all inside one jitted program.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.mobo import mobo_forward, mobo_hard_boundaries
from ..utils.masks import sequence_mask


@dataclasses.dataclass(frozen=True)
class MoBoConfig:
    vocab_size: int = 256
    n_mels: int = 80
    dim: int = 192
    hidden: int = 256
    max_duration: int = 32
    energy_scale: float | None = None  # default 1/sqrt(dim)
    # Per-frame mel reconstruction through the boundary posteriors —
    # the objective that pins boundaries in the MoBo demos (the
    # marginal NLL alone only shapes energies). The demo reconstructs
    # through known synthetic prototypes; for real corpora (train CLI)
    # the decoder is learned: mel_decoder(keys) plays the prototype
    # role. Adds `loss_recon` to the outputs when True.
    use_recon: bool = False


class MoBoAligner(nn.Module):
    config: MoBoConfig = MoBoConfig()

    @nn.compact
    def __call__(self, tokens, mel, text_lengths, mel_lengths,
                 compute_hard: bool = True):
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
        scale = (cfg.energy_scale if cfg.energy_scale is not None
                 else 1.0 / jnp.sqrt(float(cfg.dim)))
        energies = scale * jnp.einsum("byd,bxd->byx", queries, keys)

        out = mobo_forward(energies, text_lengths, mel_lengths,
                           cfg.max_duration)
        result = {
            "energies": energies,
            "loss_mobo": jnp.mean(out["loss"]
                                  / jnp.maximum(mel_lengths, 1)),
            "soft_alignment": out["soft_alignment"],
            "expected_durations": out["expected_durations"],
            "log_boundaries": out["log_boundaries"],
        }
        if cfg.use_recon:
            decoded = nn.Dense(cfg.n_mels, name="mel_decoder")(keys)
            recon = jnp.einsum("byx,bxd->byd", out["soft_alignment"],
                               decoded)
            frame_mask = mel_mask[..., None]
            result["loss_recon"] = (
                jnp.sum(frame_mask * (recon - mel) ** 2)
                / jnp.maximum(frame_mask.sum(), 1.0) / cfg.n_mels)
        if compute_hard:
            durs, path = mobo_hard_boundaries(
                jax.lax.stop_gradient(energies), text_lengths, mel_lengths,
                cfg.max_duration)
            result["hard_durations"] = durs
            result["hard_path"] = path
        return result
