"""RoMoAligner: Rough Alignment + MoBoAligner refinement.

Reconstruction of the reference project's RoMoAligner experiment
(README.md:15-19 — "Experimental improvement attempt combining Rough
Alignment with MoBoAligner"; the branch itself is unmounted, so this
follows the stated architecture built from this framework's primitives):

1. **Rough stage** — the OTA machinery produces soft alignment posteriors
   (forward-sum over log-attention + beta-binomial prior); expected
   durations give rough boundary anchors r_i = cumsum(E[dur]) - 1.
2. **Refinement stage** — MoBo boundary search runs on energies *windowed
   around the anchors*: candidates outside |t - r_i| <= window get NEG.
   This addresses MoBo's global max-duration limitation (README.md:13):
   long tokens are reachable because the search is re-anchored per token
   by the rough alignment instead of accumulating from frame 0.

Both stages are differentiable (rough via the forward-sum custom VJP,
refinement via the MoBo marginal NLL with stop-gradient anchors) and run
in one jitted program.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.forward_sum import forward_sum_loss_with_posteriors
from ..ops.mobo import mobo_forward, mobo_hard_boundaries
from ..ops.prior import beta_binomial_log_prior
from ..utils.masks import sequence_mask


@dataclasses.dataclass(frozen=True)
class RoMoConfig:
    vocab_size: int = 256
    n_mels: int = 80
    dim: int = 192
    hidden: int = 256
    temperature: float = 0.05
    prior_omega: float = 1.0
    window: int = 16            # refinement half-window around anchors
    max_duration: int = 32      # MoBo transition window in the refinement
    energy_scale: float | None = None
    # Learned per-frame mel reconstruction through the REFINEMENT
    # posteriors — the demo-measured fix for unpinned refined
    # boundaries (see cli.cmd_demo_romo); mel_decoder(keys) replaces
    # the demo's known synthetic prototypes for real corpora. Items
    # whose refinement is infeasible are gated out (their posteriors
    # are sentinels). Adds `loss_recon` when True.
    use_recon: bool = False


class RoMoAligner(nn.Module):
    config: RoMoConfig = RoMoConfig()

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

        # ---- rough stage (OTA-style) ----
        q2 = jnp.sum(queries * queries, axis=-1, keepdims=True)
        k2 = jnp.sum(keys * keys, axis=-1)[:, None, :]
        qk = jnp.einsum("byd,bxd->byx", queries, keys)
        energies_soft = -cfg.temperature * (q2 - 2.0 * qk + k2)
        energies_soft = jnp.where(text_mask[:, None, :] > 0,
                                  energies_soft, -1e9)
        log_attn = jax.nn.log_softmax(energies_soft, axis=-1)
        logp = log_attn + beta_binomial_log_prior(
            text_lengths, mel_lengths, T_x, T_y, cfg.prior_omega)
        # Loss and posteriors from ONE alpha+beta sweep; gamma is also the
        # loss gradient, so the backward pass is free.
        fs, gamma = forward_sum_loss_with_posteriors(
            logp, text_lengths, mel_lengths)
        loss_rough = jnp.mean(fs / jnp.maximum(mel_lengths, 1))

        # expected durations -> rough boundary anchors (stop-grad).
        exp_dur = jnp.sum(gamma, axis=1)                   # [B, T_x]
        anchors = jnp.cumsum(exp_dur, axis=1) - 1.0        # r_i, frames
        anchors = jax.lax.stop_gradient(anchors)

        # ---- refinement stage (windowed MoBo) ----
        scale = (cfg.energy_scale if cfg.energy_scale is not None
                 else 1.0 / jnp.sqrt(float(cfg.dim)))
        energies_mobo = scale * qk                          # [B, T_y, T_x]
        ys = jnp.arange(T_y, dtype=jnp.float32)[None, :, None]
        in_window = jnp.abs(ys - anchors[:, None, :]) <= float(cfg.window)
        # the pinned final boundary must stay reachable for every item
        is_final = (jnp.arange(T_x)[None, None, :]
                    == text_lengths[:, None, None] - 1)
        at_end = (ys == mel_lengths[:, None, None].astype(jnp.float32) - 1)
        in_window = in_window | (is_final & at_end)
        energies_win = jnp.where(in_window, energies_mobo, -1e15)

        mobo = mobo_forward(energies_win, text_lengths, mel_lengths,
                            cfg.max_duration)
        # Gate infeasible items (no boundary sequence fits the window /
        # max-duration constraints) out of the loss: their ~1e15 sentinel
        # would otherwise swamp metrics while contributing ~zero gradient.
        feasible = mobo["loss"] < 1e14
        per_item = jnp.where(feasible,
                             mobo["loss"] / jnp.maximum(mel_lengths, 1),
                             0.0)
        loss_refine = (jnp.sum(per_item)
                       / jnp.maximum(jnp.sum(feasible), 1))

        result = {
            "log_attn": log_attn,
            "loss_rough": loss_rough,
            "loss_refine": loss_refine,
            "loss": loss_rough + loss_refine,
            # False when no boundary sequence fits the window/max-duration
            # constraints (hard_durations are meaningless then; early in
            # training, widen `window` or warm-start the rough stage).
            "refine_feasible": feasible,
            "rough_posteriors": gamma,
            "rough_durations": exp_dur,
            "anchors": anchors,
            "soft_alignment": mobo["soft_alignment"],
            "expected_durations": mobo["expected_durations"],
        }
        if cfg.use_recon:
            decoded = nn.Dense(cfg.n_mels, name="mel_decoder")(keys)
            recon = jnp.einsum("byx,bxd->byd", mobo["soft_alignment"],
                               decoded)
            m = mel_mask[..., None] * feasible[:, None, None]
            result["loss_recon"] = (
                jnp.sum(m * (recon - mel) ** 2)
                / jnp.maximum(m.sum(), 1.0) / cfg.n_mels)
        if compute_hard:
            durs, path = mobo_hard_boundaries(
                jax.lax.stop_gradient(energies_win), text_lengths,
                mel_lengths, cfg.max_duration)
            result["hard_durations"] = durs
            result["hard_path"] = path
        return result
