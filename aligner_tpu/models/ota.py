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
    # Softmax temperature on the -L2² energies. 0.1 is the measured
    # recipe (docs/PERF.md quality table: every >= 0.9 boundary-F1 run
    # uses 0.1-0.15; the OTA paper's 0.0005 — round-2's default — fails
    # to binarise sharply at realistic step counts on our corpus scale
    # because |q - k|² here is O(dim), not O(1)).
    temperature: float = 0.1
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
    # Implicit pause modeling — the reference OTA branch's stated goal
    # (README.md:21-25): interleave an optional shared pause state
    # between tokens (skip-state DP, ops/skip_dp.py) so silence frames
    # align to pauses without silence tokens in the transcript. The
    # attention/losses then run over 2*T_x+1 expanded states, and the
    # outputs gain `pause_durations` [B, T_x+1].
    model_pauses: bool = False
    # Prior shape for pause states: "bridge" spans both neighbouring
    # tokens' beta-binomial peaks (logaddexp average), "inherit" copies
    # the following token's row (round-2 behaviour). See
    # ops.skip_dp.expand_prior_to_states.
    pause_prior: str = "bridge"
    # Constant log-odds added to the pause class's energy before the
    # label softmax: a per-frame occupancy cost (negative discourages
    # pauses from absorbing token frames; 0 = neutral).
    pause_bias: float = 0.0
    # Static log-cost per pause ENTERED (applied on the skip-DP's
    # advance-into-pause transitions, so it scales with the number of
    # pauses used, not their length — a pause-count prior; negative
    # suppresses spurious pauses). See ops.skip_dp's module docstring.
    pause_enter_cost: float = 0.0
    # Weight of the silence-anchor auxiliary (requires use_recon): pulls
    # the pause key's decoded spectrum toward the batch's silence
    # estimate (each utterance's minimum-energy frame). Round-4 lever
    # for the hard-corpus pause-placement swaps (docs/design.md): a
    # pause key that decodes to true silence stops speech frames from
    # preferring the pause state one gap over. 0 disables.
    pause_silence_anchor: float = 0.0
    # Mixed precision: "bfloat16" runs the encoders and the pairwise
    # energy matmul at MXU bf16 rate (params stay float32, flax
    # convention); the log-softmax, prior, forward-sum and MAS lattices
    # always run in float32 — path bit-exactness is a property of the
    # lattice the DP receives, which with bf16 encoders is (by design)
    # a coarser lattice. Default float32 is numerically unchanged.
    compute_dtype: str = "float32"


class OTAAligner(nn.Module):
    """Returns the soft/hard alignment artefacts and both losses."""
    config: OTAConfig = OTAConfig()

    @nn.compact
    def __call__(self, tokens, mel, text_lengths, mel_lengths,
                 pause_bias=None):
        """tokens [B, T_x] int32; mel [B, T_y, n_mels];
        text_lengths, mel_lengths [B] int32.

        pause_bias: optional (traced) scalar overriding
        config.pause_bias — lets a training schedule anneal the pause
        occupancy cost per step without recompiling (see
        train.step.make_train_step's apply_extra hook)."""
        from .encoders import MelEncoder, TextEncoder
        cfg = self.config
        B, T_x = tokens.shape
        T_y = mel.shape[1]
        mel_mask = sequence_mask(mel_lengths, T_y)

        dtype = (None if cfg.compute_dtype == "float32"
                 else jnp.dtype(cfg.compute_dtype))
        text_mask = sequence_mask(text_lengths, T_x)
        keys = TextEncoder(cfg.vocab_size, cfg.dim, cfg.hidden,
                           dtype=dtype, name="text_encoder")(
            tokens, text_mask)
        if cfg.model_pauses:
            # ONE shared learned pause key, appended as an extra *label*
            # after the conv encoder (interleaving pause ids before the
            # encoder contaminates every gap's pause key with its
            # neighbours' embeddings — measured to collapse pause usage).
            # zeros init keeps it symmetric with the near-zero conv-
            # initialised token keys under the -L2 energy.
            pause_key = self.param(
                "pause_key", nn.initializers.zeros, (cfg.dim,))
            keys = jnp.concatenate(
                [keys, jnp.broadcast_to(
                    pause_key[None, None, :].astype(keys.dtype),
                    (B, 1, cfg.dim))], axis=1)
            # label axis = T_x tokens + 1 pause class
            text_mask = jnp.concatenate(
                [text_mask, jnp.ones((B, 1), text_mask.dtype)], axis=1)
        queries = MelEncoder(cfg.dim, cfg.hidden, dtype=dtype,
                             name="mel_encoder")(mel, mel_mask)

        # Pairwise squared L2 via one MXU matmul:
        # |q|² - 2 q·k + |k|², energies = -temp * dist². The big qk
        # product runs in the compute dtype (bf16 inputs accumulate in
        # f32 on the MXU); the squares and everything downstream are
        # float32.
        qf = queries.astype(jnp.float32)
        kf = keys.astype(jnp.float32)
        q2 = jnp.sum(qf * qf, axis=-1, keepdims=True)             # [B,T_y,1]
        k2 = jnp.sum(kf * kf, axis=-1)[:, None, :]                # [B,1,T_x]
        qk = jnp.einsum("byd,bxd->byx", queries, keys,
                        preferred_element_type=jnp.float32)
        dist2 = q2 - 2.0 * qk + k2
        energies = -cfg.temperature * dist2

        # Mask padded text tokens before the softmax over text.
        energies = jnp.where(text_mask[:, None, :] > 0, energies, -1e9)
        if cfg.model_pauses and (pause_bias is not None or cfg.pause_bias):
            bias = cfg.pause_bias if pause_bias is None else pause_bias
            energies = energies.at[:, :, T_x].add(bias)
        # Softmax over LABELS (tokens [+ pause class]), the CTC
        # normalisation: the single pause class competes once per frame
        # regardless of how many lattice states replicate it. A softmax
        # over the 2*T_x+1 states instead hands the pause T_x+1 shares
        # of attention against ~half the posterior mass, and the shared
        # key is repelled from every query at once (measured collapse
        # to zero pause occupancy within 30 steps).
        log_attn = jax.nn.log_softmax(energies, axis=-1)
        log_attn_labels = log_attn      # [B, T_y, T_x (+1)] — for recon

        if cfg.model_pauses:
            # Broadcast label log-probs onto the expanded state axis:
            # token j -> state 2j+1, the pause class -> every even state.
            la_tok = log_attn[:, :, :T_x]
            la_pause = log_attn[:, :, T_x:]
            T_s = 2 * T_x + 1
            log_attn = (jnp.zeros((B, T_y, T_s), log_attn.dtype)
                        .at[:, :, 1::2].set(la_tok)
                        .at[:, :, 0::2].set(
                            jnp.broadcast_to(la_pause,
                                             (B, T_y, T_x + 1))))

        logp = log_attn
        if cfg.use_prior:
            prior = beta_binomial_log_prior(
                text_lengths, mel_lengths, T_x, T_y, cfg.prior_omega)
            if cfg.model_pauses:
                from ..ops.skip_dp import expand_prior_to_states
                prior = expand_prior_to_states(prior, text_lengths,
                                               mode=cfg.pause_prior)
            logp = logp + prior

        if cfg.model_pauses:
            from ..ops.skip_dp import (forward_sum_skip_loss,
                                       mas_skip_path_frame_major,
                                       split_state_durations)
            fs = forward_sum_skip_loss(logp, text_lengths, mel_lengths,
                                       enter_cost=cfg.pause_enter_cost)
            hard = mas_skip_path_frame_major(
                jax.lax.stop_gradient(logp), text_lengths, mel_lengths,
                implementation=("auto" if cfg.mas_implementation == "auto"
                                else cfg.mas_implementation),
                enter_cost=cfg.pause_enter_cost)
        else:
            fs = forward_sum_loss(logp, text_lengths, mel_lengths)
            # Hard Viterbi binarisation on the prior-augmented lattice,
            # non-differentiable (reference call stack §3.3).
            hard = mas_path_frame_major(
                jax.lax.stop_gradient(logp), text_lengths, mel_lengths,
                implementation=cfg.mas_implementation)
        loss_forward_sum = jnp.mean(fs / jnp.maximum(mel_lengths, 1))

        # Binarisation (KL) loss: cross-entropy of the soft attention
        # against the hard path, per real frame.
        ce = -jnp.sum(hard * log_attn, axis=(1, 2))
        loss_bin = jnp.mean(ce / jnp.maximum(mel_lengths, 1))

        state_durations = jnp.sum(hard, axis=1)     # [B, T_x] or [B, T_s]
        pause_durations = None
        if cfg.model_pauses:
            durations, pause_durations = split_state_durations(
                state_durations)
        else:
            durations = state_durations

        loss_recon = 0.0
        if cfg.use_recon:
            # Reconstruction runs over the label axis (tokens + pause
            # class): the pause key decodes to the silence spectrum,
            # anchoring silence frames to the pause class.
            decoded = nn.Dense(cfg.n_mels, dtype=dtype,
                               name="mel_decoder")(keys) \
                .astype(jnp.float32)
            recon = jnp.einsum("byx,bxd->byd", jnp.exp(log_attn_labels),
                               decoded)
            frame_mask = mel_mask[..., None]
            loss_recon = (jnp.sum(frame_mask * (recon - mel) ** 2)
                          / jnp.maximum(frame_mask.sum(), 1.0)
                          / cfg.n_mels)
            if cfg.model_pauses and cfg.pause_silence_anchor:
                # Silence anchor: the pause key should decode to the
                # corpus's silence spectrum, not merely to "whatever
                # reconstructs the frames the pause happened to grab" —
                # on hard corpora the recon-only anchor lets the pause
                # drift onto speech one gap over (placement swaps, see
                # docs/design.md). Estimate silence per utterance as
                # the minimum-energy valid frame; no labels needed.
                energy = jnp.where(mel_mask > 0,
                                   jnp.mean(mel, axis=-1), jnp.inf)
                idx = jnp.argmin(energy, axis=1)                 # [B]
                silence = jnp.take_along_axis(
                    mel, idx[:, None, None], axis=1)[:, 0]       # [B,n_mels]
                target = jax.lax.stop_gradient(jnp.mean(silence, axis=0))
                dec_pause = decoded[:, T_x].astype(jnp.float32)  # [B,n_mels]
                anchor = jnp.mean((dec_pause - target[None, :]) ** 2)
                loss_recon = (loss_recon
                              + cfg.pause_silence_anchor * anchor)

        out = {
            "loss_recon": loss_recon,
            "log_attn": log_attn,
            "logp_with_prior": logp,
            "loss_forward_sum": loss_forward_sum,
            "loss_bin": loss_bin,
            "hard_path": hard,
            "durations": durations,
        }
        if pause_durations is not None:
            out["pause_durations"] = pause_durations
        return out
