"""Drop-in MAS inside a VITS/Glow-TTS-style training step.

This mirrors the reference's reconstructed caller pattern (SURVEY.md
§3.3): per step, encoder outputs define a pairwise log-likelihood lattice;
`maximum_path` (non-differentiable, under stop_gradient) picks the hard
monotonic alignment; durations supervise a duration predictor; the
likelihood term flows gradients through the *selected* lattice cells.
With aligner_tpu, the whole step — including the Viterbi DP — is one
jitted XLA program, where the reference implementation round-trips
through the host every step (monotonic_align/__init__.py:11-21).

Run: python examples/vits_style_integration.py   (any backend)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from aligner_tpu import maximum_path
from aligner_tpu.ops.durations import (duration_loss, durations_from_path,
                                       selected_loglik)
from aligner_tpu.utils.masks import lattice_mask


def gaussian_loglik_lattice(mu, logs, mel):
    """VITS-style lattice: log N(mel_frame | mu_token, sigma_token) summed
    over channels. mu, logs: [B, T_x, C]; mel: [B, T_y, C].
    Returns [B, T_x, T_y]."""
    # sum_c log N(y_c; mu_c, s_c) expanded into matmul-friendly terms.
    inv_var = jnp.exp(-2.0 * logs)                                # [B,Tx,C]
    const = jnp.sum(-0.5 * np.log(2 * np.pi) - logs, axis=-1)     # [B,Tx]
    quad = -0.5 * jnp.einsum("byc,bxc->bxy", mel ** 2, inv_var)
    cross = jnp.einsum("byc,bxc->bxy", mel, mu * inv_var)
    center = jnp.sum(-0.5 * mu ** 2 * inv_var, axis=-1)           # [B,Tx]
    return quad + cross + center[:, :, None] + const[:, :, None]


def train_step(params, mel, tokens_emb, mask, text_lengths):
    """One fused step: lattice -> MAS -> duration + likelihood losses."""
    def loss_fn(p):
        mu = tokens_emb @ p["w_mu"]
        logs = tokens_emb @ p["w_logs"]
        value = gaussian_loglik_lattice(mu, logs, mel)
        # Hard alignment: non-differentiable, fully on device.
        path = maximum_path(jax.lax.stop_gradient(value), mask)
        durations = durations_from_path(path)
        log_dur_pred = (tokens_emb @ p["w_dur"]).squeeze(-1)
        l_dur = duration_loss(log_dur_pred, durations, text_lengths)
        # Likelihood through the selected cells only.
        l_mle = -jnp.mean(selected_loglik(value, path)
                          / jnp.maximum(durations.sum(-1), 1))
        return l_mle + l_dur, (l_mle, l_dur)

    (loss, (l_mle, l_dur)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    params = jax.tree.map(lambda p, g: p - 1e-2 * g, params, grads)
    return params, loss, l_mle, l_dur


def main():
    rng = np.random.default_rng(0)
    B, T_x, T_y, C = 8, 24, 96, 20
    tokens_emb = jnp.asarray(rng.standard_normal((B, T_x, 32))
                             .astype(np.float32))
    mel = jnp.asarray(rng.standard_normal((B, T_y, C)).astype(np.float32))
    t_x = jnp.asarray(rng.integers(12, T_x + 1, B), jnp.int32)
    t_y = jnp.asarray(
        np.maximum(np.asarray(t_x) * 2, rng.integers(48, T_y + 1, B)),
        jnp.int32)
    mask = lattice_mask(t_x, t_y, T_x, T_y)
    params = {
        "w_mu": jnp.asarray(rng.standard_normal((32, C)).astype(np.float32)
                            * 0.1),
        "w_logs": jnp.zeros((32, C), jnp.float32),
        "w_dur": jnp.asarray(rng.standard_normal((32, 1)).astype(np.float32)
                             * 0.1),
    }
    step = jax.jit(train_step)
    for i in range(40):
        params, loss, l_mle, l_dur = step(params, mel, tokens_emb, mask,
                                          t_x)
        if i % 10 == 0 or i == 39:
            print(f"step {i:3d}  loss {float(loss):8.3f}  "
                  f"mle {float(l_mle):8.3f}  dur {float(l_dur):6.3f}")
    print("done — MAS ran inside the jitted step on",
          jax.default_backend())


if __name__ == "__main__":
    main()
