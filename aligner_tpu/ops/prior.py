"""Beta-binomial alignment prior — K4 of the capability inventory.

The OTA method (arXiv 2108.10447, README.md:50) adds a static, cigar-shaped
near-diagonal prior to the soft attention so alignment learning converges
quickly: for mel frame y (1-indexed) the text position follows

    x ~ BetaBinomial(n = t_x - 1, a = omega * y, b = omega * (t_y + 1 - y))

whose mean tracks the diagonal x ≈ (t_x - 1) * y / t_y. `omega` (the
"scaling factor") controls the width; omega = 1 is the common default.

Computed fully on device with `gammaln` (no scipy host callback), with
per-item ragged lengths as traced values, so it can live inside a jitted
training step. Cells outside (t_x, t_y) get log-prob NEG.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

NEG = -1e15


def _log_beta(a, b):
    return gammaln(a) + gammaln(b) - gammaln(a + b)


def beta_binomial_log_prior(t_x, t_y, max_text: int, max_mel: int,
                            omega: float = 1.0):
    """Log prior lattice [B, T_y, T_x] (frame-major, matching the
    aligner's attention layout).

    t_x, t_y: [B] int32 true lengths; max_text/max_mel: padded sizes.
    """
    t_x = t_x.astype(jnp.float32)[:, None, None]
    t_y = t_y.astype(jnp.float32)[:, None, None]
    k = jnp.arange(max_text, dtype=jnp.float32)[None, None, :]     # x
    y1 = jnp.arange(1, max_mel + 1, dtype=jnp.float32)[None, :, None]

    n = t_x - 1.0
    a = omega * y1
    b = omega * (t_y + 1.0 - y1)
    # Guard padded cells before gammaln (negative args -> nan).
    in_range = (k <= n) & (y1 <= t_y)
    b_safe = jnp.where(in_range, b, 1.0)
    k_safe = jnp.where(in_range, k, 0.0)
    log_pmf = (gammaln(n + 1.0) - gammaln(k_safe + 1.0)
               - gammaln(n - k_safe + 1.0)
               + _log_beta(k_safe + a, n - k_safe + b_safe)
               - _log_beta(a, b_safe))
    return jnp.where(in_range, log_pmf, NEG)
