"""Beta-binomial alignment prior — K4 of the capability inventory.

The OTA method (arXiv 2108.10447, README.md:50) adds a static, cigar-shaped
near-diagonal prior to the soft attention so alignment learning converges
quickly: for mel frame y (1-indexed) the text position follows

    x ~ BetaBinomial(n = t_x - 1, a = omega * y, b = omega * (t_y + 1 - y))

whose mean tracks the diagonal x ≈ (t_x - 1) * y / t_y. `omega` (the
"scaling factor") controls the width; omega = 1 is the common default.

Computed fully on device with per-item ragged lengths as traced values, so
it lives inside the jitted training step. Two implementations:

* ``method="ratio"`` (default) — `gammaln` only for log pmf(0) on the
  [B, T_y] grid, then the exact pmf ratio recurrence cumulated along x:

      log pmf(x+1) - log pmf(x)
          = log((n - x)(a + x)) - log((x + 1)(b + n - x - 1))

  One log + a lane cumsum per lattice cell instead of ~10 gammaln
  evaluations — ~6x less device time at training shapes, and slightly
  *more* accurate than f32 gammaln differencing.
* ``method="gammaln"`` — the direct closed form, kept as the oracle.

Cells outside (t_x, t_y) get log-prob NEG.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

NEG = -1e15


def _log_beta(a, b):
    return gammaln(a) + gammaln(b) - gammaln(a + b)


def _prior_gammaln(t_x, t_y, max_text: int, max_mel: int, omega: float):
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


def _prior_ratio(t_x, t_y, max_text: int, max_mel: int, omega: float):
    tx = t_x.astype(jnp.float32)[:, None]                  # [B, 1]
    ty = t_y.astype(jnp.float32)[:, None]
    y1 = jnp.arange(1, max_mel + 1, dtype=jnp.float32)[None, :]  # [1, T_y]
    n = tx - 1.0                                            # [B, 1]
    a = omega * y1                                          # [B, T_y]
    b = omega * (ty + 1.0 - y1)
    frame_ok = y1 <= ty
    b_safe = jnp.where(frame_ok, b, 1.0)
    # log pmf(0) = ln Γ(n+b) + ln Γ(a+b) - ln Γ(a+n+b) - ln Γ(b)
    log_p0 = (gammaln(n + b_safe) + gammaln(a + b_safe)
              - gammaln(a + n + b_safe) - gammaln(b_safe))  # [B, T_y]

    x = jnp.arange(max_text, dtype=jnp.float32)[None, None, :]
    nn = n[:, :, None]                                      # [B, 1, 1]
    aa = a[:, :, None]                                      # [B, T_y, 1]
    bb = b_safe[:, :, None]
    # ratio term r(x) = log pmf(x+1) - log pmf(x), valid for x < n.
    num = (nn - x) * (aa + x)
    den = (x + 1.0) * (bb + nn - x - 1.0)
    ok = x < nn
    r = jnp.where(ok, jnp.log(jnp.where(ok, num / den, 1.0)), 0.0)
    # log pmf(x) = log pmf(0) + sum_{x'<x} r(x'). The exclusive cumsum
    # over the lane axis runs on the MXU as one triangular matmul:
    # jnp.cumsum here lowers to ~log2(T_x) shift-add passes, each a
    # full read+write of the [B, T_y, T_x] lattice (measured +0.89 ms
    # of the 6.8 ms config-5 step — HBM-bound, not compute). One
    # matmul is a single pass, and the elementwise ratio fuses into
    # its producer. HIGHEST precision keeps f32 operand mantissas
    # (the MXU's default f32 path rounds operands to bf16); a <=128-
    # term tree sum is no less accurate than the sequential cumsum.
    tri = jnp.triu(jnp.ones((max_text, max_text), jnp.float32), k=1)
    csum = jax.lax.dot_general(
        r, tri, (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)                # exclusive
    log_pmf = log_p0[:, :, None] + csum
    in_range = (x <= nn) & frame_ok[:, :, None]
    return jnp.where(in_range, log_pmf, NEG)


def beta_binomial_log_prior(t_x, t_y, max_text: int, max_mel: int,
                            omega: float = 1.0, *,
                            method: str = "ratio"):
    """Log prior lattice [B, T_y, T_x] (frame-major, matching the
    aligner's attention layout).

    t_x, t_y: [B] int32 true lengths; max_text/max_mel: padded sizes.
    """
    if method == "ratio":
        return _prior_ratio(t_x, t_y, max_text, max_mel, omega)
    if method == "gammaln":
        return _prior_gammaln(t_x, t_y, max_text, max_mel, omega)
    raise ValueError(f"unknown method: {method!r}")
