"""Pallas TPU kernels for the forward-sum alignment loss.

Same column-scan structure as the MAS kernels (time-major [T_y, B, T_x],
sequential grid with a VMEM carry) with logaddexp in place of max:

* **alpha kernel** — forward log-mass sweep; emits the alpha lattice (the
  custom-VJP residual) and the final carry column (for the per-item
  log-marginal).
* **beta/grad kernel** — reverse sweep over the *message* M[y] = lp[y] +
  beta[y], which needs only the current logp row (no cross-chunk reads);
  emits the gradient rows -g * exp(alpha + M - lp - total) directly, so
  the backward pass is one kernel with no extra posterior buffers.

Bit-exactness is not required here (differentiable loss; the lax version
remains the CPU/test oracle) — parity is asserted to ~1e-5 in tests.
Padding: logp must be pre-masked with NEG at x >= t_x (as in
forward_sum._masked_logp); cells are identified by lp <= NEG/2 in the
backward kernel, and frames y >= t_y freeze/pass through the carries
exactly like the lax scans.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mas_pallas import _pick_chunk, _shift_left, _shift_right

NEG = -1e15


def _alpha_kernel(ty_ref, lp_ref, alpha_ref, final_ref, carry_ref):
    chunk = lp_ref.shape[0]
    B, T_x = carry_ref.shape
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full((B, T_x), NEG, jnp.float32)

    ty = ty_ref[:]
    x = jax.lax.broadcasted_iota(jnp.int32, (B, T_x), 1)
    x_is_0 = x == 0
    first = jnp.where(x_is_0, 0.0, NEG)

    def body(j, prev):
        y = i * chunk + j
        col = lp_ref[j]
        # zero-pad concat shift: ~3x lower chained latency than
        # pltpu.roll on sub-tile rows (see mas_pallas helper comment);
        # the shifted-in lane is masked here anyway.
        shift = jnp.where(x_is_0, NEG, _shift_right(prev, 1))
        inner = jnp.logaddexp(prev, shift)
        alpha = col + jnp.where(y == 0, first, inner)
        alpha = jnp.where(y < ty, alpha, prev)
        alpha_ref[j] = alpha
        return alpha

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:],
                                     unroll=True)

    @pl.when(i == n - 1)
    def _():
        final_ref[:] = carry_ref[:]


def _beta_grad_kernel(tx_ref, ty_ref, total_ref, lp_ref, alpha_ref,
                      grad_ref, carry_ref):
    """Reverse sweep with carry M[y] = lp[y] + beta[y] (the message), so
    each step needs only its own logp row. Emits the posterior occupancy
    gamma = exp(alpha + beta - total); the caller chains the linear
    cotangent (-g) outside the kernel. total_ref: per-item log-marginal
    broadcast to [B, T_x]."""
    chunk = lp_ref.shape[0]
    B, T_x = carry_ref.shape
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full((B, T_x), NEG, jnp.float32)

    tx = tx_ref[:]
    ty = ty_ref[:]
    total = total_ref[:]
    x = jax.lax.broadcasted_iota(jnp.int32, (B, T_x), 1)
    x_is_last = x == tx - 1
    base = (n - 1 - i) * chunk

    def body(jj, m_next):
        j = chunk - 1 - jj
        y = base + j
        lp = lp_ref[j]
        alpha = alpha_ref[j]
        # beta[y] from the next message: stay or advance (x+1).
        shift = _shift_left(m_next, 1)
        shift = jnp.where(x_is_last | (x == T_x - 1), NEG, shift)
        beta = jnp.logaddexp(m_next, shift)
        is_last = y == ty - 1
        beta = jnp.where(is_last, jnp.where(x_is_last, 0.0, NEG), beta)
        live = (y < ty) & (lp > 0.5 * NEG)
        gamma = jnp.where(live, jnp.exp(alpha + beta - total), 0.0)
        grad_ref[j] = gamma
        m = lp + beta
        m = jnp.where(m > 0.5 * NEG, m, NEG)
        return jnp.where(y < ty, m, m_next)

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:],
                                     unroll=True)


def forward_sum_alpha_pallas(lp_tm, t_y, *, interpret: bool = False):
    """lp_tm: [T_y, B, T_x] pre-masked log-probs. Returns (alphas
    [T_y, B, T_x], final carry [B, T_x])."""
    from .mas_pallas import _pad_frames
    lp_tm, T_y0 = _pad_frames(lp_tm)
    T_y, B, T_x = lp_tm.shape
    chunk = _pick_chunk(T_y, B, T_x)
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_x))
    len_spec = pl.BlockSpec((B, T_x), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    grid = T_y // chunk
    alphas, final = pl.pallas_call(
        _alpha_kernel,
        grid=(grid,),
        in_specs=[
            len_spec,
            pl.BlockSpec((chunk, B, T_x), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, B, T_x), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, T_x), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T_y, B, T_x), jnp.float32),
            jax.ShapeDtypeStruct((B, T_x), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((B, T_x), jnp.float32)],
        interpret=interpret,
    )(ty_b, lp_tm)
    return alphas[:T_y0], final


def forward_sum_grad_pallas(lp_tm, alphas, total, t_x, t_y,
                            *, interpret: bool = False):
    """Posterior occupancy gamma [T_y, B, T_x] via the fused beta sweep."""
    from .mas_pallas import _pad_frames
    lp_tm, T_y0 = _pad_frames(lp_tm)
    alphas, _ = _pad_frames(alphas)
    T_y, B, T_x = lp_tm.shape
    chunk = _pick_chunk(T_y, B, T_x)
    grid = T_y // chunk
    tx_b = jnp.broadcast_to(t_x.astype(jnp.int32)[:, None], (B, T_x))
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_x))
    total_b = jnp.broadcast_to(total.astype(jnp.float32)[:, None],
                               (B, T_x))
    len_spec = pl.BlockSpec((B, T_x), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    rev = lambda i: (grid - 1 - i, 0, 0)
    gamma = pl.pallas_call(
        _beta_grad_kernel,
        grid=(grid,),
        in_specs=[
            len_spec, len_spec, len_spec,
            pl.BlockSpec((chunk, B, T_x), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, T_x), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, B, T_x), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_y, B, T_x), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, T_x), jnp.float32)],
        interpret=interpret,
    )(tx_b, ty_b, total_b, lp_tm, alphas)
    return gamma[:T_y0]
