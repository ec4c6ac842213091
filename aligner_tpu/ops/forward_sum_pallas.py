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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mas_pallas import _pick_chunk, _shift_left, _shift_right

NEG = -1e15

# Latency-regime gate for the pair-composed alpha sweep (mirrors
# mas_pallas.QUAD_MAX_ELEMS).
FS_PAIR_MAX_ELEMS = 4096


def _alpha_pair_step(prev, c1, c2, y1, ty, x, x_is_0):
    """Two composed forward-sum frames: the nested two-frame logaddexp
    tree expands to one flat, max-stabilised 4-term logsumexp —
    log(e^{p+c1} + e^{p1+c1} + e^{p1+c1'} + e^{p2+c1'}) + c2 — so two
    frames cost one cross-lane shift latency and one exp/log round.
    Numerically equivalent to the sequential nesting within normal LSE
    accuracy (this loss has a tolerance contract, not a bit contract).
    The y == 0 initialisation and per-item freeze are selected against
    the (shift-reusing) single-step results. Returns (alpha1, alpha2) —
    alpha1 is the exact sequential intermediate expression."""
    shr = _shift_right
    y2 = y1 + 1
    r1, r2 = shr(prev, 1), shr(prev, 2)
    sel1 = jnp.where(x_is_0, NEG, r1)
    c1s1 = shr(c1, 1)
    first = jnp.where(x_is_0, 0.0, NEG)
    T1 = c1 + prev
    T2 = c1 + sel1
    T3 = jnp.where(x_is_0, NEG, c1s1 + r1)
    T4 = jnp.where(x < 2, NEG, c1s1 + r2)
    m = jnp.maximum(jnp.maximum(T1, T2), jnp.maximum(T3, T4))
    s = (jnp.exp(T1 - m) + jnp.exp(T2 - m)
         + jnp.exp(T3 - m) + jnp.exp(T4 - m))
    a2_active = c2 + (m + jnp.log(s))

    a1_active = c1 + jnp.logaddexp(prev, sel1)
    init1 = c1 + first
    a1 = jnp.where(y1 == 0, init1,
                   jnp.where(y1 < ty, a1_active, prev))
    a2_init = c2 + jnp.logaddexp(
        init1, jnp.where(x_is_0, NEG, shr(init1, 1)))
    a2 = jnp.where(y2 < ty,
                   jnp.where(y1 == 0, a2_init,
                             jnp.where(y1 < ty, a2_active, prev)),
                   a1)
    return a1, a2


def _alpha_kernel(ty_ref, lp_ref, alpha_ref, final_ref, carry_ref,
                  *, pair: bool = False):
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

    def pair_body(jj, prev):
        j = 2 * jj
        a1, a2 = _alpha_pair_step(prev, lp_ref[j], lp_ref[j + 1],
                                  i * chunk + j, ty, x, x_is_0)
        alpha_ref[j] = a1
        alpha_ref[j + 1] = a2
        return a2

    if pair:  # call site guarantees chunk % 2 == 0 when pair is set
        carry_ref[:] = jax.lax.fori_loop(0, chunk // 2, pair_body,
                                         carry_ref[:], unroll=True)
    else:
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
    broadcast to [B, T_x].

    Pair composition was implemented and measured as an exact wash here
    (0.1097 vs 0.1096 ms at B=16, identical at B=1): unlike the alpha
    sweep, the per-frame gamma-emission exp dominates and is irreducible
    by composition, so the per-frame body stays."""
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
    maskA = x_is_last | (x == T_x - 1)
    end_col = jnp.where(x_is_last, 0.0, NEG)
    base = (n - 1 - i) * chunk

    def body(jj, m_next):
        j = chunk - 1 - jj
        y = base + j
        lp = lp_ref[j]
        alpha = alpha_ref[j]
        # beta[y] from the next message: stay or advance (x+1).
        shift = _shift_left(m_next, 1)
        shift = jnp.where(maskA, NEG, shift)
        beta = jnp.logaddexp(m_next, shift)
        is_last = y == ty - 1
        beta = jnp.where(is_last, end_col, beta)
        live = (y < ty) & (lp > 0.5 * NEG)
        gamma = jnp.where(live, jnp.exp(alpha + beta - total), 0.0)
        grad_ref[j] = gamma
        m = lp + beta
        m = jnp.where(m > 0.5 * NEG, m, NEG)
        return jnp.where(y < ty, m, m_next)

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:],
                                     unroll=True)


def forward_sum_alpha_pallas(lp_tm, t_y, *, interpret: bool = False,
                             pair: bool | None = None):
    """lp_tm: [T_y, B, T_x] pre-masked log-probs. Returns (alphas
    [T_y, B, T_x], final carry [B, T_x]). pair: None enables the
    two-frame composed sweep in the latency regime (B*T_x <=
    FS_PAIR_MAX_ELEMS); True/False force."""
    from .mas_pallas import _pad_frames
    lp_tm, T_y0 = _pad_frames(lp_tm)
    T_y, B, T_x = lp_tm.shape
    chunk = _pick_chunk(T_y, B, T_x)
    if pair is None:
        pair = B * T_x <= FS_PAIR_MAX_ELEMS
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_x))
    len_spec = pl.BlockSpec((B, T_x), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    grid = T_y // chunk
    alphas, final = pl.pallas_call(
        functools.partial(_alpha_kernel, pair=pair and chunk % 2 == 0),
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
                            *, interpret: bool = False,
                            pair: bool | None = None):
    """Posterior occupancy gamma [T_y, B, T_x] via the fused beta sweep.
    `pair` is accepted for API symmetry with the alpha sweep but is a
    no-op: composition was measured as a wash for this kernel (see
    _beta_grad_kernel docstring)."""
    from .mas_pallas import _pad_frames
    lp_tm, T_y0 = _pad_frames(lp_tm)
    alphas, _ = _pad_frames(alphas)
    T_y, B, T_x = lp_tm.shape
    chunk = _pick_chunk(T_y, B, T_x)
    del pair  # measured no-op for this kernel; kept for API symmetry
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
