"""MoBoAligner: monotonic boundary search with max-duration constraint — K7.

Reimplements the algorithm of "MoBoAligner: a Neural Alignment Model for
Non-autoregressive TTS with Monotonic Boundary Search" (arXiv 2005.08528;
the reference project's MoBoAligner branch is its unofficial
implementation, README.md:9-13). The defining constraint — and the
reference README's stated limitation (README.md:13) — is the **maximum
duration window D**: token i's boundary b_i can lie at most D frames after
b_{i-1}.

Formulation (log-domain, frames 0..t_y-1, virtual boundary b_{-1} = -1,
final boundary pinned b_{t_x-1} = t_y - 1):

    transition  log w_i(t' -> t'+d) = e_i(t'+d) - logsumexp_{d'<=D} e_i(t'+d')
    forward     logB_i(t) = e~_i(t) + logsumexp_{d=1..D} [logB_{i-1}(t-d)
                                                          - z_i(t-d)]
    posterior   P(b_i = t | b_last = t_y-1) = exp(logB_i + logbeta_i - total)
    alignment   gamma[i, t] = F_{i-1}(t-1) - F_i(t-1)   (posterior CDFs)

TPU mapping: unlike MAS/forward-sum (sequential in mel frames), the
boundary recursion is **sequential in text tokens** (~T_x steps) with
[B, T_y, D]-parallel work per step — a `lax.scan` over tokens where the
max-duration window is a static stack of D lane-shifts feeding one
logsumexp; everything fuses into a single XLA loop on the VPU. The hard
mode swaps logsumexp for max, records int32 backpointers (the chosen d),
and backtracks over tokens on device — the same column-sweep-with-banded-
transitions primitive as the MAS kernel, transposed to the token axis
(SURVEY.md §2.3 K7).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -1e15


def _sb(arr, d):
    """out[..., t] = arr[..., t - d], NEG-padded."""
    pad = jnp.full(arr.shape[:-1] + (d,), NEG, arr.dtype)
    return jnp.concatenate([pad, arr[..., :-d]], axis=-1)


def _sf(arr, d):
    """out[..., t] = arr[..., t + d], NEG-padded."""
    pad = jnp.full(arr.shape[:-1] + (d,), NEG, arr.dtype)
    return jnp.concatenate([arr[..., d:], pad], axis=-1)


def _window_lse(arr, D, shift):
    """logsumexp_{d=1..D} arr(t -/+ d) as a max/sum accumulation —
    identical values to a stacked logsumexp but without materialising the
    [.., T, D] stack, which XLA fuses ~3x faster inside the token scan."""
    m = shift(arr, 1)
    for d in range(2, D + 1):
        m = jnp.maximum(m, shift(arr, d))
    s = jnp.zeros_like(arr)
    for d in range(1, D + 1):
        s = s + jnp.exp(shift(arr, d) - m)
    return m + jnp.log(s)


def _window_max_argmax_back(arr, D):
    """(max, argmax-d) over d = 1..D of arr(t - d)."""
    m = _sb(arr, 1)
    bp = jnp.ones(arr.shape, jnp.int32)
    for d in range(2, D + 1):
        c = _sb(arr, d)
        take = c > m
        m = jnp.where(take, c, m)
        bp = jnp.where(take, d, bp)
    return m, bp


def _window_normalizer(e_row, D):
    """z(t') = logsumexp_{d=1..D} e(t' + d); e_row [B, T_y+1] on the
    shifted grid (position 0 = virtual frame -1)."""
    return _window_lse(e_row, D, _sf)


def _prep_energies(energies, t_x, t_y):
    """energies [B, T_y, T_x] -> token-major [T_x, B, T_y+1] with padding
    masked to NEG and a NEG column prepended (virtual frame -1 slot)."""
    B, T_y, T_x = energies.shape
    ys = jnp.arange(T_y, dtype=jnp.int32)
    e = jnp.where(ys[None, :, None] < t_y[:, None, None],
                  energies.astype(jnp.float32), NEG)
    e = jnp.moveaxis(e, 2, 0)  # [T_x, B, T_y]
    pad = jnp.full((T_x, B, 1), NEG, jnp.float32)
    return jnp.concatenate([pad, e], axis=2)  # [T_x, B, T_y+1]


# Per-grid-step VMEM footprint of the token-sweep kernels: the
# double-buffered f32 value and output blocks (chunk = 8 token rows
# each), the carry and the broadcast length rows come to ~136 bytes per
# [B, T_y1_padded] element; 90K elements keeps the step within the
# ~12 MB scoped-VMEM budget the MAS kernels also use (e.g. config 4
# B=16 x 1152 = 18K; B=64 x 1152 = 74K fits, B=128 falls back).
MOBO_PALLAS_MAX_ELEMS = 90_000


def _use_pallas(B: int, T_y1: int) -> bool:
    """Route the sequential token sweeps to the Pallas kernels on TPU
    (measured 2.14x over the fused XLA scan at config 4 —
    scripts/mobo_pallas_proto.py, docs/design.md); the lax scans below
    remain the CPU/interpret oracle, mirroring the MAS kernel/oracle
    split. Shapes whose whole-batch [B, T_y1] rows exceed the VMEM
    budget fall back to the lax scans (the sweeps are token-sequential,
    so batch tiling would multiply the serial chain — not worth it for
    the rare huge-batch MoBo loss call)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    pad = (-T_y1) % (128 if T_y1 > 128 else 8)
    return B * (T_y1 + pad) <= MOBO_PALLAS_MAX_ELEMS


def _boundary_scan(e_tm, t_x, t_y, D, use_max: bool):
    """Forward boundary recursion.

    e_tm: [T_x, B, T_y1] token-major padded energies (T_y1 = T_y + 1,
    position 0 = virtual frame -1). Returns (logB stack [T_x, B, T_y1],
    backpointers [T_x, B, T_y1] int32 with the chosen d, only meaningful
    when use_max).
    """
    T_x, B, T_y1 = e_tm.shape
    init = jnp.full((B, T_y1), NEG, jnp.float32).at[:, 0].set(0.0)

    def step(carry, inputs):
        i, e_i = inputs
        z = _window_normalizer(e_i, D)
        # A(t') = logB_{i-1}(t') - z(t'); guard fully-dead windows.
        a = jnp.where(z > 0.5 * NEG, carry - z, NEG)
        if use_max:
            inner, bp = _window_max_argmax_back(a, D)
        else:
            inner = _window_lse(a, D, _sb)
            bp = jnp.zeros((B, T_y1), jnp.int32)
        new = e_i + inner
        new = jnp.where(new > 0.5 * NEG, new, NEG)
        # Ragged freeze: items with i >= t_x keep logB_{t_x-1}.
        new = jnp.where(i < t_x[:, None], new, carry)
        return new, (new, bp)

    xs = jnp.arange(T_x, dtype=jnp.int32)
    _, (logB, bps) = jax.lax.scan(step, init, (xs, e_tm))
    return logB, bps


def _total_from_logB(logB_stack, t_x, t_y):
    """log P(b_{t_x-1} = t_y-1): gather the frozen final carry at the
    shifted end position t_y."""
    T_x, B, T_y1 = logB_stack.shape
    final = logB_stack[-1]  # [B, T_y1] (frozen at token t_x-1)
    pos = jnp.arange(T_y1, dtype=jnp.int32)
    onehot = (pos[None, :] == t_y[:, None]).astype(final.dtype)
    return jnp.sum(final * onehot, axis=1)


def _beta_scan(e_tm, t_x, t_y, D):
    """Backward recursion: logbeta_i(t) = logsumexp_d [e_{i+1}(t+d)
    - z_{i+1}(t) + logbeta_{i+1}(t+d)]; init at the pinned final boundary."""
    T_x, B, T_y1 = e_tm.shape
    pos = jnp.arange(T_y1, dtype=jnp.int32)
    end_row = jnp.where(pos[None, :] == t_y[:, None], 0.0, NEG)

    def step(nxt, inputs):
        i, e_next = inputs  # e_next = e_{i+1}
        z_next = _window_normalizer(e_next, D)
        inner = _window_lse(
            jnp.where(e_next > 0.5 * NEG, e_next, NEG) + nxt, D, _sf)
        beta = jnp.where(z_next > 0.5 * NEG, inner - z_next, NEG)
        # i == t_x - 1: this is the last real token -> pinned boundary.
        beta = jnp.where(i == t_x[:, None] - 1, end_row, beta)
        # i >= t_x: dead tokens, pass through.
        beta = jnp.where(i < t_x[:, None], beta, nxt)
        return beta, beta

    xs = jnp.arange(T_x, dtype=jnp.int32)
    e_next = jnp.concatenate(
        [e_tm[1:], jnp.full((1, B, T_y1), NEG, jnp.float32)], axis=0)
    init = jnp.full((B, T_y1), NEG, jnp.float32)
    _, betas = jax.lax.scan(step, init, (xs, e_next), reverse=True)
    return betas


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mobo_log_marginal(energies, t_x, t_y, max_duration: int):
    """log P(b_{t_x-1} = t_y - 1) — the MoBo marginal, with an analytic
    VJP instead of autodiff through the scans:

        d total / d e_i(t) = xi_i(t) - sum_d xi_{i-1}(t-d) exp(e_i(t)
                                                              - z_i(t-d))

    (posterior boundary marginal minus the expected window-softmax mass;
    the per-token gradient rows sum to zero). One beta scan + D shifted
    logaddexp accumulations — roughly half the cost and memory of
    differentiating through the forward scan.
    """
    total, _ = _mobo_log_marginal_fwd(energies, t_x, t_y, max_duration)
    return total


def _alpha(e_tm, t_x, t_y, D):
    """logB stack via the Pallas kernel on TPU, lax scan elsewhere.

    Only for non-autodiff surfaces: Pallas kernels have no reverse-mode
    AD rule, so these helpers are only called inside custom-VJP
    primals (`mobo_log_marginal`, `_mobo_ab`) and the stop-gradient
    hard mode — gradients are analytic, never traced through the
    kernels."""
    if _use_pallas(e_tm.shape[1], e_tm.shape[2]):
        from .mobo_pallas import mobo_alpha_pallas
        return mobo_alpha_pallas(e_tm, t_x, D)
    return _boundary_scan(e_tm, t_x, t_y, D, use_max=False)[0]


def _beta(e_tm, t_x, t_y, D):
    """beta stack via the Pallas kernel on TPU (see _alpha's AD note)."""
    if _use_pallas(e_tm.shape[1], e_tm.shape[2]):
        from .mobo_pallas import mobo_beta_pallas
        return mobo_beta_pallas(e_tm, t_x, t_y, D)
    return _beta_scan(e_tm, t_x, t_y, D)


def _mobo_log_marginal_fwd(energies, t_x, t_y, max_duration):
    e_tm = _prep_energies(energies, t_x, t_y)
    logB = _alpha(e_tm, t_x, t_y, max_duration)
    total = _total_from_logB(logB, t_x, t_y)
    return total, (e_tm, logB, total, t_x, t_y)


def _mobo_log_marginal_bwd(max_duration, res, g):
    e_tm, logB, total, t_x, t_y = res
    T_x, B, T_y1 = e_tm.shape
    D = max_duration
    betas = _beta(e_tm, t_x, t_y, D)
    log_xi = logB + betas - total[None, :, None]      # [T_x, B, T_y1]

    # log xi_{i-1}: virtual boundary xi_{-1} = delta(p = 0).
    pos = jnp.arange(T_y1, dtype=jnp.int32)
    xi_init = jnp.where(pos[None, :] == 0, 0.0, NEG)  # [1-broadcast, T_y1]
    log_xi_prev = jnp.concatenate(
        [jnp.broadcast_to(xi_init, (1, B, T_y1)), log_xi[:-1]], axis=0)

    # z_i(p') per token (window normalizer on the shifted grid).
    z = jax.vmap(lambda e: _window_normalizer(e, D))(e_tm)
    a = jnp.where(z > 0.5 * NEG, log_xi_prev - z, NEG)

    # logsumexp over d of a(p - d), accumulated to bound memory.
    acc = _window_lse(a, D, _sb)

    xs = jnp.arange(T_x, dtype=jnp.int32)
    live = xs[:, None, None] < t_x[None, :, None]
    xi = jnp.where(live, jnp.exp(log_xi), 0.0)
    c = jnp.where(live, jnp.exp(e_tm + acc), 0.0)
    grad_tm = (xi - c) * g[None, :, None]
    # back to [B, T_y, T_x], dropping the virtual frame -1 column.
    grad = jnp.moveaxis(grad_tm[:, :, 1:], 0, 2)
    return grad, None, None


mobo_log_marginal.defvjp(_mobo_log_marginal_fwd, _mobo_log_marginal_bwd)


# ---------------------------------------------------------------------
# Differentiable (alpha, beta, total) core with an analytic adjoint.
#
# `mobo_forward`'s posteriors ARE an autodiff surface (the MoBo/RoMo
# reconstruction objectives differentiate through gamma), and Pallas
# kernels have no reverse-mode AD rule — so round 2/3 kept the soft
# path on lax scans (1.229 ms at config 4 vs 0.910 for the Pallas'd
# loss+grad). This custom_vjp removes that constraint: the primal runs
# the Pallas alpha/beta token sweeps, and the backward is the
# hand-derived adjoint of the two recursions — two more lax token
# scans of the same window-shift cost class, consuming the saved
# alpha/beta stacks as residuals. All downstream posterior/CDF math
# stays plain XLA and autodiffs through normally.
#
# Adjoint math (shifted grid, position 0 = virtual frame -1):
#   alpha chain   alpha_i(p) = e_i(p) + LSE_d A_i(p-d),
#                 A_i(q) = alpha_{i-1}(q) - z_i(q),
#                 z_i(q) = LSE_d e_i(q+d)
#     with softmax weights w_d(p) = exp(A_i(p-d) - inner_i(p)),
#     inner_i = alpha_i - e_i (recomputed from the saved stack):
#       alphabar_{i-1}(q) += sum_d u_i(q+d) w_d(q+d)   (= -zbar_i(q))
#       ebar_i(p)         += u_i(p) + sum_d zbar_i(p-d) v_i(p-d, d),
#                            v_i(q, d) = exp(e_i(q+d) - z_i(q))
#   beta chain    beta_i(p) = LSE_d [e^_{i+1}(p+d) + beta_{i+1}(p+d)]
#                             - z_{i+1}(p)
#     with s_d(p) = exp(e^_{i+1}(p+d) + beta_{i+1}(p+d) - inner_i(p)),
#     inner_i = beta_i + z_{i+1}:
#       betabar_{i+1}(q) += sum_d u_i(q-d) s_d(q-d)
#       ebar_{i+1}(q)    += sum_d u_i(q-d) [s_d(q-d) - v_{i+1}(q-d, d)]
#   Every exp argument is <= 0 (LSE >= each term), so the adjoint is
#   overflow-free; clamped/frozen/pinned cells are masked exactly as in
#   the primal `where` guards. Verified against jax.grad through the
#   lax scans and finite differences (tests/test_mobo.py).
# ---------------------------------------------------------------------


def _shift0(arr, d):
    """out[..., p] = arr[..., p - d] (d > 0) or arr[..., p - d] with
    d < 0 reading forward; zero-padded (adjoint flows, not log-domain)."""
    z = jnp.zeros(arr.shape[:-1] + (abs(d),), arr.dtype)
    if d > 0:
        return jnp.concatenate([z, arr[..., :-d]], axis=-1)
    return jnp.concatenate([arr[..., -d:], z], axis=-1)


def _mobo_ab_primal(e_tm, t_x, t_y, max_duration):
    logB = _alpha(e_tm, t_x, t_y, max_duration)
    betas = _beta(e_tm, t_x, t_y, max_duration)
    total = _total_from_logB(logB, t_x, t_y)
    return logB, betas, total


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mobo_ab(e_tm, t_x, t_y, max_duration: int):
    """(logB stack, beta stack, log-total), differentiable in e_tm via
    the analytic adjoint above. Primal dispatches to the Pallas token
    sweeps on TPU; cotangents on all three outputs are honoured (the
    posterior, gamma and loss gradients all flow)."""
    return _mobo_ab_primal(e_tm, t_x, t_y, max_duration)


def _mobo_ab_fwd(e_tm, t_x, t_y, max_duration):
    out = _mobo_ab_primal(e_tm, t_x, t_y, max_duration)
    logB, betas, total = out
    return out, (e_tm, logB, betas, t_x, t_y)


def _mobo_ab_bwd(max_duration, res, cotangents):
    e_tm, logB, betas, t_x, t_y = res
    abar, bbar, tbar = cotangents
    D = max_duration
    T_x, B, T_y1 = e_tm.shape
    pos = jnp.arange(T_y1, dtype=jnp.int32)

    # Fold total's cotangent into the final alpha row (total is the
    # gather of the frozen final carry at position t_y).
    seed = (pos[None, :] == t_y[:, None]).astype(e_tm.dtype) * tbar[:, None]
    abar = abar.at[-1].add(seed)

    # ----- alpha-chain adjoint: reverse scan over tokens -----
    init_row = jnp.full((B, T_y1), NEG, jnp.float32).at[:, 0].set(0.0)
    alpha_prev = jnp.concatenate([init_row[None], logB[:-1]], axis=0)
    xs = jnp.arange(T_x, dtype=jnp.int32)

    def astep(cbar, inputs):
        i, abar_i, logB_i, aprev_i, e_i = inputs
        live = (i < t_x)[:, None]
        u = abar_i + cbar
        valid = (logB_i > 0.5 * NEG) & live
        u_l = jnp.where(valid, u, 0.0)
        z = _window_normalizer(e_i, D)
        A = jnp.where(z > 0.5 * NEG, aprev_i - z, NEG)
        inner = logB_i - e_i          # only meaningful where `valid`
        a_ok = A > 0.5 * NEG
        cprev = jnp.zeros_like(u)
        for d in range(1, D + 1):
            u_sh = _shift0(u_l, -d)                     # u_l(q + d)
            inner_sh = _shift0(inner, -d)
            ok = a_ok & _shift0(valid, -d)
            arg = jnp.where(ok, A - inner_sh, NEG)
            cprev = cprev + u_sh * jnp.exp(arg)
        zbar = -cprev
        ebar = u_l
        for d in range(1, D + 1):
            zb_sh = _shift0(zbar, d)                    # zbar(p - d)
            z_sh = _shift0(z, d)
            arg = jnp.where(zb_sh != 0.0, e_i - z_sh, NEG)
            ebar = ebar + zb_sh * jnp.exp(arg)
        cbar_next = jnp.where(live, cprev, u)           # frozen: pass thru
        ebar = jnp.where(live, ebar, 0.0)
        return cbar_next, ebar

    _, grad_e_alpha = jax.lax.scan(
        astep, jnp.zeros((B, T_y1), jnp.float32),
        (xs, abar, logB, alpha_prev, e_tm), reverse=True)

    # ----- beta-chain adjoint: forward scan over tokens -----
    neg_row = jnp.full((1, B, T_y1), NEG, jnp.float32)
    beta_next = jnp.concatenate([betas[1:], neg_row], axis=0)
    e_next = jnp.concatenate([e_tm[1:], neg_row], axis=0)

    def bstep(carry, inputs):
        i, bbar_i, beta_i, bnext_i, enext_i = inputs
        pinned = (i == t_x - 1)[:, None]
        dead = (i >= t_x)[:, None]
        live = (~pinned) & (~dead)
        u = bbar_i + carry
        valid = (beta_i > 0.5 * NEG) & live
        u_l = jnp.where(valid, u, 0.0)
        z_n = _window_normalizer(enext_i, D)
        inner = beta_i + z_n          # only meaningful where `valid`
        e_hat_ok = (enext_i > 0.5 * NEG) & (bnext_i > 0.5 * NEG)
        co = jnp.zeros_like(u)
        ve = jnp.zeros_like(u)
        for d in range(1, D + 1):
            u_sh = _shift0(u_l, d)                      # u_l(q - d)
            inner_sh = _shift0(inner, d)
            ok_sh = _shift0(valid, d)
            arg_s = jnp.where(e_hat_ok & ok_sh,
                              enext_i + bnext_i - inner_sh, NEG)
            co = co + u_sh * jnp.exp(arg_s)
            zn_sh = _shift0(z_n, d)
            arg_v = jnp.where(ok_sh & (zn_sh > 0.5 * NEG)
                              & (enext_i > 0.5 * NEG),
                              enext_i - zn_sh, NEG)
            ve = ve + u_sh * jnp.exp(arg_v)
        ebar_next = co - ve           # already zero off the live rows
        carry_next = jnp.where(dead, u, jnp.where(pinned, 0.0, co))
        return carry_next, ebar_next

    _, stack = jax.lax.scan(
        bstep, jnp.zeros((B, T_y1), jnp.float32),
        (xs, bbar, betas, beta_next, e_next))
    # step i wrote the gradient for token i+1
    grad_e_beta = jnp.concatenate(
        [jnp.zeros((1, B, T_y1), jnp.float32), stack[:-1]], axis=0)

    return grad_e_alpha + grad_e_beta, None, None


_mobo_ab.defvjp(_mobo_ab_fwd, _mobo_ab_bwd)


def mobo_forward(energies, t_x, t_y, max_duration: int):
    """Soft MoBo alignment (differentiable).

    energies: [B, T_y, T_x] (frame-major, matching the OTA layout);
    t_x, t_y: [B] int32; max_duration: static window D >= 1.
    Requires t_y <= t_x * D (otherwise that item's likelihood is -inf).

    Returns dict:
      loss            [B]  — negative log P(final boundary at t_y - 1)
      log_boundaries  [B, T_x, T_y] — posterior log P(b_i = t)
      soft_alignment  [B, T_y, T_x] — gamma, P(token i active at frame t)
      expected_durations [B, T_x]

    Fully differentiable (including through gamma / the posteriors):
    the alpha/beta sweeps run as Pallas kernels on TPU under
    `_mobo_ab`'s analytic custom VJP; only the cheap posterior/CDF
    arithmetic is left to XLA autodiff.
    """
    e_tm = _prep_energies(energies, t_x, t_y)
    logB, betas, total = _mobo_ab(e_tm, t_x, t_y, max_duration)
    return _posteriors_from_ab(logB, betas, total, t_x, t_y)


def _mobo_forward_autodiff(energies, t_x, t_y, max_duration: int):
    """Test oracle: identical math with plain autodiff through the lax
    scans (no custom VJP). Gradient reference for `_mobo_ab_bwd`."""
    e_tm = _prep_energies(energies, t_x, t_y)
    logB, _ = _boundary_scan(e_tm, t_x, t_y, max_duration, use_max=False)
    total = _total_from_logB(logB, t_x, t_y)
    betas = _beta_scan(e_tm, t_x, t_y, max_duration)
    return _posteriors_from_ab(logB, betas, total, t_x, t_y)


def _posteriors_from_ab(logB, betas, total, t_x, t_y):
    T_x, B, T_y1 = logB.shape
    T_y = T_y1 - 1
    # Posterior boundary marginals on the shifted grid.
    log_post = logB + betas - total[None, :, None]
    xs = jnp.arange(T_x, dtype=jnp.int32)
    live = (xs[:, None, None] < t_x[None, :, None])
    post = jnp.where(live, jnp.exp(log_post), 0.0)   # [T_x, B, T_y1]

    # CDFs F_i(t) = P(b_i <= t) on the shifted grid; F_{-1} = 1 everywhere.
    F = jnp.cumsum(post, axis=2)
    F_prev = jnp.concatenate([jnp.ones((1, B, T_y1), F.dtype), F[:-1]],
                             axis=0)
    # Dead tokens i >= t_x are zeroed via the `live` mask above (their
    # raw posteriors are pass-through carries, not zeros).
    gamma = F_prev - F                                # P(b_{i-1} <= t < b_i)
    gamma = jnp.clip(gamma[:, :, :-1], 0.0, 1.0)      # drop shifted tail,
    # gamma[i, b, t] on frame grid: P(b_{i-1} <= t-1) - P(b_i <= t-1)
    ys = jnp.arange(T_y, dtype=jnp.int32)
    gamma = jnp.where(ys[None, None, :] < t_y[None, :, None], gamma, 0.0)

    soft_alignment = jnp.moveaxis(gamma, 0, 2)        # [B, T_y, T_x]
    expected_durations = jnp.sum(gamma, axis=2).T     # [B, T_x]
    log_boundaries = jnp.moveaxis(log_post[:, :, 1:], 1, 0)  # [B,T_x,T_y]
    return {
        "loss": -total,
        "log_boundaries": log_boundaries,
        "soft_alignment": soft_alignment,
        "expected_durations": expected_durations,
    }


@functools.partial(jax.jit, static_argnames=("max_duration",))
def mobo_hard_boundaries(energies, t_x, t_y, max_duration: int):
    """Viterbi mode: most-likely boundary sequence under the same
    max-duration-constrained model. Returns (durations [B, T_x] int32,
    path [B, T_y, T_x] float32 0/1)."""
    B, T_y, T_x = energies.shape
    e_tm = _prep_energies(energies, t_x, t_y)
    if _use_pallas(B, T_y + 1):
        from .mobo_pallas import mobo_bp_pallas
        bps = mobo_bp_pallas(e_tm, t_x, max_duration)
    else:
        _, bps = _boundary_scan(e_tm, t_x, t_y, max_duration,
                                use_max=True)

    def backtrack(bps_i, t_x_i, t_y_i):
        # walk tokens i = T_x-1 .. 0; position on shifted grid.
        def step(pos, inputs):
            i, bp_row = inputs
            live = i < t_x_i
            d = jnp.where(live, bp_row[pos], 0)
            return pos - d, d

        xs = jnp.arange(T_x, dtype=jnp.int32)
        _, durs = jax.lax.scan(step, t_y_i, (xs, bps_i), reverse=True)
        return durs

    durations = jax.vmap(backtrack)(jnp.moveaxis(bps, 0, 1), t_x, t_y)
    # Path matrix from durations: token i covers frames
    # [cum_{i-1}, cum_i) -- build with cumsum + comparisons.
    cum = jnp.cumsum(durations, axis=1)               # [B, T_x]
    start = cum - durations
    ys = jnp.arange(T_y, dtype=jnp.int32)[None, :, None]
    path = ((ys >= start[:, None, :]) & (ys < cum[:, None, :])
            & (ys < t_y[:, None, None]))
    return durations, path.astype(jnp.float32)


def mobo_loss(energies, t_x, t_y, max_duration: int):
    """Convenience: mean per-frame MoBo NLL (differentiable, analytic
    gradient via mobo_log_marginal's custom VJP)."""
    total = mobo_log_marginal(energies, t_x, t_y, max_duration)
    return jnp.mean(-total / jnp.maximum(t_y, 1))
