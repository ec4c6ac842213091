"""Skip-state lattice DPs — the primitive behind implicit pause modeling.

The reference project's OTA branch exists to handle *implicit pauses*
without explicit silence tokens in the transcript
(/root/reference/README.md:21-25). The classic mechanism (CTC blanks,
adapted to the monotonic-surjective alignment setting): interleave an
optional, shared pause state between text tokens,

    states  s = 0..T_s-1,  T_s = 2*t_x + 1
    even s  → pause state (optional)
    odd  s  → token (s-1)//2 (mandatory)

and extend the column DP with a *move-2* transition that hops from token
state s-2 directly to token state s, skipping the pause between them.
Every alignment then decides per gap whether a pause absorbs frames or
not — no silence tokens needed in the input.

Two DPs share the structure (exactly like mas.py / forward_sum.py for
the plain lattice):

* `mas_skip_lax`   — Viterbi: max over moves {0, 1, 2}, hard path.
* `forward_sum_skip_loss` — marginal NLL: logaddexp over the same moves,
  with a custom VJP (posterior occupancy = gradient, one beta sweep).

Transition rules (defined here — the reference has no pause code to be
bit-identical to; conformance is against this module's NumPy oracle):

* moves: stay (0), advance (1), skip (2); skip only into odd s >= 3.
* start states {0, 1} (leading pause optional), end states
  {T_s-2, T_s-1} (trailing pause optional), where T_s = 2*t_x + 1.
* optional `enter_cost`: a log-domain cost added once per transition
  INTO a pause state (advance into even s, plus starting in state 0).
  A monotonic path enters each pause at most once, so this is a cost
  per *used pause slot* — a pause-count prior, orthogonal to the
  per-frame occupancy cost (`OTAConfig.pause_bias`) which scales with
  pause LENGTH. Negative values suppress spurious short pauses without
  penalising long real ones (the round-3 hard-corpus saturation lever;
  see docs/design.md "pause duration model"). 0.0 (default) is exactly
  the round-3 behaviour.
* Viterbi ties prefer the smaller move (stay > advance > skip — each
  candidate replaces only if strictly greater), matching the plain MAS
  convention that transitions happen as early as possible; the end
  state prefers the last *token* on a tie.
* Ragged: per-item t_x, t_y; requires 1 <= t_x and t_y >= t_x (pauses
  are skippable so t_y >= t_x suffices even though T_s > t_y may hold);
  invalid items yield an all-zero path / loss 0, like the plain ops.

Layouts match the plain ops: Viterbi takes state-major [B, T_s, T_y]
(mas.py convention), the loss takes frame-major [B, T_y, T_s].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_NEG_VAL = -1e9
NEG = -1e15  # loss sentinel, matches forward_sum.NEG


def n_states(t_x):
    """Expanded state count T_s = 2*t_x + 1 (works on ints or arrays)."""
    return 2 * t_x + 1


# ---------------------------------------------------------------------------
# NumPy oracle (golden path for the conformance suite)
# ---------------------------------------------------------------------------

def mas_skip_single(value: np.ndarray, t_x: int, t_y: int,
                    max_neg_val: float = MAX_NEG_VAL,
                    enter_cost: float = 0.0) -> np.ndarray:
    """Viterbi over the pause-expanded lattice for one item.

    value: [T_s_pad, T_y_pad] float32, rows 0..2*t_x are live states.
    Returns an int32 0/1 path of value.shape (one state per frame).
    enter_cost: added to every advance-into-even-state candidate (and
    the state-0 start) — see the module docstring.
    """
    if not (1 <= t_x <= t_y):
        raise ValueError(f"need 1 <= t_x <= t_y, got {t_x}, {t_y}")
    T_s = 2 * t_x + 1
    if T_s > value.shape[0]:
        raise ValueError(f"value has {value.shape[0]} state rows, "
                         f"need 2*t_x+1 = {T_s}")
    c = np.float32(enter_cost)
    v = np.full((T_s, t_y), np.float32(max_neg_val), np.float32)
    move = np.zeros((T_s, t_y), np.int8)
    v[0, 0] = np.float32(np.float32(value[0, 0]) + c)
    if T_s > 1:
        v[1, 0] = value[1, 0]
    for y in range(1, t_y):
        for s in range(T_s):
            best = v[s, y - 1]
            m = 0
            if s >= 1:
                cand = np.float32(v[s - 1, y - 1]
                                  + (c if s % 2 == 0 else np.float32(0.0)))
                if cand > best:
                    best = cand
                    m = 1
            if s >= 3 and s % 2 == 1 and v[s - 2, y - 1] > best:
                best = v[s - 2, y - 1]
                m = 2
            v[s, y] = np.float32(np.float32(best) + np.float32(value[s, y]))
            move[s, y] = m
    path = np.zeros(value.shape, np.int32)
    s = T_s - 2 if T_s >= 2 else 0
    if T_s >= 2 and v[T_s - 1, t_y - 1] > v[T_s - 2, t_y - 1]:
        s = T_s - 1
    for y in range(t_y - 1, -1, -1):
        path[s, y] = 1
        # int() guard: NEP 50 would otherwise cast the Python-int state
        # into the trit's int8 dtype, which overflows once T_s > 127
        # (t_x > 63) — caught by the on-chip conformance sweep.
        s -= int(move[s, y])
    return path


def forward_sum_skip_numpy(logp: np.ndarray, t_x: int, t_y: int,
                           enter_cost: float = 0.0) -> float:
    """Log-marginal over all pause-optional monotonic alignments.

    logp: [T_s_pad, T_y_pad] (state-major for symmetry with the oracle).
    enter_cost: log-cost per pause entered (module docstring).
    """
    T_s = 2 * t_x + 1
    a = np.full(T_s, -np.inf)
    a[0] = logp[0, 0] + enter_cost
    if T_s > 1:
        a[1] = logp[1, 0]
    for y in range(1, t_y):
        nxt = np.full(T_s, -np.inf)
        for s in range(T_s):
            terms = [a[s]]
            if s >= 1:
                terms.append(a[s - 1]
                             + (enter_cost if s % 2 == 0 else 0.0))
            if s >= 3 and s % 2 == 1:
                terms.append(a[s - 2])
            m = max(terms)
            if m == -np.inf:
                continue
            nxt[s] = m + np.log(sum(np.exp(t - m) for t in terms)) \
                + logp[s, y]
        a = nxt
    ends = [a[T_s - 1]] + ([a[T_s - 2]] if T_s >= 2 else [])
    m = max(ends)
    if m == -np.inf:
        return -np.inf
    return float(m + np.log(sum(np.exp(e - m) for e in ends)))


# ---------------------------------------------------------------------------
# lax Viterbi (CPU path + interpret oracle for the Pallas kernel)
# ---------------------------------------------------------------------------

def _mas_skip_single_lax(value, t_x, t_y, max_neg_val=MAX_NEG_VAL,
                         enter_cost=0.0):
    """value: [T_s, T_y] f32; returns 0/1 path [T_s, T_y] f32."""
    T_s, T_y = value.shape
    ss = jnp.arange(T_s, dtype=jnp.int32)
    ts = 2 * t_x + 1
    live = ss < ts
    can_skip = (ss % 2 == 1) & (ss >= 3) & live
    valid = (t_x >= 1) & (t_x <= t_y)
    c = jnp.float32(enter_cost)

    col0 = value[:, 0]
    if enter_cost != 0.0:
        col0 = jnp.where(ss == 0, col0 + c, col0)
    init = jnp.where((ss <= 1) & live, col0, max_neg_val)

    def fwd(prev, inputs):
        y, col = inputs
        p1 = jnp.concatenate([prev[:1], prev[:-1]])
        p2 = jnp.concatenate([prev[:2], prev[:-2]])
        if enter_cost != 0.0:
            p1 = jnp.where(ss % 2 == 0, p1 + c, p1)
        p1 = jnp.where(ss >= 1, p1, max_neg_val)
        p2 = jnp.where(can_skip, p2, max_neg_val)
        # ties prefer the smaller move: replace only if strictly greater
        best = prev
        m = jnp.zeros((T_s,), jnp.int8)
        m = jnp.where(p1 > best, jnp.int8(1), m)
        best = jnp.maximum(best, p1)
        m = jnp.where(p2 > best, jnp.int8(2), m)
        best = jnp.maximum(best, p2)
        new = jnp.where(live, best + col, max_neg_val)
        new = jnp.where(y < t_y, new, prev)
        m = jnp.where(y < t_y, m, 0)
        return new, m

    ys = jnp.arange(1, T_y, dtype=jnp.int32)
    final, moves = jax.lax.scan(fwd, init, (ys, value[:, 1:].T))
    moves = jnp.concatenate([jnp.zeros((1, T_s), jnp.int8), moves])

    # end state: last token (ts - 2) unless the trailing pause is
    # strictly better
    v_tok = final[jnp.maximum(ts - 2, 0)]
    v_pause = final[ts - 1]
    s0 = jnp.where(v_pause > v_tok, ts - 1, jnp.maximum(ts - 2, 0))

    def bwd(s, inputs):
        y, mv = inputs
        active = (y < t_y) & valid
        emit = jnp.where(active, (ss == s).astype(jnp.float32), 0.0)
        s = s - jnp.where(active, mv[s].astype(jnp.int32), 0)
        return s, emit

    ys_all = jnp.arange(T_y, dtype=jnp.int32)
    _, rows = jax.lax.scan(bwd, s0, (ys_all, moves), reverse=True)
    return rows.T


@functools.partial(jax.jit, static_argnames=("max_neg_val", "enter_cost"))
def mas_skip_lax(value, t_x, t_y, *, max_neg_val: float = MAX_NEG_VAL,
                 enter_cost: float = 0.0):
    """Batched pause-aware Viterbi. value: [B, T_s, T_y] f32 (state-major,
    T_s >= 2*max(t_x)+1); t_x, t_y: [B]. Returns 0/1 paths [B, T_s, T_y].
    enter_cost: log-cost per pause entered (module docstring)."""
    fn = functools.partial(_mas_skip_single_lax, max_neg_val=max_neg_val,
                           enter_cost=enter_cost)
    return jax.vmap(fn)(value.astype(jnp.float32), t_x, t_y)


# ---------------------------------------------------------------------------
# Forward-sum with skips (frame-major, custom VJP)
# ---------------------------------------------------------------------------

def _masked_logp_skip(log_probs, t_x):
    B, T_y, T_s = log_probs.shape
    ss = jnp.arange(T_s, dtype=jnp.int32)
    ts = n_states(t_x)
    log_probs = jnp.maximum(log_probs, NEG)  # -inf -> finite sentinel
    return jnp.where(ss[None, None, :] < ts[:, None, None], log_probs, NEG)


def _alpha_scan_skip(lp_tm, t_y, enter_cost: float = 0.0):
    """lp_tm: [T_y, B, T_s] pre-masked. Returns alpha [T_y, B, T_s]."""
    T_y, B, T_s = lp_tm.shape
    ss = jnp.arange(T_s, dtype=jnp.int32)
    can_skip = (ss % 2 == 1) & (ss >= 3)
    neg_col = jnp.full((B, 1), NEG, jnp.float32)
    neg_col2 = jnp.full((B, 2), NEG, jnp.float32)
    first = jnp.where(ss[None, :] <= 1, 0.0, NEG)
    if enter_cost != 0.0:
        first = jnp.where(ss[None, :] == 0, first + enter_cost, first)
    init = jnp.full((B, T_s), NEG, jnp.float32)

    def step(prev, inputs):
        y, col = inputs
        p1 = jnp.concatenate([neg_col, prev[:, :-1]], axis=1)
        p2 = jnp.concatenate([neg_col2, prev[:, :-2]], axis=1)
        if enter_cost != 0.0:
            p1 = jnp.where((ss % 2 == 0)[None, :], p1 + enter_cost, p1)
        p2 = jnp.where(can_skip[None, :], p2, NEG)
        inner = jnp.logaddexp(jnp.logaddexp(prev, p1), p2)
        alpha = col + jnp.where(y == 0, first, inner)
        alpha = jnp.where(y < t_y[:, None], alpha, prev)
        return alpha, alpha

    ys = jnp.arange(T_y, dtype=jnp.int32)
    _, alphas = jax.lax.scan(step, init, (ys, lp_tm))
    return alphas


def _beta_scan_skip(lp_tm, t_x, t_y, enter_cost: float = 0.0):
    """beta[s, y] = log-mass of suffixes after (s, y) excluding lp[s, y].
    Skip arcs leave odd (token) states s and land on s + 2."""
    T_y, B, T_s = lp_tm.shape
    ss = jnp.arange(T_s, dtype=jnp.int32)
    ts = n_states(t_x)
    # a skip OUT of s exists iff s is odd (token) and s + 2 < ts
    skip_out = (ss[None, :] % 2 == 1) & (ss[None, :] + 2 < ts[:, None])
    end_col = jnp.where((ss[None, :] == ts[:, None] - 1)
                        | (ss[None, :] == ts[:, None] - 2), 0.0, NEG)
    neg_col = jnp.full((B, 1), NEG, jnp.float32)
    neg_col2 = jnp.full((B, 2), NEG, jnp.float32)

    def step(nxt, inputs):
        y, col_next = inputs
        msg = nxt + col_next
        m1 = jnp.concatenate([msg[:, 1:], neg_col], axis=1)
        m2 = jnp.concatenate([msg[:, 2:], neg_col2], axis=1)
        if enter_cost != 0.0:
            # the advance arc s -> s+1 enters a pause iff s+1 is even
            m1 = jnp.where((ss % 2 == 1)[None, :], m1 + enter_cost, m1)
        m2 = jnp.where(skip_out, m2, NEG)
        beta = jnp.logaddexp(jnp.logaddexp(msg, m1), m2)
        beta = jnp.where(y == t_y[:, None] - 1, end_col, beta)
        beta = jnp.where(y < t_y[:, None], beta, nxt)
        return beta, beta

    ys = jnp.arange(T_y, dtype=jnp.int32)
    lp_next = jnp.concatenate(
        [lp_tm[1:], jnp.full((1, B, T_s), NEG, jnp.float32)], axis=0)
    init = jnp.full((B, T_s), NEG, jnp.float32)
    _, betas = jax.lax.scan(step, init, (ys, lp_next), reverse=True)
    return betas


def _valid_items_skip(t_x, t_y):
    return (t_x >= 1) & (t_x <= t_y)


def _total_from_alphas_skip(alphas, t_x):
    B, T_s = alphas.shape[1], alphas.shape[2]
    ss = jnp.arange(T_s, dtype=jnp.int32)
    ts = n_states(t_x)
    final = alphas[-1]
    pick = ((ss[None, :] == ts[:, None] - 1)
            | (ss[None, :] == ts[:, None] - 2))
    picked = jnp.where(pick, final, NEG)
    return jax.scipy.special.logsumexp(picked, axis=1)


def _use_pallas() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def forward_sum_skip_loss(log_probs, t_x, t_y, enter_cost: float = 0.0):
    """NLL of the pause-optional monotonic alignment marginal.

    log_probs: [B, T_y, T_s] frame-major over expanded states (T_s >=
    2*max(t_x)+1), log-softmax over states (+ prior); -inf-safe. t_x is
    the *token* count per item. Returns per-item loss [B]; invalid
    lengths (t_x < 1 or t_x > t_y) give 0 with zero gradient.
    enter_cost: static log-cost per pause entered (module docstring);
    the gradient stays -gamma, the posterior occupancy under the
    penalized model.
    """
    return _fss_cvjp(log_probs, t_x, t_y, float(enter_cost))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fss_cvjp(log_probs, t_x, t_y, enter_cost):
    loss, _ = _fss_fwd(log_probs, t_x, t_y, enter_cost)
    return loss


def _fss_fwd(log_probs, t_x, t_y, enter_cost=0.0):
    lp = _masked_logp_skip(log_probs.astype(jnp.float32), t_x)
    lp_tm = jnp.moveaxis(lp, 0, 1)
    if _use_pallas():
        from .skip_dp_pallas import forward_sum_skip_alpha_pallas
        alphas = forward_sum_skip_alpha_pallas(lp_tm, t_y,
                                               enter_cost=enter_cost)
    else:
        alphas = _alpha_scan_skip(lp_tm, t_y, enter_cost)
    valid = _valid_items_skip(t_x, t_y)
    total = jnp.where(valid, _total_from_alphas_skip(alphas, t_x), 0.0)
    return -total, (lp_tm, alphas, total, t_x, t_y)


def _fss_bwd(enter_cost, res, g):
    lp_tm, alphas, total, t_x, t_y = res
    T_y, B, T_s = lp_tm.shape
    valid = _valid_items_skip(t_x, t_y)
    g = jnp.where(valid, g, 0.0)
    if _use_pallas():
        from .skip_dp_pallas import forward_sum_skip_gamma_pallas
        gamma = forward_sum_skip_gamma_pallas(lp_tm, alphas, total,
                                              t_x, t_y,
                                              enter_cost=enter_cost)
    else:
        betas = _beta_scan_skip(lp_tm, t_x, t_y, enter_cost)
        gamma = jnp.exp(alphas + betas - total[None, :, None])
        ys = jnp.arange(T_y, dtype=jnp.int32)
        ss = jnp.arange(T_s, dtype=jnp.int32)
        in_range = ((ys[:, None, None] < t_y[None, :, None])
                    & (ss[None, None, :] < n_states(t_x)[None, :, None]))
        gamma = jnp.where(in_range, gamma, 0.0)
    gamma = jnp.where(valid[None, :, None], gamma, 0.0)
    grad = -gamma * g[None, :, None]
    return jnp.moveaxis(grad, 1, 0), None, None


_fss_cvjp.defvjp(_fss_fwd, _fss_bwd)


def expand_tokens_with_pauses(tokens, text_lengths, pause_id: int):
    """tokens [B, T_x] -> expanded ids [B, 2*T_x+1]: `pause_id` at even
    slots, token j at slot 2j+1, zeros past each item's 2*t_x+1 states."""
    B, T_x = tokens.shape
    T_s = 2 * T_x + 1
    ss = jnp.arange(T_s, dtype=jnp.int32)[None, :]
    ts = n_states(text_lengths.astype(jnp.int32))[:, None]
    exp = jnp.zeros((B, T_s), tokens.dtype).at[:, 1::2].set(tokens)
    exp = jnp.where((ss % 2 == 0) & (ss < ts), pause_id, exp)
    return jnp.where(ss < ts, exp, 0)


def split_state_durations(state_durations):
    """[B, T_s] per-state frame counts -> (token durations [B, T_x],
    pause durations [B, T_x+1]); pause j precedes token j."""
    return state_durations[:, 1::2], state_durations[:, 0::2]


def expand_prior_to_states(log_prior, t_x, mode: str = "inherit"):
    """Map a token-axis prior [B, T_y, T_x] onto the expanded state axis
    [B, T_y, 2*T_x+1].

    mode="inherit" (round-2 behaviour): state s takes the prior of token
    min(s // 2, t_x - 1) — a pause shares its *following* token's prior
    (the trailing pause its preceding token's).

    mode="bridge": token states keep their own prior; the pause between
    tokens j-1 and j gets logaddexp(prior[j-1], prior[j]) - log 2 — a
    smooth bridge spanning both neighbours' diagonal peaks, so a pause
    is not pinned to one side of the gap it occupies (round-2 verdict
    weak item 2: pauses had no pause-shaped prior). Edge pauses reduce
    to plain inheritance via index clamping."""
    B, T_y, T_x = log_prior.shape
    T_s = 2 * T_x + 1
    ss = jnp.arange(T_s, dtype=jnp.int32)[None, :]
    last = jnp.maximum(t_x.astype(jnp.int32)[:, None] - 1, 0)
    idx = jnp.minimum(ss // 2, last)
    idx = jnp.broadcast_to(idx[:, None, :], (B, T_y, T_s))
    inherit = jnp.take_along_axis(log_prior, idx, axis=2)
    if mode == "inherit":
        return inherit
    if mode != "bridge":
        raise ValueError(f"unknown pause-prior mode: {mode!r}")
    # previous token's prior: token (s // 2) - 1, clamped into range
    idx_prev = jnp.clip(ss // 2 - 1, 0, None)
    idx_prev = jnp.minimum(idx_prev, last)
    idx_prev = jnp.broadcast_to(idx_prev[:, None, :], (B, T_y, T_s))
    prev = jnp.take_along_axis(log_prior, idx_prev, axis=2)
    bridge = jnp.logaddexp(inherit, prev) - jnp.log(2.0)
    is_pause = (ss % 2 == 0)[:, None, :]
    return jnp.where(is_pause, bridge, inherit)


def mas_skip_path_frame_major(logp, t_x, t_y, *,
                              implementation: str = "auto",
                              max_neg_val: float = MAX_NEG_VAL,
                              enter_cost: float = 0.0):
    """Hard pause-aware path in frame-major layout: logp [B, T_y, T_s]
    -> 0/1 path [B, T_y, T_s] (Pallas on TPU, lax elsewhere).
    enter_cost: log-cost per pause entered (module docstring)."""
    if implementation == "auto":
        implementation = ("pallas"
                          if jax.default_backend() in ("tpu", "axon")
                          else "lax")
    v_sm = jnp.transpose(logp.astype(jnp.float32), (0, 2, 1))
    if implementation == "pallas":
        from .skip_dp_pallas import mas_skip_pallas
        path = mas_skip_pallas(v_sm, t_x, t_y, max_neg_val=max_neg_val,
                               enter_cost=enter_cost)
    elif implementation == "lax":
        path = mas_skip_lax(v_sm, t_x, t_y, max_neg_val=max_neg_val,
                            enter_cost=enter_cost)
    else:
        raise ValueError(f"unknown implementation: {implementation!r}")
    return jnp.transpose(path, (0, 2, 1))


def skip_posteriors(log_probs, t_x, t_y):
    """Posterior state occupancy gamma [B, T_y, T_s] and the log-marginal
    [B] (lax paths; diagnostics)."""
    lp = _masked_logp_skip(log_probs.astype(jnp.float32), t_x)
    lp_tm = jnp.moveaxis(lp, 0, 1)
    alphas = _alpha_scan_skip(lp_tm, t_y)
    betas = _beta_scan_skip(lp_tm, t_x, t_y)
    valid = _valid_items_skip(t_x, t_y)
    total = jnp.where(valid, _total_from_alphas_skip(alphas, t_x), 0.0)
    gamma = jnp.exp(alphas + betas - total[None, :, None])
    T_y_, B, T_s = lp_tm.shape
    ys = jnp.arange(T_y_, dtype=jnp.int32)
    ss = jnp.arange(T_s, dtype=jnp.int32)
    in_range = ((ys[:, None, None] < t_y[None, :, None])
                & (ss[None, None, :] < n_states(t_x)[None, :, None]))
    gamma = jnp.where(in_range & valid[None, :, None], gamma, 0.0)
    return jnp.moveaxis(gamma, 1, 0), total
