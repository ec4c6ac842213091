"""Pallas TPU kernels for the skip-state (implicit-pause) lattice DPs.

Same architecture as mas_pallas.py / forward_sum_pallas.py — time-major
[T_y, B, T_s] blocks, sequential frame grid, [B, T_s] VMEM carry — with
one extra lane-roll per step for the move-2 (pause-skip) transition:

* Viterbi forward emits an int8 move trit per cell (0 = stay, 1 =
  advance, 2 = skip) instead of the plain kernel's single bit; ties
  prefer the smaller move (strictly-greater replacement), matching
  skip_dp.mas_skip_single exactly.
* The backtrack walks the trits with the same elementwise one-hot
  algebra as the plain kernel, now with two selected masks:
      ind' = ind - s1 - s2 + roll(s1, -1) + roll(s2, -2).
  Its start state ({T_s-2, T_s-1}, preferring the last token on ties)
  is decided outside the kernel from the forward pass's final column.
* forward-sum alpha / gamma kernels mirror forward_sum_pallas.py with
  the third logaddexp arm; the gamma (beta+grad) sweep stays fused.

Unlike the plain MAS forward kernel (length-independent by the band
argument), the skip forward must freeze the carry past each item's t_y:
the backtrack's start-state comparison reads the carry *at frame
t_y - 1*, so t_y rides into the forward kernel as a broadcast input.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mas_pallas import (_pad_frames, _pick_chunk, _shift_left,
                         _shift_right)

MAX_NEG_VAL = -1e9
NEG = -1e15

# Latency-regime gate for the pair-composed Viterbi sweeps (mirrors
# mas_pallas.QUAD_MAX_ELEMS): below this many B*T_s elements per column
# the chain latency dominates and two frames per cross-lane shift win.
SKIP_PAIR_MAX_ELEMS = 4096


def _skip_mask(B, T_s):
    s = jax.lax.broadcasted_iota(jnp.int32, (B, T_s), 1)
    return s, (s % 2 == 1) & (s >= 3)


def _enter_rows(s, enter_cost: float):
    """Static per-lane pause-entry costs: (ce, co) with ce = cost on
    even destination states (advance into a pause) and co = cost on odd
    ones shifted by one (i.e. even(s-1)). Zero rows when the cost is 0
    (the `if enter_cost` call-site gates keep the traced program
    byte-identical to the cost-free kernels)."""
    c = jnp.float32(enter_cost)
    ce = jnp.where(s % 2 == 0, c, 0.0)
    co = jnp.where(s % 2 == 1, c, 0.0)
    return ce, co


def _viterbi_pair_step(prev, c1, c2, y1, ty, s, max_neg_val,
                       enter_cost: float = 0.0):
    """Two composed skip-Viterbi frames (columns c1 then c2): nine
    (m1, m2) move-pair candidates over moves {stay, advance, skip-2},
    with each move's validity mask evaluated at its destination state
    — one cross-lane shift latency for two frames. Exact by the same
    distribute lemma as the MAS compositions (the max is distributed
    over the common per-level addends c1[s - m2] and c2[s]; additions
    are never re-associated). The y == 0 initialisation and the
    per-item y >= t_y freeze are handled by explicit selects against
    the (off-chain) single-step results.

    enter_cost: per-pause-entry cost — added to each advance-into-even
    candidate IN the sequential position the per-frame kernel adds it
    (first-move costs before the c1 shift-column, second-move costs
    after), so pair and per-frame routes stay bit-identical.

    Returns (trit1, trit2 int8 move emissions, new carry column)."""
    shr = _shift_right
    y2 = y1 + 1
    # destination-validity masks (static in s, off the carry chain)
    m1_s = s >= 1
    m2_s = (s % 2 == 1) & (s >= 3)            # can_skip at s
    m1_s1 = s >= 2                            # mask1 at s-1
    m2_s1 = (s % 2 == 0) & (s >= 4)           # can_skip at s-1
    m1_s2 = s >= 3                            # mask1 at s-2
    m2_s2 = (s % 2 == 1) & (s >= 5)           # can_skip at s-2

    r1, r2 = shr(prev, 1), shr(prev, 2)
    r3, r4 = shr(prev, 3), shr(prev, 4)
    c1s1, c1s2 = shr(c1, 1), shr(c1, 2)

    def sel(mask, r):
        return jnp.where(mask, r, max_neg_val)

    if enter_cost != 0.0:
        ce, co = _enter_rows(s, enter_cost)

        def add_e(v):           # second-move advance-into-even cost
            return v + ce

        def sel_e(mask, r):     # cost-then-mask advance candidate
            return jnp.where(mask, r + ce, max_neg_val)
    else:
        def add_e(v):
            return v

        def sel_e(mask, r):
            return jnp.where(mask, r, max_neg_val)

    # (m1, m2) candidates; per-path value keeps the sequential
    # left-to-right addition order (entry costs included).
    if enter_cost != 0.0:
        # cost-then-mask, so sentinel lanes stay exactly max_neg_val
        # (matching the per-frame kernel and the lax oracle)
        t10_base = sel(m1_s, r1 + ce)
        t11_base = sel(m1_s & m1_s1, r2 + co)
        t12_base = sel(m2_s & m1_s2, r3 + ce)
    else:
        t10_base = sel(m1_s, r1)
        t11_base = sel(m1_s & m1_s1, r2)
        t12_base = sel(m2_s & m1_s2, r3)
    t00 = prev + c1
    t10 = t10_base + c1
    t20 = sel(m2_s, r2) + c1
    t01 = add_e(sel(m1_s, r1) + c1s1)
    t11 = add_e(t11_base + c1s1)
    t21 = add_e(sel(m1_s & m2_s1, r3) + c1s1)
    t02 = sel(m2_s, r2) + c1s2
    t12 = t12_base + c1s2
    t22 = sel(m2_s & m2_s2, r4) + c1s2
    u2_active = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.maximum(t00, t10), jnp.maximum(t20, t01)),
                    jnp.maximum(jnp.maximum(t11, t21), jnp.maximum(t02, t12))),
        t22) + c2

    # intermediate column u1 (exact sequential value; off the carry
    # chain — the shifts it needs are already computed)
    p1 = t10_base                              # sel(m1_s, r1) [+ ce]
    p2 = sel(m2_s, r2)
    best1_1 = jnp.maximum(prev, p1)
    u1_active = jnp.maximum(best1_1, p2) + c1
    if enter_cost != 0.0:
        init1 = jnp.where(s < 2,
                          jnp.where(s == 0, c1 + jnp.float32(enter_cost),
                                    c1),
                          max_neg_val)
    else:
        init1 = jnp.where(s < 2, c1, max_neg_val)
    u1 = jnp.where(y1 == 0, init1,
                   jnp.where(y1 < ty, u1_active, prev))

    # y1 == 0 fallback for u2: one plain step from the init column
    # (all operands are c1-derived — off-chain)
    u2_from_init = jnp.maximum(
        jnp.maximum(init1, sel_e(m1_s, shr(init1, 1))),
        sel(m2_s, shr(init1, 2))) + c2
    u2 = jnp.where(y2 < ty,
                   jnp.where(y1 == 0, u2_from_init,
                             jnp.where(y1 < ty, u2_active, prev)),
                   u1)

    # move trits (ties prefer smaller moves, matching the per-frame
    # kernel exactly: strict > comparisons)
    take2_1 = (p2 > best1_1).astype(jnp.float32)
    take1_1 = (p1 > prev).astype(jnp.float32) * (1.0 - take2_1)
    gate1 = ((y1 < ty) & (y1 != 0)).astype(jnp.float32)
    trit1 = ((take1_1 + 2.0 * take2_1) * gate1).astype(jnp.int8)

    q1 = sel_e(m1_s, shr(u1, 1))
    q2 = sel(m2_s, shr(u1, 2))
    best1_2 = jnp.maximum(u1, q1)
    take2_2 = (q2 > best1_2).astype(jnp.float32)
    take1_2 = (q1 > u1).astype(jnp.float32) * (1.0 - take2_2)
    gate2 = (y2 < ty).astype(jnp.float32)      # y2 >= 1 always
    trit2 = ((take1_2 + 2.0 * take2_2) * gate2).astype(jnp.int8)
    return trit1, trit2, u2


def _viterbi_fwd_kernel(ty_ref, val_ref, moves_ref, final_ref, carry_ref,
                        *, max_neg_val: float, pair: bool = False,
                        enter_cost: float = 0.0):
    chunk = val_ref.shape[0]
    B, T_s = carry_ref.shape
    i = pl.program_id(0)
    n = pl.num_programs(0)
    ty = ty_ref[:]
    s, can_skip = _skip_mask(B, T_s)
    s_is_0 = s == 0
    s_lt_2 = s < 2
    if enter_cost != 0.0:
        ce, _ = _enter_rows(s, enter_cost)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full((B, T_s), max_neg_val, jnp.float32)

    def body(j, prev):
        y = i * chunk + j
        col = val_ref[j]
        # zero-pad concat shifts (see mas_pallas helper comment); the
        # shifted-in lanes are masked here anyway.
        p1 = _shift_right(prev, 1)
        if enter_cost != 0.0:
            p1 = p1 + ce          # before the s==0 mask, like the oracle
        p1 = jnp.where(s_is_0, max_neg_val, p1)
        p2 = jnp.where(can_skip, _shift_right(prev, 2), max_neg_val)
        best1 = jnp.maximum(prev, p1)
        best = jnp.maximum(best1, p2)
        # move trit via f32 arithmetic (i8-valued selects hit Mosaic
        # relayout limits at odd lane counts); ties prefer smaller moves
        take2 = (p2 > best1).astype(jnp.float32)
        take1 = (p1 > prev).astype(jnp.float32) * (1.0 - take2)
        gate = ((y < ty) & (y != 0)).astype(jnp.float32)
        moves_ref[j] = ((take1 + 2.0 * take2) * gate).astype(jnp.int8)
        new = best + col
        # y == 0: only the start states {0, 1} are live, no transitions
        # (the leading pause, state 0, is an entry).
        init = jnp.where(s_lt_2, col, max_neg_val)
        if enter_cost != 0.0:
            init = jnp.where(s_is_0, col + jnp.float32(enter_cost), init)
        new = jnp.where(y == 0, init, new)
        # freeze past each item's last frame (the final column must be
        # the carry at frame t_y - 1 for the start-state choice)
        return jnp.where(y < ty, new, prev)

    def pair_body(jj, prev):
        j = 2 * jj
        trit1, trit2, new = _viterbi_pair_step(
            prev, val_ref[j], val_ref[j + 1], i * chunk + j, ty, s,
            max_neg_val, enter_cost=enter_cost)
        moves_ref[j] = trit1
        moves_ref[j + 1] = trit2
        return new

    if pair:  # call sites guarantee chunk % 2 == 0 when pair is set
        carry_ref[:] = jax.lax.fori_loop(0, chunk // 2, pair_body,
                                         carry_ref[:], unroll=True)
    else:
        carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:],
                                         unroll=True)

    @pl.when(i == n - 1)
    def _():
        final_ref[:] = carry_ref[:]


def _viterbi_bwd_kernel(ty_ref, ind0_ref, moves_ref, path_ref, ind_ref,
                        *, pair: bool = False):
    chunk = moves_ref.shape[0]
    B, T_s = ind_ref.shape
    i = pl.program_id(0)
    n = pl.num_programs(0)
    ty = ty_ref[:]

    @pl.when(i == 0)
    def _():
        ind_ref[:] = ind0_ref[:]

    base = (n - 1 - i) * chunk

    def body(jj, ind):
        j = chunk - 1 - jj
        y = base + j
        active = (y < ty).astype(jnp.float32)
        emit = ind * active
        path_ref[j] = emit.astype(jnp.int8)
        # decode the trit arithmetically in f32 (mv in {0, 1, 2}):
        # b1 = mv*(2-mv), b2 = mv*(mv-1)/2 — avoids i8-mask selects.
        mvf = moves_ref[j].astype(jnp.float32)
        s1 = emit * (mvf * (2.0 - mvf))
        s2 = emit * (mvf * (mvf - 1.0) * 0.5)
        # shifted-in lanes are zero: moves vanish at s == 0 (and skip
        # moves at s <= 1), so the one-hot masses s1/s2 do too.
        return (ind - s1 - s2
                + _shift_left(s1, 1)
                + _shift_left(s2, 2))

    def pair_body(jj, ind):
        # Two composed trit steps: the move-0..4 masses D_M depend only
        # on the (activity-gated) trit rows — off the indicator chain —
        # so ind advances two frames per cross-lane shift latency.
        # Exact one-hot x {0,1,2}-indicator algebra in f32; an inactive
        # frame has gated mv = 0, i.e. a pure stay.
        j_hi = chunk - 1 - 2 * jj
        j_lo = j_hi - 1
        y_hi = base + j_hi
        a_hi = (y_hi < ty).astype(jnp.float32)
        a_lo = (y_hi - 1 < ty).astype(jnp.float32)
        mh = moves_ref[j_hi].astype(jnp.float32) * a_hi
        ml = moves_ref[j_lo].astype(jnp.float32) * a_lo
        h0 = (mh - 1.0) * (mh - 2.0) * 0.5
        h1 = mh * (2.0 - mh)
        h2 = mh * (mh - 1.0) * 0.5
        l0 = (ml - 1.0) * (ml - 2.0) * 0.5
        l1 = ml * (2.0 - ml)
        l2 = ml * (ml - 1.0) * 0.5
        shr = _shift_right
        D0 = h0 * l0
        D1 = h0 * l1 + h1 * shr(l0, 1)
        D2 = h0 * l2 + h1 * shr(l1, 1) + h2 * shr(l0, 2)
        D3 = h1 * shr(l2, 1) + h2 * shr(l1, 2)
        D4 = h2 * shr(l2, 2)
        path_ref[j_hi] = (ind * a_hi).astype(jnp.int8)
        s1 = ind * h1                      # == emit_hi * b1 (gated)
        s2 = ind * h2
        ind_mid = (ind - s1 - s2 + _shift_left(s1, 1)
                   + _shift_left(s2, 2))
        path_ref[j_lo] = (ind_mid * a_lo).astype(jnp.int8)
        return (ind * D0
                + _shift_left(ind * D1, 1) + _shift_left(ind * D2, 2)
                + _shift_left(ind * D3, 3) + _shift_left(ind * D4, 4))

    if pair:  # call sites guarantee chunk % 2 == 0 when pair is set
        ind_ref[:] = jax.lax.fori_loop(0, chunk // 2, pair_body,
                                       ind_ref[:], unroll=True)
    else:
        ind_ref[:] = jax.lax.fori_loop(0, chunk, body, ind_ref[:],
                                       unroll=True)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "max_neg_val", "pair",
                                    "enter_cost"))
def mas_skip_pallas(value, t_x, t_y, *, interpret: bool | None = None,
                    max_neg_val: float = MAX_NEG_VAL,
                    pair: bool | None = None,
                    enter_cost: float = 0.0):
    """Batched pause-aware Viterbi on TPU. value: [B, T_s, T_y] f32
    (state-major, T_s >= 2*max(t_x)+1); t_x, t_y: [B] int32. Returns 0/1
    paths [B, T_s, T_y] f32, identical to skip_dp.mas_skip_lax.
    pair: None enables the two-frame composed sweeps in the latency
    regime (B*T_s <= SKIP_PAIR_MAX_ELEMS); True/False force.
    enter_cost: static log-cost per pause entered (skip_dp docstring)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    B, T_s, T_y0 = value.shape
    if pair is None:
        pair = B * T_s <= SKIP_PAIR_MAX_ELEMS
    vt = jnp.transpose(value.astype(jnp.float32), (2, 0, 1))
    vt, _ = _pad_frames(vt)
    T_y = vt.shape[0]
    chunk = _pick_chunk(T_y, B, T_s)
    grid = T_y // chunk
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_s))
    len_spec = pl.BlockSpec((B, T_s), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    seq_spec = lambda ix: pl.BlockSpec((chunk, B, T_s), ix,
                                       memory_space=pltpu.VMEM)
    moves, final = pl.pallas_call(
        functools.partial(_viterbi_fwd_kernel, max_neg_val=max_neg_val,
                          pair=pair and chunk % 2 == 0,
                          enter_cost=enter_cost),
        grid=(grid,),
        in_specs=[len_spec, seq_spec(lambda i: (i, 0, 0))],
        out_specs=(seq_spec(lambda i: (i, 0, 0)), len_spec),
        out_shape=(jax.ShapeDtypeStruct((T_y, B, T_s), jnp.int8),
                   jax.ShapeDtypeStruct((B, T_s), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((B, T_s), jnp.float32)],
        interpret=interpret,
    )(ty_b, vt)

    # start state for the reverse walk: last token (2 t_x - 1) unless
    # the trailing pause (2 t_x) is strictly better; invalid items
    # (t_x < 1 or t_x > t_y) start with a zero indicator -> zero path.
    ts = 2 * t_x.astype(jnp.int32) + 1
    ss = jnp.arange(T_s, dtype=jnp.int32)[None, :]
    v_tok = jnp.take_along_axis(
        final, jnp.maximum(ts - 2, 0)[:, None], axis=1)[:, 0]
    v_pause = jnp.take_along_axis(
        final, jnp.maximum(ts - 1, 0)[:, None], axis=1)[:, 0]
    s0 = jnp.where(v_pause > v_tok, ts - 1, jnp.maximum(ts - 2, 0))
    valid = (t_x >= 1) & (t_x <= t_y)
    ind0 = ((ss == s0[:, None]) & valid[:, None]).astype(jnp.float32)

    rev = lambda i: (grid - 1 - i, 0, 0)
    path = pl.pallas_call(
        functools.partial(_viterbi_bwd_kernel,
                          pair=pair and chunk % 2 == 0),
        grid=(grid,),
        in_specs=[len_spec, len_spec, seq_spec(rev)],
        out_specs=seq_spec(rev),
        out_shape=jax.ShapeDtypeStruct((T_y, B, T_s), jnp.int8),
        scratch_shapes=[pltpu.VMEM((B, T_s), jnp.float32)],
        interpret=interpret,
    )(ty_b, ind0, moves)
    return jnp.transpose(path[:T_y0], (1, 2, 0)).astype(jnp.float32)


def _alpha_skip_pair_step(prev, c1, c2, y1, ty, s,
                          enter_cost: float = 0.0):
    """Two composed skip-lattice forward-sum frames: the nested
    three-arm logaddexp tree over two frames expands to one flat,
    max-stabilised 9-term logsumexp — the same nine (m1, m2) move-pair
    candidates (and destination masks) as the Viterbi pair, LSE-combined
    — so two frames cost one cross-lane shift latency and one exp/log
    round. Tolerance contract, not bit; init/freeze selected against
    the (shift-reusing) single-step results. Returns (alpha1, alpha2)."""
    shr = _shift_right
    y2 = y1 + 1
    m1_s = s >= 1
    m2_s = (s % 2 == 1) & (s >= 3)
    m1_s1 = s >= 2
    m2_s1 = (s % 2 == 0) & (s >= 4)
    m1_s2 = s >= 3
    m2_s2 = (s % 2 == 1) & (s >= 5)
    r1, r2 = shr(prev, 1), shr(prev, 2)
    r3, r4 = shr(prev, 3), shr(prev, 4)
    c1s1, c1s2 = shr(c1, 1), shr(c1, 2)
    first = jnp.where(s < 2, 0.0, NEG)

    def sel(mask, r):
        return jnp.where(mask, r, NEG)

    # Outer-arm masks (m1_s / m2_s on the alpha1-shift arms) replace the
    # WHOLE arm with a raw NEG sentinel — exactly as the sequential
    # nesting does — while inner masks sit inside the +c1-shift sum.
    # The surplus masked terms use 2*NEG so a dead cell contributes one
    # e^{NEG} like the sequential form (the rest underflow to zero).
    if enter_cost != 0.0:
        ce, co = _enter_rows(s, enter_cost)
        first = jnp.where(s == 0, first + jnp.float32(enter_cost), first)

        def sel_e(mask, r):     # advance candidate, cost-then-mask
            return jnp.where(mask, r + ce, NEG)

        def add_e(v):           # second-move advance-into-even cost
            return v + ce

        def add_o(v):           # first-move advance into s-1 (odd->even)
            return v + co
    else:
        sel_e = sel

        def add_e(v):
            return v
        add_o = add_e

    # Entry costs sit at the same sequential positions as the Viterbi
    # pair: first-move costs on the prev shifts, second-move costs after
    # the c1-shift sums.
    T = [prev + c1,
         sel_e(m1_s, r1) + c1,
         sel(m2_s, r2) + c1,
         jnp.where(m1_s, add_e(r1 + c1s1), NEG),
         jnp.where(m1_s, add_e(add_o(sel(m1_s1, r2)) + c1s1), 2.0 * NEG),
         jnp.where(m1_s, add_e(sel(m2_s1, r3) + c1s1), 2.0 * NEG),
         jnp.where(m2_s, r2 + c1s2, NEG),
         jnp.where(m2_s, sel_e(m1_s2, r3) + c1s2, 2.0 * NEG),
         jnp.where(m2_s, sel(m2_s2, r4) + c1s2, 2.0 * NEG)]
    mx = T[0]
    for t in T[1:]:
        mx = jnp.maximum(mx, t)
    ssum = jnp.exp(T[0] - mx)
    for t in T[1:]:
        ssum = ssum + jnp.exp(t - mx)
    a2_active = c2 + (mx + jnp.log(ssum))

    p1 = sel_e(m1_s, r1)
    p2 = sel(m2_s, r2)
    a1_active = c1 + jnp.logaddexp(jnp.logaddexp(prev, p1), p2)
    init1 = c1 + first
    a1 = jnp.where(y1 == 0, init1,
                   jnp.where(y1 < ty, a1_active, prev))
    a2_init = c2 + jnp.logaddexp(
        jnp.logaddexp(init1, sel_e(m1_s, shr(init1, 1))),
        sel(m2_s, shr(init1, 2)))
    a2 = jnp.where(y2 < ty,
                   jnp.where(y1 == 0, a2_init,
                             jnp.where(y1 < ty, a2_active, prev)),
                   a1)
    return a1, a2


def _alpha_skip_kernel(ty_ref, lp_ref, alpha_ref, carry_ref,
                       *, pair: bool = False, enter_cost: float = 0.0):
    chunk = lp_ref.shape[0]
    B, T_s = carry_ref.shape
    i = pl.program_id(0)
    ty = ty_ref[:]
    s, can_skip = _skip_mask(B, T_s)
    s_is_0 = s == 0
    first = jnp.where(s < 2, 0.0, NEG)
    if enter_cost != 0.0:
        ce, _ = _enter_rows(s, enter_cost)
        first = jnp.where(s_is_0, first + jnp.float32(enter_cost), first)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full((B, T_s), NEG, jnp.float32)

    def body(j, prev):
        y = i * chunk + j
        col = lp_ref[j]
        p1 = _shift_right(prev, 1)
        if enter_cost != 0.0:
            p1 = p1 + ce          # before the s==0 mask, like the oracle
        p1 = jnp.where(s_is_0, NEG, p1)
        p2 = jnp.where(can_skip, _shift_right(prev, 2), NEG)
        inner = jnp.logaddexp(jnp.logaddexp(prev, p1), p2)
        alpha = col + jnp.where(y == 0, first, inner)
        alpha = jnp.where(y < ty, alpha, prev)
        alpha_ref[j] = alpha
        return alpha

    def pair_body(jj, prev):
        j = 2 * jj
        a1, a2 = _alpha_skip_pair_step(prev, lp_ref[j], lp_ref[j + 1],
                                       i * chunk + j, ty, s,
                                       enter_cost=enter_cost)
        alpha_ref[j] = a1
        alpha_ref[j + 1] = a2
        return a2

    if pair:  # call site guarantees chunk % 2 == 0 when pair is set
        carry_ref[:] = jax.lax.fori_loop(0, chunk // 2, pair_body,
                                         carry_ref[:], unroll=True)
    else:
        carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:],
                                         unroll=True)


def _gamma_skip_kernel(ts_ref, ty_ref, total_ref, lp_ref, alpha_ref,
                       grad_ref, carry_ref, *, enter_cost: float = 0.0):
    """Fused beta sweep + posterior emission. Carry M[y] = lp[y] +
    beta[y]. Skip arcs leave odd states s with s + 2 < ts. The
    advance arc s -> s+1 enters a pause iff s+1 is even, so the
    enter_cost lands on odd source states (mirrors _beta_scan_skip)."""
    chunk = lp_ref.shape[0]
    B, T_s = carry_ref.shape
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        # Every frame y >= t_y passes the carry through, so without this
        # init the padded tail would read uninitialized VMEM; today the
        # y == ty-1 end-column overwrite masks it, but keep the same
        # defined-start invariant as every other sweep kernel.
        carry_ref[:] = jnp.full((B, T_s), NEG, jnp.float32)

    ts = ts_ref[:]
    ty = ty_ref[:]
    total = total_ref[:]
    s, _ = _skip_mask(B, T_s)
    s_odd = s % 2 == 1
    end_col = jnp.where((s == ts - 1) | (s == ts - 2), 0.0, NEG)
    base = (n - 1 - i) * chunk

    def body(jj, m_next):
        j = chunk - 1 - jj
        y = base + j
        lp = lp_ref[j]
        alpha = alpha_ref[j]
        m1 = _shift_left(m_next, 1)
        if enter_cost != 0.0:
            m1 = jnp.where(s_odd, m1 + jnp.float32(enter_cost), m1)
        m1 = jnp.where(s + 1 < ts, m1, NEG)
        m2 = _shift_left(m_next, 2)
        m2 = jnp.where(s_odd & (s + 2 < ts), m2, NEG)
        beta = jnp.logaddexp(jnp.logaddexp(m_next, m1), m2)
        beta = jnp.where(y == ty - 1, end_col, beta)
        live = (y < ty) & (lp > 0.5 * NEG)
        gamma = jnp.where(live, jnp.exp(alpha + beta - total), 0.0)
        grad_ref[j] = gamma
        m = lp + beta
        m = jnp.where(m > 0.5 * NEG, m, NEG)
        return jnp.where(y < ty, m, m_next)

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:],
                                     unroll=True)


def forward_sum_skip_alpha_pallas(lp_tm, t_y, *, interpret: bool = False,
                                  pair: bool | None = None,
                                  enter_cost: float = 0.0):
    """lp_tm: [T_y, B, T_s] pre-masked log-probs. Returns alphas
    [T_y, B, T_s] (frame t_y-1's column persists to the last row).
    pair: None enables the two-frame composed sweep in the latency
    regime (B*T_s <= SKIP_PAIR_MAX_ELEMS); True/False force.
    enter_cost: static log-cost per pause entered (skip_dp docstring)."""
    lp_tm, T_y0 = _pad_frames(lp_tm)
    T_y, B, T_s = lp_tm.shape
    chunk = _pick_chunk(T_y, B, T_s)
    if pair is None:
        pair = B * T_s <= SKIP_PAIR_MAX_ELEMS
    grid = T_y // chunk
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_s))
    len_spec = pl.BlockSpec((B, T_s), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    alphas = pl.pallas_call(
        functools.partial(_alpha_skip_kernel,
                          pair=pair and chunk % 2 == 0,
                          enter_cost=enter_cost),
        grid=(grid,),
        in_specs=[len_spec,
                  pl.BlockSpec((chunk, B, T_s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, B, T_s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_y, B, T_s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, T_s), jnp.float32)],
        interpret=interpret,
    )(ty_b, lp_tm)
    return alphas[:T_y0]


def forward_sum_skip_gamma_pallas(lp_tm, alphas, total, t_x, t_y,
                                  *, interpret: bool = False,
                                  enter_cost: float = 0.0):
    """Posterior occupancy gamma [T_y, B, T_s] via the fused beta sweep."""
    lp_tm, T_y0 = _pad_frames(lp_tm)
    alphas, _ = _pad_frames(alphas)
    T_y, B, T_s = lp_tm.shape
    chunk = _pick_chunk(T_y, B, T_s)
    grid = T_y // chunk
    ts = (2 * t_x.astype(jnp.int32) + 1)
    ts_b = jnp.broadcast_to(ts[:, None], (B, T_s))
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_s))
    total_b = jnp.broadcast_to(total.astype(jnp.float32)[:, None],
                               (B, T_s))
    len_spec = pl.BlockSpec((B, T_s), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    rev = lambda i: (grid - 1 - i, 0, 0)
    seq = lambda: pl.BlockSpec((chunk, B, T_s), rev,
                               memory_space=pltpu.VMEM)
    gamma = pl.pallas_call(
        functools.partial(_gamma_skip_kernel, enter_cost=enter_cost),
        grid=(grid,),
        in_specs=[len_spec, len_spec, len_spec, seq(), seq()],
        out_specs=seq(),
        out_shape=jax.ShapeDtypeStruct((T_y, B, T_s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, T_s), jnp.float32)],
        interpret=interpret,
    )(ts_b, ty_b, total_b, lp_tm, alphas)
    return gamma[:T_y0]
