"""Pallas TPU kernels for Monotonic Alignment Search.

TPU-native replacement for the reference Cython DP (monotonic_align/
core.pyx:9-45). Kernels over a time-major [T_y, B, T_x] layout:

* **Forward sweep** — a sequential grid over mel-frame chunks; the previous
  cumulative column ([B, T_x] f32) lives in a VMEM scratch that persists
  across grid steps (TPU grids execute sequentially, so the scratch is the
  scan carry). Pallas double-buffers the value-chunk DMAs automatically.
  Each step is a handful of VPU ops on a [B, T_x] tile; instead of writing
  the cumulative lattice back to HBM, the kernel emits one int8 *decision
  bit* per cell — the reference's backtrack predicate
  `(x != 0) & ((x == y) | (cum[x, y-1] < cum[x-1, y-1]))` (core.pyx:34)
  evaluated inline, since both operands are already in the carry. This cuts
  HBM traffic 4x vs storing the f32 lattice.

  The reference's reachability band is *not* masked here: in-band cells read
  only in-band (or special-cased) cells of the previous column, and the
  backtrack provably never visits an out-of-band cell (index <= y and
  index >= t_x + y - t_y hold inductively, see SURVEY.md §2.2), so values
  and bits computed at out-of-band cells are dead. Dropping the band mask
  removes ~1/3 of the per-step VPU work and all length inputs from the
  forward kernel while keeping paths bit-identical.

* **Backtrack** — the same grid reversed. The walking token index is a
  one-hot indicator row ([B, T_x] f32 scratch); `index -= bit[index, y]` is
  done entirely elementwise, with no cross-lane reduction:
      emit     = indicator * active          (the path row for frame y)
      selected = emit * bits_row             (one-hot iff the bit is set)
      indicator += roll(selected, -1) - selected
  which keeps the inherently sequential backtrack fully vectorised over the
  batch with no host involvement.

* **Fused kernel** — when the whole int8 bit lattice fits a VMEM scratch
  (T_y*B*T_x <= ~6 MB: every serving-size batch and the headline config),
  forward and backtrack run as the two halves of ONE kernel's sequential
  grid: steps [0, n) sweep value chunks left-to-right writing bits to the
  scratch, steps [n, 2n) walk the scratch right-to-left emitting the path.
  One launch instead of two, and the bit lattice never touches HBM. This
  is the low-latency path for the B=1 serving regime (the two-kernel
  pipeline's second launch + bits round-trip dominates at small B).

* **Natural-input variants** — the drop-in contract is the reference's
  [B, T_x, T_y] layout; `_fused_kernel_nat` (and `_forward_kernel_natv`
  for bit lattices beyond the fused budget) read it directly via an
  in-kernel block transpose, deleting the standalone XLA transpose's
  HBM round-trip (the dominant wrapper cost at large B).

* **Composed recurrences** — the kernels are VPU-latency-chain-bound,
  so the fast region advances two frames (`_fwd_pair_fast`/`_bt_pair`)
  or, in the latency regime (B*T_x <= QUAD_MAX_ELEMS), four frames
  (`_fwd_quad_fast`/`_bt_quad`) per cross-lane shift latency, with
  every composition coefficient computed off the critical chain. Bit-
  exactness rests on one lemma, applied iteratively: f32 rounding is
  monotone, so max(fl(q+a), fl(q+b)) == fl(q + max(a, b)) — the max
  may be distributed over a common addend, but additions are never
  re-associated, so every path keeps the sequential left-to-right sum.

All pipelines share the per-step recurrence helpers below (and the
`_bt_half` backtrack scaffold), so the bit-exactness rules live in
exactly one place. Lane shifts across token positions use zero-padded
slice+concat (`_shift_right`/`_shift_left` — ~3x lower chained latency
than `pltpu.roll` on sub-tile rows, see the helper comment); shifted-in
lanes are either masked or provably zero. Ties match the reference
exactly (strict `<` in the bit predicate: ties keep the token,
transitions happen as early as possible). Items with t_x > t_y
(reference UB, core.pyx:32-35) return all-zero paths. Measured numbers:
docs/PERF.md; the microbenchmarks behind each choice: docs/design.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_NEG_VAL = -1e9

# Whole-bit-lattice VMEM scratch budget for the fused kernel. Together
# with the 4 MB double-buffered value-chunk budget (_pick_chunk) and the
# path/state blocks this stays well under the ~16 MB/core VMEM.
FUSED_BITS_BUDGET = 6 * 1024 * 1024

# Below this many B*T_x elements per column the DP is latency-chain
# bound (not VPU-issue bound) and the four-frame composed recurrences
# win (measured v5e: quad beats pair at B=1 through B=32 at T_x=128;
# B=64+ takes the two-kernel route anyway); above it their extra issue
# volume would cost more than the shortened chain saves.
QUAD_MAX_ELEMS = 4096


# ---------------------------------------------------------------------------
# Shared per-step recurrence algebra (used by both the chunked two-kernel
# pipeline and the fused single-kernel pipeline — keep bit-exact).
#
# Lane shifts use zero-padded slice+concat rather than `pltpu.roll`:
# measured on v5e, a chained roll costs ~216 ns on sub-tile rows (e.g.
# (1, 64) — the B=1 serving shape) vs ~75 ns for the concat form, and
# they tie at full 128-lane rows. Zero padding is also the semantically
# right edge: every wrapped-in lane the kernels consume was either
# explicitly masked or provably zero (forward bits vanish at x == 0), so
# paths are bit-identical to the roll formulation.
# ---------------------------------------------------------------------------

def _shift_right(v, k: int = 1):
    """out[..., x] = v[..., x-k]; the first k lanes are zero."""
    if k >= v.shape[-1]:
        return jnp.zeros_like(v)
    pad = jnp.zeros_like(v[..., :k])
    return jnp.concatenate([pad, v[..., :-k]], axis=-1)


def _shift_left(v, k: int = 1):
    """out[..., x] = v[..., x+k]; the last k lanes are zero."""
    if k >= v.shape[-1]:
        return jnp.zeros_like(v)
    pad = jnp.zeros_like(v[..., :k])
    return jnp.concatenate([v[..., k:], pad], axis=-1)


def _fwd_step_full(prev, col, y, x, max_neg_val):
    """One forward step for a frame with y < T_x (the diagonal cell x == y
    exists). Returns (decision bits int8, new cumulative column)."""
    prev_shift = _shift_right(prev)  # prev[x-1]; x==0 masked
    x_is_y = x == y
    v_cur = jnp.where(x_is_y, max_neg_val, prev)
    v_prev = jnp.where(x == 0,
                       jnp.where(y == 0, 0.0, max_neg_val),
                       prev_shift)
    bits = ((x_is_y | (prev < prev_shift)) & (x > 0)).astype(jnp.int8)
    return bits, jnp.maximum(v_cur, v_prev) + col


def _fwd_step_fast(prev, col, x, max_neg_val):
    """One forward step for y >= T_x: x == y is impossible, so v_cur = prev
    and the diagonal terms drop out of both the max and the bits."""
    prev_shift = _shift_right(prev)
    v_prev = jnp.where(x == 0, max_neg_val, prev_shift)
    bits = ((prev < prev_shift) & (x > 0)).astype(jnp.int8)
    return bits, jnp.maximum(prev, v_prev) + col


def _fwd_pair_fast(prev, colA, colB, x, max_neg_val):
    """Two composed forward steps (both frames y >= T_x). The shift-k
    candidate coefficients depend only on the value columns, so the
    critical dependency chain shrinks from 8 ops per 2 frames to 6.
    Bit-exact: round(p + max(a, b)) == max(round(p+a), round(p+b)) because
    f32 rounding is monotone, so distributing adds over the max tree
    preserves every candidate's rounded value.
    Returns (bitsA, bitsB, new cumulative column after both frames)."""
    x_is_0 = x == 0
    x_gt_0 = x > 0
    r1 = _shift_right(prev, 1)                  # prev[x-1]
    r2 = _shift_right(prev, 2)                  # prev[x-2]
    sel1 = jnp.where(x_is_0, max_neg_val, r1)
    sel2 = jnp.where(x < 2, max_neg_val, r2)
    rollA = _shift_right(colA, 1)               # colA[x-1]
    m1 = jnp.where(x_is_0, colA, jnp.maximum(colA, rollA))
    a1 = jnp.where(x_is_0, 0.0, rollA)
    t0 = prev + colA
    t1 = sel1 + m1
    t2 = sel2 + a1
    bitsA = ((prev < r1) & x_gt_0).astype(jnp.int8)
    cmid = jnp.maximum(prev, sel1) + colA       # the skipped column
    bitsB = ((cmid < _shift_right(cmid, 1)) & x_gt_0).astype(jnp.int8)
    return bitsA, bitsB, jnp.maximum(jnp.maximum(t1, t2), t0) + colB


def _bt_step(ind, bits_col, y, ty, T_x):
    """One backtrack step: emit the path row for frame y and advance the
    one-hot indicator. Returns (path row f32, new indicator)."""
    emit = ind * (y < ty).astype(jnp.float32)
    s = emit * bits_col.astype(jnp.float32)
    return emit, ind - s + _shift_left(s, 1)


def _bt_pair(ind, bits_hi, bits_lo, y_hi, ty, T_x):
    """Two backtrack steps with the two-step walk *composed*: the per-step
    update ind' = ind - s + roll(s, -1) (s = ind * bits) has a serial
    dependency chain whose latency dominates at small batch; the composed
    move-0/1/2 coefficients D0/D1/D2 depend only on the bit rows (off the
    critical chain), so ind_{y-2} is 4 chained ops from ind_y instead of 8.
    One-hot x {0,1} algebra in f32 — exact. Shifted-in lanes are zero by
    construction (and were provably zero in the roll formulation too:
    forward bits vanish at x == 0, D2 at x <= 1). Requires T_x >= 2.
    Returns (path row y_hi, path row y_hi - 1, new indicator)."""
    a_hi = (y_hi < ty).astype(jnp.float32)
    a_lo = (y_hi - 1 < ty).astype(jnp.float32)
    b1 = bits_hi.astype(jnp.float32) * a_hi
    b2 = bits_lo.astype(jnp.float32) * a_lo
    b2s = _shift_right(b2, 1)                # b2[x-1]
    d1 = b1 * (1.0 - b2s) + (1.0 - b1) * b2  # move exactly one
    d2 = b1 * b2s                            # move twice
    path_hi = ind * a_hi
    s1 = ind * b1
    ind_mid = ind - s1 + _shift_left(s1, 1)
    path_lo = ind_mid * a_lo
    m1 = ind * d1
    m2 = ind * d2
    new_ind = (ind - m1 - m2
               + _shift_left(m1, 1)
               + _shift_left(m2, 2))
    return path_hi, path_lo, new_ind


def _fwd_quad_fast(prev, c1, c2, c3, c4, x, max_neg_val):
    """Four composed fast forward steps (all frames y >= T_x): one
    cross-lane shift latency per FOUR frames. The 16 advance patterns
    are grouped by total advance m; within a group, paths are merged
    bottom-up with the distribute identity
        max(fl(q + a), fl(q + b)) == fl(q + max(a, b))
    (f32 rounding is monotone), so every path value keeps the exact
    sequential left-to-right addition order — bit-identical to four
    _fwd_step_fast applications whenever the max_neg_val sentinel
    dominates the accumulated values (the documented contract). All
    column shifts/maxima and the m-group merge trees are carry-
    independent; the carry chain is one shift + a few adds/maxes.
    Returns (bits for the 4 frames, new cumulative column)."""
    shr = _shift_right
    # carry shifts: independent, issue together — one shift latency.
    sel1 = jnp.where(x < 1, max_neg_val, shr(prev, 1))
    sel2 = jnp.where(x < 2, max_neg_val, shr(prev, 2))
    sel3 = jnp.where(x < 3, max_neg_val, shr(prev, 3))
    sel4 = jnp.where(x < 4, max_neg_val, shr(prev, 4))
    # column shifts and pairwise maxima: off the carry chain entirely.
    c1s1, c1s2, c1s3 = shr(c1, 1), shr(c1, 2), shr(c1, 3)
    c2s1, c2s2 = shr(c2, 1), shr(c2, 2)
    c3s1 = shr(c3, 1)
    M11 = jnp.maximum(c1, c1s1)
    M21 = jnp.maximum(c2, c2s1)
    M31 = jnp.maximum(c3, c3s1)
    # advance-m groups (pre-c4 sums; the shared final +c4 distributes).
    A0 = ((prev + c1) + c2) + c3
    A1 = jnp.maximum(((sel1 + M11) + c2) + c3,
                     ((sel1 + c1s1) + c2s1) + M31)
    A2 = jnp.maximum(
        jnp.maximum(((sel2 + c1s1) + c2) + c3,
                    ((sel2 + c1s1) + c2s1) + M31),
        jnp.maximum(((sel2 + c1s2) + c2s1) + M31,
                    ((sel2 + c1s2) + c2s2) + c3s1))
    A3 = jnp.maximum(((sel3 + c1s2) + c2s1) + M31,
                     jnp.maximum(((sel3 + c1s2) + c2s2) + c3s1,
                                 ((sel3 + c1s3) + c2s2) + c3s1))
    A4 = ((sel4 + c1s3) + c2s2) + c3s1
    new = jnp.maximum(jnp.maximum(jnp.maximum(A0, A1),
                                  jnp.maximum(A2, A3)), A4) + c4
    # intermediate columns (exact sequential values, off the carry
    # chain) — operands of the per-frame bit predicates.
    u1 = jnp.maximum(prev, sel1) + c1
    u2 = jnp.maximum(jnp.maximum(prev + c1, sel1 + M11),
                     sel2 + c1s1) + c2
    u3 = jnp.maximum(
        jnp.maximum(jnp.maximum((prev + c1) + c2, (sel1 + M11) + c2),
                    (sel1 + c1s1) + c2s1),
        jnp.maximum(jnp.maximum((sel2 + c1s1) + M21,
                                (sel2 + c1s2) + c2s1),
                    (sel3 + c1s2) + c2s1)) + c3
    x_gt_0 = x > 0
    b1 = ((prev < shr(prev, 1)) & x_gt_0).astype(jnp.int8)
    b2 = ((u1 < shr(u1, 1)) & x_gt_0).astype(jnp.int8)
    b3 = ((u2 < shr(u2, 1)) & x_gt_0).astype(jnp.int8)
    b4 = ((u3 < shr(u3, 1)) & x_gt_0).astype(jnp.int8)
    return b1, b2, b3, b4, new


def _unrolled_fwd(vt, prev, write, y_base, x, T_x, chunk, max_neg_val,
                  first_body: bool, quad: bool):
    """Shared Python-unrolled forward over one chunk of columns. Lives
    ONCE so the tie-rule-critical frame-step dispatch (full / quad /
    pair / single) cannot drift between the fused time-major, fused
    natural, batch-tiled natural, and two-kernel natural routes — all
    of which carry the same bit-identity contract vs the oracle.

    vt[j] must be indexable with a static int (vt is either a ref or a
    traced value such as an in-kernel transpose result; Mosaic cannot
    lower dynamic_slice on values, hence Python unrolling). `write(j,
    bits)` stores frame j's decision bits; `y_base + j` is the absolute
    frame index (only consulted by the first-chunk full steps). Returns
    the carry after the chunk."""
    if first_body:
        for j in range(chunk):
            bits, prev = _fwd_step_full(prev, vt[j], y_base + j, x,
                                        max_neg_val)
            write(j, bits)
    elif quad and chunk % 4 == 0 and T_x >= 2:
        for jj in range(chunk // 4):
            j = 4 * jj
            b1, b2, b3, b4, prev = _fwd_quad_fast(
                prev, vt[j], vt[j + 1], vt[j + 2], vt[j + 3], x,
                max_neg_val)
            write(j, b1)
            write(j + 1, b2)
            write(j + 2, b3)
            write(j + 3, b4)
    elif chunk % 2 == 0 and T_x >= 2:
        for jj in range(chunk // 2):
            j = 2 * jj
            bitsA, bitsB, prev = _fwd_pair_fast(prev, vt[j], vt[j + 1],
                                                x, max_neg_val)
            write(j, bitsA)
            write(j + 1, bitsB)
    else:
        for j in range(chunk):
            bits, prev = _fwd_step_fast(prev, vt[j], x, max_neg_val)
            write(j, bits)
    return prev


_BT_PATTERNS = [(e4, e3, e2, e1)
                for e4 in (0, 1) for e3 in (0, 1)
                for e2 in (0, 1) for e1 in (0, 1)]


def _bt_quad(ind, bits4, bits3, bits2, bits1, y4, ty, T_x):
    """Four composed backtrack steps, frames y4 (top) down to y4-3: the
    composed move-0..4 masses D_m depend only on the (gated) bit rows —
    off the indicator chain — so ind advances four frames in one mult +
    shift + 4 adds. Exact one-hot x {0,1} algebra in f32 (disjoint
    indicator products); zero-padded shifts make it valid for any T_x.
    Returns (path rows y4, y4-1, y4-2, y4-3, new indicator)."""
    shr, shl = _shift_right, _shift_left
    a4 = (y4 < ty).astype(jnp.float32)
    a3 = (y4 - 1 < ty).astype(jnp.float32)
    a2 = (y4 - 2 < ty).astype(jnp.float32)
    a1 = (y4 - 3 < ty).astype(jnp.float32)
    g4 = bits4.astype(jnp.float32) * a4
    g3 = bits3.astype(jnp.float32) * a3
    g2 = bits2.astype(jnp.float32) * a2
    g1 = bits1.astype(jnp.float32) * a1
    # g_j as seen after k prior moves
    gs = {(4, 0): g4, (3, 0): g3, (3, 1): shr(g3, 1),
          (2, 0): g2, (2, 1): shr(g2, 1), (2, 2): shr(g2, 2),
          (1, 0): g1, (1, 1): shr(g1, 1), (1, 2): shr(g1, 2),
          (1, 3): shr(g1, 3)}
    D = [None] * 5
    for pattern in _BT_PATTERNS:
        k = 0
        term = None
        for j, e in zip((4, 3, 2, 1), pattern):
            gj = gs[(j, k)]
            f = gj if e else (1.0 - gj)
            term = f if term is None else term * f
            k += e
        D[k] = term if D[k] is None else D[k] + term
    moved = [ind * d for d in D]
    ind0 = (moved[0] + shl(moved[1], 1) + shl(moved[2], 2)
            + shl(moved[3], 3) + shl(moved[4], 4))
    # partial compositions for the three lower emissions (off-chain)
    s4 = ind * g4
    ind3 = ind - s4 + shl(s4, 1)
    g3_1 = gs[(3, 1)]
    P2_1 = g4 * (1.0 - g3_1) + (1.0 - g4) * g3
    P2_2 = g4 * g3_1
    ind2 = (ind * ((1.0 - g4) * (1.0 - g3))
            + shl(ind * P2_1, 1) + shl(ind * P2_2, 2))
    g2_1, g2_2 = gs[(2, 1)], gs[(2, 2)]
    P3_0 = (1.0 - g4) * (1.0 - g3) * (1.0 - g2)
    P3_1 = (g4 * (1.0 - g3_1) * (1.0 - g2_1)
            + (1.0 - g4) * g3 * (1.0 - g2_1)
            + (1.0 - g4) * (1.0 - g3) * g2)
    P3_2 = (g4 * g3_1 * (1.0 - g2_2)
            + g4 * (1.0 - g3_1) * g2_1
            + (1.0 - g4) * g3 * g2_1)
    P3_3 = g4 * g3_1 * g2_2
    ind1 = (ind * P3_0 + shl(ind * P3_1, 1) + shl(ind * P3_2, 2)
            + shl(ind * P3_3, 3))
    return (ind * a4, ind3 * a3, ind2 * a2, ind1 * a1, ind0)


# ---------------------------------------------------------------------------
# Two-kernel pipeline (large lattices: bit lattice streams through HBM).
# ---------------------------------------------------------------------------

def _forward_kernel(val_ref, bits_ref, carry_ref,
                    *, max_neg_val: float = MAX_NEG_VAL):
    chunk = val_ref.shape[0]
    B, T_x = carry_ref.shape
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    x = jax.lax.broadcasted_iota(jnp.int32, (B, T_x), 1)

    # The running cumulative column lives in vector registers across the
    # chunk (fori_loop carry); the VMEM scratch only persists it between
    # grid steps. This removes 8 VMEM ops per frame.
    def body_full(j, prev):
        bits, new = _fwd_step_full(prev, val_ref[j], i * chunk + j, x,
                                   max_neg_val)
        bits_ref[j] = bits
        return new

    def body_fast(j, prev):
        bits, new = _fwd_step_fast(prev, val_ref[j], x, max_neg_val)
        bits_ref[j] = bits
        return new

    def pair_fast(jj, prev):
        j = 2 * jj
        bitsA, bitsB, new = _fwd_pair_fast(prev, val_ref[j], val_ref[j + 1],
                                           x, max_neg_val)
        bits_ref[j] = bitsA
        bits_ref[j + 1] = bitsB
        return new

    @pl.when(i * chunk < T_x)
    def _():
        carry_ref[:] = jax.lax.fori_loop(0, chunk, body_full,
                                         carry_ref[:], unroll=True)

    @pl.when(i * chunk >= T_x)
    def _():
        if chunk % 2 == 0 and T_x >= 2:
            carry_ref[:] = jax.lax.fori_loop(0, chunk // 2, pair_fast,
                                             carry_ref[:], unroll=True)
        else:
            carry_ref[:] = jax.lax.fori_loop(0, chunk, body_fast,
                                             carry_ref[:], unroll=True)


def _backtrack_kernel(tx_ref, ty_ref, bits_ref, path_ref, ind_ref):
    chunk = bits_ref.shape[0]
    B, T_x = ind_ref.shape
    i = pl.program_id(0)
    n = pl.num_programs(0)

    tx = tx_ref[:]
    ty = ty_ref[:]
    x = jax.lax.broadcasted_iota(jnp.int32, (B, T_x), 1)

    @pl.when(i == 0)
    def _():
        # Fold the validity gate (1 <= t_x <= t_y) into the init: invalid
        # items start all-zero and stay all-zero (rolls of zero are zero).
        valid = (tx >= 1) & (tx <= ty)
        ind_ref[:] = ((x == tx - 1) & valid).astype(jnp.float32)

    base = (n - 1 - i) * chunk

    def single_step(j, ind):
        emit, new = _bt_step(ind, bits_ref[j], base + j, ty, T_x)
        path_ref[j] = emit.astype(jnp.int8)
        return new

    def pair_body(jj, ind):
        j_hi = chunk - 1 - (chunk % 2) - 2 * jj
        j_lo = j_hi - 1
        p_hi, p_lo, new = _bt_pair(ind, bits_ref[j_hi], bits_ref[j_lo],
                                   base + j_hi, ty, T_x)
        path_ref[j_hi] = p_hi.astype(jnp.int8)
        path_ref[j_lo] = p_lo.astype(jnp.int8)
        return new

    ind = ind_ref[:]
    if chunk % 2:                     # static: odd chunks do the top
        ind = single_step(chunk - 1, ind)  # frame singly, then pairs
    if T_x >= 2:
        ind = jax.lax.fori_loop(0, chunk // 2, pair_body, ind,
                                unroll=True)
    else:                             # T_x == 1: index never moves
        ind = jax.lax.fori_loop(
            0, chunk // 2,
            lambda jj, ind: single_step(
                chunk - 1 - (chunk % 2) - 2 * jj - 1,
                single_step(chunk - 1 - (chunk % 2) - 2 * jj, ind)),
            ind, unroll=True)

    ind_ref[:] = ind


# ---------------------------------------------------------------------------
# Fused single-kernel pipeline (bit lattice in VMEM; one launch).
# ---------------------------------------------------------------------------

def _bt_half(tx_ref, ty_ref, path_ref, bits_ref, state_ref, x,
             *, i, start_step, chunk, n_chunks, T_x, quad):
    """The shared backtrack half of both fused kernels (time-major and
    natural-input): indicator init at grid step `start_step`, then a
    right-to-left chunk walk emitting path rows from the VMEM bit
    lattice. Lives once so the tie/scheduling rules cannot diverge
    between the two pipelines."""
    tx = tx_ref[:]
    ty = ty_ref[:]

    @pl.when(i == start_step)
    def _():
        # Fold the validity gate (1 <= t_x <= t_y) into the init: invalid
        # items start all-zero and stay all-zero.
        valid = (tx >= 1) & (tx <= ty)
        state_ref[:] = ((x == tx - 1) & valid).astype(jnp.float32)

    base_b = jnp.clip(2 * n_chunks - 1 - i, 0, n_chunks - 1) * chunk

    def bt_single(j, ind):
        emit, new = _bt_step(ind, bits_ref[base_b + j], base_b + j, ty,
                             T_x)
        path_ref[j] = emit.astype(jnp.int8)
        return new

    def bt_pair(jj, ind):
        j_hi = chunk - 1 - (chunk % 2) - 2 * jj
        j_lo = j_hi - 1
        p_hi, p_lo, new = _bt_pair(ind, bits_ref[base_b + j_hi],
                                   bits_ref[base_b + j_lo],
                                   base_b + j_hi, ty, T_x)
        path_ref[j_hi] = p_hi.astype(jnp.int8)
        path_ref[j_lo] = p_lo.astype(jnp.int8)
        return new

    def bt_quad(jj, ind):
        j_hi = chunk - 1 - 4 * jj
        p4, p3, p2, p1, new = _bt_quad(
            ind, bits_ref[base_b + j_hi], bits_ref[base_b + j_hi - 1],
            bits_ref[base_b + j_hi - 2], bits_ref[base_b + j_hi - 3],
            base_b + j_hi, ty, T_x)
        path_ref[j_hi] = p4.astype(jnp.int8)
        path_ref[j_hi - 1] = p3.astype(jnp.int8)
        path_ref[j_hi - 2] = p2.astype(jnp.int8)
        path_ref[j_hi - 3] = p1.astype(jnp.int8)
        return new

    @pl.when(i >= start_step)
    def _():
        ind = state_ref[:]
        if quad and chunk % 4 == 0:
            ind = jax.lax.fori_loop(0, chunk // 4, bt_quad, ind,
                                    unroll=True)
        else:
            if chunk % 2:
                ind = bt_single(chunk - 1, ind)
            if T_x >= 2:
                ind = jax.lax.fori_loop(0, chunk // 2, bt_pair, ind,
                                        unroll=True)
            else:
                ind = jax.lax.fori_loop(
                    0, chunk // 2,
                    lambda jj, ind: bt_single(
                        chunk - 1 - (chunk % 2) - 2 * jj - 1,
                        bt_single(chunk - 1 - (chunk % 2) - 2 * jj, ind)),
                    ind, unroll=True)
        state_ref[:] = ind

def _fused_kernel(tx_ref, ty_ref, val_ref, path_ref, bits_ref, state_ref,
                  *, max_neg_val: float = MAX_NEG_VAL, quad: bool = False):
    """Grid = (2n,): steps [0, n) forward over value chunks, steps [n, 2n)
    backtrack over the VMEM bit lattice. `state_ref` is the forward carry
    column during the first half and the one-hot backtrack indicator during
    the second (same [B, T_x] f32 shape). quad=True uses the four-frame
    composed recurrences (latency regime; requires chunk % 4 == 0)."""
    chunk, B, T_x = val_ref.shape
    i = pl.program_id(0)
    n = pl.num_programs(0) // 2
    x = jax.lax.broadcasted_iota(jnp.int32, (B, T_x), 1)

    # -- forward half --------------------------------------------------
    @pl.when(i == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    # Clamp the traced chunk bases so the (predicated-off) other half never
    # forms an out-of-range scratch index.
    base_f = jnp.minimum(i, n - 1) * chunk

    def write(j, bits):
        bits_ref[base_f + j] = bits

    @pl.when((i < n) & (i * chunk < T_x))
    def _():
        state_ref[:] = _unrolled_fwd(val_ref, state_ref[:], write,
                                     base_f, x, T_x, chunk, max_neg_val,
                                     True, quad)

    @pl.when((i < n) & (i * chunk >= T_x))
    def _():
        state_ref[:] = _unrolled_fwd(val_ref, state_ref[:], write,
                                     base_f, x, T_x, chunk, max_neg_val,
                                     False, quad)

    # -- backtrack half (shared) ----------------------------------------
    _bt_half(tx_ref, ty_ref, path_ref, bits_ref, state_ref, x,
             i=i, start_step=n, chunk=chunk, n_chunks=n, T_x=T_x,
             quad=quad)


def _fused_kernel_nat(tx_ref, ty_ref, val_ref, path_ref, bits_ref,
                      state_ref, *, max_neg_val: float = MAX_NEG_VAL,
                      quad: bool = False):
    """Natural-input variant of _fused_kernel: the value block arrives in
    the reference's [B, T_x, chunk] layout and is transposed to
    [chunk, B, T_x] *inside* the kernel (a VPU shuffle), which deletes
    the standalone XLA transpose's HBM round-trip (2 x 16.8 MB at the
    headline shape). Only the forward half touches the value. The path
    stays time-major: Mosaic crashes on the (1, 2, 0) write-side
    transpose, so the (cheap, int8) output conversion remains XLA's."""
    B, T_x, chunk = val_ref.shape
    i = pl.program_id(0)
    n = pl.num_programs(0)
    half = n // 2
    x = jax.lax.broadcasted_iota(jnp.int32, (B, T_x), 1)

    @pl.when(i == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    base_f = jnp.minimum(i, half - 1) * chunk

    def write(j, bits):
        bits_ref[base_f + j] = bits

    def fwd(first_body):
        return _unrolled_fwd(jnp.transpose(val_ref[:], (2, 0, 1)),
                             state_ref[:], write, base_f, x, T_x, chunk,
                             max_neg_val, first_body, quad)

    @pl.when((i < half) & (i * chunk < T_x))
    def _():
        state_ref[:] = fwd(True)

    @pl.when((i < half) & (i * chunk >= T_x))
    def _():
        state_ref[:] = fwd(False)

    # -- backtrack half (shared) ----------------------------------------
    _bt_half(tx_ref, ty_ref, path_ref, bits_ref, state_ref, x,
             i=i, start_step=half, chunk=chunk, n_chunks=half, T_x=T_x,
             quad=quad)


def mas_pallas_fused_nat(value, t_x, t_y, *, interpret: bool = False,
                         max_neg_val: float = MAX_NEG_VAL,
                         quad: bool = False, _chunk: int | None = None):
    """Single-launch MAS over a natural-layout [B, T_x, T_y] lattice
    (T_y a multiple of 128, or <= 128 after padding to a multiple of 8);
    returns the int8 path time-major [T_y, B, T_x]. Caller guarantees
    the FUSED_BITS_BUDGET fit. `_chunk` overrides the frame-chunk size
    for interpret-mode tests only (the TPU-lowered kernel needs 128-
    aligned chunks, but a 128-step Python-unrolled kernel is very slow
    to build under the interpreter)."""
    B, T_x, T_y = value.shape
    pad = (-T_y) % (128 if T_y > 128 else 8)
    if pad:
        value = jnp.pad(value, ((0, 0), (0, 0), (0, pad)))
    T_yp = T_y + pad
    # Mosaic block rule: the chunk (last dim) must be a multiple of 128
    # or the whole axis.
    chunk = _chunk or (128 if T_yp % 128 == 0 else T_yp)
    n = T_yp // chunk
    tx_b = jnp.broadcast_to(t_x.astype(jnp.int32)[:, None], (B, T_x))
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_x))
    len_spec = pl.BlockSpec((B, T_x), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    val_map = lambda i: (0, 0, jnp.minimum(i, n - 1))
    path_map = lambda i: (jnp.clip(2 * n - 1 - i, 0, n - 1), 0, 0)
    path = pl.pallas_call(
        functools.partial(_fused_kernel_nat, max_neg_val=max_neg_val,
                          quad=quad and chunk % 4 == 0),
        grid=(2 * n,),
        in_specs=[
            len_spec, len_spec,
            pl.BlockSpec((B, T_x, chunk), val_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, B, T_x), path_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_yp, B, T_x), jnp.int8),
        scratch_shapes=[pltpu.VMEM((T_yp, B, T_x), jnp.int8),
                        pltpu.VMEM((B, T_x), jnp.float32)],
        interpret=interpret,
    )(tx_b, ty_b, value.astype(jnp.float32))
    return path[:T_y]


def _forward_kernel_natv(val_ref, bits_ref, carry_ref,
                         *, max_neg_val: float = MAX_NEG_VAL,
                         quad: bool = False):
    """Natural-input forward sweep for the two-kernel pipeline: value
    blocks arrive in the reference's [Bb, T_x, chunk] layout, are
    transposed in-kernel, and the decision bits stream to HBM time-major
    for the (unchanged) backtrack kernel. Extends the transpose-free
    input path to shapes whose bit lattice exceeds the fused VMEM
    budget (e.g. B=64 at 128x1024/2048). Python-unrolled frame loops
    for the same reason as _fused_kernel_nat (values cannot be
    dynamically indexed).

    Grid is (batch_blocks, frame_chunks) — frames fastest, so each
    batch block runs its full sequential sweep before the next starts;
    the carry resets at each block's first frame chunk. Batch tiling
    extends the transpose-free route to serving batches whose whole
    [B, T_x, chunk] value block would not fit VMEM (round-2 verdict
    item 3: B=256 drop-in)."""
    Bb, T_x, chunk = val_ref.shape
    i = pl.program_id(1)
    x = jax.lax.broadcasted_iota(jnp.int32, (Bb, T_x), 1)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    def write(j, bits):
        bits_ref[j] = bits

    def fwd(first_body):
        return _unrolled_fwd(jnp.transpose(val_ref[:], (2, 0, 1)),
                             carry_ref[:], write, i * chunk, x, T_x,
                             chunk, max_neg_val, first_body, quad)

    @pl.when(i * chunk < T_x)
    def _():
        carry_ref[:] = fwd(True)

    @pl.when(i * chunk >= T_x)
    def _():
        carry_ref[:] = fwd(False)


# Double-buffered natural value blocks (2 * Bb * T_x * 128 * 4 bytes)
# must fit alongside the int8 bits block; Bb*T_x up to 8192 (Bb=64 at
# T_x=128) keeps the forward kernel within ~10 MB VMEM.
NAT_FWD_MAX_ELEMS = 8192


def _nat_batch_block(B: int, T_x: int,
                     max_elems: int = NAT_FWD_MAX_ELEMS) -> int | None:
    """Largest usable batch tile for the natural-layout kernels: a
    divisor of B whose [Bb, T_x] column fits the VMEM element budget,
    and which is a multiple of 8 (Mosaic sublane rule for the
    [chunk, Bb, T_x] blocks) unless it is the whole batch. None if no
    tile qualifies (dispatch then falls back to the time-major route)."""
    if B * T_x <= max_elems:
        return B
    for bb in range(B - 1, 0, -1):
        if B % bb == 0 and bb * T_x <= max_elems and bb % 8 == 0:
            return bb
    return None


def mas_pallas_bits_nat(value, *, interpret: bool = False,
                        max_neg_val: float = MAX_NEG_VAL,
                        _chunk: int | None = None,
                        batch_block: int | None = None,
                        quad: bool = False):
    """Forward sweep over a natural-layout [B, T_x, T_y] lattice ->
    int8 decision bits time-major [T_y_pad, B, T_x] (T_y padded to a
    multiple of 128, or of 8 when T_y <= 128). batch_block: batch tile
    size (must divide B; default = largest divisor fitting the VMEM
    budget), each tile swept sequentially with its own carry."""
    B, T_x, T_y = value.shape
    pad = (-T_y) % (128 if T_y > 128 else 8)
    if pad:
        value = jnp.pad(value, ((0, 0), (0, 0), (0, pad)))
    T_yp = T_y + pad
    chunk = _chunk or (128 if T_yp % 128 == 0 else T_yp)
    bb = batch_block or _nat_batch_block(B, T_x)
    if bb is None:
        raise ValueError(
            f"no batch tile divides B = {B} within the natural forward's "
            f"VMEM budget at T_x = {T_x}; use the time-major route")
    if B % bb:
        raise ValueError(f"batch_block {bb} must divide B = {B}")
    return pl.pallas_call(
        functools.partial(_forward_kernel_natv, max_neg_val=max_neg_val,
                          quad=quad),
        grid=(B // bb, T_yp // chunk),
        in_specs=[pl.BlockSpec((bb, T_x, chunk), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, bb, T_x), lambda b, i: (i, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_yp, B, T_x), jnp.int8),
        scratch_shapes=[pltpu.VMEM((bb, T_x), jnp.float32)],
        interpret=interpret,
    )(value.astype(jnp.float32))


def _fused_kernel_nat_tiled(tx_ref, ty_ref, val_ref, path_ref, bits_ref,
                            state_ref, *,
                            max_neg_val: float = MAX_NEG_VAL,
                            quad: bool = False,
                            quad_walk: bool = False):
    """Batch-tiled fused natural pipeline: grid = (batch_blocks, 2n).
    For each batch block, steps [0, n) sweep the block's natural-layout
    value chunks (in-kernel transpose, decision bits into a VMEM
    scratch), steps [n, 2n) run the compare-form walk emitting the path
    in the reference's natural [Bb, T_x, chunk] layout. The bit lattice
    never touches HBM — this deletes the two-kernel natural route's
    2 x B*T_x*T_y int8 round-trip (64 MB at B=256, 128x1024) and one
    kernel launch, at the price of a smaller batch tile (the
    [T_yp, Bb, T_x] bits scratch must fit VMEM alongside the value and
    path blocks — see _nat_fused_batch_block)."""
    Bb, T_x, chunk = val_ref.shape
    i = pl.program_id(1)
    n = pl.num_programs(1) // 2
    x = jax.lax.broadcasted_iota(jnp.int32, (Bb, T_x), 1)
    tx = tx_ref[:]
    ty = ty_ref[:]

    # -- forward half (carry reset at each batch block's first step) ----
    @pl.when(i == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    base_f = jnp.minimum(i, n - 1) * chunk

    def write(j, bits):
        bits_ref[base_f + j] = bits

    def fwd(first_body):
        return _unrolled_fwd(jnp.transpose(val_ref[:], (2, 0, 1)),
                             state_ref[:], write, base_f, x, T_x, chunk,
                             max_neg_val, first_body, quad)

    @pl.when((i < n) & (i * chunk < T_x))
    def _():
        state_ref[:] = fwd(True)

    @pl.when((i < n) & (i * chunk >= T_x))
    def _():
        state_ref[:] = fwd(False)

    # -- backtrack half (compare form, natural output) ------------------
    @pl.when(i == n)
    def _():
        valid = (tx >= 1) & (tx <= ty)
        state_ref[:] = ((x == tx - 1) & valid).astype(jnp.float32)

    base_b = jnp.clip(2 * n - 1 - i, 0, n - 1) * chunk

    @pl.when(i >= n)
    def _():
        ind, acc = _bt_cmp_walk(state_ref[:],
                                lambda j: bits_ref[base_b + j], base_b,
                                chunk, ty, T_x, Bb, x, quad=quad_walk)
        state_ref[:] = ind
        path_ref[:] = _cmp_emit(acc, Bb, T_x, chunk)


# Minimum lattice size (B * T_x * T_y_padded elements) for the fused
# natural-in/natural-out route: below this the extra f32 output write
# costs more than the XLA transpose+convert it deletes (measured
# crossover between B=16 and B=24 at 128x1024 — 2.1M vs 3.1M elems).
NAT_FUSED_MIN_ELEMS = 2_500_000


def _nat_fused_batch_block(B: int, T_x: int, T_yp: int,
                           chunk: int) -> int | None:
    """Largest usable batch tile for the fused natural pipeline: the
    int8 bits scratch (T_yp rows) plus the double-buffered f32 value
    and path blocks must fit a ~12 MB VMEM budget."""
    budget = 12 * 1024 * 1024
    per_elem = T_yp + 16 * chunk  # int8 bits + 2x(f32 in) + 2x(f32 out)
    max_elems = budget // per_elem
    if B * T_x <= max_elems:
        return B
    for bb in range(B - 1, 0, -1):
        if B % bb == 0 and bb * T_x <= max_elems and bb % 8 == 0:
            return bb
    return None


def mas_pallas_nat_fused_tiled(value, t_x, t_y, *,
                               interpret: bool = False,
                               max_neg_val: float = MAX_NEG_VAL,
                               batch_block: int | None = None,
                               _chunk: int | None = None,
                               quad: bool = False,
                               quad_walk: bool = False):
    """Single-launch natural-in/natural-out MAS over batch tiles:
    [B, T_x, T_y] f32 lattice + lengths -> f32 path [B, T_x, T_y]
    (the reference's layout end to end; the caller slices off frame
    padding). Requires T_x % 8 == 0 and a usable batch tile.

    `quad` composes the FORWARD recurrences four frames per cross-lane
    shift; the compare-form walk stays pair-composed unless `quad_walk`
    is set — the quad walk's extra nested packs cost more than the
    latency they hide at this route's batch sizes (measured on v5e at
    B=32 128x1024: walk 0.065 ms pair vs 0.078 ms quad; end-to-end
    0.124 vs 0.133 ms)."""
    B, T_x, T_y = value.shape
    pad = (-T_y) % (128 if T_y > 128 else 8)
    if pad:
        value = jnp.pad(value, ((0, 0), (0, 0), (0, pad)))
    T_yp = T_y + pad
    chunk = _chunk or (128 if T_yp % 128 == 0 else T_yp)
    bb = batch_block or _nat_fused_batch_block(B, T_x, T_yp, chunk)
    if bb is None or B % bb:
        raise ValueError(f"no usable fused batch tile for B = {B}")
    n = T_yp // chunk
    tx_b = jnp.broadcast_to(t_x.astype(jnp.int32)[:, None], (B, T_x))
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_x))
    len_spec = pl.BlockSpec((bb, T_x), lambda b, i: (b, 0),
                            memory_space=pltpu.VMEM)
    val_map = lambda b, i: (b, 0, jnp.minimum(i, n - 1))
    path_map = lambda b, i: (b, 0, jnp.clip(2 * n - 1 - i, 0, n - 1))
    path = pl.pallas_call(
        functools.partial(_fused_kernel_nat_tiled,
                          max_neg_val=max_neg_val,
                          quad=quad and chunk % 4 == 0,
                          quad_walk=quad_walk and chunk % 4 == 0),
        grid=(B // bb, 2 * n),
        in_specs=[
            len_spec, len_spec,
            pl.BlockSpec((bb, T_x, chunk), val_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, T_x, chunk), path_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_x, T_yp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T_yp, bb, T_x), jnp.int8),
                        pltpu.VMEM((bb, T_x), jnp.float32)],
        interpret=interpret,
    )(tx_b, ty_b, value.astype(jnp.float32))
    return path[:, :, :T_y]


def _pick_chunk(T_y: int, B: int = 32, T_x: int = 128,
                budget_bytes: int = 4 * 1024 * 1024) -> int:
    """Largest frame-chunk whose double-buffered f32 block fits the VMEM
    budget (Pallas keeps 2 in-flight input blocks plus the int8 output)."""
    for c in (256, 128, 64, 32, 16, 8):
        if T_y % c == 0 and 2 * c * B * T_x * 4 <= budget_bytes:
            return c
    fallback = min(T_y, 8) if T_y % 8 == 0 else T_y
    if 2 * fallback * B * T_x * 4 > budget_bytes:
        raise ValueError(
            f"MAS Pallas block of B*T_x={B}*{T_x}={B * T_x} f32 elements "
            f"exceeds the {budget_bytes // 2**20} MB VMEM block budget even "
            f"at the minimum frame chunk ({fallback}); split the batch "
            f"(B*T_x must be <= {budget_bytes // (2 * fallback * 4)}) or "
            f"use implementation='lax'.")
    return fallback


def mas_pallas_bits(value_tm, *, interpret: bool = False,
                    max_neg_val: float = MAX_NEG_VAL):
    """Forward sweep only: time-major value [T_y, B, T_x] -> int8 decision
    bits [T_y, B, T_x]. Length-independent (see module docstring)."""
    T_y, B, T_x = value_tm.shape
    chunk = _pick_chunk(T_y, B, T_x)
    return pl.pallas_call(
        functools.partial(_forward_kernel, max_neg_val=max_neg_val),
        grid=(T_y // chunk,),
        in_specs=[pl.BlockSpec((chunk, B, T_x), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, B, T_x), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_y, B, T_x), jnp.int8),
        scratch_shapes=[pltpu.VMEM((B, T_x), jnp.float32)],
        interpret=interpret,
    )(value_tm)


def mas_pallas_backtrack(bits, t_x, t_y, *, interpret: bool = False):
    """Reverse walk: int8 bits [T_y, B, T_x] + lengths -> int8 path
    [T_y, B, T_x] (time-major)."""
    T_y, B, T_x = bits.shape
    chunk = _pick_chunk(T_y, B, T_x)
    grid = T_y // chunk
    tx_b = jnp.broadcast_to(t_x.astype(jnp.int32)[:, None], (B, T_x))
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_x))
    len_spec = pl.BlockSpec((B, T_x), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    rev = lambda i: (grid - 1 - i, 0, 0)
    return pl.pallas_call(
        _backtrack_kernel,
        grid=(grid,),
        in_specs=[
            len_spec, len_spec,
            pl.BlockSpec((chunk, B, T_x), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, B, T_x), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_y, B, T_x), jnp.int8),
        scratch_shapes=[pltpu.VMEM((B, T_x), jnp.float32)],
        interpret=interpret,
    )(tx_b, ty_b, bits)


def _backtrack_kernel_nat(tx_ref, ty_ref, bits_ref, path_ref, buf_ref,
                          ind_ref):
    """Natural-output backtrack: same walk as _backtrack_kernel, but the
    grid is (batch_blocks, frame_chunks) and the chunk's path rows are
    staged in an f32 VMEM buffer, then written to the output in the
    reference's [Bb, T_x, chunk] layout via an in-kernel two-step
    transpose ((1,0,2) then (0,2,1) — the direct (1,2,0) form is
    rejected by Mosaic; an int8 staging variant was measured SLOWER,
    0.64 vs 0.46 ms at B=256 — int8 relayouts lower poorly). This deletes the standalone XLA transpose AND
    the 134 MB output-layout copy it forces at serving batch sizes
    (measured 0.61 ms of the 1.07 ms B=256 drop-in call)."""
    chunk = bits_ref.shape[0]
    Bb, T_x = ind_ref.shape
    i = pl.program_id(1)
    n = pl.num_programs(1)

    tx = tx_ref[:]
    ty = ty_ref[:]
    x = jax.lax.broadcasted_iota(jnp.int32, (Bb, T_x), 1)

    @pl.when(i == 0)
    def _():
        valid = (tx >= 1) & (tx <= ty)
        ind_ref[:] = ((x == tx - 1) & valid).astype(jnp.float32)

    base = (n - 1 - i) * chunk

    def single_step(j, ind):
        emit, new = _bt_step(ind, bits_ref[j], base + j, ty, T_x)
        buf_ref[j] = emit
        return new

    def pair_body(jj, ind):
        j_hi = chunk - 1 - (chunk % 2) - 2 * jj
        j_lo = j_hi - 1
        p_hi, p_lo, new = _bt_pair(ind, bits_ref[j_hi], bits_ref[j_lo],
                                   base + j_hi, ty, T_x)
        buf_ref[j_hi] = p_hi
        buf_ref[j_lo] = p_lo
        return new

    ind = ind_ref[:]
    if chunk % 2:
        ind = single_step(chunk - 1, ind)
    if T_x >= 2:
        ind = jax.lax.fori_loop(0, chunk // 2, pair_body, ind,
                                unroll=True)
    else:
        ind = jax.lax.fori_loop(
            0, chunk // 2,
            lambda jj, ind: single_step(
                chunk - 1 - (chunk % 2) - 2 * jj - 1,
                single_step(chunk - 1 - (chunk % 2) - 2 * jj, ind)),
            ind, unroll=True)
    ind_ref[:] = ind
    path_ref[:] = jnp.transpose(
        jnp.transpose(buf_ref[:], (1, 0, 2)), (0, 2, 1))


def _bt_cmp_walk(ind, bits_at, frame0, chunk, ty, T_x, Bb, x,
                 quad: bool = False):
    """Compare-form chunk walk shared by the standalone natural-output
    backtrack and the fused natural pipeline: walk `chunk` frames
    top-down, packing each frame's emitted token index into one lane of
    a [Bb, chunk] f32 row (packed as token_index + 1; 0 = no emission —
    dead frame or invalid item). `bits_at(j)` reads the bit row for
    in-chunk frame j; `frame0 + j` is the absolute frame index. The
    per-frame lane-reduction (sum of one-hot x iota) is off the walk's
    carry chain, so it overlaps.
    Returns (new indicator, packed [Bb, chunk] row)."""
    xp1 = (x + 1).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Bb, chunk), 1)

    def pack(emit, j, acc):
        v = jnp.sum(emit * xp1, axis=1, keepdims=True)
        return acc + v * (lane == j).astype(jnp.float32)

    def single_step(j, carry):
        ind, acc = carry
        emit, new = _bt_step(ind, bits_at(j), frame0 + j, ty, T_x)
        return new, pack(emit, j, acc)

    def pair_body(jj, carry):
        ind, acc = carry
        j_hi = chunk - 1 - (chunk % 2) - 2 * jj
        j_lo = j_hi - 1
        p_hi, p_lo, new = _bt_pair(ind, bits_at(j_hi), bits_at(j_lo),
                                   frame0 + j_hi, ty, T_x)
        return new, pack(p_lo, j_lo, pack(p_hi, j_hi, acc))

    def quad_body(jj, carry):
        ind, acc = carry
        j_hi = chunk - 1 - 4 * jj
        p4, p3, p2, p1, new = _bt_quad(
            ind, bits_at(j_hi), bits_at(j_hi - 1), bits_at(j_hi - 2),
            bits_at(j_hi - 3), frame0 + j_hi, ty, T_x)
        acc = pack(p1, j_hi - 3,
                   pack(p2, j_hi - 2,
                        pack(p3, j_hi - 1, pack(p4, j_hi, acc))))
        return new, acc

    carry = (ind, jnp.zeros((Bb, chunk), jnp.float32))
    if quad and chunk % 4 == 0 and T_x >= 2:
        return jax.lax.fori_loop(0, chunk // 4, quad_body, carry,
                                 unroll=True)
    if chunk % 2:
        carry = single_step(chunk - 1, carry)
    if T_x >= 2:
        carry = jax.lax.fori_loop(0, chunk // 2, pair_body, carry,
                                  unroll=True)
    else:
        carry = jax.lax.fori_loop(
            0, chunk // 2,
            lambda jj, c: single_step(
                chunk - 1 - (chunk % 2) - 2 * jj - 1,
                single_step(chunk - 1 - (chunk % 2) - 2 * jj, c)),
            carry, unroll=True)
    return carry


def _cmp_emit(acc, Bb, T_x, chunk):
    """Packed [Bb, chunk] index row -> [Bb, T_x, chunk] one-hot block
    via one broadcast integer compare."""
    x3 = jax.lax.broadcasted_iota(jnp.int32, (Bb, T_x, chunk), 1)
    return (x3 + 1 == acc.astype(jnp.int32)[:, None, :]) \
        .astype(jnp.float32)


def _backtrack_kernel_nat_cmp(tx_ref, ty_ref, bits_ref, path_ref,
                              ind_ref, *, quad: bool = False):
    """Natural-output backtrack, compare form: the packed-index walk
    (_bt_cmp_walk) plus ONE broadcast compare producing the whole
    [Bb, T_x, chunk] output block. No staging buffer, no in-kernel
    relayout passes: this trades _backtrack_kernel_nat's two VMEM
    transposes (the dominant cost of the staged form) for one
    off-chain lane-reduction per frame plus a single elementwise pass
    over the output block."""
    chunk = bits_ref.shape[0]
    Bb, T_x = ind_ref.shape
    i = pl.program_id(1)
    n = pl.num_programs(1)

    tx = tx_ref[:]
    ty = ty_ref[:]
    x = jax.lax.broadcasted_iota(jnp.int32, (Bb, T_x), 1)

    @pl.when(i == 0)
    def _():
        valid = (tx >= 1) & (tx <= ty)
        ind_ref[:] = ((x == tx - 1) & valid).astype(jnp.float32)

    base = (n - 1 - i) * chunk
    ind, acc = _bt_cmp_walk(ind_ref[:], lambda j: bits_ref[j], base,
                            chunk, ty, T_x, Bb, x, quad=quad)
    ind_ref[:] = ind
    path_ref[:] = _cmp_emit(acc, Bb, T_x, chunk)


def _backtrack_kernel_idx(tx_ref, ty_ref, bits_ref, idx_ref, ind_ref,
                          *, quad: bool = False):
    """Walk-only half of the SPLIT backtrack: the packed-index walk with
    a [Bb, chunk] f32 output (token_index + 1 per frame; 0 = no
    emission) and NO path block. With the 4 MB/chunk path write gone,
    the walk tile takes the whole serving batch (bits block is the only
    big VMEM user), so the inherently sequential chunk walk runs ONCE
    over T_y instead of once per batch tile — the mechanism behind the
    measured split-form win (docs/PERF.md "cmp-walk backtrack"): the
    cmp form at B=256 is walk-latency-bound at bb=64 (4 sequential
    passes), not bandwidth-bound."""
    chunk = bits_ref.shape[0]
    Bb, T_x = ind_ref.shape
    i = pl.program_id(1)
    n = pl.num_programs(1)

    tx = tx_ref[:]
    ty = ty_ref[:]
    x = jax.lax.broadcasted_iota(jnp.int32, (Bb, T_x), 1)

    @pl.when(i == 0)
    def _():
        valid = (tx >= 1) & (tx <= ty)
        ind_ref[:] = ((x == tx - 1) & valid).astype(jnp.float32)

    base = (n - 1 - i) * chunk
    ind, acc = _bt_cmp_walk(ind_ref[:], lambda j: bits_ref[j], base,
                            chunk, ty, T_x, Bb, x, quad=quad)
    ind_ref[:] = ind
    idx_ref[:] = acc


def _expand_kernel(idx_ref, path_ref):
    """Embarrassingly-parallel half of the split backtrack: packed
    per-frame indices -> one-hot path blocks, one broadcast compare per
    block. Pure streaming (reads 4 B per frame-row, writes the full
    path) — runs at the HBM copy floor, with no serial carry at all."""
    Bb, T_x, chunk = path_ref.shape
    path_ref[:] = _cmp_emit(idx_ref[:], Bb, T_x, chunk)


# walk-only tile budget: the double-buffered [chunk, Bb, T_x] int8 bits
# block is the only large VMEM user (the packed-index output is
# [Bb, chunk] f32), so the tile can take the whole serving batch:
# bb*T_x = 32768 -> 4 MB bits blocks at chunk 128.
NAT_IDX_MAX_ELEMS = 32768


def mas_pallas_backtrack_nat_split(bits, t_x, t_y, *,
                                   interpret: bool = False,
                                   walk_block: int | None = None,
                                   expand_block: int | None = None,
                                   _chunk: int | None = None,
                                   quad: bool = False):
    """Split natural-output backtrack: a walk-only kernel emitting
    packed per-frame token indices [B, T_yp] (whole-batch tile -> one
    sequential pass over T_y), then a parallel expand kernel writing
    the one-hot path at the copy floor. Same bit-exact walk algebra as
    form="cmp" (_bt_cmp_walk); only the emission is restructured."""
    T_yp, B, T_x = bits.shape
    chunk = _chunk or (128 if T_yp % 128 == 0 else T_yp)
    wb = walk_block or _nat_batch_block(B, T_x, NAT_IDX_MAX_ELEMS)
    eb = expand_block or _nat_batch_block(B, T_x,
                                          nat_bt_budget("cmp"))
    if wb is None or B % wb or eb is None or B % eb:
        raise ValueError(f"no usable batch tile for B = {B}")
    tx_b = jnp.broadcast_to(t_x.astype(jnp.int32)[:, None], (B, T_x))
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_x))
    len_spec = pl.BlockSpec((wb, T_x), lambda b, i: (b, 0),
                            memory_space=pltpu.VMEM)
    n = T_yp // chunk
    idx = pl.pallas_call(
        functools.partial(_backtrack_kernel_idx, quad=quad),
        grid=(B // wb, n),
        in_specs=[
            len_spec, len_spec,
            pl.BlockSpec((chunk, wb, T_x), lambda b, i: (n - 1 - i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wb, chunk), lambda b, i: (b, n - 1 - i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_yp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((wb, T_x), jnp.float32)],
        interpret=interpret,
    )(tx_b, ty_b, bits)
    return pl.pallas_call(
        _expand_kernel,
        grid=(B // eb, n),
        in_specs=[pl.BlockSpec((eb, chunk), lambda b, i: (b, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((eb, T_x, chunk), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_x, T_yp), jnp.float32),
        interpret=interpret,
    )(idx)


def _backtrack_kernel_durs(tx_ref, ty_ref, bits_ref, dur_ref, ind_ref,
                           acc_ref):
    """Duration-form backtrack: walk the bits accumulating each token's
    frame count in a [Bb, T_x] VMEM accumulator instead of writing path
    rows. A MAS path is a monotone staircase (every token covers one
    contiguous frame span), so the durations determine it exactly; the
    caller rebuilds the 0/1 path with ONE XLA cumsum + broadcast-compare
    pass. This removes the backtrack kernel's entire [B, T_x, T_y]
    output traffic (134 MB at B=256) — the walk touches only the 33.5 MB
    bit lattice — and moves the path write into a pure streaming XLA op.
    The emit rows feeding the accumulator are off the indicator chain
    (same property the cmp walk's lane-packing uses)."""
    chunk = bits_ref.shape[0]
    Bb, T_x = ind_ref.shape
    i = pl.program_id(1)
    n = pl.num_programs(1)

    tx = tx_ref[:]
    ty = ty_ref[:]
    x = jax.lax.broadcasted_iota(jnp.int32, (Bb, T_x), 1)

    @pl.when(i == 0)
    def _():
        valid = (tx >= 1) & (tx <= ty)
        ind_ref[:] = ((x == tx - 1) & valid).astype(jnp.float32)
        acc_ref[:] = jnp.zeros((Bb, T_x), jnp.float32)

    base = (n - 1 - i) * chunk

    def single_step(j, carry):
        ind, acc = carry
        emit, new = _bt_step(ind, bits_ref[j], base + j, ty, T_x)
        return new, acc + emit

    def pair_body(jj, carry):
        ind, acc = carry
        j_hi = chunk - 1 - (chunk % 2) - 2 * jj
        p_hi, p_lo, new = _bt_pair(ind, bits_ref[j_hi],
                                   bits_ref[j_hi - 1], base + j_hi, ty,
                                   T_x)
        return new, acc + (p_hi + p_lo)

    carry = (ind_ref[:], acc_ref[:])
    if chunk % 2:
        carry = single_step(chunk - 1, carry)
    if T_x >= 2:
        carry = jax.lax.fori_loop(0, chunk // 2, pair_body, carry,
                                  unroll=True)
    else:
        carry = jax.lax.fori_loop(
            0, chunk // 2,
            lambda jj, c: single_step(
                chunk - 1 - (chunk % 2) - 2 * jj - 1,
                single_step(chunk - 1 - (chunk % 2) - 2 * jj, c)),
            carry, unroll=True)
    ind_ref[:], acc_ref[:] = carry

    @pl.when(i == n - 1)
    def _():
        dur_ref[:] = acc_ref[:]


def mas_pallas_durations(bits, t_x, t_y, *, interpret: bool = False,
                             batch_block: int | None = None,
                             _chunk: int | None = None):
    """Token durations from the bit lattice: int8 bits [T_yp, B, T_x] +
    lengths -> f32 durations [B, T_x] (exact small integers; invalid
    items all-zero). The duration walk's VMEM footprint is just the
    double-buffered bits block + three [Bb, T_x] rows, so the batch
    tile can be ~4x the path-emitting backtrack's."""
    T_yp, B, T_x = bits.shape
    chunk = _chunk or (128 if T_yp % 128 == 0 else T_yp)
    bb = batch_block or _nat_batch_block(B, T_x, NAT_DUR_MAX_ELEMS)
    if bb is None or B % bb:
        raise ValueError(f"no usable batch tile for B = {B}")
    tx_b = jnp.broadcast_to(t_x.astype(jnp.int32)[:, None], (B, T_x))
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_x))
    len_spec = pl.BlockSpec((bb, T_x), lambda b, i: (b, 0),
                            memory_space=pltpu.VMEM)
    n = T_yp // chunk
    return pl.pallas_call(
        _backtrack_kernel_durs,
        grid=(B // bb, n),
        in_specs=[
            len_spec, len_spec,
            pl.BlockSpec((chunk, bb, T_x), lambda b, i: (n - 1 - i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=len_spec,
        out_shape=jax.ShapeDtypeStruct((B, T_x), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, T_x), jnp.float32),
                        pltpu.VMEM((bb, T_x), jnp.float32)],
        interpret=interpret,
    )(tx_b, ty_b, bits)


def path_from_durations(durs, T_y):
    """[B, T_x] durations -> 0/1 f32 path [B, T_x, T_y] via cumsum +
    broadcast compare (a pure streaming XLA pass; exact for integer
    durations, which f32 holds exactly up to 2^24)."""
    cum = jnp.cumsum(durs, axis=1)
    start = cum - durs
    ys = jnp.arange(T_y, dtype=jnp.float32)[None, None, :]
    return ((ys >= start[..., None]) & (ys < cum[..., None])) \
        .astype(jnp.float32)


# Backtrack batch tile: the double-buffered f32 output blocks plus the
# staging buffer and transpose intermediates run ~6x the bits block
# (bb=64 was measured to OOM scoped VMEM at 24.3M), so the staged
# form's tile budget is half the forward's. The compare form has no
# staging buffer or transpose intermediates, so it keeps the forward's
# budget. The duration walk reads only bits and writes a [Bb, T_x] row,
# so its tile is gated by the bits block alone — but int8 blocks widen
# to 32-bit in VMEM (measured: bb=256 allocates 30.8M for the
# double-buffered [128, 256, 128] i8 block), so the tile budget matches
# the cmp form's rather than 4x it.
NAT_BT_MAX_ELEMS = 4096
NAT_BT_CMP_MAX_ELEMS = 8192
NAT_DUR_MAX_ELEMS = 8192


def nat_bt_budget(form: str = "cmp") -> int:
    return NAT_BT_CMP_MAX_ELEMS if form == "cmp" else NAT_BT_MAX_ELEMS


def mas_pallas_backtrack_nat(bits, t_x, t_y, *, interpret: bool = False,
                             batch_block: int | None = None,
                             _chunk: int | None = None,
                             form: str = "cmp", quad: bool = False):
    """Reverse walk emitting the path in the reference's natural layout:
    int8 bits [T_yp, B, T_x] + lengths -> f32 path [B, T_x, T_yp].
    Requires T_x % 8 == 0 (Mosaic sublane rule for the output block) and
    a batch tile (see _nat_batch_block); callers fall back to
    mas_pallas_backtrack + an XLA transpose otherwise.

    form: "cmp" (default; packed-index walk + one broadcast compare) or
    "stage" (stage the chunk's path rows and transpose in-kernel; kept
    for A/B measurement)."""
    if form not in ("cmp", "stage"):
        raise ValueError(f"unknown backtrack form {form!r}")
    T_yp, B, T_x = bits.shape
    chunk = _chunk or (128 if T_yp % 128 == 0 else T_yp)
    bb = batch_block or _nat_batch_block(B, T_x, nat_bt_budget(form))
    if bb is None or B % bb:
        raise ValueError(f"no usable batch tile for B = {B}")
    tx_b = jnp.broadcast_to(t_x.astype(jnp.int32)[:, None], (B, T_x))
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_x))
    len_spec = pl.BlockSpec((bb, T_x), lambda b, i: (b, 0),
                            memory_space=pltpu.VMEM)
    n = T_yp // chunk
    rev = lambda b, i: (n - 1 - i, b, 0)
    if form == "cmp":
        kernel = functools.partial(_backtrack_kernel_nat_cmp, quad=quad)
        scratch = [pltpu.VMEM((bb, T_x), jnp.float32)]
    else:
        kernel = _backtrack_kernel_nat
        scratch = [pltpu.VMEM((chunk, bb, T_x), jnp.float32),
                   pltpu.VMEM((bb, T_x), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=(B // bb, n),
        in_specs=[
            len_spec, len_spec,
            pl.BlockSpec((chunk, bb, T_x), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, T_x, chunk),
                               lambda b, i: (b, 0, n - 1 - i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_x, T_yp), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(tx_b, ty_b, bits)


def _forward_kernel_natv_multi(val_ref, bits_ref, carry_ref,
                               *, max_neg_val: float = MAX_NEG_VAL,
                               quad: bool = False):
    """K-chain interleaved natural forward: like _forward_kernel_natv,
    but each grid step advances K independent batch blocks' recurrences
    frame by frame. The DP chain is latency-bound (~50 ns/frame
    dependency latency vs ~3 ns/vreg of VPU work at 128 lanes, see
    docs/design.md B=1 decomposition), so interleaving K independent
    chains hides up to (K-1)/K of the latency at the same VMEM
    footprint (each chain's tile is 1/K of the single-chain tile).

    val block (K, bb, T_x, chunk) over value.reshape(K, B//K, ...) —
    chain c owns batch rows [c*B//K, (c+1)*B//K), so the reshape and
    the final bits reshape are both free (contiguous leading-dim
    merges). bits block (chunk, K, bb, T_x); carry scratch
    (K, bb, T_x).

    Deliberately NOT routed through _unrolled_fwd: the frame loops here
    interleave the K chains' steps per frame (chain c's step j emitted
    adjacent to chain c+1's step j), which is the latency-hiding point;
    the shared helper would emit whole chunks per chain sequentially.
    The per-step algebra is still the same _fwd_step_full/_fwd_pair_
    fast/_fwd_quad_fast primitives, so the tie rules cannot diverge."""
    k, Bb, T_x, chunk = val_ref.shape
    i = pl.program_id(1)
    x = jax.lax.broadcasted_iota(jnp.int32, (Bb, T_x), 1)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    def fwd(first_body):
        vs = [jnp.transpose(val_ref[c], (2, 0, 1)) for c in range(k)]
        ps = [carry_ref[c] for c in range(k)]
        if first_body:
            for j in range(chunk):
                for c in range(k):
                    bits, ps[c] = _fwd_step_full(ps[c], vs[c][j],
                                                 i * chunk + j, x,
                                                 max_neg_val)
                    bits_ref[j, c] = bits
        elif quad and chunk % 4 == 0 and T_x >= 2:
            for jj in range(chunk // 4):
                j = 4 * jj
                for c in range(k):
                    b1, b2, b3, b4, ps[c] = _fwd_quad_fast(
                        ps[c], vs[c][j], vs[c][j + 1], vs[c][j + 2],
                        vs[c][j + 3], x, max_neg_val)
                    bits_ref[j, c] = b1
                    bits_ref[j + 1, c] = b2
                    bits_ref[j + 2, c] = b3
                    bits_ref[j + 3, c] = b4
        elif chunk % 2 == 0 and T_x >= 2:
            for jj in range(chunk // 2):
                j = 2 * jj
                for c in range(k):
                    bitsA, bitsB, ps[c] = _fwd_pair_fast(
                        ps[c], vs[c][j], vs[c][j + 1], x, max_neg_val)
                    bits_ref[j, c] = bitsA
                    bits_ref[j + 1, c] = bitsB
        else:
            for j in range(chunk):
                for c in range(k):
                    bits, ps[c] = _fwd_step_fast(ps[c], vs[c][j], x,
                                                 max_neg_val)
                    bits_ref[j, c] = bits
        for c in range(k):
            carry_ref[c] = ps[c]

    @pl.when(i * chunk < T_x)
    def _():
        fwd(True)

    @pl.when(i * chunk >= T_x)
    def _():
        fwd(False)


def mas_pallas_bits_nat_multi(value, *, chains: int = 2,
                              interpret: bool = False,
                              max_neg_val: float = MAX_NEG_VAL,
                              _chunk: int | None = None,
                              batch_block: int | None = None,
                              quad: bool = False):
    """K-chain interleaved natural forward sweep: [B, T_x, T_y] f32 ->
    int8 decision bits time-major [T_y_pad, B, T_x] (identical layout
    and values to mas_pallas_bits_nat). batch_block is the PER-CHAIN
    tile; chains * batch_block rows are resident per grid step, so the
    default per-chain budget is the single-chain budget / chains."""
    B, T_x, T_y = value.shape
    k = chains
    if B % k:
        raise ValueError(f"chains {k} must divide B = {B}")
    pad = (-T_y) % (128 if T_y > 128 else 8)
    if pad:
        value = jnp.pad(value, ((0, 0), (0, 0), (0, pad)))
    T_yp = T_y + pad
    chunk = _chunk or (128 if T_yp % 128 == 0 else T_yp)
    bb = batch_block or _nat_batch_block(B // k, T_x,
                                         NAT_FWD_MAX_ELEMS // k)
    if bb is None or (B // k) % bb:
        raise ValueError(
            f"no per-chain batch tile divides B/chains = {B}//{k} within "
            f"the natural forward's VMEM budget at T_x = {T_x}")
    v4 = value.astype(jnp.float32).reshape(k, B // k, T_x, T_yp)
    bits4 = pl.pallas_call(
        functools.partial(_forward_kernel_natv_multi,
                          max_neg_val=max_neg_val, quad=quad),
        grid=(B // k // bb, T_yp // chunk),
        in_specs=[pl.BlockSpec((k, bb, T_x, chunk),
                               lambda b, i: (0, b, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, k, bb, T_x),
                               lambda b, i: (i, 0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_yp, k, B // k, T_x), jnp.int8),
        scratch_shapes=[pltpu.VMEM((k, bb, T_x), jnp.float32)],
        interpret=interpret,
    )(v4)
    return bits4.reshape(T_yp, B, T_x)


def _bt_cmp_walk_multi(inds, bits_at, frame0, chunk, tys, T_x, Bb, x,
                       quad: bool = False):
    """K-chain interleaved compare-form walk: advances K independent
    chains' indicator/packed-row carries per frame step (see
    _bt_cmp_walk for the single-chain algebra). bits_at(j, c) reads
    chain c's bit row for in-chunk frame j."""
    k = len(inds)
    xp1 = (x + 1).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Bb, chunk), 1)

    def pack(emit, j, acc):
        v = jnp.sum(emit * xp1, axis=1, keepdims=True)
        return acc + v * (lane == j).astype(jnp.float32)

    def single_step(j, carry):
        out = []
        for c in range(k):
            ind, acc = carry[c]
            emit, new = _bt_step(ind, bits_at(j, c), frame0 + j,
                                 tys[c], T_x)
            out.append((new, pack(emit, j, acc)))
        return tuple(out)

    def pair_body(jj, carry):
        j_hi = chunk - 1 - (chunk % 2) - 2 * jj
        j_lo = j_hi - 1
        out = []
        for c in range(k):
            ind, acc = carry[c]
            p_hi, p_lo, new = _bt_pair(ind, bits_at(j_hi, c),
                                       bits_at(j_lo, c),
                                       frame0 + j_hi, tys[c], T_x)
            out.append((new, pack(p_lo, j_lo, pack(p_hi, j_hi, acc))))
        return tuple(out)

    def quad_body(jj, carry):
        j_hi = chunk - 1 - 4 * jj
        out = []
        for c in range(k):
            ind, acc = carry[c]
            p4, p3, p2, p1, new = _bt_quad(
                ind, bits_at(j_hi, c), bits_at(j_hi - 1, c),
                bits_at(j_hi - 2, c), bits_at(j_hi - 3, c),
                frame0 + j_hi, tys[c], T_x)
            acc = pack(p1, j_hi - 3,
                       pack(p2, j_hi - 2,
                            pack(p3, j_hi - 1, pack(p4, j_hi, acc))))
            out.append((new, acc))
        return tuple(out)

    carry = tuple((inds[c], jnp.zeros((Bb, chunk), jnp.float32))
                  for c in range(k))
    if quad and chunk % 4 == 0 and T_x >= 2:
        return jax.lax.fori_loop(0, chunk // 4, quad_body, carry,
                                 unroll=True)
    if chunk % 2:
        carry = single_step(chunk - 1, carry)
    if T_x >= 2:
        carry = jax.lax.fori_loop(0, chunk // 2, pair_body, carry,
                                  unroll=True)
    else:
        carry = jax.lax.fori_loop(
            0, chunk // 2,
            lambda jj, c: single_step(
                chunk - 1 - (chunk % 2) - 2 * jj - 1,
                single_step(chunk - 1 - (chunk % 2) - 2 * jj, c)),
            carry, unroll=True)
    return carry


def _backtrack_kernel_nat_cmp_multi(tx_ref, ty_ref, bits_ref, path_ref,
                                    ind_ref, *, quad: bool = False):
    """K-chain interleaved natural-output backtrack (compare form):
    each grid step walks K independent batch blocks' reverse chains.
    Same latency-hiding rationale as _forward_kernel_natv_multi."""
    chunk, k, Bb, T_x = bits_ref.shape
    i = pl.program_id(1)
    n = pl.num_programs(1)
    x = jax.lax.broadcasted_iota(jnp.int32, (Bb, T_x), 1)
    txs = [tx_ref[c] for c in range(k)]
    tys = [ty_ref[c] for c in range(k)]

    @pl.when(i == 0)
    def _():
        for c in range(k):
            valid = (txs[c] >= 1) & (txs[c] <= tys[c])
            ind_ref[c] = ((x == txs[c] - 1) & valid).astype(jnp.float32)

    base = (n - 1 - i) * chunk
    carry = _bt_cmp_walk_multi([ind_ref[c] for c in range(k)],
                               lambda j, c: bits_ref[j, c], base, chunk,
                               tys, T_x, Bb, x, quad=quad)
    for c in range(k):
        ind, acc = carry[c]
        ind_ref[c] = ind
        path_ref[c] = _cmp_emit(acc, Bb, T_x, chunk)


def mas_pallas_backtrack_nat_multi(bits, t_x, t_y, *, chains: int = 2,
                                   interpret: bool = False,
                                   batch_block: int | None = None,
                                   _chunk: int | None = None,
                                   quad: bool = False):
    """K-chain interleaved natural-output backtrack: int8 bits
    [T_yp, B, T_x] + lengths -> f32 path [B, T_x, T_yp] (identical to
    mas_pallas_backtrack_nat form="cmp")."""
    T_yp, B, T_x = bits.shape
    k = chains
    if B % k:
        raise ValueError(f"chains {k} must divide B = {B}")
    chunk = _chunk or (128 if T_yp % 128 == 0 else T_yp)
    bb = batch_block or _nat_batch_block(B // k, T_x,
                                         NAT_BT_CMP_MAX_ELEMS // k)
    if bb is None or (B // k) % bb:
        raise ValueError(f"no usable per-chain batch tile for B = {B}")
    tx_b = jnp.broadcast_to(t_x.astype(jnp.int32)[:, None],
                            (B, T_x)).reshape(k, B // k, T_x)
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None],
                            (B, T_x)).reshape(k, B // k, T_x)
    len_spec = pl.BlockSpec((k, bb, T_x), lambda b, i: (0, b, 0),
                            memory_space=pltpu.VMEM)
    n = T_yp // chunk
    path4 = pl.pallas_call(
        functools.partial(_backtrack_kernel_nat_cmp_multi, quad=quad),
        grid=(B // k // bb, n),
        in_specs=[
            len_spec, len_spec,
            pl.BlockSpec((chunk, k, bb, T_x),
                         lambda b, i: (n - 1 - i, 0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, bb, T_x, chunk),
                               lambda b, i: (0, b, 0, n - 1 - i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, B // k, T_x, T_yp),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, bb, T_x), jnp.float32)],
        interpret=interpret,
    )(tx_b, ty_b, bits.reshape(T_yp, k, B // k, T_x))
    return path4.reshape(B, T_x, T_yp)


def mas_pallas_fused_tm(value_tm, t_x, t_y, *, interpret: bool = False,
                        max_neg_val: float = MAX_NEG_VAL,
                        quad: bool = False):
    """Single-launch MAS: time-major value [T_y, B, T_x] (T_y a multiple
    of 8) -> int8 path [T_y, B, T_x], with the bit lattice held in VMEM.
    Caller must ensure T_y*B*T_x fits FUSED_BITS_BUDGET."""
    T_y, B, T_x = value_tm.shape
    chunk = _pick_chunk(T_y, B, T_x)
    n = T_y // chunk
    tx_b = jnp.broadcast_to(t_x.astype(jnp.int32)[:, None], (B, T_x))
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_x))
    len_spec = pl.BlockSpec((B, T_x), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    # Forward steps read value chunk i; backtrack steps keep the last
    # chunk resident (no further DMAs). The path block stays on the last
    # chunk through the whole forward half (never flushed mid-garbage:
    # Pallas only writes a block out when its index changes), then follows
    # the backtrack right-to-left — exactly one HBM write per chunk.
    val_map = lambda i: (jnp.minimum(i, n - 1), 0, 0)
    path_map = lambda i: (jnp.clip(2 * n - 1 - i, 0, n - 1), 0, 0)
    return pl.pallas_call(
        functools.partial(_fused_kernel, max_neg_val=max_neg_val,
                          quad=quad and chunk % 4 == 0),
        grid=(2 * n,),
        in_specs=[
            len_spec, len_spec,
            pl.BlockSpec((chunk, B, T_x), val_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, B, T_x), path_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_y, B, T_x), jnp.int8),
        scratch_shapes=[pltpu.VMEM((T_y, B, T_x), jnp.int8),
                        pltpu.VMEM((B, T_x), jnp.float32)],
        interpret=interpret,
    )(tx_b, ty_b, value_tm)


def _pad_frames(arr_tm):
    """Pad the leading (frame) axis to a multiple of 8 so the chunk picker
    always finds a VMEM-sized divisor (odd T_y would otherwise fall back
    to a whole-lattice block)."""
    T_y = arr_tm.shape[0]
    pad = (-T_y) % 8
    if pad:
        arr_tm = jnp.pad(arr_tm, ((0, pad),) + ((0, 0),) * (arr_tm.ndim - 1))
    return arr_tm, T_y


def mas_pallas_tm(value_tm, t_x, t_y, *, interpret: bool | None = None,
                  max_neg_val: float = MAX_NEG_VAL,
                  fuse: bool | None = None, quad: bool | None = None):
    """Time-major MAS: value [T_y, B, T_x] f32 -> int8 path [T_y, B, T_x].

    The transpose-free entry point for internal callers whose lattices are
    naturally mel-major (e.g. the OTA aligner's attention is [B, T_mel,
    T_text]); the public `maximum_path` wraps this with layout conversion.

    fuse: None picks the single-launch fused kernel whenever the bit
    lattice fits its VMEM budget (always at serving sizes); True/False
    force the choice (True raises if it cannot fit). quad: None enables
    the four-frame composed recurrences in the latency regime
    (B*T_x <= QUAD_MAX_ELEMS); True/False force.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    value_tm, T_y = _pad_frames(value_tm)
    T_y_pad, B, T_x = value_tm.shape
    fits = T_y_pad * B * T_x <= FUSED_BITS_BUDGET
    if quad is None:
        quad = B * T_x <= QUAD_MAX_ELEMS
    if fuse is True and not fits:
        raise ValueError(
            f"fused MAS bit lattice T_y*B*T_x = {T_y_pad}*{B}*{T_x} "
            f"exceeds the {FUSED_BITS_BUDGET // 2**20} MB VMEM scratch "
            f"budget; use fuse=False/None.")
    if fuse or (fuse is None and fits):
        path = mas_pallas_fused_tm(value_tm, t_x, t_y, interpret=interpret,
                                   max_neg_val=max_neg_val, quad=quad)
    else:
        bits = mas_pallas_bits(value_tm, interpret=interpret,
                               max_neg_val=max_neg_val)
        path = mas_pallas_backtrack(bits, t_x, t_y, interpret=interpret)
    return path[:T_y]


@functools.partial(jax.jit,
                   static_argnames=("interpret", "max_neg_val", "fuse",
                                    "quad"))
def mas_pallas(value, t_x, t_y, *, interpret: bool | None = None,
               max_neg_val: float = MAX_NEG_VAL, fuse: bool | None = None,
               quad: bool | None = None):
    """Batched MAS paths on TPU via the Pallas column-sweep kernels.

    value: [B, T_x, T_y] float32 (log-prob lattice, padding arbitrary);
    t_x, t_y: [B] int32 true lengths. Returns float32 0/1 paths,
    [B, T_x, T_y], bit-identical to the reference Cython backtrack.

    When the bit lattice fits VMEM and T_y is 128-aligned (or <= 128),
    the natural-input fused kernel reads the reference layout directly
    (in-kernel block transpose) — no standalone f32 transpose op. In
    the latency regime (B*T_x <= QUAD_MAX_ELEMS, override with `quad`)
    the kernels advance four frames per cross-lane shift latency.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    B, T_x, T_y = value.shape
    T_yp8 = T_y + (-T_y) % 8
    fits = T_yp8 * B * T_x <= FUSED_BITS_BUDGET
    if quad is None:
        quad = B * T_x <= QUAD_MAX_ELEMS
    # The natural-input route is a device-side optimization only: its
    # interpret-mode compile is disproportionately slow (per-step block
    # transposes), and CPU callers see identical results either way.
    natural_ok = (not interpret) and ((T_yp8 % 128 == 0) or (T_yp8 <= 128))
    T_ypn = T_y + ((-T_y) % (128 if T_y > 128 else 8))
    chunk_n = 128 if T_ypn % 128 == 0 else T_ypn
    if (fuse is not False and natural_ok and T_x % 8 == 0
            and B * T_x * T_ypn >= NAT_FUSED_MIN_ELEMS
            and _nat_fused_batch_block(B, T_x, T_ypn, chunk_n) == B):
        # Whole batch in one tile AND a large enough lattice: the
        # single-launch natural-in/natural-out pipeline wins (B=32
        # headline 0.134 -> 0.120 ms — deletes the output
        # transpose+convert the time-major fused route pays, whose cost
        # scales with the lattice). With more than one tile per batch
        # it LOSES (the bits scratch halves the tile, doubling the
        # sequential chain: 0.91 vs 0.70 ms at B=256), and below the
        # element gate the extra f32 output write costs more than the
        # transpose it saves (B=16 at 128x1024: 94 vs 81 us; B=1 at
        # 64x256: 26 vs 21 us) — measured crossover between 2.1M and
        # 3.1M lattice elements.
        return mas_pallas_nat_fused_tiled(
            value, t_x, t_y, interpret=interpret,
            max_neg_val=max_neg_val, quad=quad)
    if fuse is not False and fits and natural_ok:
        path_t = mas_pallas_fused_nat(value.astype(jnp.float32), t_x, t_y,
                                      interpret=interpret,
                                      max_neg_val=max_neg_val, quad=quad)
        return jnp.transpose(path_t, (1, 2, 0)).astype(jnp.float32)
    if fuse is None and natural_ok \
            and _nat_batch_block(B, T_x) is not None:
        # Bit lattice too large for the fused VMEM scratch, but the
        # forward sweep can still read the reference layout directly —
        # batch-tiled (a second grid axis over B-blocks with a per-block
        # carry) beyond B*T_x = NAT_FWD_MAX_ELEMS. This supersedes the
        # round-2 XLA-level batch slicing, which was measured and
        # rejected (per-slice concat + output assembly cost what the
        # deleted input transpose saved, 1.40 vs 1.34 ms at B=256).
        # (fuse=True must fall through to mas_pallas_tm, which raises
        # the documented budget error instead of silently downgrading.)
        bits = mas_pallas_bits_nat(value, interpret=interpret,
                                   max_neg_val=max_neg_val)
        if (not interpret and T_x % 8 == 0
                and _nat_batch_block(B, T_x, nat_bt_budget())):
            # natural-output backtrack: no XLA transpose, no layout copy
            path = mas_pallas_backtrack_nat(bits, t_x, t_y,
                                            interpret=interpret)
            return path[:, :, :T_y]
        path_t = mas_pallas_backtrack(bits, t_x, t_y, interpret=interpret)
        return jnp.transpose(path_t[:T_y], (1, 2, 0)).astype(jnp.float32)
    # Time-major layout: dynamic per-frame indexing lands on dim 0, which
    # has no TPU sublane/lane tiling constraint.
    vt = jnp.transpose(value.astype(jnp.float32), (2, 0, 1))
    path_t = mas_pallas_tm(vt, t_x, t_y, interpret=interpret,
                           max_neg_val=max_neg_val, fuse=fuse, quad=quad)
    return jnp.transpose(path_t, (1, 2, 0)).astype(jnp.float32)
