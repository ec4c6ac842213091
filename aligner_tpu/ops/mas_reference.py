"""NumPy oracle for Monotonic Alignment Search (MAS).

A line-level-faithful CPU transcription of the reference Viterbi DP
(reference: monotonic_align/core.pyx:9-45), used as the golden oracle in the
conformance suite. Semantics reproduced exactly (see SURVEY.md §2.2):

* forward sweep over mel columns y = 0..t_y-1, band
  x in [max(0, t_x + y - t_y), min(t_x, y + 1)), in-place on the value buffer;
* per-cell emission `max(v_cur, v_prev) + value[x, y]` with
  v_cur = value[x, y-1] (-1e9 if x == y) and
  v_prev = value[x-1, y-1] (0 at the origin, -1e9 if x == 0, y > 0);
* backtrack from index = t_x - 1 with strict-`<` comparison, so ties keep the
  current token (transitions happen as early as possible in forward order).

Contract: requires 1 <= t_x <= t_y per item. The reference silently reads
out-of-band memory when t_x > t_y (core.pyx:32-35 with wraparound disabled);
we instead raise, and the device kernels return an all-zero path for such
items (documented divergence).
"""
from __future__ import annotations

import numpy as np

MAX_NEG_VAL = -1e9


def mas_single(value: np.ndarray, t_x: int, t_y: int,
               max_neg_val: float = MAX_NEG_VAL) -> np.ndarray:
    """Run the MAS DP on one lattice; returns int32 path of value.shape.

    `value` is modified in place (cumulative scores), mirroring the
    destructive in-place contract of the reference kernel
    (monotonic_align/core.pyx:30).
    """
    if not (1 <= t_x <= t_y):
        raise ValueError(
            f"MAS requires 1 <= t_x <= t_y, got t_x={t_x}, t_y={t_y} "
            "(the reference has undefined behaviour here; we reject)")
    path = np.zeros(value.shape, dtype=np.int32)

    for y in range(t_y):
        lo = t_x + y - t_y
        if lo < 0:
            lo = 0
        hi = y + 1
        if hi > t_x:
            hi = t_x
        for x in range(lo, hi):
            v_cur = max_neg_val if x == y else value[x, y - 1]
            if x == 0:
                v_prev = 0.0 if y == 0 else max_neg_val
            else:
                v_prev = value[x - 1, y - 1]
            # Cython `max(v_cur, v_prev)` lowers to `v_prev if v_prev > v_cur
            # else v_cur` (core.c:19384-19391): ties pick v_cur ("stay").
            best = v_prev if v_prev > v_cur else v_cur
            value[x, y] = np.float32(np.float32(best) + np.float32(value[x, y]))

    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[index, y] = 1
        if index != 0 and (index == y or value[index, y - 1] < value[index - 1, y - 1]):
            index -= 1
    return path


def maximum_path_numpy(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Batched oracle with the reference wrapper's exact length derivation.

    value, mask: [b, t_x, t_y]; returns int32 path [b, t_x, t_y].
    Mirrors monotonic_align/__init__.py:6-21 (minus the torch round-trip).
    """
    value = (value * mask).astype(np.float32).copy()
    t_xs = mask.sum(axis=1)[:, 0].astype(np.int32)
    t_ys = mask.sum(axis=2)[:, 0].astype(np.int32)
    out = np.zeros(value.shape, dtype=np.int32)
    for i in range(value.shape[0]):
        out[i] = mas_single(value[i], int(t_xs[i]), int(t_ys[i]))
    return out
