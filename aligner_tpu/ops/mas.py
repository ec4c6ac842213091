"""Monotonic Alignment Search, TPU-native (pure jax.lax formulation).

This is the on-device replacement for the reference Cython kernel
(monotonic_align/core.pyx:9-45) and its host-round-trip wrapper
(monotonic_align/__init__.py:6-21). Design (see SURVEY.md §2.2, §7):

* Both DP dependencies of a lattice column live in the previous column, so
  the sweep is a `lax.scan` over mel frames with the previous cumulative
  column (a [T_x] vector) as carry — T_y sequential steps of T_x-parallel
  VPU work, batched with `vmap`.
* Instead of materialising the cumulative lattice for the backtrack, the
  forward step emits one *decision bit* per cell:
      bit[x, y] = (x != 0) & ((x == y) | (cum[x, y-1] < cum[x-1, y-1]))
  which is literally the reference's backtrack decrement predicate
  (core.pyx:34) evaluated during the forward pass (both of its operands are
  forward-step inputs). The backtrack then only walks the bit lattice:
  path[index, y] = 1; index -= bit[index, y]. Every cell the backtrack
  visits is inside the forward band, so bits are exact (SURVEY.md §2.2
  invariants).
* Tie semantics match the reference exactly: the forward max is tie-free by
  value equality, and the backtrack bit uses strict `<`, so ties keep the
  token and transitions happen as early as possible — identical paths.
* Ragged batches: static padded shapes, per-item (t_x, t_y) as traced
  scalars; out-of-band lattice cells never influence in-band results (band
  masking), matching the reference's untouched-memory semantics.

Divergence from the reference: items with t_x > t_y (silent out-of-band
reads / garbage paths in the reference) return an all-zero path here.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.masks import lengths_from_lattice_mask

MAX_NEG_VAL = -1e9


def _forward_bits_single(value, t_x, t_y, y0=0, carry0=None,
                         max_neg_val: float = MAX_NEG_VAL):
    """Forward band sweep for one item.

    value: [T_x, T_yl] float32 lattice block (log-probs); y0: global frame
    index of the block's first column (for sequence-parallel blocks);
    carry0: incoming cumulative column (zeros for the first block).
    t_x, t_y: scalar int32 true lengths (global).
    Returns (bits [T_yl, T_x] bool — the backtrack decrement predicate per
    cell — and the outgoing cumulative column).
    """
    T_x, T_yl = value.shape
    xs = jnp.arange(T_x, dtype=jnp.int32)

    def step(prev_col, inputs):
        y, col = inputs
        # prev_col[x-1]; the x == 0 slot is masked below.
        prev_shift = jnp.concatenate([prev_col[:1], prev_col[:-1]])
        v_cur = jnp.where(xs == y, max_neg_val, prev_col)
        v_prev = jnp.where(xs == 0,
                           jnp.where(y == 0, 0.0, max_neg_val),
                           prev_shift)
        new = jnp.maximum(v_cur, v_prev) + col
        in_band = ((xs >= t_x + y - t_y) & (xs < t_x) & (xs <= y)
                   & (y < t_y))
        # Out-of-band cells keep the raw column value, mirroring the
        # reference's in-place, untouched-out-of-band buffer semantics.
        cum = jnp.where(in_band, new, col)
        bits = (xs > 0) & ((xs == y) | (prev_col < prev_shift)) & in_band
        return cum, bits

    ys = y0 + jnp.arange(T_yl, dtype=jnp.int32)
    init = (jnp.zeros((T_x,), value.dtype) if carry0 is None else carry0)
    final, bits = jax.lax.scan(step, init, (ys, value.T))
    if carry0 is None and y0 == 0:
        return bits
    return bits, final


def _backtrack_single(bits, t_x, t_y, y0=0, index0=None):
    """Reverse walk over the decision bits for one item.

    bits: [T_yl, T_x] bool block starting at global frame y0; index0:
    incoming token index (t_x - 1 for the last block). Returns path
    [T_x, T_yl] float32 (0/1) — plus the outgoing index when used
    block-wise (y0/index0 given).
    """
    T_yl, T_x = bits.shape
    xs = jnp.arange(T_x, dtype=jnp.int32)
    valid = (t_x >= 1) & (t_x <= t_y)

    def step(index, inputs):
        y, bits_col = inputs
        active = (y < t_y) & valid
        emit = jnp.where(active, (xs == index).astype(jnp.float32), 0.0)
        dec = active & bits_col[index]
        index = index - dec.astype(index.dtype)
        return index, emit

    ys = y0 + jnp.arange(T_yl, dtype=jnp.int32)
    init = t_x - 1 if index0 is None else index0
    final, rows = jax.lax.scan(step, init, (ys, bits), reverse=True)
    if index0 is None and y0 == 0:
        return rows.T
    return rows.T, final  # [T_x, T_yl]


def _mas_single(value, t_x, t_y, max_neg_val: float = MAX_NEG_VAL):
    bits = _forward_bits_single(value, t_x, t_y, max_neg_val=max_neg_val)
    return _backtrack_single(bits, t_x, t_y)


@functools.partial(jax.jit, static_argnames=("max_neg_val",))
def mas_lax(value, t_x, t_y, *, max_neg_val: float = MAX_NEG_VAL):
    """Batched MAS paths via lax.scan.

    value: [B, T_x, T_y] float32; t_x, t_y: [B] int32.
    Returns float32 0/1 paths [B, T_x, T_y].
    """
    return jax.vmap(
        functools.partial(_mas_single, max_neg_val=max_neg_val)
    )(value.astype(jnp.float32), t_x, t_y)


def _resolve_impl(implementation: str) -> str:
    if implementation == "auto":
        return ("pallas" if jax.default_backend() in ("tpu", "axon")
                else "lax")
    return implementation


def mas_path_frame_major(logp, t_x, t_y, *, implementation: str = "auto"):
    """Hard MAS path in the aligner's native frame-major layout.

    logp: [B, T_y, T_x] log-prob lattice (e.g. log-attention + prior);
    returns float32 0/1 path [B, T_y, T_x]. On TPU this avoids both
    layout transposes of the drop-in `maximum_path` API (the Pallas
    kernels are time-major internally).
    """
    impl = _resolve_impl(implementation)
    if impl == "pallas":
        from .mas_pallas import mas_pallas_tm
        path_tm = mas_pallas_tm(
            jnp.transpose(logp.astype(jnp.float32), (1, 0, 2)), t_x, t_y)
        return jnp.transpose(path_tm, (1, 0, 2)).astype(jnp.float32)
    if impl == "lax":
        path = mas_lax(jnp.transpose(logp, (0, 2, 1)), t_x, t_y)
        return jnp.transpose(path, (0, 2, 1))
    raise ValueError(f"unknown implementation: {implementation!r}")


def maximum_path(value, mask, *, implementation: str = "auto",
                 max_neg_val: float = MAX_NEG_VAL):
    """Drop-in MAS API: `maximum_path(value, mask) -> path`.

    Same contract as the reference wrapper (monotonic_align/__init__.py:6-21):
    value, mask are [b, t_x, t_y]; per-item lengths are derived from the mask
    (t_x = mask.sum(1)[:, 0], t_y = mask.sum(2)[:, 0]); the returned 0/1 path
    has the dtype of `value`. Unlike the reference there is no host
    round-trip — this is jit-compatible and runs fully on device.

    implementation: "auto" | "lax" | "pallas" | "cpp" ("cpp" runs the
    native host oracle via callback — the measured winner only for
    B=1 lattices under ~128x512, docs/PERF.md "Single-utterance
    latency"; it is not jittable on device and exists for that corner
    and for conformance checks).
    max_neg_val: sentinel used to exclude infeasible DP transitions —
    the reference dispatcher's one knob (core.pyx:40, default -1e9). It
    must dominate (be far below) every real lattice value; only change it
    if your lattice legitimately contains values near -1e9.

    Performance note (measured on a v5e; details in docs/PERF.md
    "Serving guidance"): this drop-in API accepts the reference's
    `[b, t_x, t_y]` layout directly, and for standalone calls up to
    B ≈ 45 it is also the fastest route. Above that, the layout +
    output-dtype contract itself costs ~2x vs the time-major kernels
    (B=256: 0.699 ms here vs 0.329 ms time-major) — latency-critical
    large-batch serving should build lattices time-major and call
    `mas_pallas_tm` (or `mas_path_frame_major`, or `serving.BatchAligner`
    which buckets and dispatches for you). Inside a larger jitted
    program XLA fuses the layout conversions into the producers, so
    integrated training steps see kernel-side throughput either way.
    """
    value = jnp.asarray(value)
    mask = jnp.asarray(mask)
    if value.ndim != 3 or mask.ndim != 3:
        raise ValueError(
            f"maximum_path expects [b, t_x, t_y] value and mask, got "
            f"value.shape={value.shape}, mask.shape={mask.shape}")
    if value.shape != mask.shape:
        raise ValueError(
            f"value and mask shapes differ: {value.shape} vs {mask.shape}")
    dtype = value.dtype
    t_x, t_y = lengths_from_lattice_mask(mask)
    # The reference multiplies by the mask first (__init__.py:11); in-band
    # cells are unchanged by it, so this only sanitises padding.
    v = (value * mask).astype(jnp.float32)

    implementation = _resolve_impl(implementation)
    if implementation == "pallas":
        from .mas_pallas import mas_pallas
        path = mas_pallas(v, t_x, t_y, max_neg_val=float(max_neg_val))
    elif implementation == "lax":
        path = mas_lax(v, t_x, t_y, max_neg_val=float(max_neg_val))
    elif implementation == "cpp":
        # Host-side native oracle — debugging / CPU-eager fallback. This
        # reintroduces the reference's host round-trip by construction;
        # never the default.
        import numpy as np

        from ..native import maximum_path_cpp

        def _cb(v_np, m_np):
            return maximum_path_cpp(np.asarray(v_np), np.asarray(m_np)) \
                .astype(np.float32)

        if isinstance(v, jax.core.Tracer):
            # Inside jit: host callback (unsupported on some platforms,
            # e.g. the tunneled axon TPU backend — use eagerly there).
            path = jax.pure_callback(
                _cb, jax.ShapeDtypeStruct(v.shape, jnp.float32), v, mask)
        else:
            path = jnp.asarray(_cb(v, mask))
    else:
        raise ValueError(f"unknown implementation: {implementation!r}")
    return path.astype(dtype)
