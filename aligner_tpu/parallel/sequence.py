"""Sequence-parallel MAS: the context-parallel analog for a lattice DP.

When a single mel sequence outgrows one chip's latency budget, split the
frame axis into P contiguous blocks, one per device on a mesh axis, and
pipeline the scan carry (SURVEY.md §5 "long-context" row; design in
docs/design.md): the forward sweep sends its final cumulative column
(T_x f32 — 512 bytes at T_x = 128) to the next device, the backtrack
sends the walking token index back the other way. Communication is one
tiny `ppermute` per block boundary; everything else is local.

Two schedules, both shard_map + lax.ppermute, bit-identical to the
single-device result:

* **microbatch=None** — the structural prototype: every device runs every
  pipeline round and gates by round (SPMD), so each device is busy 1/P of
  the time. Total work = P * B lattice blocks.
* **microbatch=M** — the overlapped pipeline: the batch is split into M
  microbatches; at round r device p sweeps microbatch r - p (forward) /
  r - (P-1-p) (backtrack), so after a P-1-round fill the pipeline is
  full and every device works every round. Total work =
  (M + P - 1) * B / M blocks — an M*P/(M+P-1) speedup over the gated
  schedule (-> ~4.3x at M = P = 8), approaching P* as M grows. The carry
  ride stays one [B/M, T_x] ppermute per round.

At baseline shapes batch sharding is strictly better (zero
communication) — this exists for the single-sequence-too-long regime.
Measured crossover numbers live in docs/design.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.mas import _backtrack_single, _forward_bits_single


def mas_sequence_parallel(value, t_x, t_y, mesh, axis: str = "data",
                          microbatch: int | None = None):
    """Batched MAS with the mel axis sharded over `axis` of `mesh`.

    value: [B, T_x, T_y] float32 (T_y divisible by the axis size);
    t_x, t_y: [B] int32. microbatch: number of pipeline microbatches
    (must divide B; None/1 = the round-gated prototype schedule).
    Returns float32 paths [B, T_x, T_y], identical to the single-device
    result.
    """
    B, T_x, T_y = value.shape
    n = mesh.shape[axis]
    if T_y % n != 0:
        raise ValueError(f"T_y={T_y} not divisible by {axis} size {n}")
    if microbatch is not None and microbatch > 1:
        if B % microbatch != 0:
            raise ValueError(
                f"B={B} not divisible by microbatch={microbatch}")
        local = functools.partial(_local_pipelined, n=n, axis=axis,
                                  M=microbatch)
    else:
        local = functools.partial(_local_gated, n=n, axis=axis)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis), P(), P()),
        out_specs=P(None, None, axis),
        check_vma=False,
    )
    return fn(value.astype(jnp.float32), t_x.astype(jnp.int32),
              t_y.astype(jnp.int32))


def _local_gated(value_blk, t_x_, t_y_, *, n, axis):
    """Round-gated schedule: each device computes only on its round."""
    B, T_x, T_yl = value_blk.shape
    perm_fwd = [(i, (i + 1) % n) for i in range(n)]
    perm_bwd = [(i, (i - 1) % n) for i in range(n)]
    me = jax.lax.axis_index(axis)
    y0 = me * T_yl

    def fwd_round(r, state):
        carry, bits = state
        new_bits, new_carry = jax.vmap(
            lambda v, tx, ty, c: _forward_bits_single(
                v, tx, ty, y0=y0, carry0=c)
        )(value_blk, t_x_, t_y_, carry)
        keep = (me == r)
        bits = jnp.where(keep, new_bits, bits)
        out_carry = jnp.where(keep, new_carry, carry)
        carry = jax.lax.ppermute(out_carry, axis, perm_fwd)
        return carry, bits

    carry0 = jnp.zeros((B, T_x), jnp.float32)
    bits0 = jnp.zeros((B, T_yl, T_x), bool)
    _, bits = jax.lax.fori_loop(0, n, fwd_round, (carry0, bits0))

    def bwd_round(r, state):
        index, rows = state
        new_rows, new_index = jax.vmap(
            lambda b, tx, ty, ix: _backtrack_single(
                b, tx, ty, y0=y0, index0=ix)
        )(bits, t_x_, t_y_, index)
        keep = (me == (n - 1 - r))
        rows = jnp.where(keep, new_rows, rows)
        out_index = jnp.where(keep, new_index, index)
        index = jax.lax.ppermute(out_index, axis, perm_bwd)
        return index, rows

    index0 = t_x_ - 1
    rows0 = jnp.zeros((B, T_x, T_yl), jnp.float32)
    _, rows = jax.lax.fori_loop(0, n, bwd_round, (index0, rows0))
    return rows


def _local_pipelined(value_blk, t_x_, t_y_, *, n, axis, M):
    """Overlapped schedule: microbatch m reaches device p at round p + m
    (forward) / (n-1-p) + m (backtrack). The first device of each sweep
    ignores the ring carry (its incoming carry is the DP initial state),
    so carries only ever cross one hop ahead of their consumer — every
    value a device *uses* was produced on the previous round."""
    B, T_x, T_yl = value_blk.shape
    Bm = B // M
    perm_fwd = [(i, (i + 1) % n) for i in range(n)]
    perm_bwd = [(i, (i - 1) % n) for i in range(n)]
    me = jax.lax.axis_index(axis)
    y0 = me * T_yl

    vb = value_blk.reshape(M, Bm, T_x, T_yl)
    txm = t_x_.reshape(M, Bm)
    tym = t_y_.reshape(M, Bm)
    rounds = M + n - 1

    def fwd_round(r, state):
        carry, bits = state             # carry [Bm,T_x]; bits [M,Bm,T_yl,T_x]
        m = r - me
        valid = (m >= 0) & (m < M)
        mc = jnp.clip(m, 0, M - 1)
        v = jax.lax.dynamic_index_in_dim(vb, mc, 0, keepdims=False)
        tx = jax.lax.dynamic_index_in_dim(txm, mc, 0, keepdims=False)
        ty = jax.lax.dynamic_index_in_dim(tym, mc, 0, keepdims=False)
        # Device 0 starts every microbatch: zero incoming column.
        carry_in = jnp.where(me == 0, 0.0, carry)
        new_bits, new_carry = jax.vmap(
            lambda v_, tx_, ty_, c: _forward_bits_single(
                v_, tx_, ty_, y0=y0, carry0=c)
        )(v, tx, ty, carry_in)
        # Select on the written slice only (a full-tensor where would
        # copy the whole bits buffer every round); the slice-in update
        # itself is done in place by XLA on the loop carry.
        old = jax.lax.dynamic_index_in_dim(bits, mc, 0, keepdims=False)
        bits = jax.lax.dynamic_update_index_in_dim(
            bits, jnp.where(valid, new_bits, old), mc, 0)
        out_carry = jnp.where(valid, new_carry, carry)
        carry = jax.lax.ppermute(out_carry, axis, perm_fwd)
        return carry, bits

    carry0 = jnp.zeros((Bm, T_x), jnp.float32)
    bits0 = jnp.zeros((M, Bm, T_yl, T_x), bool)
    _, bits = jax.lax.fori_loop(0, rounds, fwd_round, (carry0, bits0))

    def bwd_round(r, state):
        index, rows = state             # index [Bm]; rows [M,Bm,T_x,T_yl]
        m = r - (n - 1 - me)
        valid = (m >= 0) & (m < M)
        mc = jnp.clip(m, 0, M - 1)
        b = jax.lax.dynamic_index_in_dim(bits, mc, 0, keepdims=False)
        tx = jax.lax.dynamic_index_in_dim(txm, mc, 0, keepdims=False)
        ty = jax.lax.dynamic_index_in_dim(tym, mc, 0, keepdims=False)
        # The last device starts every microbatch: index = t_x - 1.
        index_in = jnp.where(me == n - 1, tx - 1, index)
        new_rows, new_index = jax.vmap(
            lambda b_, tx_, ty_, ix: _backtrack_single(
                b_, tx_, ty_, y0=y0, index0=ix)
        )(b, tx, ty, index_in)
        old = jax.lax.dynamic_index_in_dim(rows, mc, 0, keepdims=False)
        rows = jax.lax.dynamic_update_index_in_dim(
            rows, jnp.where(valid, new_rows, old), mc, 0)
        out_index = jnp.where(valid, new_index, index)
        index = jax.lax.ppermute(out_index, axis, perm_bwd)
        return index, rows

    index0 = jnp.zeros((Bm,), jnp.int32)
    rows0 = jnp.zeros((M, Bm, T_x, T_yl), jnp.float32)
    _, rows = jax.lax.fori_loop(0, rounds, bwd_round, (index0, rows0))
    return rows.reshape(B, T_x, T_yl)
