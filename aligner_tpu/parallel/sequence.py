"""Sequence-parallel MAS: the context-parallel analog for a lattice DP.

When a single mel sequence outgrows one chip's latency budget, split the
frame axis into P contiguous blocks, one per device on a mesh axis, and
pipeline the scan carry (SURVEY.md §5 "long-context" row; design in
docs/design.md): the forward sweep sends its final cumulative column
(T_x f32 — 512 bytes at T_x = 128) to the next device, the backtrack
sends the walking token index back the other way. Communication is one
tiny `ppermute` per block boundary; everything else is local.

This implementation is the *structural* one — shard_map + lax.ppermute,
correct on any mesh (validated against single-device MAS on the virtual
CPU mesh). All devices run every pipeline round and gate by round (SPMD);
a production variant would overlap rounds across microbatches and ship
the carry with a Pallas remote DMA. At baseline shapes batch sharding is
strictly better (zero communication) — this exists for the
single-sequence-too-long regime.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.mas import _backtrack_single, _forward_bits_single


def mas_sequence_parallel(value, t_x, t_y, mesh, axis: str = "data"):
    """Batched MAS with the mel axis sharded over `axis` of `mesh`.

    value: [B, T_x, T_y] float32 (T_y divisible by the axis size);
    t_x, t_y: [B] int32. Returns float32 paths [B, T_x, T_y], identical
    to the single-device result.
    """
    B, T_x, T_y = value.shape
    n = mesh.shape[axis]
    if T_y % n != 0:
        raise ValueError(f"T_y={T_y} not divisible by {axis} size {n}")
    T_yl = T_y // n
    perm_fwd = [(i, (i + 1) % n) for i in range(n)]
    perm_bwd = [(i, (i - 1) % n) for i in range(n)]

    def local(value_blk, t_x_, t_y_):
        # value_blk: [B, T_x, T_yl] — this device's frame block.
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

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis), P(), P()),
        out_specs=P(None, None, axis),
        check_vma=False,
    )
    return fn(value.astype(jnp.float32), t_x.astype(jnp.int32),
              t_y.astype(jnp.int32))
