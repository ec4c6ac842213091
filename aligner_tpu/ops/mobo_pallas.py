"""Pallas TPU kernels for the MoBo boundary recursions — K7 hot path.

Round 2 closed the "Pallas MoBo?" question with a cycle-count estimate
("~18 vregs x ~250 ops per token, a wash vs the fused XLA scan body");
round 3 replaced the estimate with a measurement
(`scripts/mobo_pallas_proto.py`): the Pallas token sweep runs the
config-4 alpha recursion in 0.232 ms vs 0.495 ms for the XLA
`lax.scan` — a 2.14x win (the scan pays per-step loop overhead and
re-materialises the [B, T_y1] carry through HBM-backed buffers, while
the kernel keeps it in vector registers across an unrolled token
chunk). Per the documented bar (implement fully if >= 1.3x), this
module provides all three sequential MoBo sweeps as Pallas kernels:

* `mobo_alpha_pallas`    — forward logB recursion (soft mode),
* `mobo_beta_pallas`     — backward beta recursion (posteriors / VJP),
* `mobo_bp_pallas`       — forward max/argmax with int32 backpointers
                           (hard Viterbi mode).

All three share the window-shift algebra of `ops.mobo` (max/sum
accumulation over D lane shifts — identical operation ORDER to the
lax scans, so live cells are bit-identical; dead cells carry the NEG
sentinel with bounded +log(D) slop, asserted below 0.5 * NEG).
`ops.mobo` dispatches to these on TPU and keeps its lax scans as the
CPU/interpret oracle, mirroring the MAS kernel/oracle split
(reference semantics: monotonic_align/core.pyx:9-45; MoBo spec:
arXiv 2005.08528, reference README.md:9-13).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Shared with the lax-scan oracle ON PURPOSE: the bit-identity contract
# ("identical operation order to the scans") would silently break if the
# kernel carried its own copies of the window algebra. All four are
# plain jnp functions, equally valid inside a Pallas kernel body.
from .mobo import (NEG, _sb as _shift_b, _sf as _shift_f, _window_lse,
                   _window_max_argmax_back)


def _pad_grid(e_tm, chunk: int):
    """Pad [T_x, B, T_y1] to a lane-aligned T_y1 and a chunk-divisible
    T_x (padded tokens are frozen pass-throughs in every sweep)."""
    T_x, B, T_y1 = e_tm.shape
    pad_y = (-T_y1) % (128 if T_y1 > 128 else 8)
    pad_x = (-T_x) % chunk
    if pad_y or pad_x:
        e_tm = jnp.pad(e_tm, ((0, pad_x), (0, 0), (0, pad_y)),
                       constant_values=NEG)
    return e_tm, T_x + pad_x, T_y1 + pad_y


def _alpha_kernel(tx_ref, e_ref, logB_ref, carry_ref, *, D: int):
    chunk = e_ref.shape[0]
    B, T_y1 = carry_ref.shape
    i = pl.program_id(0)
    tx = tx_ref[:]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, T_y1), 1)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.where(pos == 0, 0.0, NEG)

    def body(j, prev):
        tok = i * chunk + j
        e = e_ref[j]
        z = _window_lse(e, D, _shift_f)
        a = jnp.where(z > 0.5 * NEG, prev - z, NEG)
        inner = _window_lse(a, D, _shift_b)
        new = e + inner
        new = jnp.where(new > 0.5 * NEG, new, NEG)
        new = jnp.where(tok < tx, new, prev)
        logB_ref[j] = new
        return new

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:],
                                     unroll=True)


def _bp_kernel(tx_ref, e_ref, bp_ref, carry_ref, *, D: int):
    """Hard-mode forward: same recursion with max instead of logsumexp,
    emitting the chosen window offset d as int32 backpointers."""
    chunk = e_ref.shape[0]
    B, T_y1 = carry_ref.shape
    i = pl.program_id(0)
    tx = tx_ref[:]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, T_y1), 1)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.where(pos == 0, 0.0, NEG)

    def body(j, prev):
        tok = i * chunk + j
        e = e_ref[j]
        z = _window_lse(e, D, _shift_f)
        a = jnp.where(z > 0.5 * NEG, prev - z, NEG)
        inner, bp = _window_max_argmax_back(a, D)
        new = e + inner
        new = jnp.where(new > 0.5 * NEG, new, NEG)
        live = tok < tx
        new = jnp.where(live, new, prev)
        bp_ref[j] = jnp.where(live, bp, 0)
        return new

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:],
                                     unroll=True)


def _beta_kernel(tx_ref, ty_ref, e_next_ref, beta_ref, carry_ref,
                 *, D: int):
    """Backward recursion over reversed token chunks: the grid walks
    chunks right-to-left; within a chunk, tokens high-to-low."""
    chunk = e_next_ref.shape[0]
    B, T_y1 = carry_ref.shape
    i = pl.program_id(0)
    n = pl.num_programs(0)
    tx = tx_ref[:]
    ty = ty_ref[:]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, T_y1), 1)
    end_row = jnp.where(pos == ty, 0.0, NEG)
    base = (n - 1 - i) * chunk

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, NEG)

    def body(jj, nxt):
        j = chunk - 1 - jj
        tok = base + j
        e_next = e_next_ref[j]
        z_next = _window_lse(e_next, D, _shift_f)
        inner = _window_lse(
            jnp.where(e_next > 0.5 * NEG, e_next, NEG) + nxt, D,
            _shift_f)
        beta = jnp.where(z_next > 0.5 * NEG, inner - z_next, NEG)
        beta = jnp.where(tok == tx - 1, end_row, beta)
        beta = jnp.where(tok < tx, beta, nxt)
        beta_ref[j] = beta
        return beta

    carry_ref[:] = jax.lax.fori_loop(0, chunk, body, carry_ref[:],
                                     unroll=True)


_CHUNK = 8


def mobo_alpha_pallas(e_tm, t_x, D: int, *, interpret: bool = False,
                      chunk: int = _CHUNK):
    """Forward logB recursion: [T_x, B, T_y1] token-major padded
    energies (ops.mobo._prep_energies layout) -> logB stack
    [T_x, B, T_y1]. Live cells bit-identical to the lax scan."""
    T_x, B, T_y1 = e_tm.shape
    e_tm, T_xp, T_y1p = _pad_grid(e_tm, chunk)
    tx_b = jnp.broadcast_to(t_x.astype(jnp.int32)[:, None], (B, T_y1p))
    logB = pl.pallas_call(
        functools.partial(_alpha_kernel, D=D),
        grid=(T_xp // chunk,),
        in_specs=[
            pl.BlockSpec((B, T_y1p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, T_y1p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, B, T_y1p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_xp, B, T_y1p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, T_y1p), jnp.float32)],
        interpret=interpret,
    )(tx_b, e_tm)
    return logB[:T_x, :, :T_y1]


def mobo_bp_pallas(e_tm, t_x, D: int, *, interpret: bool = False,
                   chunk: int = _CHUNK):
    """Hard-mode forward: -> int32 backpointer stack [T_x, B, T_y1]
    (the chosen duration d per cell; 0 on frozen/padded tokens)."""
    T_x, B, T_y1 = e_tm.shape
    e_tm, T_xp, T_y1p = _pad_grid(e_tm, chunk)
    tx_b = jnp.broadcast_to(t_x.astype(jnp.int32)[:, None], (B, T_y1p))
    bps = pl.pallas_call(
        functools.partial(_bp_kernel, D=D),
        grid=(T_xp // chunk,),
        in_specs=[
            pl.BlockSpec((B, T_y1p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, T_y1p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, B, T_y1p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_xp, B, T_y1p), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, T_y1p), jnp.float32)],
        interpret=interpret,
    )(tx_b, e_tm)
    return bps[:T_x, :, :T_y1]


def mobo_beta_pallas(e_tm, t_x, t_y, D: int, *, interpret: bool = False,
                     chunk: int = _CHUNK):
    """Backward beta recursion: -> beta stack [T_x, B, T_y1]. The
    kernel consumes e_{i+1} rows (precomputed shift of e_tm along the
    token axis, one XLA copy)."""
    T_x, B, T_y1 = e_tm.shape
    e_next = jnp.concatenate(
        [e_tm[1:], jnp.full((1, B, T_y1), NEG, jnp.float32)], axis=0)
    e_next, T_xp, T_y1p = _pad_grid(e_next, chunk)
    n = T_xp // chunk
    tx_b = jnp.broadcast_to(t_x.astype(jnp.int32)[:, None], (B, T_y1p))
    ty_b = jnp.broadcast_to(t_y.astype(jnp.int32)[:, None], (B, T_y1p))
    len_spec = pl.BlockSpec((B, T_y1p), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    rev = lambda i: (n - 1 - i, 0, 0)
    betas = pl.pallas_call(
        functools.partial(_beta_kernel, D=D),
        grid=(n,),
        in_specs=[
            len_spec, len_spec,
            pl.BlockSpec((chunk, B, T_y1p), rev,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, B, T_y1p), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_xp, B, T_y1p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, T_y1p), jnp.float32)],
        interpret=interpret,
    )(tx_b, ty_b, e_next)
    return betas[:T_x, :, :T_y1]
