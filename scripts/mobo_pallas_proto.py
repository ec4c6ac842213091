"""Measured answer to round-2 verdict item 7: would a Pallas kernel for
the MoBo boundary alpha sweep beat the XLA token scan?

    python scripts/mobo_pallas_proto.py [--B 16 --t-text 128 --t-mel 1024
                                        --max-duration 16]

Prototypes the forward boundary recursion (ops/mobo._boundary_scan with
use_max=False) as a Pallas token-sweep kernel — same architecture as the
MAS/forward-sum kernels (sequential grid over token chunks, [B, T_y1]
VMEM carry) — and benchmarks both on the attached chip at the config-4
shape, asserting value parity first. Round 2 closed the question with a
cycle-count estimate ("~18 vregs x ~250 ops, a wash", docs/design.md);
this script replaces the estimate with a measurement. The kernel stays a
prototype unless it wins >= 1.3x (the documented bar).
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e15


def _shift_b(v, d):
    """out[..., t] = v[..., t-d], NEG fill (mobo._sb inside a kernel)."""
    return jnp.concatenate(
        [jnp.full_like(v[..., :d], NEG), v[..., :-d]], axis=-1)


def _shift_f(v, d):
    """out[..., t] = v[..., t+d], NEG fill."""
    return jnp.concatenate(
        [v[..., d:], jnp.full_like(v[..., :d], NEG)], axis=-1)


def _window_lse(arr, D, shift):
    m = shift(arr, 1)
    for d in range(2, D + 1):
        m = jnp.maximum(m, shift(arr, d))
    s = jnp.zeros_like(arr)
    for d in range(1, D + 1):
        s = s + jnp.exp(shift(arr, d) - m)
    return m + jnp.log(s)


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


def mobo_alpha_pallas(e_tm, t_x, D: int, *, interpret: bool = False,
                      chunk: int = 8):
    """e_tm: [T_x, B, T_y1] token-major padded energies (mobo layout).
    Returns the logB stack [T_x, B, T_y1]."""
    T_x, B, T_y1 = e_tm.shape
    pad = (-T_y1) % 128
    if pad:
        e_tm = jnp.pad(e_tm, ((0, 0), (0, 0), (0, pad)),
                       constant_values=NEG)
    T_y1p = T_y1 + pad
    tx_b = jnp.broadcast_to(t_x.astype(jnp.int32)[:, None], (B, T_y1p))
    logB = pl.pallas_call(
        functools.partial(_alpha_kernel, D=D),
        grid=(T_x // chunk,),
        in_specs=[
            pl.BlockSpec((B, T_y1p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, B, T_y1p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, B, T_y1p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_x, B, T_y1p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, T_y1p), jnp.float32)],
        interpret=interpret,
    )(tx_b, e_tm)
    return logB[:, :, :T_y1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--t-text", type=int, default=128)
    ap.add_argument("--t-mel", type=int, default=1024)
    ap.add_argument("--max-duration", type=int, default=16)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    from aligner_tpu.ops.mobo import _boundary_scan, _prep_energies
    from aligner_tpu.utils.profiling import measure_device_time

    B, T_x, T_y, D = args.B, args.t_text, args.t_mel, args.max_duration
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.standard_normal((B, T_y, T_x)).astype(np.float32))
    tx = jnp.asarray(rng.integers(T_x // 2, T_x + 1, B), jnp.int32)
    ty = jnp.asarray(
        np.minimum(rng.integers(T_y // 2, T_y + 1, B),
                   np.asarray(tx) * D), jnp.int32)
    e_tm = _prep_energies(e, tx, ty)

    scan_fn = jax.jit(lambda et: _boundary_scan(et, tx, ty, D,
                                                use_max=False)[0])
    pallas_fn = jax.jit(lambda et: mobo_alpha_pallas(
        et, tx, D, interpret=args.interpret))

    want = np.asarray(scan_fn(e_tm))
    got = np.asarray(pallas_fn(e_tm))
    # NEG-sentinel cells can differ by the +log(D) slop of dead windows;
    # compare live cells tightly and dead cells as "both dead".
    live = want > 0.5 * NEG
    assert np.allclose(got[live], want[live], rtol=1e-5, atol=1e-4), \
        f"parity failure: maxerr {np.abs(got[live]-want[live]).max()}"
    assert (got[~live] <= 0.5 * NEG).all()
    print(f"parity OK (live maxerr "
          f"{np.abs(got[live] - want[live]).max():.2e})")

    if args.interpret:
        print("interpret mode: skipping timing")
        return 0
    t_scan = measure_device_time(scan_fn, e_tm, iters=10)
    t_pallas = measure_device_time(pallas_fn, e_tm, iters=10)
    print(f"XLA token scan : {t_scan*1e3:8.3f} ms")
    print(f"Pallas kernel  : {t_pallas*1e3:8.3f} ms")
    print(f"speedup        : {t_scan/t_pallas:8.2f}x "
          f"({'implement fully' if t_scan/t_pallas >= 1.3 else 'wash — keep the scan'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
