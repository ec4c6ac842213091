"""Measure achievable HBM streaming ceilings at the B=256 serving shape
(round-3 verdict weak item 1: the "forward is at the HBM roofline"
closure cited ~440 GB/s against a v5e peak of ~819 GB/s without ever
measuring what a trivial streaming kernel achieves at these shapes).

Kernels, all on the natural forward's exact grid and BlockSpecs
(grid (B//bb, T_y/chunk), in [bb, T_x, chunk] f32, out [chunk, bb, T_x]):

* read-only   — in-kernel reduce of the value block to a [bb, T_x] row,
                written once per batch block (write traffic ~0).
* transpose+cast — the forward's IO contract with no DP: transpose the
                block in-kernel and emit int8 (reads 4 B/elem, writes
                1 B/elem) — the true "speed of light" for the forward.
* copy f32    — same blocks, f32 out (reads 4, writes 4).

Prints one line per kernel with device time and effective GB/s, then
the measured mas_pallas_bits_nat forward and the full drop-in
maximum_path at B=256 for the %-of-ceiling accounting (docs/PERF.md).

Run on the chip: python scripts/hbm_ceiling.py [--batch 256]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _read_kernel(val_ref, out_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:] += jnp.sum(val_ref[:], axis=2)


def _tcast_kernel(val_ref, out_ref):
    # the forward's IO contract minus the DP: in-kernel transpose + cast
    out_ref[:] = jnp.transpose(val_ref[:], (2, 0, 1)).astype(jnp.int8)


def _copy_kernel(val_ref, out_ref):
    out_ref[:] = jnp.transpose(val_ref[:], (2, 0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--t-text", type=int, default=128)
    ap.add_argument("--t-mel", type=int, default=1024)
    ap.add_argument("--bb", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=128)
    args = ap.parse_args()

    from aligner_tpu.utils.profiling import measure_device_time

    B, T_x, T_y = args.batch, args.t_text, args.t_mel
    bb, chunk = args.bb, args.chunk
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((B, T_x, T_y)).astype(np.float32))
    in_bytes = B * T_x * T_y * 4

    grid = (B // bb, T_y // chunk)
    in_spec = pl.BlockSpec((bb, T_x, chunk), lambda b, i: (b, 0, i),
                           memory_space=pltpu.VMEM)
    tm_spec = pl.BlockSpec((chunk, bb, T_x), lambda b, i: (i, b, 0),
                           memory_space=pltpu.VMEM)

    def call(kernel, out_shape, out_spec):
        return pl.pallas_call(kernel, grid=grid, in_specs=[in_spec],
                              out_specs=out_spec, out_shape=out_shape)

    rows = []

    def bench(name, fn, bytes_moved):
        f = jax.jit(fn)
        jax.block_until_ready(f(value))
        t = measure_device_time(lambda: f(value))
        rows.append({"kernel": name, "ms": round(t * 1e3, 4),
                     "GB/s": round(bytes_moved / t / 1e9, 1)})

    read = call(_read_kernel,
                jax.ShapeDtypeStruct((B // bb, bb, T_x), jnp.float32),
                pl.BlockSpec((1, bb, T_x), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM))
    bench("read-only (sum)", lambda v: read(v), in_bytes)

    tcast = call(_tcast_kernel,
                 jax.ShapeDtypeStruct((T_y, B, T_x), jnp.int8), tm_spec)
    bench("transpose+int8 cast (forward IO)", lambda v: tcast(v),
          in_bytes + in_bytes // 4)

    # f32 copy needs half-size blocks: [bb,T_x,chunk] f32 in + out,
    # double-buffered, exceeds the 16 MB scoped-VMEM limit at bb=64
    # (the last block dim must stay a multiple of 128, so halve bb).
    bb2 = bb // 2
    copy = pl.pallas_call(
        _copy_kernel, grid=(B // bb2, T_y // chunk),
        in_specs=[pl.BlockSpec((bb2, T_x, chunk), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, bb2, T_x), lambda b, i: (i, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_y, B, T_x), jnp.float32))
    bench(f"transpose copy f32 (bb {bb2})", lambda v: copy(v),
          2 * in_bytes)

    from aligner_tpu.ops.mas_pallas import mas_pallas_bits_nat
    fwd = functools.partial(mas_pallas_bits_nat, batch_block=bb,
                            _chunk=chunk)
    bench("mas natural forward (DP)", lambda v: fwd(v),
          in_bytes + in_bytes // 4)

    from aligner_tpu.ops.mas import maximum_path
    t_x = jnp.full((B,), T_x, jnp.int32)
    t_y = jnp.full((B,), T_y, jnp.int32)
    mask = (jnp.arange(T_x)[None, :, None] < t_x[:, None, None]) & \
           (jnp.arange(T_y)[None, None, :] < t_y[:, None, None])
    mask = mask.astype(jnp.float32)
    mp = jax.jit(lambda v, m: maximum_path(v, m))
    jax.block_until_ready(mp(value, mask))
    t = measure_device_time(lambda: mp(value, mask))
    rows.append({"kernel": "maximum_path drop-in e2e", "ms":
                 round(t * 1e3, 4),
                 "GB/s": None,
                 "paths/s": round(B / t)})

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
