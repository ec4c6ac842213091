"""A/B the natural-route (batch_block, chunk) tilings at serving batch.

The B=256 drop-in route runs (B/bb) sequential frame sweeps; VMEM caps
bb*T_x*chunk, so shrinking the chunk buys a larger batch tile and a
shorter serial chain (per-frame cost grows sub-linearly in bb: ~50 ns
latency + ~3 ns/vreg throughput at 128 lanes, docs/design.md). This
script measures forward / backtrack / end-to-end across tilings, gated
on bit-identity vs the NumPy reference oracle.

Usage: python scripts/nat_tile_ab.py [B] [T_x] [T_y]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import importlib

mp = importlib.import_module("aligner_tpu.ops.mas_pallas")
from aligner_tpu.ops.mas_reference import mas_single
from aligner_tpu.utils.profiling import measure_device_time


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    T_x = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    T_y = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    rng = np.random.default_rng(0)
    value = jnp.asarray(
        (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32))
    t_x = jnp.asarray(rng.integers(T_x // 2, T_x + 1, B).astype(np.int32))
    t_y = jnp.asarray(np.maximum(
        np.asarray(t_x), rng.integers(T_y // 4, T_y + 1, B)).astype(np.int32))

    want = np.stack([
        mas_single(np.asarray(value)[i].copy(), int(t_x[i]), int(t_y[i]))
        for i in range(B)])
    bits_ref = None

    # (bb, chunk): current default first; the bb < 64 rows map the
    # per-frame cost curve f(bb) = t * bb / (B * T_y) to split the
    # latency vs throughput components (flat f => interleaving two
    # independent block chains would hide the latency); the chunk < 128
    # rows probe whether Mosaic accepts sub-128 lane blocks at all.
    tilings = [(64, 128), (32, 128), (16, 128), (8, 128),
               (128, 64), (256, 32)]

    for bb, chunk in tilings:
        if B % bb or (T_y % chunk):
            continue
        # ---- forward ----
        try:
            fwd = jax.jit(lambda v, bb=bb, ck=chunk: mp.mas_pallas_bits_nat(
                v, batch_block=bb, _chunk=ck))
            bits = jax.block_until_ready(fwd(value))
            if bits_ref is None:
                bits_ref = np.asarray(bits)
            fwd_ok = np.array_equal(np.asarray(bits), bits_ref)
            fwd_ms = measure_device_time(lambda: fwd(value)) * 1e3
            T_yp = T_y + (-T_y) % (128 if T_y > 128 else 8)
            f_ns = fwd_ms * 1e6 * bb / (B * T_yp)
            print(f"fwd bb={bb:3d} chunk={chunk:3d}: {fwd_ms:.3f} ms "
                  f"bits-equal={fwd_ok}  f(bb)={f_ns:.1f} ns/frame")
        except Exception as e:  # noqa: BLE001
            print(f"fwd bb={bb:3d} chunk={chunk:3d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}")
            continue
        # ---- backtrack (cmp form) ----
        try:
            bt = jax.jit(lambda b, x, y, bb=bb, ck=chunk:
                         mp.mas_pallas_backtrack_nat(
                             b, x, y, batch_block=bb, _chunk=ck))
            out = np.asarray(
                jax.block_until_ready(bt(bits, t_x, t_y)))[:, :, :T_y]
            bt_ok = np.array_equal(out.astype(np.int32), want)
            bt_ms = measure_device_time(lambda: bt(bits, t_x, t_y)) * 1e3
            print(f"bt  bb={bb:3d} chunk={chunk:3d}: {bt_ms:.3f} ms "
                  f"bitexact={bt_ok}  e2e={fwd_ms + bt_ms:.3f} ms "
                  f"({B / (fwd_ms + bt_ms) * 1e3:,.0f} paths/s)")
        except Exception as e:  # noqa: BLE001
            print(f"bt  bb={bb:3d} chunk={chunk:3d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}")

    # ---- quad composition and K-chain interleaving (latency hiding at
    # the same VMEM footprint; see _forward_kernel_natv_multi) ----
    for k in (1, 2, 4):
        for quad in (False, True):
            if k == 1 and not quad:
                continue  # == the (64, 128) baseline row above
            tag = f"chains={k} quad={int(quad)}"
            try:
                if k == 1:
                    fwd = jax.jit(lambda v, q=quad:
                                  mp.mas_pallas_bits_nat(v, quad=q))
                else:
                    fwd = jax.jit(lambda v, k=k, q=quad:
                                  mp.mas_pallas_bits_nat_multi(
                                      v, chains=k, quad=q))
                bits = jax.block_until_ready(fwd(value))
                fwd_ok = (bits_ref is not None
                          and np.array_equal(np.asarray(bits), bits_ref))
                fwd_ms = measure_device_time(lambda: fwd(value)) * 1e3
                print(f"fwd {tag}: {fwd_ms:.3f} ms bits-equal={fwd_ok}")
            except Exception as e:  # noqa: BLE001
                print(f"fwd {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}")
                continue
            try:
                if k == 1:
                    bt = jax.jit(lambda b, x, y, q=quad:
                                 mp.mas_pallas_backtrack_nat(
                                     b, x, y, quad=q))
                else:
                    bt = jax.jit(lambda b, x, y, k=k, q=quad:
                                 mp.mas_pallas_backtrack_nat_multi(
                                     b, x, y, chains=k, quad=q))
                out = np.asarray(
                    jax.block_until_ready(bt(bits, t_x, t_y)))[:, :, :T_y]
                bt_ok = np.array_equal(out.astype(np.int32), want)
                bt_ms = measure_device_time(
                    lambda: bt(bits, t_x, t_y)) * 1e3
                print(f"bt  {tag}: {bt_ms:.3f} ms bitexact={bt_ok}  "
                      f"e2e={fwd_ms + bt_ms:.3f} ms "
                      f"({B / (fwd_ms + bt_ms) * 1e3:,.0f} paths/s)")
            except Exception as e:  # noqa: BLE001
                print(f"bt  {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
