"""A/B the natural-output backtrack forms on chip (stage vs cmp) and
the end-to-end drop-in `maximum_path` at serving batch, with the
bit-identity gate vs the NumPy oracle.

Usage: python scripts/bt_nat_ab.py [B] [T_x] [T_y]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import importlib

# the ops package re-exports the `mas_pallas` jit fn, which shadows the
# submodule under `import ... as`; go through importlib for the module
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

    bits_fn = jax.jit(lambda v: mp.mas_pallas_bits_nat(v))
    bits = jax.block_until_ready(bits_fn(value))

    for form in ("stage", "cmp"):
        for bb in (None, 64):
            try:
                fn = jax.jit(lambda b, x, y, form=form, bb=bb:
                             mp.mas_pallas_backtrack_nat(
                                 b, x, y, form=form, batch_block=bb))
                out = np.asarray(
                    jax.block_until_ready(fn(bits, t_x, t_y)))[:, :, :T_y]
                ok = np.array_equal(out.astype(np.int32), want)
                ms = measure_device_time(lambda: fn(bits, t_x, t_y)) * 1e3
                print(f"backtrack form={form:5s} bb={bb}: {ms:.3f} ms "
                      f"bitexact={ok}")
            except Exception as e:  # noqa: BLE001
                print(f"backtrack form={form:5s} bb={bb}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}")

    # split form: whole-batch walk kernel + parallel expand kernel
    for wb in (None, 128, 64):
        for quad in (False, True):
            try:
                fn = jax.jit(lambda b, x, y, wb=wb, quad=quad:
                             mp.mas_pallas_backtrack_nat_split(
                                 b, x, y, walk_block=wb, quad=quad))
                out = np.asarray(
                    jax.block_until_ready(fn(bits, t_x, t_y)))[:, :, :T_y]
                ok = np.array_equal(out.astype(np.int32), want)
                ms = measure_device_time(lambda: fn(bits, t_x, t_y)) * 1e3
                print(f"backtrack split wb={wb} quad={quad}: {ms:.3f} ms "
                      f"bitexact={ok}")
            except Exception as e:  # noqa: BLE001
                print(f"backtrack split wb={wb} quad={quad}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}")

    # fused natural-in/natural-out single-launch route
    for bb in (None, 8, 16, 32):
        for quad in (False, True):
            try:
                fn = jax.jit(lambda v, x, y, bb=bb, quad=quad:
                             mp.mas_pallas_nat_fused_tiled(
                                 v, x, y, batch_block=bb, quad=quad))
                out = np.asarray(
                    jax.block_until_ready(fn(value, t_x, t_y)))
                ok = np.array_equal(out.astype(np.int32), want)
                ms = measure_device_time(lambda: fn(value, t_x, t_y)) * 1e3
                print(f"fused-nat bb={bb} quad={quad}: {ms:.3f} ms "
                      f"bitexact={ok} ({B / ms * 1e3:,.0f} paths/s)")
            except Exception as e:  # noqa: BLE001
                print(f"fused-nat bb={bb} quad={quad}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}")

    # end-to-end drop-in
    out = np.asarray(jax.block_until_ready(
        mp.mas_pallas(value, t_x, t_y))).astype(np.int32)
    ok = np.array_equal(out, want)
    ms = measure_device_time(lambda: mp.mas_pallas(value, t_x, t_y)) * 1e3
    print(f"drop-in mas_pallas B={B}: {ms:.3f} ms bitexact={ok} "
          f"({B / ms * 1e3:,.0f} paths/s)")


if __name__ == "__main__":
    main()
