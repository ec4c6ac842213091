"""On-device MAS conformance sweep: every kernel route vs the oracle.

    python scripts/conformance_sweep.py [--seeds 2]

Runs the drop-in `mas_pallas` across a grid of shapes chosen to hit
every dispatch route (natural-input fused + quad, time-major fused
quad/pair, natural two-kernel forward, time-major two-kernel) and
asserts bit-identical paths against the line-faithful NumPy oracle.
This is the heavyweight on-chip complement to the interpret-mode test
suite — run it after kernel changes; bench.py runs a 2-seed subset as
its gate on every benchmark invocation.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

# (B, T_x, T_y, expected route) — routes per mas_pallas dispatch rules:
# natural_ok requires (not interpret) and T_y (8-padded) 128-aligned or
# <= 128; fused requires the bit lattice <= FUSED_BITS_BUDGET; quad
# requires B*T_x <= QUAD_MAX_ELEMS (4096).
SHAPES = [
    (1, 64, 256, "fused-nat quad (< NAT_FUSED_MIN_ELEMS)"),
    (1, 128, 1024, "fused-nat quad"),
    (2, 16, 384, "fused-nat quad"),
    (8, 128, 1024, "fused-nat quad"),
    (16, 128, 1024, "fused-nat quad (just under the fused-tiled gate)"),
    (32, 128, 1024, "nat-fused-tiled quad (headline)"),
    (3, 40, 200, "tm fused quad (T_y not 128-aligned)"),
    (5, 8, 201, "tm fused quad, odd T_y padding"),
    (5, 8, 21, "fused-nat quad, whole-axis chunk, odd T_y"),
    (4, 1, 64, "T_x == 1"),
    (4, 256, 96, "multi-lane-tile T_x"),
    (33, 128, 1024, "fused-nat pair (odd B: no fused tile; > quad gate)"),
    (33, 128, 200, "tm fused pair (> quad gate, unaligned T_y)"),
    (64, 128, 1024, "natural two-kernel + cmp backtrack"),
    (64, 128, 2048, "natural two-kernel + cmp backtrack (config 5)"),
    (72, 128, 1024, "natural batch-tiled two-kernel (bb=24)"),
    (256, 128, 1024, "natural batch-tiled two-kernel (serving, bb=64)"),
    (250, 128, 1024, "tm two-kernel (no 8-multiple batch tile)"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=2)
    args = ap.parse_args()

    from aligner_tpu.ops.mas_pallas import mas_pallas
    from aligner_tpu.ops.mas_reference import mas_single

    failures = 0
    for B, T_x, T_y, route in SHAPES:
        for seed in range(args.seeds):
            rng = np.random.default_rng(1000 * seed + B + T_x + T_y)
            v = jnp.asarray((rng.standard_normal((B, T_x, T_y)) * 3)
                            .astype(np.float32))
            tx_np = rng.integers(1, min(T_x, T_y) + 1, B).astype(np.int32)
            ty_np = np.maximum(tx_np, rng.integers(1, T_y + 1, B)) \
                .astype(np.int32)
            tx, ty = jnp.asarray(tx_np), jnp.asarray(ty_np)
            got = np.asarray(mas_pallas(v, tx, ty)).astype(np.int32)
            v_np = np.asarray(v)
            want = np.stack([
                mas_single(v_np[i].copy(), int(tx_np[i]), int(ty_np[i]))
                for i in range(B)])
            ok = np.array_equal(got, want)
            failures += not ok
            print(f"{'OK  ' if ok else 'FAIL'} B={B:3d} T_x={T_x:3d} "
                  f"T_y={T_y:4d} seed={seed}  [{route}]")
    if failures:
        print(f"{failures} FAILURES")
        return 1
    print(f"all {len(SHAPES) * args.seeds} cases bit-identical "
          f"to the oracle")
    return 0


if __name__ == "__main__":
    sys.exit(main())
