"""Decompose the B=1 small-shape MAS latency (round-2 verdict item 6).

    python scripts/b1_decompose.py

The B=1 64x256 fused call sits at ~21 us device time vs the 1-core CPU
oracle's 19 us. This script separates launch/setup overhead from the
per-frame dependent chain by sweeping T_y at fixed T_x (the chain length
is T_y steps for the forward + T_y for the backtrack; everything else is
~T_y-independent): a linear fit device_us(T_y) gives
  intercept = launch + prologue cost,  slope = per-frame chain cost.
Also reports the two-kernel split and quad on/off for the same shapes,
and the host-side dispatch overhead (wall enqueue time of an async call).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from aligner_tpu.ops.mas_pallas import mas_pallas
from aligner_tpu.ops.mas_reference import mas_single
from aligner_tpu.utils.profiling import measure_device_time


def run(B, T_x, T_y, **kw):
    rng = np.random.default_rng(0)
    value = jnp.asarray(
        (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32))
    t_x = jnp.full((B,), T_x, jnp.int32)
    t_y = jnp.full((B,), T_y, jnp.int32)
    out = np.asarray(jax.block_until_ready(
        mas_pallas(value, t_x, t_y, **kw))).astype(np.int32)
    want = np.stack([mas_single(np.asarray(value)[i].copy(), T_x, T_y)
                     for i in range(B)])
    assert np.array_equal(out, want), f"not bit-exact at {(B, T_x, T_y)}"
    us = measure_device_time(
        lambda: mas_pallas(value, t_x, t_y, **kw)) * 1e6
    return us, (value, t_x, t_y)


def main():
    T_x = 64
    rows = []
    for T_y in (128, 256, 512, 1024):
        us, _ = run(1, T_x, T_y)
        rows.append((T_y, us))
        print(f"B=1 {T_x}x{T_y:5d}: {us:8.2f} us device")
    ys = np.array([r[0] for r in rows], float)
    ts = np.array([r[1] for r in rows], float)
    slope, intercept = np.polyfit(ys, ts, 1)
    print(f"linear fit: intercept {intercept:.2f} us (launch/prologue), "
          f"slope {slope * 1e3:.2f} ns/frame "
          f"(chain @ T_y=256: {slope * 256:.2f} us)")

    for quad in (True, False):
        us, _ = run(1, T_x, 256, quad=quad)
        print(f"B=1 {T_x}x256 quad={quad}: {us:8.2f} us")
    for fuse in (True, False):
        us, _ = run(1, T_x, 256, fuse=fuse)
        print(f"B=1 {T_x}x256 fuse={fuse}: {us:8.2f} us")

    # host-side dispatch: enqueue wall time of one async call (warm)
    _, (value, t_x, t_y) = run(1, T_x, 256)
    for _ in range(3):
        o = mas_pallas(value, t_x, t_y)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    n = 200
    for _ in range(n):
        o = mas_pallas(value, t_x, t_y)
    enqueue_us = (time.perf_counter() - t0) / n * 1e6
    jax.block_until_ready(o)
    print(f"host enqueue (async, warm): {enqueue_us:.1f} us/call "
          f"(overlaps device; not additive unless serving synchronously)")


if __name__ == "__main__":
    main()
