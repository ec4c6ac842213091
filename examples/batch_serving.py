"""Maximum-throughput batch alignment serving.

Demonstrates the layout guidance from docs/PERF.md: for standalone batch
alignment at large B, produce the log-likelihood lattice *time-major*
([T_mel, B, T_text]) and call `mas_pallas_tm` directly — the drop-in
`maximum_path` accepts the reference's [B, T_text, T_mel] layout, whose
conversion costs ~3x the kernel time at B=256 (134 MB per direction).
Inside a larger jitted program XLA fuses that transpose into the lattice
producer, so this only matters for standalone serving loops like this
one.

Run on the TPU host:

    python examples/batch_serving.py [--batch 256]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--t-text", type=int, default=128)
    ap.add_argument("--t-mel", type=int, default=1024)
    args = ap.parse_args()

    from aligner_tpu.ops.mas_pallas import mas_pallas_tm
    from aligner_tpu.utils.profiling import measure_device_time

    B, T_x, T_y = args.batch, args.t_text, args.t_mel
    rng = np.random.default_rng(0)

    # In a real service this is the model's log-likelihood lattice;
    # produce it time-major from the start (e.g. einsum "...->ybx").
    value_tm = jnp.asarray(
        rng.standard_normal((T_y, B, T_x)).astype(np.float32))
    t_x = jnp.asarray(rng.integers(T_x // 2, T_x + 1, B), jnp.int32)
    t_y = jnp.asarray(
        np.maximum(np.asarray(t_x), rng.integers(T_y // 4, T_y + 1, B)),
        jnp.int32)

    @jax.jit
    def align(value_tm, t_x, t_y):
        path_tm = mas_pallas_tm(value_tm, t_x, t_y)   # int8 [T_y, B, T_x]
        # durations per token: sum over frames — cheap in this layout.
        durations = path_tm.astype(jnp.int32).sum(0)  # [B, T_x]
        return durations

    durations = jax.block_until_ready(align(value_tm, t_x, t_y))
    assert (np.asarray(durations).sum(-1) == np.asarray(t_y)).all()

    t = measure_device_time(align, value_tm, t_x, t_y, iters=20)
    print(f"B={B} T_text={T_x} T_mel={T_y}: {t*1e3:.3f} ms/batch, "
          f"{B/t:,.0f} paths/s (device time)")


if __name__ == "__main__":
    sys.exit(main())
