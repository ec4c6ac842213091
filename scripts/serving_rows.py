"""Measure the round-4 serving rows on the chip (docs/PERF.md):

* durations-only MAS serving (bits forward + duration-walk kernel) at
  B=64 time-major (BatchAligner's program) and B=256 natural.
* pause-aware skip-Viterbi serving (SkipBatchAligner's program:
  mas_skip_pallas state-major) at B=8 and B=64, T_s=33 (t_x=16) and
  T_s=257 (t_x=128).

Run: python scripts/serving_rows.py
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from aligner_tpu.ops.mas_pallas import (_pad_frames, mas_pallas_bits,
                                            mas_pallas_bits_nat,
                                            mas_pallas_durations)
    from aligner_tpu.ops.skip_dp_pallas import mas_skip_pallas
    from aligner_tpu.utils.profiling import measure_device_time

    rng = np.random.default_rng(0)

    # ---- durations-only MAS serving ----
    for B, T_x, T_y, layout in [(64, 128, 1024, "tm"),
                                (256, 128, 1024, "nat")]:
        t_x = jnp.full((B,), T_x, jnp.int32)
        t_y = jnp.full((B,), T_y, jnp.int32)
        if layout == "tm":
            v = jnp.asarray(rng.standard_normal(
                (T_y, B, T_x)).astype(np.float32))

            def durf(v):
                vt, _ = _pad_frames(v)
                return mas_pallas_durations(mas_pallas_bits(vt), t_x, t_y)
        else:
            v = jnp.asarray(rng.standard_normal(
                (B, T_x, T_y)).astype(np.float32))

            def durf(v):
                return mas_pallas_durations(mas_pallas_bits_nat(v),
                                            t_x, t_y)
        f = jax.jit(durf)
        jax.block_until_ready(f(v))
        t = measure_device_time(lambda: f(v))
        print(json.dumps({"row": f"durations-only {layout} B={B}",
                          "ms": round(t * 1e3, 4),
                          "durs_per_s": round(B / t)}))

    # ---- pause-aware skip-Viterbi serving ----
    for B, t_x_tok, T_y in [(8, 16, 128), (64, 16, 128),
                            (8, 128, 1024), (64, 128, 1024)]:
        T_s = 2 * t_x_tok + 1
        v = jnp.asarray(rng.standard_normal(
            (B, T_s, T_y)).astype(np.float32))
        t_x = jnp.full((B,), t_x_tok, jnp.int32)
        t_y = jnp.full((B,), T_y, jnp.int32)
        f = jax.jit(lambda v: mas_skip_pallas(v, t_x, t_y))
        jax.block_until_ready(f(v))
        t = measure_device_time(lambda: f(v))
        print(json.dumps({"row": f"skip-viterbi B={B} T_s={T_s} T_y={T_y}",
                          "ms": round(t * 1e3, 4),
                          "paths_per_s": round(B / t)}))


if __name__ == "__main__":
    main()
