"""A/B the duration-form natural-output backtrack (round 4) against the
round-3 compare-form walk at serving batches.

Routes (natural [B, T_x, T_y] f32 in, natural f32 path out):
  cmp:  mas_pallas_bits_nat -> mas_pallas_backtrack_nat(form="cmp")
  dur:  mas_pallas_bits_nat -> mas_pallas_durations
        -> path_from_durations (XLA cumsum + broadcast compare)

Also prints each stage's device time and checks the two paths are
bit-identical on ragged random lattices.

Run on the chip: python scripts/nat_dur_ab.py [--batches 256 128 64]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[256, 128, 64])
    ap.add_argument("--t-text", type=int, default=128)
    ap.add_argument("--t-mel", type=int, default=1024)
    args = ap.parse_args()

    from aligner_tpu.ops.mas_pallas import (mas_pallas_backtrack_nat,
                                            mas_pallas_bits_nat,
                                            mas_pallas_durations,
                                            path_from_durations)
    from aligner_tpu.utils.profiling import measure_device_time

    T_x, T_y = args.t_text, args.t_mel
    for B in args.batches:
        rng = np.random.default_rng(1)
        v = rng.standard_normal((B, T_x, T_y)).astype(np.float32)
        t_x = rng.integers(T_x // 2, T_x + 1, B).astype(np.int32)
        t_y = rng.integers(T_y // 2, T_y + 1, B).astype(np.int32)
        for i in range(B):  # sanitize padding
            v[i, t_x[i]:, :] = 0
            v[i, :, t_y[i]:] = 0
        vj, txj, tyj = jnp.asarray(v), jnp.asarray(t_x), jnp.asarray(t_y)

        bits_f = jax.jit(lambda v: mas_pallas_bits_nat(v))
        cmp_f = jax.jit(lambda b: mas_pallas_backtrack_nat(
            b, txj, tyj, form="cmp")[:, :, :T_y])

        def dur_route(b):
            durs = mas_pallas_durations(b, txj, tyj)
            return path_from_durations(durs, b.shape[0])[:, :, :T_y]
        dur_f = jax.jit(dur_route)
        dur_only = jax.jit(
            lambda b: mas_pallas_durations(b, txj, tyj))

        bits = jax.block_until_ready(bits_f(vj))
        p_cmp = np.asarray(cmp_f(bits))
        p_dur = np.asarray(dur_f(bits))
        identical = bool((p_cmp == p_dur).all())

        e2e_cmp = jax.jit(lambda v: mas_pallas_backtrack_nat(
            bits_f(v), txj, tyj, form="cmp")[:, :, :T_y])
        e2e_dur = jax.jit(lambda v: dur_route(bits_f(v)))
        for f in (e2e_cmp, e2e_dur, dur_only):
            jax.block_until_ready(f(vj if f is not dur_only else bits))
        rec = {
            "B": B, "identical": identical,
            "fwd_ms": round(measure_device_time(
                lambda: bits_f(vj)) * 1e3, 4),
            "cmp_bt_ms": round(measure_device_time(
                lambda: cmp_f(bits)) * 1e3, 4),
            "dur_walk_ms": round(measure_device_time(
                lambda: dur_only(bits)) * 1e3, 4),
            "dur_bt_ms": round(measure_device_time(
                lambda: dur_f(bits)) * 1e3, 4),
            "e2e_cmp_ms": round(measure_device_time(
                lambda: e2e_cmp(vj)) * 1e3, 4),
            "e2e_dur_ms": round(measure_device_time(
                lambda: e2e_dur(vj)) * 1e3, 4),
        }
        rec["e2e_dur_paths_s"] = round(B / (rec["e2e_dur_ms"] / 1e3))
        rec["e2e_cmp_paths_s"] = round(B / (rec["e2e_cmp_ms"] / 1e3))
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
