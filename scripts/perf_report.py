"""Reproduce the framework's device-time numbers on the attached chip.

    python scripts/perf_report.py [--quick] > docs/PERF.md

All timings are device-side (jax.profiler trace), not host wall-clock —
see aligner_tpu/utils/profiling.py for why.
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
    ap.add_argument("--quick", action="store_true",
                    help="skip the slower configs")
    args = ap.parse_args()

    from aligner_tpu.ops.mas_pallas import mas_pallas
    from aligner_tpu.ops.forward_sum import forward_sum_loss
    from aligner_tpu.models import OTAAligner, OTAConfig
    from aligner_tpu.ops.mobo import mobo_loss
    from aligner_tpu.train import create_train_state, make_train_step
    from aligner_tpu.utils.profiling import measure_device_time

    rng = np.random.default_rng(0)
    rows = []

    def mas_case(B, T_x, T_y, ref_pps, label, fuse=None, fmt="%.0f"):
        v = jnp.asarray((rng.standard_normal((B, T_x, T_y)) * 3)
                        .astype(np.float32))
        tx = jnp.asarray(rng.integers(T_x // 2, T_x + 1, B), jnp.int32)
        ty = jnp.asarray(
            np.maximum(np.asarray(tx), rng.integers(T_y // 4, T_y + 1, B)),
            jnp.int32)
        t = measure_device_time(
            lambda v_, tx_, ty_: mas_pallas(v_, tx_, ty_, fuse=fuse),
            v, tx, ty)
        rows.append((label, f"{t*1e3:.3f} ms", f"{B/t:,.0f} paths/s",
                     (fmt % (B / t / ref_pps)) + "x CPU ref"))

    mas_case(32, 128, 1024, 2110, "MAS batch (headline, config 1-2)")
    if not args.quick:
        mas_case(64, 128, 2048, 920, "MAS batch (config 5 shape)")
        mas_case(8, 128, 1024, 2110, "MAS batch (serving, B=8)")
        mas_case(16, 128, 1024, 2110, "MAS batch (serving, B=16)")
        mas_case(256, 128, 1024, 2110,
                 "MAS batch (serving, B=256)")
        mas_case(1, 64, 256, 52900, "MAS single path (config 1, quad)",
                 fmt="%.2f")
        mas_case(1, 64, 256, 52900,
                 "MAS single path (config 1, pair kernels)", fuse=False,
                 fmt="%.2f")

    # OTA train step (config 3 shape)
    B, T_x, T_y = 16, 128, 1024
    batch = {
        "tokens": jnp.asarray(rng.integers(1, 100, (B, T_x)), jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, T_y, 80))
                           .astype(np.float32)),
        "text_lengths": jnp.asarray(rng.integers(64, T_x + 1, B),
                                    jnp.int32),
        "mel_lengths": jnp.asarray(rng.integers(512, T_y + 1, B),
                                   jnp.int32),
    }
    model = OTAAligner(OTAConfig(vocab_size=100, dim=192, hidden=256))
    state = create_train_state(jax.random.PRNGKey(0), model, batch)
    step = make_train_step(model, donate=False)
    t = measure_device_time(lambda s, b: step(s, b)[1]["loss"], state,
                            batch, iters=10)
    rows.append(("OTA aligner full train step (B=16, 128x1024)",
                 f"{t*1e3:.3f} ms", f"{B/t:,.0f} utt/s", "-"))

    # forward-sum loss+grad alone
    logp = jax.nn.log_softmax(jnp.asarray(
        rng.standard_normal((B, T_y, T_x)).astype(np.float32)), -1)
    vg = jax.jit(jax.value_and_grad(
        lambda lp: forward_sum_loss(lp, batch["text_lengths"],
                                    batch["mel_lengths"]).sum()))
    t = measure_device_time(lambda lp: vg(lp)[1], logp, iters=10)
    rows.append(("forward-sum loss+grad (B=16, 128x1024)",
                 f"{t*1e3:.3f} ms", "-", "-"))

    if not args.quick:
        e = jnp.asarray(rng.standard_normal((16, 1024, 128))
                        .astype(np.float32))
        txs = jnp.asarray(rng.integers(64, 129, 16), jnp.int32)
        tys = jnp.asarray(
            np.minimum(rng.integers(512, 1025, 16),
                       np.asarray(txs) * 16), jnp.int32)
        vg2 = jax.jit(jax.value_and_grad(
            lambda e: mobo_loss(e, txs, tys, 16)))
        t = measure_device_time(lambda e: vg2(e)[1], e, iters=5)
        rows.append(("MoBo loss+grad (B=16, 128x1024, D=16)",
                     f"{t*1e3:.3f} ms", "-", "-"))

    dev = jax.devices()[0]
    print(f"# Measured performance — {dev.device_kind} "
          f"(backend {jax.default_backend()})\n")
    print("All numbers are device time from jax.profiler traces "
          "(see utils/profiling.py).\n")
    print("| Workload | device time | throughput | vs reference |")
    print("|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(r) + " |")
    print("\nReference CPU numbers from BASELINE.md (1 x86 core, gcc -O3 "
          "transcription of the reference kernel).")


if __name__ == "__main__":
    sys.exit(main())
