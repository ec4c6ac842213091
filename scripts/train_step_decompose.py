"""Decompose the config-5 OTA train step (round-3 verdict weak item 2 /
next-round item 6: 6.80 ms at B=64, 128x2048 had no per-component
accounting).

    python scripts/train_step_decompose.py [--batch 64 --t-mel 2048]

Method: device-time (trace-based, utils/profiling.py) a ladder of jitted
programs that each add one component, so successive deltas attribute the
step to encoders / prior / forward-sum / MAS+bin / backward / optimizer.
XLA fuses across the seams we cut at, so deltas are attributions, not
exact op sums — the script also prints the top fusions of the *full*
step's trace as ground truth, plus standalone component timings where a
clean standalone program exists (forward-sum loss+grad, MAS).
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def top_fusions(fn, *args, iters=10, k=12):
    """Run fn under a trace; return [(op_name, total_s/iters)] top-k."""
    out = fn(*args)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory(prefix="decomp_") as d:
        with jax.profiler.trace(d):
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
        files = glob.glob(os.path.join(d, "**", "*.trace.json.gz"),
                          recursive=True)
        with gzip.open(sorted(files)[-1]) as f:
            data = json.load(f)
    ev = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tot = collections.defaultdict(float)
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e["pid"], "")
                and not e["name"].startswith("jit_")):
            tot[e["name"]] += e["dur"] / 1e6
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:k]
    return [(n, t / iters) for n, t in rows]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t-text", type=int, default=128)
    ap.add_argument("--t-mel", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--compute-dtype", default="float32",
                    help="OTAConfig.compute_dtype for the A/B "
                         "(bfloat16 runs the encoders/energies in bf16; "
                         "params and DPs stay f32)")
    args = ap.parse_args()

    from aligner_tpu.models import OTAAligner, OTAConfig
    from aligner_tpu.models.encoders import MelEncoder, TextEncoder
    from aligner_tpu.ops.forward_sum import forward_sum_loss
    from aligner_tpu.ops.mas import mas_path_frame_major
    from aligner_tpu.ops.prior import beta_binomial_log_prior
    from aligner_tpu.train import create_train_state, make_train_step
    from aligner_tpu.utils.profiling import measure_device_time

    B, T_x, T_y = args.batch, args.t_text, args.t_mel
    rng = np.random.default_rng(0)
    batch = {
        "tokens": jnp.asarray(rng.integers(1, 100, (B, T_x)), jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, T_y, 80))
                           .astype(np.float32)),
        "text_lengths": jnp.asarray(rng.integers(T_x // 2, T_x + 1, B),
                                    jnp.int32),
        "mel_lengths": jnp.asarray(rng.integers(T_y // 2, T_y + 1, B),
                                   jnp.int32),
    }
    cfg = OTAConfig(vocab_size=100, dim=192, hidden=256,
                    compute_dtype=args.compute_dtype)
    model = OTAAligner(cfg)
    state = create_train_state(jax.random.PRNGKey(0), model, batch)
    params = state.params

    def produce_log_attn(p, stop_at):
        """Re-run the model's forward up to a cut point, mirroring
        models/ota.py (kept in sync by the full-step cross-check below).
        """
        from aligner_tpu.utils.masks import sequence_mask
        enc_dtype = (None if cfg.compute_dtype == "float32"
                     else jnp.dtype(cfg.compute_dtype))
        mel_mask = sequence_mask(batch["mel_lengths"], T_y)
        text_mask = sequence_mask(batch["text_lengths"], T_x)
        keys = TextEncoder(cfg.vocab_size, cfg.dim, cfg.hidden,
                           dtype=enc_dtype).apply(
            {"params": p["text_encoder"]}, batch["tokens"], text_mask)
        queries = MelEncoder(cfg.dim, cfg.hidden, dtype=enc_dtype).apply(
            {"params": p["mel_encoder"]}, batch["mel"], mel_mask)
        qf = queries.astype(jnp.float32)
        kf = keys.astype(jnp.float32)
        q2 = jnp.sum(qf * qf, axis=-1, keepdims=True)
        k2 = jnp.sum(kf * kf, axis=-1)[:, None, :]
        qk = jnp.einsum("byd,bxd->byx", queries, keys,
                        preferred_element_type=jnp.float32)
        energies = -cfg.temperature * (q2 - 2.0 * qk + k2)
        energies = jnp.where(text_mask[:, None, :] > 0, energies, -1e9)
        log_attn = jax.nn.log_softmax(energies, axis=-1)
        if stop_at == "attn":
            return log_attn.sum()
        prior = beta_binomial_log_prior(
            batch["text_lengths"], batch["mel_lengths"], T_x, T_y,
            cfg.prior_omega)
        logp = log_attn + prior
        if stop_at == "prior":
            return logp.sum()
        fs = forward_sum_loss(logp, batch["text_lengths"],
                              batch["mel_lengths"])
        fsum = jnp.mean(fs / jnp.maximum(batch["mel_lengths"], 1))
        if stop_at == "fsum":
            return fsum + 0.0 * logp.sum()
        hard = mas_path_frame_major(
            jax.lax.stop_gradient(logp), batch["text_lengths"],
            batch["mel_lengths"])
        ce = -jnp.sum(hard * log_attn, axis=(1, 2))
        loss_bin = jnp.mean(ce / jnp.maximum(batch["mel_lengths"], 1))
        return fsum + loss_bin

    ladder = {}
    for stop in ("attn", "prior", "fsum", "full"):
        fn = jax.jit(lambda p, s=stop: produce_log_attn(p, s))
        ladder[f"fwd:{stop}"] = measure_device_time(
            fn, params, iters=args.iters)
        gfn = jax.jit(jax.grad(lambda p, s=stop: produce_log_attn(p, s)))
        ladder[f"grad:{stop}"] = measure_device_time(
            gfn, params, iters=args.iters)

    step = make_train_step(model, donate=False, bin_start=0, bin_ramp=1)
    full = measure_device_time(lambda s, b: step(s, b)[1]["loss"],
                               state, batch, iters=args.iters)
    ladder["train_step"] = full

    # standalone components for cross-checking the deltas
    logp = jax.nn.log_softmax(jnp.asarray(
        rng.standard_normal((B, T_y, T_x)).astype(np.float32)), -1)
    vg = jax.jit(jax.value_and_grad(
        lambda lp: forward_sum_loss(lp, batch["text_lengths"],
                                    batch["mel_lengths"]).sum()))
    t_fs = measure_device_time(lambda lp: vg(lp)[1], logp,
                               iters=args.iters)
    mas_fn = jax.jit(lambda lp: mas_path_frame_major(
        lp, batch["text_lengths"], batch["mel_lengths"]))
    t_mas = measure_device_time(mas_fn, logp, iters=args.iters)

    ms = {k: v * 1e3 for k, v in ladder.items()}
    print(f"\n# config-5 train step decomposition "
          f"(B={B}, {T_x}x{T_y}, dim {cfg.dim})\n")
    print("| component | device ms | how |")
    print("|---|---|---|")
    print(f"| encoders + energies + log-softmax (fwd) | "
          f"{ms['fwd:attn']:.3f} | ladder fwd:attn |")
    print(f"| + beta-binomial prior | "
          f"{ms['fwd:prior'] - ms['fwd:attn']:+.3f} | delta |")
    print(f"| + forward-sum alpha (fwd) | "
          f"{ms['fwd:fsum'] - ms['fwd:prior']:+.3f} | delta |")
    print(f"| + MAS + bin CE (fwd) | "
          f"{ms['fwd:full'] - ms['fwd:fsum']:+.3f} | delta |")
    print(f"| backward (encoders bwd + fsum beta/gamma + CE bwd) | "
          f"{ms['grad:full'] - ms['fwd:full']:+.3f} | grad - fwd |")
    print(f"| optimizer (adamw) + metrics | "
          f"{ms['train_step'] - ms['grad:full']:+.3f} | step - grad |")
    print(f"| **full train step** | **{ms['train_step']:.3f}** | "
          f"measured |")

    print("\n## backward ladder (value_and_grad of each fwd prefix)\n")
    print("| objective prefix | fwd ms | grad ms | bwd = grad - fwd |")
    print("|---|---|---|---|")
    for stop in ("attn", "prior", "fsum", "full"):
        f, g = ms[f"fwd:{stop}"], ms[f"grad:{stop}"]
        print(f"| {stop} | {f:.3f} | {g:.3f} | {g - f:+.3f} |")
    print(f"\nstandalone cross-checks: forward-sum loss+grad "
          f"{t_fs*1e3:.3f} ms, MAS {t_mas*1e3:.3f} ms")

    print("\n## top fusions of the full step (device total / iter)\n")
    for name, t in top_fusions(lambda s, b: step(s, b)[1]["loss"],
                               state, batch, iters=args.iters):
        print(f"  {t*1e3:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
