"""Probe the hard-corpus pause placement-swap residual (round-4 verdict
item 3 follow-up to scripts/pause_error_diag.py).

Two questions the lever table couldn't answer:

1. Are placement swaps a DECODE problem or a LATTICE problem? For each
   swap (true pause missed at gap g, spurious pause at adjacent gap h)
   compare the model's own posterior pause occupancy (expected pause
   frames from `skip_posteriors`) at g vs h. If the lattice puts more
   mass on the swapped gap, no decode-side lever can fix it — the
   residual is an information floor of the corpus, not a search bug.
2. What do decode-time levers buy on a FIXED trained model? Sweep
   (a) `enter_cost` (pause-count prior in the skip Viterbi) and
   (b) a min-pause-duration post-filter (pauses shorter than k frames
   merged into the preceding token — the cheapest "pause duration
   model"), and score each decode. One training run, many probes.

Usage: python scripts/pause_swap_probe.py --steps 3000 --seed 0 --hard
       [--backend cpu]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def minlen_filter(durs, pauses, k):
    """Merge decoded pauses shorter than k frames into the preceding
    token (gap 0 merges into token 0). durs [t_x], pauses [t_x+1]."""
    durs = durs.copy()
    pauses = pauses.copy()
    for g in range(len(pauses)):
        if 0 < pauses[g] < k:
            durs[max(g - 1, 0)] += pauses[g]
            pauses[g] = 0
    return durs, pauses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hard", action="store_true")
    ap.add_argument("--backend", default=None)
    ap.add_argument("--pause-prob", type=float, default=0.4)
    ap.add_argument("--enter-costs", type=float, nargs="*",
                    default=[0.0, -0.5, -1.0, -2.0])
    ap.add_argument("--min-lens", type=int, nargs="*", default=[1, 2, 3])
    args = ap.parse_args()

    if args.backend:
        import jax
        jax.config.update("jax_platforms", args.backend)
    import jax
    import jax.numpy as jnp

    from aligner_tpu.data import SyntheticConfig, bucket_batches, make_corpus
    from aligner_tpu.models import OTAAligner, OTAConfig
    from aligner_tpu.ops.skip_dp import (mas_skip_path_frame_major,
                                         skip_posteriors,
                                         split_state_durations)
    from aligner_tpu.train.loop import train_aligner
    from aligner_tpu.utils.eval import pause_detection, token_boundary_f1

    synth_kw = dict(coarticulation=0.3, proto_overlap=0.5,
                    gain_var=0.3) if args.hard else {}
    cfg = SyntheticConfig(seed=args.seed, max_tokens=16, max_duration=7,
                          pause_prob=args.pause_prob, **synth_kw)
    corpus = make_corpus(64, cfg)
    batches = list(bucket_batches(corpus, 16, shuffle_seed=args.seed))

    model = OTAAligner(OTAConfig(
        vocab_size=cfg.vocab_size, n_mels=cfg.n_mels, dim=96, hidden=128,
        temperature=0.15, model_pauses=True, use_recon=True,
        pause_prior="bridge"))
    anneal = args.steps // 2

    def apply_extra(step_no):
        frac = jnp.clip(step_no / max(anneal, 1), 0.0, 1.0)
        return {"pause_bias": -3.0 * (1.0 - frac)}

    state, _ = train_aligner(model, batches, steps=args.steps,
                             learning_rate=3e-4,
                             bin_start=args.steps // 6,
                             bin_ramp=args.steps // 3,
                             log_fn=lambda s: None, seed=args.seed,
                             apply_extra=apply_extra)

    def match_item(tokens, t_x):
        for item in corpus:
            if len(item["tokens"]) == t_x and \
                    (item["tokens"] == tokens[:t_x]).all():
                return item
        return None

    # one forward per eval batch: lattice + posteriors, then re-decodes
    decode = jax.jit(lambda lp, tx, ty, c: mas_skip_path_frame_major(
        lp, tx, ty, enter_cost=c), static_argnums=3)
    post = jax.jit(skip_posteriors)

    per_setting = {}          # (enter_cost, minlen) -> metric lists
    swap_rows = []            # posterior mass at true vs swapped gap
    for b in batches[:2]:
        bj = {k: jnp.asarray(v) for k, v in b.items()}
        out = model.apply({"params": state.params}, bj["tokens"],
                          bj["mel"], bj["text_lengths"],
                          bj["mel_lengths"])
        lp = out["logp_with_prior"]
        gamma, _ = post(lp, bj["text_lengths"], bj["mel_lengths"])
        gamma = np.asarray(gamma)
        base_pd = np.asarray(out["durations"])
        base_pp = np.asarray(out["pause_durations"])
        decodes = {}
        for c in args.enter_costs:
            hard = decode(lp, bj["text_lengths"], bj["mel_lengths"], c)
            d, p = split_state_durations(jnp.sum(hard, axis=1))
            decodes[c] = (np.asarray(d), np.asarray(p))
        for i in range(bj["tokens"].shape[0]):
            item = match_item(np.asarray(bj["tokens"][i]),
                              int(bj["text_lengths"][i]))
            if item is None:
                continue
            t_xi = len(item["tokens"])
            tp = np.asarray(item["pause_durations"])
            # swap probe on the BASE decode (the trained model's own)
            pp0 = base_pp[i][:t_xi + 1]
            exp_frames = gamma[i, :, 0:2 * t_xi + 1:2].sum(axis=0)
            for g in range(t_xi + 1):
                if tp[g] >= 2 and pp0[g] < 2:
                    for h in (g - 1, g + 1):
                        if 0 <= h <= t_xi and pp0[h] >= 2 and tp[h] < 2:
                            swap_rows.append({
                                "true_gap_mass": float(exp_frames[g]),
                                "swap_gap_mass": float(exp_frames[h]),
                                "true_len": int(tp[g]),
                                "swap_len": int(pp0[h]),
                            })
            # lever grid
            for c in args.enter_costs:
                d_all, p_all = decodes[c]
                for k in args.min_lens:
                    pd, pp = minlen_filter(d_all[i][:t_xi].copy(),
                                           p_all[i][:t_xi + 1].copy(), k)
                    f1 = token_boundary_f1(
                        pd, item["durations"], pred_pauses=pp,
                        true_pauses=tp, tolerance_frames=2)["f1"]
                    det = pause_detection(pp, tp)
                    per_setting.setdefault((c, k), []).append(
                        (f1, det["precision"], det["recall"]))

    print("\n# decode-time lever grid (fixed model, "
          f"steps={args.steps} seed={args.seed} hard={args.hard})\n")
    print("| enter_cost | min_len | F1@2 | pause P | pause R |")
    print("|---|---|---|---|---|")
    for (c, k), rows in sorted(per_setting.items()):
        a = np.asarray(rows, dtype=np.float64)
        m = np.nanmean(a, axis=0)
        print(f"| {c:+.1f} | {k} | {m[0]:.3f} | {m[1]:.3f} | {m[2]:.3f} |")

    lattice_prefers_swap = sum(
        1 for r in swap_rows if r["swap_gap_mass"] > r["true_gap_mass"])
    print(f"\n# swap posterior probe: {len(swap_rows)} swaps; lattice "
          f"puts MORE pause mass on the swapped gap in "
          f"{lattice_prefers_swap}/{len(swap_rows)}")
    print(json.dumps({"swaps": swap_rows[:20]}, indent=None))


if __name__ == "__main__":
    main()
