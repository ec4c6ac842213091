"""Diagnose the hard-corpus pause error mode (round-4 verdict item 3).

Trains the pause-aware OTA model with the flagship recipe and breaks the
pause errors down by type instead of averaging them into precision /
recall:

* spurious  — predicted pause >= 2 frames in a gap with no true pause;
  histogrammed by predicted length (is it 1-2-frame noise or real mass?)
* missed    — true pause >= 2 frames predicted < 2; histogrammed by true
  length (are we losing short pauses or long ones?)
* matched   — both on; signed length error distribution.
* boundary residuals of pause-adjacent vs pause-free token edges.

Usage: python scripts/pause_error_diag.py --steps 3000 --seed 0 [--hard]
       [--backend cpu]
"""
from __future__ import annotations

import argparse
import collections
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hard", action="store_true")
    ap.add_argument("--backend", default=None,
                    help="force a jax backend (e.g. cpu) for previews")
    ap.add_argument("--pause-prob", type=float, default=0.4)
    ap.add_argument("--enter-cost", type=float, default=0.0,
                    help="pause entry cost passed to OTAConfig "
                         "(pause_enter_cost; 0 = current behaviour)")
    ap.add_argument("--silence-anchor", type=float, default=0.0,
                    help="pause-key silence-anchor aux weight")
    ap.add_argument("--bin-start", type=int, default=None,
                    help="binarisation CE start step (default steps//6)")
    ap.add_argument("--bin-ramp", type=int, default=None,
                    help="binarisation CE ramp length (default steps//3)")
    ap.add_argument("--anneal", type=int, default=None,
                    help="pause-bias curriculum length (default steps//2)")
    args = ap.parse_args()

    if args.backend:
        import jax
        jax.config.update("jax_platforms", args.backend)
    import jax.numpy as jnp

    from aligner_tpu.data import SyntheticConfig, bucket_batches, make_corpus
    from aligner_tpu.models import OTAAligner, OTAConfig
    from aligner_tpu.train.loop import train_aligner
    from aligner_tpu.utils.eval import pause_detection, token_boundary_f1

    synth_kw = dict(coarticulation=0.3, proto_overlap=0.5,
                    gain_var=0.3) if args.hard else {}
    cfg = SyntheticConfig(seed=args.seed, max_tokens=16, max_duration=7,
                          pause_prob=args.pause_prob, **synth_kw)
    corpus = make_corpus(64, cfg)
    batches = list(bucket_batches(corpus, 16, shuffle_seed=args.seed))

    extra_cfg = {}
    if args.enter_cost:
        extra_cfg["pause_enter_cost"] = args.enter_cost
    if args.silence_anchor:
        extra_cfg["pause_silence_anchor"] = args.silence_anchor
    model = OTAAligner(OTAConfig(
        vocab_size=cfg.vocab_size, n_mels=cfg.n_mels, dim=96, hidden=128,
        temperature=0.15, model_pauses=True, use_recon=True,
        pause_prior="bridge", **extra_cfg))

    anneal = args.anneal or args.steps // 2

    def apply_extra(step_no):
        frac = jnp.clip(step_no / max(anneal, 1), 0.0, 1.0)
        return {"pause_bias": -3.0 * (1.0 - frac)}

    state, _ = train_aligner(model, batches, steps=args.steps,
                             learning_rate=3e-4,
                             bin_start=args.bin_start or args.steps // 6,
                             bin_ramp=args.bin_ramp or args.steps // 3,
                             log_fn=lambda s: None, seed=args.seed,
                             apply_extra=apply_extra)

    spurious = collections.Counter()   # predicted length of false pauses
    missed = collections.Counter()     # true length of missed pauses
    swaps = []                         # missed pause w/ spurious neighbour
    matched_err = []                   # signed pred - true length
    edge_err_pause = []                # |boundary error| near true pauses
    edge_err_free = []
    f1s, pauses = [], []

    def match_item(tokens, t_x):
        for item in corpus:
            if len(item["tokens"]) == t_x and \
                    (item["tokens"] == tokens[:t_x]).all():
                return item
        return None

    for b in batches[:2]:
        bj = {k: jnp.asarray(v) for k, v in b.items()}
        out = model.apply({"params": state.params}, bj["tokens"],
                          bj["mel"], bj["text_lengths"],
                          bj["mel_lengths"])
        for i in range(bj["tokens"].shape[0]):
            item = match_item(np.asarray(bj["tokens"][i]),
                              int(bj["text_lengths"][i]))
            if item is None:
                continue
            t_xi = len(item["tokens"])
            pd = np.asarray(out["durations"][i])[:t_xi]
            pp = np.asarray(out["pause_durations"][i])[:t_xi + 1]
            tp = np.asarray(item["pause_durations"])
            f1s.append(token_boundary_f1(
                pd, item["durations"], pred_pauses=pp, true_pauses=tp,
                tolerance_frames=2)["f1"])
            pauses.append(pause_detection(pp, tp))
            for g in range(t_xi + 1):
                t_on, p_on = tp[g] >= 2, pp[g] >= 2
                if p_on and not t_on:
                    spurious[int(pp[g])] += 1
                elif t_on and not p_on:
                    missed[int(tp[g])] += 1
                    # swap hypothesis: was the mass moved one gap over?
                    neigh = [h for h in (g - 1, g + 1)
                             if 0 <= h <= t_xi and pp[h] >= 2
                             and tp[h] < 2]
                    if neigh:
                        swaps.append({
                            "true_len": int(tp[g]),
                            "pred_neighbor_len": int(pp[neigh[0]]),
                            "gap": g, "t_x": t_xi,
                            "tok_between": int(
                                item["durations"][min(g, neigh[0])]),
                        })
                elif t_on and p_on:
                    matched_err.append(int(pp[g]) - int(tp[g]))
            # boundary residuals: token start edges split by adjacency
            # to a true pause
            from aligner_tpu.utils.eval import token_spans
            ps = token_spans(pd, pp)
            ts_ = token_spans(item["durations"], tp)
            for j in range(t_xi):
                err_s = abs(int(ps[j, 0]) - int(ts_[j, 0]))
                err_e = abs(int(ps[j, 1]) - int(ts_[j, 1]))
                (edge_err_pause if tp[j] >= 2 else edge_err_free) \
                    .append(err_s)
                (edge_err_pause if tp[j + 1] >= 2 else edge_err_free) \
                    .append(err_e)

    me = np.asarray(matched_err) if matched_err else np.zeros(0)
    rec = {
        "steps": args.steps, "seed": args.seed, "hard": args.hard,
        "enter_cost": args.enter_cost,
        "silence_anchor": args.silence_anchor,
        "bin_start": args.bin_start, "bin_ramp": args.bin_ramp,
        "anneal": args.anneal,
        "token_boundary_f1_tol2": round(float(np.mean(f1s)), 3),
        "pause_precision": round(float(np.mean(
            [p["precision"] for p in pauses])), 3),
        "pause_recall": round(float(np.mean(
            [p["recall"] for p in pauses if p["n_true"]])), 3),
        "spurious_by_pred_len": dict(sorted(spurious.items())),
        "missed_by_true_len": dict(sorted(missed.items())),
        "swaps": swaps,
        "n_swaps": len(swaps),
        "matched_n": int(me.size),
        "matched_len_err_mean": round(float(me.mean()), 3) if me.size else 0,
        "matched_len_err_abs_mean": round(float(np.abs(me).mean()), 3)
        if me.size else 0,
        "edge_abs_err_pause_adjacent": round(float(np.mean(edge_err_pause)), 3)
        if edge_err_pause else 0,
        "edge_abs_err_pause_free": round(float(np.mean(edge_err_free)), 3)
        if edge_err_free else 0,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
