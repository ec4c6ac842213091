"""Command-line interface: demo training runs and the MAS micro-bench.

    python -m aligner_tpu demo-ota   [--steps N] [--batch-size B] ...
    python -m aligner_tpu demo-mobo  [--steps N] [--max-duration D] ...
    python -m aligner_tpu bench-mas  [--batch B --t-text X --t-mel Y]

The demos train on the synthetic corpus (known ground-truth durations) and
report duration accuracy at the end — an end-to-end smoke of the full
framework on whatever backend JAX selects (TPU when available).
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def _common(p):
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--utterances", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--init-seed", type=int, default=None,
                   help="training init/shuffle seed (default: --seed); "
                        "decouples optimisation variance from the "
                        "corpus draw")
    # hard-corpus knobs (see data.SyntheticConfig): coarticulated
    # boundaries, confusable prototype families, speaker gain/offset
    p.add_argument("--hard", action="store_true",
                   help="hard-corpus preset (coarticulation 0.3, "
                        "proto-overlap 0.5, gain-var 0.3)")
    p.add_argument("--coarticulation", type=float, default=None)
    p.add_argument("--proto-overlap", type=float, default=None)
    p.add_argument("--gain-var", type=float, default=None)
    p.add_argument("--max-tokens", type=int, default=None,
                   help="override the demo's max tokens per utterance "
                        "(longer utterances)")


def _recon_mse(soft_alignment, protos, b, n_mels, feasible=None):
    """Per-frame mel reconstruction MSE through alignment posteriors —
    the auxiliary that pins boundaries in the MoBo-family demos
    (marginal NLLs alone only shape energies; docs/design.md).
    `feasible` ([B] bool) gates items whose posteriors are sentinels
    (RoMo: no boundary sequence fits the refinement window)."""
    import jax.numpy as jnp
    T_y = b["mel"].shape[1]
    recon = jnp.einsum("byx,bxd->byd", soft_alignment,
                       protos[b["tokens"]])
    m = (jnp.arange(T_y)[None, :, None]
         < b["mel_lengths"][:, None, None])
    if feasible is not None:
        m = m & feasible[:, None, None]
    return (jnp.sum(jnp.where(m, (recon - b["mel"]) ** 2, 0.0))
            / jnp.maximum(m.sum(), 1) / n_mels)


def _init_seed(args):
    return args.seed if args.init_seed is None else args.init_seed


def _synth_kwargs(args):
    kw = {}
    if getattr(args, "hard", False):
        kw.update(coarticulation=0.3, proto_overlap=0.5, gain_var=0.3)
    for name in ("coarticulation", "proto_overlap", "gain_var"):
        v = getattr(args, name, None)
        if v is not None:
            kw[name] = v
    return kw


def build_parser():
    ap = argparse.ArgumentParser("aligner_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("demo-ota", help="train the OTA aligner on the "
                                        "synthetic corpus")
    _common(p)
    # 0.15 + --recon + ~2000 steps is the measured headline recipe
    # (boundary F1@2 = 0.992, docs/PERF.md); 0.05 was round-1's default
    # and leaves ~2 frames of boundary blur.
    p.add_argument("--temperature", type=float, default=0.15)
    p.add_argument("--recon", action="store_true",
                   help="enable the per-frame reconstruction auxiliary")
    p = sub.add_parser("demo-mobo", help="train the MoBo aligner "
                                         "(reconstruction objective)")
    _common(p)
    p.add_argument("--max-duration", type=int, default=10)
    p = sub.add_parser(
        "demo-romo",
        help="train the RoMo aligner (rough OTA anchors + windowed MoBo "
             "refinement) and report rough vs refined duration quality")
    _common(p)
    p.add_argument("--max-duration", type=int, default=10)
    p.add_argument("--window", type=int, default=8,
                   help="refinement half-window around the rough anchors")
    p = sub.add_parser(
        "demo-pauses",
        help="implicit pause modeling on a silence-bearing corpus: "
             "train the pause-aware OTA aligner vs the pause-blind one "
             "and compare boundary/pause metrics")
    _common(p)
    # 0.15 + bridge prior + the -3 -> 0 pause-bias curriculum at ~2000
    # steps is the measured headline recipe (F1@2 0.93-0.94 across
    # seeds, docs/PERF.md); the curriculum is also what makes the
    # result seed-robust (docs/design.md).
    p.add_argument("--temperature", type=float, default=0.15)
    p.add_argument("--pause-prob", type=float, default=0.4)
    p.add_argument("--skip-blind", action="store_true",
                   help="train only the pause-aware model")
    p.add_argument("--pause-prior", choices=("bridge", "inherit"),
                   default="bridge",
                   help="pause-state prior shape (see OTAConfig)")
    p.add_argument("--pause-bias", type=float, default=0.0,
                   help="per-frame pause occupancy cost (log-odds; "
                        "negative discourages pauses)")
    p.add_argument("--pause-bias-start", type=float, default=-3.0,
                   help="curriculum: initial pause bias, annealed "
                        "linearly to --pause-bias over "
                        "--pause-bias-anneal steps. Strongly negative "
                        "starts let tokens claim their frames before "
                        "pauses compete (the measured seed-robustness "
                        "fix); set equal to --pause-bias to disable "
                        "the curriculum")
    p.add_argument("--pause-bias-anneal", type=int, default=None,
                   help="curriculum length in steps (default: "
                        "steps // 2)")
    p.add_argument("--bin-start", type=int, default=None,
                   help="binarisation CE start step (default steps//6; "
                        "hard corpora measurably prefer ~steps//2 — the "
                        "late-binarisation recipe, docs/design.md "
                        "'placement swaps')")
    p.add_argument("--bin-ramp", type=int, default=None,
                   help="binarisation CE ramp length (default steps//3)")
    p.add_argument("--pause-enter-cost", type=float, default=0.0,
                   help="log-cost per pause entered (pause-count "
                        "prior; measured to collapse pause usage as a "
                        "training lever — prefer it at serving time, "
                        "see SkipBatchAligner)")
    p = sub.add_parser("bench-mas", help="single-chip MAS micro-benchmark")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--t-text", type=int, default=128)
    p.add_argument("--t-mel", type=int, default=1024)

    p = sub.add_parser("train", help="train an aligner on a wav "
                                     "corpus (metadata.csv + wavs/)")
    p.add_argument("corpus", help="corpus root directory")
    p.add_argument("--model", choices=("ota", "mobo", "romo"),
                   default="ota",
                   help="alignment model family: 'ota' (forward-sum + "
                        "MAS binarisation; the default), 'mobo' "
                        "(monotonic boundary search under the "
                        "max-duration constraint, reference "
                        "README.md:9-13), 'romo' (rough OTA anchors + "
                        "windowed MoBo refinement, README.md:15-19). "
                        "Recorded in config.json; `align` decodes "
                        "whichever family the checkpoint holds")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--limit", type=int, default=None,
                   help="max utterances to load")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--dim", type=int, default=192)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.05)
    p.add_argument("--max-duration", type=int, default=32,
                   help="MoBo/RoMo boundary-search window D in frames "
                        "(the reference's stated max-duration "
                        "constraint); ignored for --model ota")
    p.add_argument("--window", type=int, default=16,
                   help="RoMo refinement half-window around the rough "
                        "anchors; ignored for other models")
    p.add_argument("--compute-dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="encoder/energy matmul precision (OTA only). "
                        "bfloat16 runs the encoders and the pairwise "
                        "energy product at MXU bf16 rate (measured -15%% "
                        "on the config-5 step, docs/design.md); the "
                        "losses and DP lattices always stay float32. "
                        "Persisted in config.json")
    p.add_argument("--tokenizer", choices=("char", "phone"),
                   default="char",
                   help="'phone' treats transcripts as space-separated "
                        "symbol sequences (ARPAbet/IPA phone corpora) "
                        "with a corpus-derived vocabulary persisted in "
                        "config.json; 'char' (default) aligns raw "
                        "characters")
    p.add_argument("--mel-hop", type=int, default=None,
                   help="mel hop length in samples (default 256 = "
                        "11.6 ms at 22.05 kHz). Smaller hops raise the "
                        "boundary resolution at proportional frame-count "
                        "cost. Persisted in config.json; `align` reuses "
                        "it")
    p.add_argument("--mel-win", type=int, default=None,
                   help="mel analysis window (= n_fft) in samples "
                        "(default 1024). The window, not the hop, sets "
                        "how far boundary evidence smears (±win/hop/2 "
                        "frames). Persisted in config.json")
    p.add_argument("--no-mel-center", action="store_true",
                   help="left-align analysis windows instead of "
                        "centering (kills the +1 center-padding "
                        "fencepost frame at the cost of a half-window "
                        "timing offset). Persisted in config.json")
    p.add_argument("--recon", action="store_true",
                   help="enable the per-frame reconstruction auxiliary "
                        "(the measured flagship recipe pairs it with "
                        "--temperature 0.15)")
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--lr-schedule", choices=("constant", "cosine"),
                   default="constant")
    p.add_argument("--grad-clip", type=float, default=None,
                   help="clip gradients by global norm")
    p.add_argument("--eval-split", type=float, default=0.0,
                   help="fraction of batches held out for validation "
                        "(logged as val_* metrics)")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest checkpoint in "
                        "--checkpoint-dir (same model/optimizer flags "
                        "required)")
    p.add_argument("--seed", type=int, default=0,
                   help="init PRNG + batch-shuffle seed (recorded in "
                        "config.json)")
    p.add_argument("--bin-start", type=int, default=None,
                   help="binarisation CE start step (default steps//6). "
                        "Corpora with smeared boundaries — coarticulated "
                        "speech, wide STFT windows — measurably prefer "
                        "~steps//2 (docs/design.md 'placement swaps')")
    p.add_argument("--bin-ramp", type=int, default=None,
                   help="binarisation CE ramp length (default steps//3)")
    p.add_argument("--model-pauses", action="store_true",
                   help="train the pause-aware aligner: silences in the "
                        "audio are absorbed by implicit pause states "
                        "between tokens instead of being smeared into "
                        "neighbouring token durations (the reference OTA "
                        "branch's goal). Enables the reconstruction "
                        "auxiliary (required — the forward-sum alone "
                        "leaves optional states collapsed) and the "
                        "pause-bias curriculum; `align` then also emits "
                        "per-gap pause durations")
    p.add_argument("--pause-prior", choices=("bridge", "inherit"),
                   default="bridge",
                   help="pause-state prior shape (see OTAConfig)")
    p.add_argument("--pause-bias", type=float, default=0.0,
                   help="final per-frame pause occupancy cost (log-odds)")
    p.add_argument("--pause-bias-start", type=float, default=-3.0,
                   help="curriculum start value for the pause bias (set "
                        "equal to --pause-bias to disable the "
                        "curriculum; see demo-pauses)")
    p.add_argument("--pause-bias-anneal", type=int, default=None,
                   help="curriculum length in steps (default steps//2)")
    p.add_argument("--pause-enter-cost", type=float, default=0.0,
                   help="log-cost per pause entered (serving-time "
                        "precision knob; see docs/design.md)")

    p = sub.add_parser("align", help="emit durations for a wav corpus "
                                     "using a trained checkpoint")
    p.add_argument("corpus", help="corpus root directory")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--output", default="durations.jsonl")
    p.add_argument("--textgrid-dir", default=None,
                   help="also write one Praat TextGrid per utterance")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--step", type=int, default=None,
                   help="decode from this checkpoint step instead of "
                        "the latest (the periodic saves every "
                        "--checkpoint-every steps remain on disk — "
                        "useful for picking a model family's "
                        "convergence sweet spot post hoc)")
    # Model shape comes from the checkpoint's config.json (written at
    # train time); explicit flags are only needed for pre-config
    # checkpoints, and conflicting with config.json is an error.
    p.add_argument("--dim", type=int, default=None)
    p.add_argument("--hidden", type=int, default=None)
    p.add_argument("--temperature", type=float, default=None)
    # Decode-time pause knobs (pause-aware checkpoints only). These are
    # static lattice costs, not parameters: overriding them at align
    # time re-runs the skip DP under a different precision/recall
    # trade-off with the same weights — the measured place to apply
    # them (docs/design.md "decode-time levers"; training-time
    # enter-cost collapses pause usage instead).
    p.add_argument("--pause-enter-cost", type=float, default=None,
                   help="override the per-pause-entered log-cost for "
                        "this decode — a measured recall/boundary-F1 "
                        "trade-off on wav checkpoints (positive values "
                        "find more true pauses and shorten lengths at "
                        "a boundary-F1 cost; negative drops marginal "
                        "pauses; a no-op at posterior-saturated "
                        "synthetic checkpoints — design.md 'enter-cost "
                        "knob on real audio'; the checkpoint's trained "
                        "value is the default)")
    p.add_argument("--pause-bias", type=float, default=None,
                   help="override the per-frame pause occupancy "
                        "log-odds for this decode (negative shortens "
                        "pauses; the checkpoint's value is the default)")
    return ap


def _corpus_batches(args, max_tokens=24, max_dur=7):
    from .data import SyntheticConfig, bucket_batches, make_corpus
    cfg = SyntheticConfig(seed=args.seed,
                          max_tokens=args.max_tokens or max_tokens,
                          max_duration=max_dur, **_synth_kwargs(args))
    corpus = make_corpus(args.utterances, cfg)
    batches = list(bucket_batches(corpus, args.batch_size,
                                  shuffle_seed=args.seed))
    return cfg, corpus, batches


def cmd_demo_ota(args):
    import jax.numpy as jnp

    from .data import duration_accuracy
    from .models import OTAAligner, OTAConfig
    from .train.loop import train_aligner

    cfg, corpus, batches = _corpus_batches(args)
    model = OTAAligner(OTAConfig(vocab_size=cfg.vocab_size, dim=96,
                                 hidden=128, temperature=args.temperature,
                                 use_recon=args.recon))
    state, _ = train_aligner(model, batches, steps=args.steps,
                             learning_rate=args.lr, bin_start=args.steps // 6,
                             bin_ramp=args.steps // 3,
                             checkpoint_dir=args.checkpoint_dir,
                             seed=_init_seed(args))
    # evaluate duration accuracy on the first batch's items
    b = {k: jnp.asarray(v) for k, v in batches[0].items()}
    out = model.apply({"params": state.params}, b["tokens"], b["mel"],
                      b["text_lengths"], b["mel_lengths"])
    accs = []
    for i in range(min(8, b["tokens"].shape[0])):
        item = _match_item(corpus, np.asarray(b["tokens"][i]),
                           int(b["text_lengths"][i]))
        if item is not None:
            from .utils.eval import boundary_f1
            t_xi = len(item["tokens"])
            rec = duration_accuracy(np.asarray(out["durations"][i]), item)
            rec["f1"] = boundary_f1(
                np.asarray(out["durations"][i])[:t_xi],
                item["durations"], tolerance_frames=2)["f1"]
            accs.append(rec)
    if accs:
        print(json.dumps({
            "demo": "ota",
            "duration_exact": round(float(np.mean([a["exact"] for a in accs])), 3),
            "duration_mae": round(float(np.mean([a["mae"] for a in accs])), 3),
            "boundary_f1_tol2": round(float(np.mean([a["f1"] for a in accs])), 3),
        }))


def cmd_demo_pauses(args):
    """The reference OTA branch's raison d'être, demonstrated: on
    utterances with un-transcribed silences, the skip-state model
    recovers token boundaries and pause slots that a pause-blind
    aligner must absorb into neighbouring tokens."""
    import jax.numpy as jnp

    from .data import SyntheticConfig, bucket_batches, make_corpus
    from .models import OTAAligner, OTAConfig
    from .train.loop import train_aligner
    from .utils.eval import pause_detection, token_boundary_f1

    cfg = SyntheticConfig(seed=args.seed,
                          max_tokens=args.max_tokens or 16,
                          max_duration=7, pause_prob=args.pause_prob,
                          **_synth_kwargs(args))
    corpus = make_corpus(args.utterances, cfg)
    batches = list(bucket_batches(corpus, args.batch_size,
                                  shuffle_seed=args.seed))

    def train_and_eval(model_pauses: bool):
        # use_recon anchors silence frames to the pause state (the pause
        # key decodes to the silence spectrum; token keys can't) — the
        # forward-sum alone leaves optional states in a collapsed local
        # optimum. Enabled for both models for a fair comparison.
        model = OTAAligner(OTAConfig(
            vocab_size=cfg.vocab_size, n_mels=cfg.n_mels, dim=96,
            hidden=128, temperature=args.temperature,
            model_pauses=model_pauses, use_recon=True,
            pause_prior=args.pause_prior, pause_bias=args.pause_bias,
            pause_enter_cost=(args.pause_enter_cost if model_pauses
                              else 0.0)))
        apply_extra = None
        if model_pauses and args.pause_bias_start is not None \
                and args.pause_bias_start != args.pause_bias:
            # Curriculum: anneal the pause occupancy cost from a
            # strongly discouraging start to the configured final value,
            # so tokens claim their frames before pauses compete (the
            # early MAS path otherwise locks spurious pauses in through
            # the binarisation CE on unlucky inits).
            anneal = args.pause_bias_anneal or args.steps // 2
            start, final = args.pause_bias_start, args.pause_bias

            def apply_extra(step_no):
                frac = jnp.clip(step_no / max(anneal, 1), 0.0, 1.0)
                return {"pause_bias": start + (final - start) * frac}
        state, _ = train_aligner(
            model, batches, steps=args.steps, learning_rate=args.lr,
            bin_start=args.bin_start or args.steps // 6,
            bin_ramp=args.bin_ramp or args.steps // 3,
            log_fn=lambda s: None, seed=_init_seed(args),
            apply_extra=apply_extra)
        f1s, pauses = [], []
        for b in batches[:2]:
            bj = {k: jnp.asarray(v) for k, v in b.items()}
            out = model.apply({"params": state.params}, bj["tokens"],
                              bj["mel"], bj["text_lengths"],
                              bj["mel_lengths"])
            for i in range(bj["tokens"].shape[0]):
                item = _match_item(corpus, np.asarray(bj["tokens"][i]),
                                   int(bj["text_lengths"][i]))
                if item is None:
                    continue
                t_xi = len(item["tokens"])
                pd = np.asarray(out["durations"][i])[:t_xi]
                pp = (np.asarray(out["pause_durations"][i])[:t_xi + 1]
                      if model_pauses else None)
                f1s.append(token_boundary_f1(
                    pd, item["durations"], pred_pauses=pp,
                    true_pauses=item["pause_durations"],
                    tolerance_frames=2)["f1"])
                if model_pauses:
                    pauses.append(pause_detection(
                        pp, item["pause_durations"]))
        rec = {"token_boundary_f1_tol2": round(float(np.mean(f1s)), 3)}
        if pauses:
            rec["pause_precision"] = round(float(np.mean(
                [p["precision"] for p in pauses])), 3)
            with_true = [p for p in pauses if p["n_true"]]
            if with_true:  # else no evaluated item had a true pause:
                rec["pause_recall"] = round(float(np.mean(
                    [p["recall"] for p in with_true])), 3)
                rec["pause_length_mae"] = round(float(np.mean(
                    [p["length_mae"] for p in with_true])), 3)
        return rec

    result = {"demo": "pauses", "pause_prob": args.pause_prob,
              "steps": args.steps,
              "pause_aware": train_and_eval(True)}
    if not args.skip_blind:
        result["pause_blind"] = train_and_eval(False)
    print(json.dumps(result))


def _match_item(corpus, tokens, t_x):
    for item in corpus:
        if len(item["tokens"]) == t_x and \
                (item["tokens"] == tokens[:t_x]).all():
            return item
    return None


def cmd_demo_mobo(args):
    import jax
    import jax.numpy as jnp
    import optax

    from .data import (SyntheticConfig, duration_accuracy, make_corpus,
                       pad_batch, prototypes)
    from .models import MoBoAligner, MoBoConfig

    if args.max_duration < 3:
        raise SystemExit("--max-duration must be >= 3 (the synthetic "
                         "corpus draws durations in [2, max_duration-1])")
    cfg = SyntheticConfig(seed=args.seed,
                          max_tokens=args.max_tokens or 16,
                          max_duration=min(7, args.max_duration - 1),
                          **_synth_kwargs(args))
    corpus = make_corpus(args.batch_size, cfg)
    batch = pad_batch(corpus)
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    protos = jnp.asarray(prototypes(cfg))

    model = MoBoAligner(MoBoConfig(vocab_size=cfg.vocab_size, dim=64,
                                   hidden=96,
                                   max_duration=args.max_duration))
    params = model.init(jax.random.PRNGKey(_init_seed(args)), b["tokens"],
                        b["mel"], b["text_lengths"],
                        b["mel_lengths"])["params"]
    tx = optax.adam(args.lr * 3)
    opt = tx.init(params)

    @jax.jit
    def train1(params, opt):
        def loss_fn(p):
            out = model.apply({"params": p}, b["tokens"], b["mel"],
                              b["text_lengths"], b["mel_lengths"],
                              compute_hard=False)
            rec = _recon_mse(out["soft_alignment"], protos, b,
                             cfg.n_mels)
            return rec + 0.1 * out["loss_mobo"]
        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), opt, l

    for i in range(args.steps):
        params, opt, l = train1(params, opt)
        if i % 100 == 0:
            print(f"step {i:5d}  recon+nll {float(l):.4f}")
    out = model.apply({"params": params}, b["tokens"], b["mel"],
                      b["text_lengths"], b["mel_lengths"])
    from .utils.eval import boundary_f1
    accs = []
    for i in range(len(corpus)):
        t_xi = len(corpus[i]["tokens"])
        rec = duration_accuracy(np.asarray(out["hard_durations"][i]),
                                corpus[i])
        rec["f1"] = boundary_f1(
            np.asarray(out["hard_durations"][i])[:t_xi],
            corpus[i]["durations"], tolerance_frames=2)["f1"]
        accs.append(rec)
    print(json.dumps({
        "demo": "mobo",
        "duration_exact": round(float(np.mean([a["exact"] for a in accs])), 3),
        "duration_mae": round(float(np.mean([a["mae"] for a in accs])), 3),
        "boundary_f1_tol2": round(float(np.mean([a["f1"] for a in accs])), 3),
    }))


def cmd_demo_romo(args):
    """RoMoAligner end to end: the rough OTA stage learns soft
    posteriors whose expected durations anchor the windowed MoBo
    refinement (reference README.md:15-19); reports both stages'
    duration quality so the refinement's contribution is visible."""
    import jax
    import jax.numpy as jnp
    import optax

    from .data import (SyntheticConfig, duration_accuracy, make_corpus,
                       pad_batch, prototypes)
    from .models import RoMoAligner, RoMoConfig
    from .utils.eval import boundary_f1

    if args.max_duration < 3:
        raise SystemExit("--max-duration must be >= 3 (the synthetic "
                         "corpus draws durations in [2, max_duration-1])")
    cfg = SyntheticConfig(seed=args.seed,
                          max_tokens=args.max_tokens or 16,
                          max_duration=min(7, args.max_duration - 1),
                          **_synth_kwargs(args))
    corpus = make_corpus(args.batch_size, cfg)
    batch = pad_batch(corpus)
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    protos = jnp.asarray(prototypes(cfg))

    model = RoMoAligner(RoMoConfig(
        vocab_size=cfg.vocab_size, n_mels=cfg.n_mels, dim=64, hidden=96,
        max_duration=args.max_duration, window=args.window))
    params = model.init(jax.random.PRNGKey(_init_seed(args)), b["tokens"],
                        b["mel"], b["text_lengths"],
                        b["mel_lengths"])["params"]
    tx = optax.adam(args.lr * 3)
    opt = tx.init(params)

    @jax.jit
    def train1(params, opt):
        def loss_fn(p):
            out = model.apply({"params": p}, b["tokens"], b["mel"],
                              b["text_lengths"], b["mel_lengths"],
                              compute_hard=False)
            # Reconstruction through the REFINEMENT posteriors (the same
            # objective that gives demo-mobo its quality): the marginal
            # NLLs alone only shape energies — within the anchor window
            # the refined boundaries are otherwise unpinned, and the
            # refined stage measured WORSE than its rough anchors
            # (F1 0.66-0.67 vs 0.89 at 600 steps) until this term.
            rec = _recon_mse(out["soft_alignment"], protos, b,
                             cfg.n_mels,
                             feasible=out["refine_feasible"])
            return rec + 0.1 * out["loss"]
        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), opt, l

    for i in range(args.steps):
        params, opt, l = train1(params, opt)
        if i % 100 == 0:
            print(f"step {i:5d}  recon+rough+refine {float(l):.4f}")
    out = model.apply({"params": params}, b["tokens"], b["mel"],
                      b["text_lengths"], b["mel_lengths"])

    def stage_metrics(durs, keep=None):
        """keep: optional [B] bool — items to include (the model
        documents hard_durations as meaningless when refine_feasible is
        False, so infeasible items must not pollute the refined row)."""
        accs = []
        for i in range(len(corpus)):
            if keep is not None and not bool(keep[i]):
                continue
            t_xi = len(corpus[i]["tokens"])
            d = np.asarray(durs[i])
            rec = duration_accuracy(np.rint(d).astype(int), corpus[i])
            rec["f1"] = boundary_f1(np.rint(d[:t_xi]).astype(int),
                                    corpus[i]["durations"],
                                    tolerance_frames=2)["f1"]
            accs.append(rec)
        if not accs:
            return None
        return {
            "duration_exact": round(float(np.mean([a["exact"]
                                                   for a in accs])), 3),
            "duration_mae": round(float(np.mean([a["mae"]
                                                 for a in accs])), 3),
            "boundary_f1_tol2": round(float(np.mean([a["f1"]
                                                     for a in accs])), 3),
        }

    feas = np.asarray(out["refine_feasible"])
    print(json.dumps({
        "demo": "romo",
        "refine_feasible": round(float(np.mean(feas)), 3),
        "rough": stage_metrics(out["rough_durations"]),
        "refined": stage_metrics(out["hard_durations"], keep=feas),
    }))


def cmd_bench_mas(args):
    import importlib.util
    import os as _os

    # bench.py lives at the repo root (the driver contract), not in the
    # installed package; load it by path so the subcommand works from
    # any CWD as long as the checkout is importable.
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    path = _os.path.join(root, "bench.py")
    if not _os.path.exists(path):
        raise SystemExit("bench-mas requires the repo checkout "
                         f"(bench.py not found at {path})")
    spec = importlib.util.spec_from_file_location("bench", path)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.B, bench.T_X, bench.T_Y = args.batch, args.t_text, args.t_mel
    bench.main()


def _mel_config_from_args(args):
    """MelConfig for a `train` run from the --mel-* lever flags.

    Returns (mel_cfg, extra) where `extra` is the config.json payload —
    only non-default levers are recorded, so old checkpoints and
    default runs keep a `mel`-free config.json."""
    from .ops.mel import MelConfig

    overrides = {}
    if getattr(args, "mel_hop", None) is not None:
        overrides["hop_length"] = args.mel_hop
    if getattr(args, "mel_win", None) is not None:
        overrides["n_fft"] = args.mel_win
        overrides["win_length"] = args.mel_win
    if getattr(args, "no_mel_center", False):
        overrides["center"] = False
    cfg = MelConfig(**overrides)
    return cfg, ({"mel": overrides} if overrides else {})


def _mel_config_from_record(rec):
    """MelConfig for `align` from a checkpoint's config.json. Pre-lever
    checkpoints (no `mel` key) back-fill the defaults they trained
    with."""
    from .ops.mel import MelConfig

    if rec is None:
        return MelConfig()
    return MelConfig(**rec.get("mel", {}))


def _make_tokenizer(args):
    """Tokenizer for a file-corpus run. `--tokenizer phone` derives the
    vocabulary from the corpus rows that will actually be loaded (wav
    present, within --limit) — space-separated symbols, the convention
    of phone-level TTS corpora — and persists it in config.json so
    `align` reconstructs the exact id mapping.

    On `--resume`, an existing config.json's vocabulary wins: the
    restored embedding rows are only meaningful under the original id
    mapping, so re-deriving from a (possibly changed) corpus would
    silently re-map symbols even when the vocab *size* happens to
    match. Out-of-vocab symbols in the current corpus are a loud error.
    """
    import os as _os

    from .data import CharTokenizer, PhoneTokenizer

    if getattr(args, "tokenizer", "char") != "phone":
        return CharTokenizer()
    from .data.files import load_metadata

    def corpus_texts():
        # Mirror load_corpus's row filter (wav exists, --limit) so the
        # vocabulary covers exactly the trained rows — symbols living
        # only in skipped rows would otherwise get never-trained
        # embedding rows.
        limit = getattr(args, "limit", None)
        n = 0
        for utt_id, text in load_metadata(args.corpus):
            if limit is not None and n >= limit:
                return
            if not _os.path.exists(_os.path.join(
                    args.corpus, "wavs", f"{utt_id}.wav")):
                continue
            yield text
            n += 1

    if getattr(args, "resume", False) and \
            getattr(args, "checkpoint_dir", None):
        from .train.checkpoint import load_run_config
        rec = load_run_config(args.checkpoint_dir)
        if rec is not None and rec.get("tokenizer_vocab") is not None:
            tok = PhoneTokenizer(phones=tuple(rec["tokenizer_vocab"]))
            unknown = sorted(
                {p for t in corpus_texts() for p in t.split()}
                - set(tok.phones))
            if unknown:
                raise SystemExit(
                    "--resume: corpus contains symbols outside the "
                    "checkpoint's vocabulary "
                    f"({', '.join(unknown[:10])}"
                    f"{', ...' if len(unknown) > 10 else ''}); the "
                    "embedding ids are fixed at first training — "
                    "retrain from scratch for a new vocabulary")
            return tok
    tok = PhoneTokenizer.from_corpus(corpus_texts())
    if not tok.phones:
        raise SystemExit("--tokenizer phone: corpus metadata has no "
                         "symbols to build a vocabulary from")
    return tok


def _file_model(args):
    """Build the model family selected by `train --model` (plus its
    tokenizer). MoBo/RoMo always train with the learned reconstruction
    decoder — the demo-measured requirement: their marginal NLLs alone
    only shape energies and leave boundaries unpinned (cmd_demo_mobo /
    cmd_demo_romo docstrings)."""
    from .models import (MoBoAligner, MoBoConfig, OTAAligner, OTAConfig,
                         RoMoAligner, RoMoConfig)

    tok = _make_tokenizer(args)
    family = getattr(args, "model", "ota")
    model_pauses = getattr(args, "model_pauses", False)
    if family != "ota":
        if model_pauses:
            raise SystemExit("--model-pauses is an OTA capability "
                             "(skip-state DP); drop it or use "
                             "--model ota")
        if getattr(args, "compute_dtype", "float32") != "float32":
            raise SystemExit("--compute-dtype is currently wired for "
                             "--model ota only")
    if family == "mobo":
        return tok, MoBoAligner(MoBoConfig(
            vocab_size=tok.vocab_size, dim=args.dim, hidden=args.hidden,
            max_duration=args.max_duration, use_recon=True))
    if family == "romo":
        return tok, RoMoAligner(RoMoConfig(
            vocab_size=tok.vocab_size, dim=args.dim, hidden=args.hidden,
            temperature=args.temperature,
            max_duration=args.max_duration, window=args.window,
            use_recon=True))
    use_recon = getattr(args, "recon", False)
    if model_pauses and not use_recon:
        # The pause key only learns the silence spectrum through the
        # reconstruction auxiliary; without it the optional states
        # collapse (measured — see demo-pauses / docs/design.md).
        print("note: --model-pauses enables --recon")
        use_recon = True
    model = OTAAligner(OTAConfig(
        vocab_size=tok.vocab_size, dim=args.dim, hidden=args.hidden,
        temperature=args.temperature, use_recon=use_recon,
        model_pauses=model_pauses,
        pause_prior=getattr(args, "pause_prior", "bridge"),
        pause_bias=getattr(args, "pause_bias", 0.0),
        pause_enter_cost=getattr(args, "pause_enter_cost", 0.0),
        compute_dtype=getattr(args, "compute_dtype", "float32")))
    return tok, model


def _decode_pause_overrides(args, cfg):
    """Overlay align's decode-time pause knobs on the checkpoint config.

    `pause_enter_cost`/`pause_bias` are static costs in the skip-DP
    lattice, not trained parameters, so overriding them at decode time
    is well-defined: same weights, different pause precision/recall
    operating point (see docs/design.md "decode-time levers")."""
    import dataclasses as _dc
    knobs = {k: getattr(args, k) for k in ("pause_enter_cost",
                                           "pause_bias")
             if getattr(args, k, None) is not None}
    if not knobs:
        return cfg
    if not cfg.model_pauses:
        names = "/".join("--" + k.replace("_", "-") for k in knobs)
        raise SystemExit(
            f"{names} requires a checkpoint trained with "
            "--model-pauses (this one has no pause states to decode)")
    return _dc.replace(cfg, **knobs)


def _model_from_checkpoint(args):
    """Rebuild the trained model from the checkpoint's config.json.

    Explicit --dim/--hidden/--temperature flags must match config.json
    when both are given (loud error on mismatch); for pre-config
    checkpoints (no config.json) they are required."""
    from .data import CharTokenizer
    from .models import OTAAligner, OTAConfig
    from .train.checkpoint import load_run_config

    rec = load_run_config(args.checkpoint_dir)
    overrides = {k: getattr(args, k) for k in
                 ("dim", "hidden", "temperature")
                 if getattr(args, k) is not None}
    if rec is None:
        missing = [k for k in ("dim", "hidden", "temperature")
                   if getattr(args, k) is None]
        if missing:
            raise SystemExit(
                f"{args.checkpoint_dir} has no config.json (pre-config "
                f"checkpoint); pass --{' --'.join(missing)} matching the "
                "training run")
        tok = CharTokenizer()
        return tok, OTAAligner(_decode_pause_overrides(args, OTAConfig(
            vocab_size=tok.vocab_size, dim=args.dim, hidden=args.hidden,
            temperature=args.temperature)))
    cfg_dict = rec["model_config"]
    conflicts = {k: (v, cfg_dict.get(k)) for k, v in overrides.items()
                 if cfg_dict.get(k) != v}
    if conflicts:
        detail = ", ".join(f"--{k}={v} vs config.json {c}"
                           for k, (v, c) in conflicts.items())
        raise SystemExit(
            f"flags conflict with the checkpoint's saved config "
            f"({detail}); drop the flags — the checkpoint is "
            "self-describing")
    family = rec.get("model_class", "OTA").removesuffix("Aligner")
    if family not in ("OTA", "MoBo", "RoMo"):
        raise SystemExit(
            f"checkpoint holds a {rec['model_class']} model; `align` "
            "drives the OTA/MoBo/RoMo aligners")
    if rec.get("tokenizer") == "PhoneTokenizer":
        from .data import PhoneTokenizer
        vocab = rec.get("tokenizer_vocab")
        if vocab is None:
            raise SystemExit(
                "checkpoint was trained with a PhoneTokenizer but its "
                "config.json records no tokenizer_vocab; retrain (the "
                "vocab is corpus-derived and cannot be reconstructed)")
        tok = PhoneTokenizer(phones=tuple(vocab))
    else:
        tok = CharTokenizer()
    if family == "MoBo":
        from .models import MoBoAligner, MoBoConfig
        cfg = MoBoConfig(**cfg_dict)
        model = MoBoAligner(cfg)
    elif family == "RoMo":
        from .models import RoMoAligner, RoMoConfig
        cfg = RoMoConfig(**cfg_dict)
        model = RoMoAligner(cfg)
    else:
        cfg = OTAConfig(**cfg_dict)
        model = OTAAligner(_decode_pause_overrides(args, cfg))
    if family != "OTA" and any(
            getattr(args, k, None) is not None
            for k in ("pause_enter_cost", "pause_bias")):
        raise SystemExit("--pause-enter-cost/--pause-bias require an "
                         "OTA checkpoint trained with --model-pauses")
    if cfg.vocab_size != tok.vocab_size:
        raise SystemExit(
            f"checkpoint vocab_size {cfg.vocab_size} does not match the "
            f"{type(tok).__name__} ({tok.vocab_size}); was it trained "
            "with a different tokenizer?")
    return tok, model


def cmd_train(args):
    import os as _os

    from .data import bucket_batches, load_corpus
    from .train.loop import train_aligner

    if not _os.path.exists(_os.path.join(args.corpus, "metadata.csv")):
        raise SystemExit(f"no metadata.csv under {args.corpus}")
    tok, model = _file_model(args)
    mel_cfg, mel_extra = _mel_config_from_args(args)
    items = list(load_corpus(args.corpus, tokenizer=tok,
                             mel_config=mel_cfg, limit=args.limit))
    if not items:
        raise SystemExit(f"no usable utterances under {args.corpus}")
    print(f"loaded {len(items)} utterances")
    batches = list(bucket_batches(items, args.batch_size,
                                  shuffle_seed=args.seed))
    eval_batches = None
    if args.eval_split > 0 and len(batches) > 1:
        n_eval = max(1, int(round(args.eval_split * len(batches))))
        n_eval = min(n_eval, len(batches) - 1)
        eval_batches, batches = batches[:n_eval], batches[n_eval:]
        print(f"holding out {n_eval} batches for validation")
    apply_extra, objective = None, None
    if args.model == "mobo":
        # Demo-measured objective (cmd_demo_mobo): reconstruction pins
        # boundaries, the boundary NLL shapes energies. Hard Viterbi
        # decode is skipped during training (align-time only).
        def apply_extra(step_no):
            return {"compute_hard": False}

        def objective(out, step_no):
            loss = out["loss_recon"] + 0.1 * out["loss_mobo"]
            return loss, {"loss_mobo": out["loss_mobo"],
                          "loss_recon": out["loss_recon"]}
    elif args.model == "romo":
        import jax.numpy as jnp

        def apply_extra(step_no):
            return {"compute_hard": False}

        def objective(out, step_no):
            loss = out["loss_recon"] + 0.1 * out["loss"]
            return loss, {"loss_rough": out["loss_rough"],
                          "loss_refine": out["loss_refine"],
                          "loss_recon": out["loss_recon"],
                          "refine_feasible": jnp.mean(
                              out["refine_feasible"].astype(jnp.float32))}
    elif args.model_pauses and args.pause_bias_start != args.pause_bias:
        # Pause-bias curriculum (the measured seed-robustness recipe —
        # see demo-pauses): anneal the occupancy cost from a strongly
        # discouraging start so tokens claim their frames first.
        import jax.numpy as jnp
        anneal = args.pause_bias_anneal or args.steps // 2
        start, final = args.pause_bias_start, args.pause_bias

        def apply_extra(step_no):
            frac = jnp.clip(step_no / max(anneal, 1), 0.0, 1.0)
            return {"pause_bias": start + (final - start) * frac}

    train_aligner(model, batches, steps=args.steps,
                  learning_rate=args.lr,
                  bin_start=args.bin_start or args.steps // 6,
                  bin_ramp=args.bin_ramp or args.steps // 3,
                  checkpoint_dir=args.checkpoint_dir,
                  config_extra={"tokenizer": type(tok).__name__,
                                **({"tokenizer_vocab": list(tok.phones)}
                                   if hasattr(tok, "phones") else {}),
                                **mel_extra},
                  warmup_steps=args.warmup_steps,
                  lr_schedule=args.lr_schedule,
                  grad_clip_norm=args.grad_clip,
                  eval_batches=eval_batches,
                  resume=args.resume, seed=args.seed,
                  apply_extra=apply_extra, objective=objective)
    print(f"checkpoints in {args.checkpoint_dir}")


def cmd_align(args):
    import json as _json
    import os as _os

    import jax
    import jax.numpy as jnp

    from .data import bucket_batches, load_corpus
    from .train import restore_params

    if not _os.path.isdir(args.checkpoint_dir):
        raise SystemExit(f"checkpoint dir not found: {args.checkpoint_dir}")
    if not _os.path.exists(_os.path.join(args.corpus, "metadata.csv")):
        raise SystemExit(f"no metadata.csv under {args.corpus}")
    tok, model = _model_from_checkpoint(args)
    from .train.checkpoint import load_run_config
    mel_cfg = _mel_config_from_record(load_run_config(args.checkpoint_dir))
    items = list(load_corpus(args.corpus, tokenizer=tok,
                             mel_config=mel_cfg, limit=args.limit))
    if not items:
        raise SystemExit(f"no usable utterances under {args.corpus}")
    batches = list(bucket_batches(items, args.batch_size,
                                  with_items=True))
    first = {k: jnp.asarray(v) for k, v in batches[0][0].items()}
    # Params-only restore: align must not depend on the training run's
    # optimizer/schedule choice (their opt_state pytrees differ).
    params0 = model.init(jax.random.PRNGKey(0), first["tokens"],
                         first["mel"], first["text_lengths"],
                         first["mel_lengths"])["params"]
    params = restore_params(args.checkpoint_dir, params0,
                            step=getattr(args, "step", None))

    family = type(model.config).__name__.removesuffix("Config")
    with_pauses = family == "OTA" and model.config.model_pauses

    def _extract(p, b):
        out = model.apply({"params": p}, b["tokens"], b["mel"],
                          b["text_lengths"], b["mel_lengths"])
        if family == "OTA":
            return (out["durations"],
                    out["pause_durations"] if with_pauses else None)
        if family == "RoMo":
            # Refined Viterbi boundaries where the windowed search is
            # feasible; the rough stage's expected durations otherwise
            # (the model documents hard_durations as meaningless then).
            import jax.numpy as _jnp
            feas = out["refine_feasible"][:, None]
            durs = _jnp.where(feas, out["hard_durations"],
                              _jnp.round(out["rough_durations"]))
            return durs, None
        return out["hard_durations"], None

    apply_fn = jax.jit(_extract)
    if args.textgrid_dir:
        _os.makedirs(args.textgrid_dir, exist_ok=True)
    n = 0
    with open(args.output, "w") as f:
        for b, group in batches:
            bj = {k: jnp.asarray(v) for k, v in b.items()}
            durs, pauses = apply_fn(params, bj)
            import numpy as _np
            durs = _np.asarray(durs)
            pauses = None if pauses is None else _np.asarray(pauses)
            for i, item in enumerate(group):
                t_x = int(b["text_lengths"][i])
                d = durs[i, :t_x].astype(int).tolist()
                rec = {
                    "utt_id": item["utt_id"],
                    "durations": d,
                    "n_frames": int(b["mel_lengths"][i]),
                }
                pp = None
                if pauses is not None:
                    pp = pauses[i, :t_x + 1].astype(int).tolist()
                    rec["pauses"] = pp  # per-gap silence frames [t_x+1]
                f.write(_json.dumps(rec) + "\n")
                if args.textgrid_dir:
                    from .data.textgrid import write_textgrid
                    token_labels = tok.labels(item["text"])[:t_x]
                    tg_durs, tg_labels = d, token_labels
                    if pp is not None:
                        # Interleave non-empty pauses as unlabelled
                        # intervals (the Praat silence convention).
                        tg_durs, tg_labels = [], []
                        for g in range(t_x):
                            if pp[g] > 0:
                                tg_durs.append(pp[g])
                                tg_labels.append("")
                            tg_durs.append(d[g])
                            tg_labels.append(token_labels[g])
                        if pp[t_x] > 0:
                            tg_durs.append(pp[t_x])
                            tg_labels.append("")
                    write_textgrid(
                        _os.path.join(args.textgrid_dir,
                                      f"{item['utt_id']}.TextGrid"),
                        tg_durs, tg_labels,
                        mel_cfg.hop_length, mel_cfg.sample_rate)
                n += 1
    print(f"wrote {n} alignments to {args.output}")


def main(argv=None):
    # Backend override for CLI runs. The axon TPU plugin force-sets
    # jax_platforms at plugin-init, so the standard JAX_PLATFORMS env
    # var is silently ignored; this knob applies the override through
    # jax.config before any backend is initialised. Use case: CPU
    # previews of quality recipes while the TPU tunnel is saturated or
    # down (the metrics are device-agnostic f32 math — see CLAUDE.md).
    import os as _os
    platform = _os.environ.get("ALIGNER_TPU_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    args = build_parser().parse_args(argv)
    if args.cmd == "demo-ota":
        cmd_demo_ota(args)
    elif args.cmd == "demo-mobo":
        cmd_demo_mobo(args)
    elif args.cmd == "demo-romo":
        cmd_demo_romo(args)
    elif args.cmd == "demo-pauses":
        cmd_demo_pauses(args)
    elif args.cmd == "bench-mas":
        cmd_bench_mas(args)
    elif args.cmd == "train":
        cmd_train(args)
    elif args.cmd == "align":
        cmd_align(args)


if __name__ == "__main__":
    main()
