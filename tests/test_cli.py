"""End-to-end CLI: train on a tiny wav corpus, align, TextGrid export."""
import json
import os

import numpy as np
import pytest


@pytest.fixture()
def wav_corpus(tmp_path):
    from scipy.io import wavfile

    root = tmp_path / "corpus"
    os.makedirs(root / "wavs")
    rng = np.random.default_rng(0)
    sr = 22050
    lines = []
    for u in range(4):
        text = f"ab cd {u}"
        wav = (rng.standard_normal(sr // 4) * 0.1 * 32767).astype(np.int16)
        wavfile.write(str(root / "wavs" / f"u{u}.wav"), sr, wav)
        lines.append(f"u{u}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines) + "\n")
    return str(root)


def test_train_then_align_roundtrip(tmp_path, wav_corpus):
    from aligner_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "durations.jsonl")
    tg = str(tmp_path / "tg")
    main(["train", wav_corpus, "--steps", "3", "--batch-size", "4",
          "--checkpoint-dir", ckpt, "--dim", "16", "--hidden", "24"])
    assert any(d.isdigit() for d in os.listdir(ckpt))
    # config.json makes align self-contained: no shape flags needed
    cfg = json.load(open(os.path.join(ckpt, "config.json")))
    assert cfg["model_config"]["dim"] == 16
    assert cfg["tokenizer"] == "CharTokenizer"
    main(["align", wav_corpus, "--checkpoint-dir", ckpt, "--output", out,
          "--textgrid-dir", tg, "--batch-size", "4"])
    recs = [json.loads(l) for l in open(out)]
    assert sorted(r["utt_id"] for r in recs) == ["u0", "u1", "u2", "u3"]
    for r in recs:
        assert sum(r["durations"]) == r["n_frames"]
    tgs = os.listdir(tg)
    assert len(tgs) == 4
    text = open(os.path.join(tg, "u0.TextGrid")).read()
    assert 'class = "IntervalTier"' in text
    # conflicting shape flags fail loudly instead of an opaque restore
    with pytest.raises(SystemExit, match="conflict with the checkpoint"):
        main(["align", wav_corpus, "--checkpoint-dir", ckpt,
              "--output", out, "--dim", "32"])
    # pre-config checkpoints (no config.json) demand explicit flags
    os.remove(os.path.join(ckpt, "config.json"))
    with pytest.raises(SystemExit, match="no config.json"):
        main(["align", wav_corpus, "--checkpoint-dir", ckpt,
              "--output", out])


def test_train_pauses_then_align_roundtrip(tmp_path, wav_corpus):
    """--model-pauses trains the pause-aware aligner from a wav corpus;
    align then emits per-gap pause durations (JSONL + silence intervals
    in the TextGrid) with frames conserved across tokens + pauses."""
    from aligner_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "durations.jsonl")
    tg = str(tmp_path / "tg")
    main(["train", wav_corpus, "--steps", "3", "--batch-size", "4",
          "--checkpoint-dir", ckpt, "--dim", "16", "--hidden", "24",
          "--model-pauses", "--pause-bias-anneal", "2"])
    cfg = json.load(open(os.path.join(ckpt, "config.json")))
    assert cfg["model_config"]["model_pauses"] is True
    assert cfg["model_config"]["use_recon"] is True  # forced by pauses
    # align rebuilds the pause-aware model from config.json alone
    main(["align", wav_corpus, "--checkpoint-dir", ckpt, "--output", out,
          "--textgrid-dir", tg, "--batch-size", "4"])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 4
    for r in recs:
        assert len(r["pauses"]) == len(r["durations"]) + 1
        assert sum(r["durations"]) + sum(r["pauses"]) == r["n_frames"]
    text = open(os.path.join(tg, "u0.TextGrid")).read()
    assert 'class = "IntervalTier"' in text
    # Decode-time pause knobs: a strongly negative enter cost re-decodes
    # the same weights with fewer pauses entered (monotone in the cost),
    # frames still conserved.
    out2 = str(tmp_path / "durations_suppressed.jsonl")
    main(["align", wav_corpus, "--checkpoint-dir", ckpt, "--output", out2,
          "--batch-size", "4", "--pause-enter-cost", "-50.0",
          "--pause-bias", "-10.0"])
    recs2 = [json.loads(l) for l in open(out2)]
    base_n = sum(sum(1 for p in r["pauses"] if p) for r in recs)
    supp_n = sum(sum(1 for p in r["pauses"] if p) for r in recs2)
    assert supp_n <= base_n
    for r in recs2:
        assert sum(r["durations"]) + sum(r["pauses"]) == r["n_frames"]


def test_align_pause_knobs_need_pause_checkpoint(tmp_path, wav_corpus):
    """--pause-enter-cost/--pause-bias on a pause-blind checkpoint is a
    loud error, not a silent no-op."""
    from aligner_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    main(["train", wav_corpus, "--steps", "2", "--batch-size", "4",
          "--checkpoint-dir", ckpt, "--dim", "16", "--hidden", "24"])
    with pytest.raises(SystemExit, match="--model-pauses"):
        main(["align", wav_corpus, "--checkpoint-dir", ckpt,
              "--output", str(tmp_path / "d.jsonl"),
              "--pause-enter-cost", "-5.0"])


def test_train_phone_tokenizer_then_align(tmp_path, wav_corpus):
    """--tokenizer phone aligns space-separated symbols (one duration
    per phone, not per character); the corpus-derived vocabulary rides
    config.json so align reconstructs the exact id mapping."""
    from aligner_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "durations.jsonl")
    tg = str(tmp_path / "tg")
    main(["train", wav_corpus, "--steps", "3", "--batch-size", "4",
          "--checkpoint-dir", ckpt, "--dim", "16", "--hidden", "24",
          "--tokenizer", "phone"])
    cfg = json.load(open(os.path.join(ckpt, "config.json")))
    assert cfg["tokenizer"] == "PhoneTokenizer"
    # corpus texts are "ab cd {u}" -> symbols {ab, cd, 0..3} (+pad/unk)
    assert sorted(cfg["tokenizer_vocab"]) == cfg["tokenizer_vocab"]
    assert "ab" in cfg["tokenizer_vocab"]
    assert cfg["model_config"]["vocab_size"] == \
        len(cfg["tokenizer_vocab"]) + 2
    main(["align", wav_corpus, "--checkpoint-dir", ckpt, "--output", out,
          "--textgrid-dir", tg, "--batch-size", "4"])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 4
    for r in recs:
        assert len(r["durations"]) == 3  # 3 phones, not 7 chars
        assert sum(r["durations"]) == r["n_frames"]
    text = open(os.path.join(tg, "u0.TextGrid")).read()
    assert 'text = "ab"' in text and 'text = "cd"' in text


def test_train_with_schedule_then_align(tmp_path, wav_corpus):
    """align must work regardless of the training run's optimizer choice
    (schedule + clipping change the opt_state pytree; align restores
    params only)."""
    from aligner_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "durations.jsonl")
    main(["train", wav_corpus, "--steps", "3", "--batch-size", "4",
          "--checkpoint-dir", ckpt, "--dim", "16", "--hidden", "24",
          "--lr-schedule", "cosine", "--warmup-steps", "1",
          "--grad-clip", "1.0", "--eval-split", "0.25",
          "--bin-start", "2", "--bin-ramp", "1"])
    main(["align", wav_corpus, "--checkpoint-dir", ckpt, "--output", out,
          "--batch-size", "4"])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 4
    for r in recs:
        assert sum(r["durations"]) == r["n_frames"]


def test_align_missing_checkpoint_fails_fast(wav_corpus):
    from aligner_tpu.cli import main

    with pytest.raises(SystemExit, match="checkpoint dir not found"):
        main(["align", wav_corpus, "--checkpoint-dir", "/nonexistent"])


def test_train_missing_metadata_fails_fast(tmp_path):
    from aligner_tpu.cli import main

    with pytest.raises(SystemExit, match="metadata.csv"):
        main(["train", str(tmp_path), "--checkpoint-dir",
              str(tmp_path / "c")])


def test_demo_romo_smoke(capsys):
    """demo-romo runs end to end (rough + refined stage metrics) on a
    tiny budget; quality is exercised in the TPU campaign, not here."""
    from aligner_tpu.cli import main

    main(["demo-romo", "--steps", "5", "--batch-size", "4",
          "--utterances", "4"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["demo"] == "romo"
    for stage in ("rough", "refined"):
        assert 0.0 <= rec[stage]["boundary_f1_tol2"] <= 1.0
        assert rec[stage]["duration_mae"] >= 0.0


def test_train_mobo_then_align_roundtrip(tmp_path, wav_corpus):
    """--model mobo trains the boundary-search aligner on a wav corpus
    (reference README.md:9-13 names it as a completed capability);
    align decodes hard Viterbi boundaries from the checkpoint's
    config.json alone."""
    from aligner_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "durations.jsonl")
    main(["train", wav_corpus, "--model", "mobo", "--steps", "3",
          "--batch-size", "4", "--checkpoint-dir", ckpt,
          "--dim", "16", "--hidden", "24", "--max-duration", "16"])
    cfg = json.load(open(os.path.join(ckpt, "config.json")))
    assert cfg["model_class"] == "MoBo"
    assert cfg["model_config"]["max_duration"] == 16
    assert cfg["model_config"]["use_recon"] is True
    main(["align", wav_corpus, "--checkpoint-dir", ckpt,
          "--output", out, "--batch-size", "4"])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 4
    for r in recs:
        assert len(r["durations"]) == 7  # char tokenizer: "ab cd N"
        assert sum(r["durations"]) == r["n_frames"]
        assert "pauses" not in r  # boundary search has no pause states


def test_train_romo_then_align_roundtrip(tmp_path, wav_corpus):
    """--model romo: rough OTA anchors + windowed MoBo refinement
    (reference README.md:15-19), decodable via align."""
    from aligner_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "durations.jsonl")
    main(["train", wav_corpus, "--model", "romo", "--steps", "3",
          "--batch-size", "4", "--checkpoint-dir", ckpt,
          "--dim", "16", "--hidden", "24", "--max-duration", "16",
          "--window", "12"])
    cfg = json.load(open(os.path.join(ckpt, "config.json")))
    assert cfg["model_class"] == "RoMo"
    assert cfg["model_config"]["window"] == 12
    main(["align", wav_corpus, "--checkpoint-dir", ckpt,
          "--output", out, "--batch-size", "4"])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 4
    for r in recs:
        assert len(r["durations"]) == 7
        # feasible items conserve frames exactly; infeasible ones fall
        # back to rounded rough expected durations (close, not exact)
        assert abs(sum(r["durations"]) - r["n_frames"]) <= 7


def test_model_pauses_rejected_outside_ota(tmp_path, wav_corpus):
    from aligner_tpu.cli import main

    with pytest.raises(SystemExit, match="OTA capability"):
        main(["train", wav_corpus, "--model", "mobo", "--model-pauses",
              "--steps", "1", "--checkpoint-dir", str(tmp_path / "c")])


def test_align_pause_knobs_rejected_for_mobo(tmp_path, wav_corpus):
    from aligner_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    main(["train", wav_corpus, "--model", "mobo", "--steps", "2",
          "--batch-size", "4", "--checkpoint-dir", ckpt,
          "--dim", "16", "--hidden", "24", "--max-duration", "16"])
    with pytest.raises(SystemExit, match="OTA checkpoint"):
        main(["align", wav_corpus, "--checkpoint-dir", ckpt,
              "--output", str(tmp_path / "d.jsonl"),
              "--pause-enter-cost", "-5.0"])


def test_train_bf16_then_align_roundtrip(tmp_path, wav_corpus):
    """--compute-dtype bfloat16 is persisted in config.json and the
    checkpoint aligns end to end (params stay f32; only the encoder/
    energy matmuls run bf16 — the measured -15% config-5 recipe)."""
    from aligner_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "durations.jsonl")
    main(["train", wav_corpus, "--steps", "3", "--batch-size", "4",
          "--checkpoint-dir", ckpt, "--dim", "16", "--hidden", "24",
          "--compute-dtype", "bfloat16"])
    cfg = json.load(open(os.path.join(ckpt, "config.json")))
    assert cfg["model_config"]["compute_dtype"] == "bfloat16"
    main(["align", wav_corpus, "--checkpoint-dir", ckpt,
          "--output", out, "--batch-size", "4"])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 4
    for r in recs:
        assert sum(r["durations"]) == r["n_frames"]


def test_resume_phone_vocab_from_checkpoint(tmp_path, wav_corpus):
    """On --resume, the phone vocabulary comes from config.json, not a
    fresh corpus scan: same-size-different-symbols corpora must not
    silently re-map restored embedding rows; out-of-vocab symbols are
    a loud error."""
    from aligner_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    main(["train", wav_corpus, "--steps", "2", "--batch-size", "4",
          "--checkpoint-dir", ckpt, "--dim", "16", "--hidden", "24",
          "--tokenizer", "phone"])
    vocab0 = json.load(open(os.path.join(ckpt,
                                         "config.json")))["tokenizer_vocab"]
    # same corpus: resume reuses the saved vocab and trains on
    main(["train", wav_corpus, "--steps", "3", "--batch-size", "4",
          "--checkpoint-dir", ckpt, "--dim", "16", "--hidden", "24",
          "--tokenizer", "phone", "--resume"])
    vocab1 = json.load(open(os.path.join(ckpt,
                                         "config.json")))["tokenizer_vocab"]
    assert vocab1 == vocab0
    # corpus gained a new symbol: loud error, not silent re-mapping
    from scipy.io import wavfile
    rng = np.random.default_rng(9)
    wav = (rng.standard_normal(22050 // 4) * 0.1 * 32767).astype(np.int16)
    wavfile.write(os.path.join(wav_corpus, "wavs", "u9.wav"), 22050, wav)
    with open(os.path.join(wav_corpus, "metadata.csv"), "a") as f:
        f.write("u9|zz qq 0\n")
    with pytest.raises(SystemExit, match="outside the checkpoint"):
        main(["train", wav_corpus, "--steps", "4", "--batch-size", "4",
              "--checkpoint-dir", ckpt, "--dim", "16", "--hidden", "24",
              "--tokenizer", "phone", "--resume"])


def test_phone_vocab_respects_limit_and_missing_wavs(tmp_path):
    """The phone vocabulary is derived from the rows that are actually
    loaded (wav present, within --limit), so no embedding row exists
    for symbols of skipped rows."""
    import scipy.io.wavfile as wavfile

    from aligner_tpu.cli import build_parser, _make_tokenizer

    root = tmp_path / "corpus"
    os.makedirs(root / "wavs")
    rng = np.random.default_rng(0)
    lines = ["u0|aa bb", "u1|cc dd", "u2|ee ff"]
    for u in (0, 1):  # u2's wav is missing
        wav = (rng.standard_normal(5512) * 0.1 * 32767).astype(np.int16)
        wavfile.write(str(root / "wavs" / f"u{u}.wav"), 22050, wav)
    (root / "metadata.csv").write_text("\n".join(lines) + "\n")
    args = build_parser().parse_args(
        ["train", str(root), "--tokenizer", "phone", "--limit", "1",
         "--checkpoint-dir", str(tmp_path / "c")])
    assert _make_tokenizer(args).phones == ("aa", "bb")
    args = build_parser().parse_args(
        ["train", str(root), "--tokenizer", "phone",
         "--checkpoint-dir", str(tmp_path / "c")])
    assert _make_tokenizer(args).phones == ("aa", "bb", "cc", "dd")


def test_zero_token_transcript_fails_loudly(tmp_path):
    """A whitespace-only transcript (t_x = 0) is a load-time error, not
    a degenerate lattice downstream."""
    import scipy.io.wavfile as wavfile

    from aligner_tpu.data import PhoneTokenizer, load_corpus

    root = tmp_path / "corpus"
    os.makedirs(root / "wavs")
    wav = (np.zeros(5512) * 32767).astype(np.int16)
    wavfile.write(str(root / "wavs" / "u0.wav"), 22050, wav)
    (root / "metadata.csv").write_text("u0|   \n")
    tok = PhoneTokenizer(phones=("aa",))
    with pytest.raises(ValueError, match="zero tokens"):
        list(load_corpus(str(root), tokenizer=tok))


def test_train_mel_levers_persist_and_align_reuses(tmp_path, wav_corpus):
    """--mel-hop/--mel-win/--no-mel-center land in config.json and
    `align` rebuilds the same front end: at hop 128 the aligned frame
    count doubles relative to the hop-256 default (same wavs)."""
    from aligner_tpu.cli import main

    ck256 = str(tmp_path / "ck256")
    ck128 = str(tmp_path / "ck128")
    main(["train", wav_corpus, "--steps", "2", "--batch-size", "4",
          "--checkpoint-dir", ck256, "--dim", "16", "--hidden", "24"])
    main(["train", wav_corpus, "--steps", "2", "--batch-size", "4",
          "--checkpoint-dir", ck128, "--dim", "16", "--hidden", "24",
          "--mel-hop", "128", "--mel-win", "512", "--no-mel-center"])
    cfg = json.load(open(os.path.join(ck128, "config.json")))
    assert cfg["mel"] == {"hop_length": 128, "n_fft": 512,
                          "win_length": 512, "center": False}
    # default runs keep a mel-free config.json (back-compat contract)
    assert "mel" not in json.load(open(os.path.join(ck256, "config.json")))
    out256 = str(tmp_path / "d256.jsonl")
    out128 = str(tmp_path / "d128.jsonl")
    main(["align", wav_corpus, "--checkpoint-dir", ck256,
          "--output", out256, "--batch-size", "4"])
    main(["align", wav_corpus, "--checkpoint-dir", ck128,
          "--output", out128, "--batch-size", "4"])
    n256 = {r["utt_id"]: r["n_frames"]
            for r in map(json.loads, open(out256))}
    n128 = {r["utt_id"]: r["n_frames"]
            for r in map(json.loads, open(out128))}
    for u, n in n256.items():
        # hop-256 centered: samples//256 + 1 frames; hop-128
        # left-aligned win 512: (samples-512)//128 + 1 — about 2x.
        assert n128[u] > int(1.8 * n), (u, n, n128[u])
        assert sum(json.loads(next(
            l for l in open(out128)
            if json.loads(l)["utt_id"] == u))["durations"]) == n128[u]


def test_align_step_picks_checkpoint(tmp_path, wav_corpus):
    """`align --step N` decodes from the named saved step (and a
    missing step fails loudly) — the post-hoc convergence-sweet-spot
    knob used by the MoBo wav campaign."""
    from aligner_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "durations.jsonl")
    main(["train", wav_corpus, "--steps", "2", "--batch-size", "4",
          "--checkpoint-dir", ckpt, "--dim", "16", "--hidden", "24"])
    main(["train", wav_corpus, "--steps", "4", "--batch-size", "4",
          "--checkpoint-dir", ckpt, "--dim", "16", "--hidden", "24",
          "--resume"])
    steps = sorted(int(d) for d in os.listdir(ckpt) if d.isdigit())
    assert steps == [2, 4]
    main(["align", wav_corpus, "--checkpoint-dir", ckpt, "--output", out,
          "--batch-size", "4", "--step", "2"])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 4
    for r in recs:
        assert sum(r["durations"]) == r["n_frames"]
    with pytest.raises(Exception):
        main(["align", wav_corpus, "--checkpoint-dir", ckpt,
              "--output", out, "--batch-size", "4", "--step", "3"])
