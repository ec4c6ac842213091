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
