"""Synthetic alignment corpus with known ground-truth durations.

Each token id has a characteristic mel "prototype"; an utterance is the
concatenation of its tokens' prototypes, each repeated for a random
duration, plus noise. Because true durations are known, alignment quality
(duration accuracy) is directly measurable — this is the corpus used by
the framework's own verification runs and the demo CLI. The reference
project has no data layer at all (SURVEY.md §0).
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SyntheticConfig:
    vocab_size: int = 64
    n_mels: int = 80
    min_tokens: int = 8
    max_tokens: int = 32
    min_duration: int = 2
    max_duration: int = 8
    noise: float = 0.25
    seed: int = 0
    # Implicit pauses: with probability `pause_prob` per token gap
    # (including the utterance edges), insert a silence segment of
    # [min_pause, max_pause] frames whose spectral prototype is the
    # reserved row 0 (token ids start at 1). The *transcript* carries no
    # silence tokens — recovering these segments is exactly the
    # reference OTA branch's implicit-pause problem (README.md:21-25).
    pause_prob: float = 0.0
    min_pause: int = 2
    max_pause: int = 6


def prototypes(cfg: SyntheticConfig = SyntheticConfig()) -> np.ndarray:
    """The per-token mel prototypes [vocab, n_mels] for a config — the
    same array make_corpus uses (deterministic in cfg.seed)."""
    rng = np.random.default_rng(cfg.seed)
    return rng.standard_normal((cfg.vocab_size, cfg.n_mels)) \
        .astype(np.float32)


def make_corpus(n_utterances: int, cfg: SyntheticConfig = SyntheticConfig()):
    """Returns a list of dicts: tokens [t_x], mel [t_y, n_mels],
    durations [t_x] (ground truth)."""
    rng = np.random.default_rng(cfg.seed)
    protos = prototypes(cfg)
    # advance the stream past the prototype draw (prototypes() re-derives
    # the same array from a fresh generator with the same seed)
    rng.standard_normal((cfg.vocab_size, cfg.n_mels))
    out = []
    for _ in range(n_utterances):
        t_x = int(rng.integers(cfg.min_tokens, cfg.max_tokens + 1))
        tokens = rng.integers(1, cfg.vocab_size, t_x).astype(np.int32)
        durs = rng.integers(cfg.min_duration, cfg.max_duration + 1, t_x)
        pauses = np.zeros(t_x + 1, np.int32)
        if cfg.pause_prob > 0:
            hit = rng.random(t_x + 1) < cfg.pause_prob
            pauses = np.where(
                hit, rng.integers(cfg.min_pause, cfg.max_pause + 1,
                                  t_x + 1), 0).astype(np.int32)
        segs = []
        for j, (tok, d) in enumerate(zip(tokens, durs)):
            if pauses[j]:
                segs.append(np.repeat(protos[0][None, :], pauses[j],
                                      axis=0))
            segs.append(np.repeat(protos[tok][None, :], d, axis=0))
        if pauses[t_x]:
            segs.append(np.repeat(protos[0][None, :], pauses[t_x],
                                  axis=0))
        mel = np.concatenate(segs, axis=0)
        mel = mel + cfg.noise * rng.standard_normal(mel.shape) \
            .astype(np.float32)
        item = {"tokens": tokens, "mel": mel.astype(np.float32),
                "durations": durs.astype(np.int32),
                # all-zero when pause_prob == 0, so pause-aware consumers
                # (demo-pauses, eval) work on pause-free corpora too
                "pause_durations": pauses}
        out.append(item)
    return out


def duration_accuracy(predicted, item) -> dict:
    """Exact-match rate and MAE of predicted durations vs ground truth."""
    t_x = len(item["tokens"])
    p = np.asarray(predicted)[:t_x]
    g = item["durations"][:t_x]
    return {"exact": float((p == g).mean()),
            "mae": float(np.abs(p - g).mean())}
