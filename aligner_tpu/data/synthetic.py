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
        segs = [np.repeat(protos[tok][None, :], d, axis=0)
                for tok, d in zip(tokens, durs)]
        mel = np.concatenate(segs, axis=0)
        mel = mel + cfg.noise * rng.standard_normal(mel.shape) \
            .astype(np.float32)
        out.append({"tokens": tokens, "mel": mel.astype(np.float32),
                    "durations": durs.astype(np.int32)})
    return out


def duration_accuracy(predicted, item) -> dict:
    """Exact-match rate and MAE of predicted durations vs ground truth."""
    t_x = len(item["tokens"])
    p = np.asarray(predicted)[:t_x]
    g = item["durations"][:t_x]
    return {"exact": float((p == g).mean()),
            "mae": float(np.abs(p - g).mean())}
