"""Alignment evaluation metrics.

Duration exact-match is a harsh metric (a single one-frame shift breaks
two tokens); the alignment literature evaluates **boundary placement
under a time tolerance** (commonly 10-20 ms). These helpers convert
durations to boundaries and score precision/recall/F1 at a tolerance,
plus the frame-level overlap rate of two alignments.
"""
from __future__ import annotations

import numpy as np


def boundaries_from_durations(durations) -> np.ndarray:
    """Internal boundary positions (frames) — cumulative sums, excluding
    the final utterance end (always shared)."""
    d = np.asarray(durations)
    return np.cumsum(d)[:-1]


def boundary_f1(pred_durations, true_durations, *, tolerance_frames: int = 2):
    """Precision/recall/F1 of predicted boundaries within +/- tolerance.

    Boundaries are matched greedily one-to-one in order. Returns a dict
    with precision, recall, f1, and the mean absolute boundary error (in
    frames) over matched pairs.
    """
    pred = boundaries_from_durations(pred_durations)
    true = boundaries_from_durations(true_durations)
    if len(pred) == 0 and len(true) == 0:
        return {"precision": 1.0, "recall": 1.0, "f1": 1.0,
                "matched_mae": 0.0}
    used = np.zeros(len(true), bool)
    hits, errs = 0, []
    for p in pred:
        cand = np.nonzero(~used & (np.abs(true - p) <= tolerance_frames))[0]
        if len(cand):
            j = cand[np.argmin(np.abs(true[cand] - p))]
            used[j] = True
            hits += 1
            errs.append(abs(float(true[j] - p)))
    precision = hits / max(len(pred), 1)
    recall = hits / max(len(true), 1)
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "matched_mae": float(np.mean(errs)) if errs else 0.0}


def frame_accuracy(pred_durations, true_durations) -> float:
    """Fraction of frames assigned to the same token index by both
    alignments (both must cover the same number of frames)."""
    def expand(d):
        d = np.asarray(d)
        return np.repeat(np.arange(len(d)), d)
    a, b = expand(pred_durations), expand(true_durations)
    assert len(a) == len(b), "alignments cover different frame counts"
    return float((a == b).mean()) if len(a) else 1.0
