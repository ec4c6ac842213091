"""BatchAligner serving helper: ragged lattices in, per-utterance paths
and durations out, bit-identical to the oracle through the padded
time-major kernel path."""
import numpy as np
import pytest

from aligner_tpu import BatchAligner
from aligner_tpu.ops.mas_reference import mas_single


def make_lattices(n, max_tx=10, max_ty=24, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        tx = int(rng.integers(1, max_tx + 1))
        ty = int(rng.integers(tx, max_ty + 1))
        out.append((rng.standard_normal((tx, ty)) * 3).astype(np.float32))
    return out


def test_batch_aligner_matches_oracle():
    lats = make_lattices(7)
    aligner = BatchAligner(max_text=10, max_mel=24, max_batch=3,
                           interpret=True)
    results = aligner.align(lats)
    assert len(results) == len(lats)
    for lat, (path, durs) in zip(lats, results):
        tx, ty = lat.shape
        assert path.shape == (tx, ty)
        want = mas_single(lat.copy(), tx, ty)
        np.testing.assert_array_equal(path.astype(np.int32), want)
        np.testing.assert_array_equal(durs, want.sum(-1))
        assert durs.sum() == ty


def test_batch_aligner_durations_only():
    lats = make_lattices(4, seed=3)
    aligner = BatchAligner(max_text=10, max_mel=24, interpret=True)
    durs = aligner.align_durations(lats)
    for lat, d in zip(lats, durs):
        assert d.sum() == lat.shape[1]
        assert len(d) == lat.shape[0]


def test_batch_aligner_rejects_oversize():
    aligner = BatchAligner(max_text=4, max_mel=8, interpret=True)
    with pytest.raises(ValueError, match="exceeds the bucket"):
        aligner.align([np.zeros((5, 8), np.float32)])
