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


def test_batch_aligner_durations_match_paths():
    """The durations-only fast path (bits + duration-walk kernel) must
    agree exactly with the full-path route's frame counts."""
    lats = make_lattices(5, seed=7)
    aligner = BatchAligner(max_text=10, max_mel=24, interpret=True)
    durs = aligner.align_durations(lats)
    for (path, d_full), d in zip(aligner.align(lats), durs):
        np.testing.assert_array_equal(d, d_full)


def make_skip_lattices(n, max_tx=6, max_ty=20, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        tx = int(rng.integers(1, max_tx + 1))
        ty = int(rng.integers(tx, max_ty + 1))
        out.append((rng.standard_normal((2 * tx + 1, ty)) * 2)
                   .astype(np.float32))
    return out


def test_skip_batch_aligner_matches_oracle():
    from aligner_tpu.ops.skip_dp import mas_skip_single
    from aligner_tpu.serving import SkipBatchAligner

    lats = make_skip_lattices(7)
    aligner = SkipBatchAligner(max_text=6, max_mel=20, max_batch=3,
                               interpret=True)
    results = aligner.align(lats)
    assert len(results) == len(lats)
    for lat, (path, tok, pause) in zip(lats, results):
        ts, ty = lat.shape
        tx = (ts - 1) // 2
        want = mas_skip_single(lat.copy(), tx, ty)
        np.testing.assert_array_equal(path.astype(np.int32), want)
        assert tok.shape == (tx,) and pause.shape == (tx + 1,)
        assert tok.sum() + pause.sum() == ty
        assert (tok >= 1).all()   # tokens are mandatory


def test_skip_batch_aligner_enter_cost_suppresses_pauses():
    """A strongly negative serving-time enter_cost must reduce (or keep
    equal) the number of pauses used, never increase it."""
    from aligner_tpu.serving import SkipBatchAligner

    lats = make_skip_lattices(6, seed=11)
    plain = SkipBatchAligner(max_text=6, max_mel=20, interpret=True)
    costly = SkipBatchAligner(max_text=6, max_mel=20, interpret=True,
                              enter_cost=-5.0)
    for (_, _, p0), (_, _, p1) in zip(plain.align(lats),
                                      costly.align(lats)):
        assert (p1 >= 2).sum() <= (p0 >= 2).sum()


def test_skip_batch_aligner_rejects_bad_states():
    from aligner_tpu.serving import SkipBatchAligner

    aligner = SkipBatchAligner(max_text=4, max_mel=8, interpret=True)
    with pytest.raises(ValueError, match="state rows"):
        aligner.align([np.zeros((6, 8), np.float32)])   # even row count
