"""Data batching, synthetic corpus, duration utilities."""
import numpy as np

import jax.numpy as jnp

from aligner_tpu.data import (BucketSpec, SyntheticConfig, bucket_batches,
                              duration_accuracy, make_corpus, pad_batch)
from aligner_tpu.ops.durations import (duration_loss, durations_from_path,
                                       path_from_durations, selected_loglik)


def test_bucket_spec():
    spec = BucketSpec()
    assert spec.bucket_for(10, 100) == (32, 256)
    assert spec.bucket_for(33, 1025) == (64, 1536)
    assert spec.bucket_for(200, 3000) == (200, 3000)  # beyond buckets


def test_pad_batch_and_bucketing():
    corpus = make_corpus(17, SyntheticConfig(max_tokens=20, seed=3))
    batches = list(bucket_batches(corpus, batch_size=4, shuffle_seed=0))
    total = sum(b["tokens"].shape[0] for b in batches)
    assert total == 17
    for b in batches:
        B, T_x = b["tokens"].shape
        assert b["mel"].shape[0] == B
        assert (b["text_lengths"] <= T_x).all()
        assert (b["mel_lengths"] <= b["mel"].shape[1]).all()
        # padding zeroed
        for i in range(B):
            assert (b["tokens"][i, b["text_lengths"][i]:] == 0).all()


def test_corpus_ground_truth_consistent():
    corpus = make_corpus(5, SyntheticConfig(seed=1))
    for item in corpus:
        assert item["durations"].sum() == item["mel"].shape[0]
        assert len(item["durations"]) == len(item["tokens"])
    assert duration_accuracy(corpus[0]["durations"], corpus[0]) == \
        {"exact": 1.0, "mae": 0.0}


def test_hard_corpus_knobs():
    """Coarticulation / prototype overlap / speaker gain change the mels
    (harder regime) but never the ground-truth durations, and knobs at 0
    reproduce the legacy corpus exactly."""
    from aligner_tpu.data import prototypes

    base = SyntheticConfig(seed=2, pause_prob=0.3)
    hard = SyntheticConfig(seed=2, pause_prob=0.3, coarticulation=0.3,
                           proto_overlap=0.5, gain_var=0.3)
    c0, c1 = make_corpus(6, base), make_corpus(6, hard)
    for a, b in zip(c0, c1):
        np.testing.assert_array_equal(a["tokens"], b["tokens"])
        np.testing.assert_array_equal(a["durations"], b["durations"])
        np.testing.assert_array_equal(a["pause_durations"],
                                      b["pause_durations"])
        assert a["mel"].shape == b["mel"].shape
        assert not np.allclose(a["mel"], b["mel"])
    # overlap makes within-group prototypes correlated
    p0, p1 = prototypes(base), prototypes(hard)
    n_groups = base.vocab_size // 4

    def mean_group_cos(p):
        cs = []
        for i in range(n_groups, 2 * n_groups):
            a, b = p[i - n_groups], p[i]  # same group (i % n_groups)
            cs.append(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        return float(np.mean(cs))

    assert mean_group_cos(p1) > mean_group_cos(p0) + 0.2
    # legacy reproduction at zero knobs
    again = make_corpus(6, SyntheticConfig(seed=2, pause_prob=0.3))
    for a, b in zip(c0, again):
        np.testing.assert_array_equal(a["mel"], b["mel"])


def test_path_duration_roundtrip():
    durs = jnp.asarray(np.array([[2, 3, 1], [4, 0, 0]], np.int32))
    path = path_from_durations(durs, max_mel=8)
    assert path.shape == (2, 3, 8)
    np.testing.assert_array_equal(np.asarray(durations_from_path(path)),
                                  np.asarray(durs))
    # frame-major round trip
    pf = jnp.transpose(path, (0, 2, 1))
    np.testing.assert_array_equal(
        np.asarray(durations_from_path(pf, frame_major=True)),
        np.asarray(durs))


def test_duration_loss_masked():
    pred = jnp.zeros((2, 4))
    durs = jnp.asarray(np.array([[2, 2, 2, 9], [2, 2, 9, 9]], np.float32))
    tl = jnp.array([3, 2])
    # with masking, the 9s (padding) must not contribute: both rows are
    # all-twos in the real region -> identical loss
    l = duration_loss(pred, durs, tl)
    # Glow-TTS/VITS convention: target = log(d + 1e-6)
    l_ref = float(np.log(2.0 + 1e-6) ** 2)
    np.testing.assert_allclose(float(l), l_ref, rtol=1e-5)


def test_durations_from_log_inverts_targets():
    from aligner_tpu.ops.durations import durations_from_log

    durs = jnp.asarray(np.array([[3, 1, 7, 0], [2, 5, 0, 0]], np.float32))
    tl = jnp.array([3, 2])
    target = jnp.log(durs + 1e-6)  # a perfect predictor's output
    got = durations_from_log(target, tl)
    want = np.array([[3, 1, 7, 0], [2, 5, 0, 0]], np.int32)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_selected_loglik():
    value = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 4, 6))
    path = path_from_durations(jnp.array([[2, 2, 1, 1]]), max_mel=6)
    got = float(selected_loglik(value, path)[0])
    want = value[0, 0, 0] + value[0, 0, 1] + value[0, 1, 2] + \
        value[0, 1, 3] + value[0, 2, 4] + value[0, 3, 5]
    np.testing.assert_allclose(got, float(want))


def test_textgrid_export(tmp_path):
    from aligner_tpu.data import durations_to_intervals, write_textgrid

    ivs = durations_to_intervals([2, 3, 1], "abc", 256, 22050)
    assert len(ivs) == 3
    np.testing.assert_allclose(ivs[0][1], 2 * 256 / 22050)
    np.testing.assert_allclose(ivs[-1][1], 6 * 256 / 22050)
    assert ivs[1][2] == "b"
    p = tmp_path / "x.TextGrid"
    write_textgrid(str(p), [2, 3, 1], ["a", "b", 'c"q'], 256, 22050)
    text = p.read_text()
    assert 'Object class = "TextGrid"' in text
    assert "intervals: size = 3" in text
    assert 'text = "c""q"' in text  # quote escaping


def test_boundary_f1_and_frame_accuracy():
    from aligner_tpu.utils.eval import boundary_f1, frame_accuracy

    true = [3, 4, 2, 5]
    # perfect
    r = boundary_f1(true, true, tolerance_frames=0)
    assert r == {"precision": 1.0, "recall": 1.0, "f1": 1.0,
                 "matched_mae": 0.0}
    assert frame_accuracy(true, true) == 1.0
    # one boundary shifted by 1 frame: perfect at tol>=1, one miss at tol=0
    pred = [4, 3, 2, 5]
    r0 = boundary_f1(pred, true, tolerance_frames=0)
    r1 = boundary_f1(pred, true, tolerance_frames=1)
    assert r0["f1"] < 1.0 and r1["f1"] == 1.0
    np.testing.assert_allclose(r1["matched_mae"], 1.0 / 3.0)
    # frame accuracy: one frame flips token
    np.testing.assert_allclose(frame_accuracy(pred, true), 13 / 14)
    # degenerate single-token alignments
    assert boundary_f1([7], [7])["f1"] == 1.0


def test_prefetch_to_device_order_and_content():
    import numpy as np

    from aligner_tpu.data import prefetch_to_device

    batches = [{"a": np.full((2, 3), i, np.float32), "i": np.array([i])}
               for i in range(5)]
    out = list(prefetch_to_device(batches, size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert int(b["i"][0]) == i                     # order preserved
        assert hasattr(b["a"], "devices")              # on device
        np.testing.assert_array_equal(np.asarray(b["a"]), batches[i]["a"])
    # fewer batches than the prefetch window
    short = list(prefetch_to_device(batches[:1], size=4))
    assert len(short) == 1
    import pytest
    with pytest.raises(ValueError, match="size"):
        list(prefetch_to_device(batches, size=0))


def test_monotonic_attention_loss():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aligner_tpu.ops import monotonic_attention_loss

    B, T_y, T_x = 2, 12, 6
    # perfectly monotone: two frames per token
    mono = np.zeros((B, T_y, T_x), np.float32)
    for t in range(T_y):
        mono[:, t, min(t // 2, T_x - 1)] = 1.0
    mel_lengths = jnp.array([12, 9], jnp.int32)
    l_mono = monotonic_attention_loss(jnp.asarray(mono), mel_lengths)
    assert float(l_mono) == 0.0

    # reversed alignment: every adjacent pair regresses
    rev = mono[:, ::-1, :].copy()
    l_rev = monotonic_attention_loss(jnp.asarray(rev), mel_lengths)
    assert float(l_rev) > 0.2

    # slack forgives small regressions
    l_slack = monotonic_attention_loss(jnp.asarray(rev), mel_lengths,
                                       slack=10.0)
    assert float(l_slack) == 0.0

    # differentiable and finite through a softmax parameterisation
    def loss(logits):
        return monotonic_attention_loss(jax.nn.softmax(logits, -1),
                                        mel_lengths,
                                        text_lengths=jnp.array([6, 4]))
    g = jax.grad(loss)(jnp.asarray(np.random.default_rng(0)
                                   .standard_normal((B, T_y, T_x))
                                   .astype(np.float32)))
    assert np.isfinite(np.asarray(g)).all()
