"""Implicit pause modeling: expansion utilities, pause-aware OTA model,
pause metrics, silence-bearing synthetic corpus."""
import jax
import jax.numpy as jnp
import numpy as np

from aligner_tpu.ops.skip_dp import (expand_prior_to_states,
                                     expand_tokens_with_pauses,
                                     split_state_durations)


def test_expand_tokens_with_pauses():
    tokens = jnp.asarray(np.array([[7, 8, 9], [4, 5, 0]], np.int32))
    tl = jnp.array([3, 2], jnp.int32)
    exp = np.asarray(expand_tokens_with_pauses(tokens, tl, pause_id=99))
    np.testing.assert_array_equal(exp[0], [99, 7, 99, 8, 99, 9, 99])
    np.testing.assert_array_equal(exp[1], [99, 4, 99, 5, 99, 0, 0])


def test_expand_prior_to_states():
    B, T_y, T_x = 1, 2, 3
    prior = jnp.asarray(
        np.arange(B * T_y * T_x, dtype=np.float32).reshape(B, T_y, T_x))
    tl = jnp.array([2], jnp.int32)  # only tokens 0, 1 live
    exp = np.asarray(expand_prior_to_states(prior, tl))
    assert exp.shape == (1, 2, 7)
    # states: P0 t0 P1 t1 P2 -> token index min(s // 2, 1)
    np.testing.assert_array_equal(exp[0, 0], [0, 0, 1, 1, 1, 1, 1])
    np.testing.assert_array_equal(exp[0, 1], [3, 3, 4, 4, 4, 4, 4])


def test_expand_prior_to_states_bridge():
    """bridge mode: token states keep their own prior; pause 2j is the
    logaddexp average of tokens j-1 and j (edges reduce to inherit)."""
    B, T_y, T_x = 1, 1, 3
    prior = jnp.asarray(
        np.log(np.array([[[0.2, 0.5, 0.3]]], np.float32)))
    tl = jnp.array([3], jnp.int32)
    exp = np.exp(np.asarray(
        expand_prior_to_states(prior, tl, mode="bridge")))[0, 0]
    # states: P0 t0 P1 t1 P2 t2 P3
    np.testing.assert_allclose(
        exp, [0.2, 0.2, 0.35, 0.5, 0.4, 0.3, 0.3], rtol=1e-6)
    # inherit stays the round-2 behaviour
    inh = np.exp(np.asarray(
        expand_prior_to_states(prior, tl, mode="inherit")))[0, 0]
    np.testing.assert_allclose(
        inh, [0.2, 0.2, 0.5, 0.5, 0.3, 0.3, 0.3], rtol=1e-6)


def test_split_state_durations():
    sd = jnp.asarray(np.array([[1, 2, 3, 4, 5, 6, 7]], np.float32))
    tok, pause = split_state_durations(sd)
    np.testing.assert_array_equal(np.asarray(tok)[0], [2, 4, 6])
    np.testing.assert_array_equal(np.asarray(pause)[0], [1, 3, 5, 7])


def _pause_batch(B=4, T_x=6, T_y=48, n_mels=20, vocab=30, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "tokens": jnp.asarray(rng.integers(1, vocab, (B, T_x)), jnp.int32),
        "mel": jnp.asarray(
            rng.standard_normal((B, T_y, n_mels)).astype(np.float32)),
        "text_lengths": jnp.asarray(
            np.clip(rng.integers(T_x // 2, T_x + 1, B), 1, T_x), jnp.int32),
        "mel_lengths": jnp.asarray(
            np.clip(rng.integers(T_y // 2, T_y + 1, B), T_x, T_y),
            jnp.int32),
    }


def test_ota_pause_model_smoke():
    from aligner_tpu.models import OTAAligner, OTAConfig

    cfg = OTAConfig(vocab_size=30, n_mels=20, dim=24, hidden=32,
                    temperature=0.05, model_pauses=True,
                    mas_implementation="lax")
    model = OTAAligner(cfg)
    b = _pause_batch()
    params = model.init(jax.random.PRNGKey(0), b["tokens"], b["mel"],
                        b["text_lengths"], b["mel_lengths"])["params"]
    out = jax.jit(lambda p: model.apply(
        {"params": p}, b["tokens"], b["mel"], b["text_lengths"],
        b["mel_lengths"]))(params)
    B, T_x = b["tokens"].shape
    assert out["durations"].shape == (B, T_x)
    assert out["pause_durations"].shape == (B, T_x + 1)
    assert out["log_attn"].shape[2] == 2 * T_x + 1
    # every real frame lands on exactly one state
    total = (np.asarray(out["durations"]).sum(1)
             + np.asarray(out["pause_durations"]).sum(1))
    np.testing.assert_array_equal(total, np.asarray(b["mel_lengths"]))
    # padded token slots get zero duration
    durs = np.asarray(out["durations"])
    for i in range(B):
        assert (durs[i, int(b["text_lengths"][i]):] == 0).all()
    assert np.isfinite(float(out["loss_forward_sum"]))
    assert np.isfinite(float(out["loss_bin"]))


def test_ota_pause_train_step_decreases():
    from aligner_tpu.models import OTAAligner, OTAConfig
    from aligner_tpu.train import create_train_state, make_train_step

    cfg = OTAConfig(vocab_size=30, n_mels=20, dim=24, hidden=32,
                    temperature=0.05, model_pauses=True,
                    mas_implementation="lax")
    model = OTAAligner(cfg)
    b = _pause_batch(seed=1)
    state = create_train_state(jax.random.PRNGKey(0), model, b,
                               learning_rate=3e-3)
    step = make_train_step(model, donate=False)
    losses = []
    for _ in range(8):
        state, m = step(state, b)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() if hasattr(np, "isfinite") else True
    assert losses[-1] < losses[0]


def test_pause_corpus_ground_truth():
    from aligner_tpu.data import SyntheticConfig, make_corpus

    cfg = SyntheticConfig(seed=5, pause_prob=0.5, min_tokens=4,
                          max_tokens=8)
    corpus = make_corpus(10, cfg)
    saw_pause = False
    for item in corpus:
        assert "pause_durations" in item
        total = item["durations"].sum() + item["pause_durations"].sum()
        assert total == item["mel"].shape[0]
        assert len(item["pause_durations"]) == len(item["tokens"]) + 1
        saw_pause |= bool((item["pause_durations"] > 0).any())
    assert saw_pause


def test_pause_free_corpus_still_has_pause_durations():
    """pause_prob == 0 corpora carry an all-zero pause_durations array so
    pause-aware consumers (demo-pauses, eval) work on them too."""
    from aligner_tpu.data import SyntheticConfig, make_corpus

    cfg = SyntheticConfig(seed=5, pause_prob=0.0, min_tokens=4,
                          max_tokens=8)
    for item in make_corpus(4, cfg):
        assert "pause_durations" in item
        assert (item["pause_durations"] == 0).all()
        assert item["durations"].sum() == item["mel"].shape[0]


def test_token_spans_and_pause_metrics():
    from aligner_tpu.utils.eval import (pause_detection, token_boundary_f1,
                                        token_spans)

    durs = [3, 2, 4]
    pauses = [2, 0, 3, 1]
    spans = token_spans(durs, pauses)
    np.testing.assert_array_equal(spans, [[2, 5], [5, 7], [10, 14]])
    # identical alignments: perfect
    r = token_boundary_f1(durs, durs, pred_pauses=pauses,
                          true_pauses=pauses, tolerance_frames=0)
    assert r["f1"] == 1.0
    # pause-blind prediction absorbing the mid silence into token 1:
    # spans [0,3][3,8][8,12] vs true edges {2,5,7,10,14} -> misses
    r2 = token_boundary_f1([3, 5, 4], durs, true_pauses=pauses,
                           tolerance_frames=0)
    assert r2["f1"] < 1.0
    pd = pause_detection([2, 0, 2, 0], pauses)
    assert pd["recall"] == 1.0 and pd["n_true"] == 2
    assert pd["precision"] == 1.0
    pd2 = pause_detection([0, 0, 0, 0], pauses)
    assert pd2["recall"] == 0.0


def test_pause_detection_gap_tolerance():
    """gap_tolerance relaxes slot matching to adjacent gaps with greedy
    one-to-one pairing: a pause detected at the neighbouring gap counts
    at tolerance 1 but not 0, and a single true pause cannot absorb two
    predictions."""
    from aligner_tpu.utils.eval import pause_detection

    true = [0, 3, 0, 0, 4, 0]
    # both pauses found, each one gap off
    pred = [3, 0, 0, 4, 0, 0]
    strict = pause_detection(pred, true)
    assert strict["precision"] == 0.0 and strict["recall"] == 0.0
    g1 = pause_detection(pred, true, gap_tolerance=1)
    assert g1["precision"] == 1.0 and g1["recall"] == 1.0
    # two predictions flanking ONE true pause: one-to-one matching
    # credits only one of them
    pred2 = [3, 0, 3, 0, 0, 0]
    g1b = pause_detection(pred2, true, gap_tolerance=1)
    assert g1b["precision"] == 0.5
    assert g1b["recall"] == 0.5  # 1 of 2 true slots matched
    # tolerance never changes length MAE (still over true slots)
    assert g1["length_mae"] == strict["length_mae"]
