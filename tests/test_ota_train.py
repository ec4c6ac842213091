"""OTA aligner model + train step: end-to-end jitted training on CPU,
sharded training on the 8-device virtual mesh, checkpoint round-trip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aligner_tpu.models import OTAAligner, OTAConfig
from aligner_tpu.ops.mel import MelConfig, log_mel_spectrogram
from aligner_tpu.parallel import make_mesh, shard_params
from aligner_tpu.train import (create_train_state, make_train_step,
                               restore_checkpoint, save_checkpoint)


def make_batch(B=4, T_x=16, T_y=40, n_mels=80, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "tokens": jnp.asarray(rng.integers(1, 50, (B, T_x)), jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, T_y, n_mels)),
                           jnp.float32),
        "text_lengths": jnp.asarray(
            np.clip(rng.integers(T_x // 2, T_x + 1, B), 1, T_x), jnp.int32),
        "mel_lengths": jnp.full((B,), T_y, jnp.int32),
    }


@pytest.fixture(scope="module")
def model_and_state():
    model = OTAAligner(OTAConfig(vocab_size=50, dim=32, hidden=48,
                                 mas_implementation="lax"))
    batch = make_batch()
    state = create_train_state(jax.random.PRNGKey(0), model, batch,
                               learning_rate=1e-3)
    return model, state, batch


def test_forward_outputs(model_and_state):
    model, state, batch = model_and_state
    out = model.apply({"params": state.params}, batch["tokens"],
                      batch["mel"], batch["text_lengths"],
                      batch["mel_lengths"])
    B, T_x = batch["tokens"].shape
    T_y = batch["mel"].shape[1]
    assert out["log_attn"].shape == (B, T_y, T_x)
    assert out["hard_path"].shape == (B, T_y, T_x)
    # hard path: exactly one token per real frame; durations sum to t_y
    ppf = np.asarray(out["hard_path"].sum(-1))
    for i in range(B):
        assert (ppf[i, :int(batch["mel_lengths"][i])] == 1).all()
    np.testing.assert_array_equal(np.asarray(out["durations"].sum(-1)),
                                  np.asarray(batch["mel_lengths"]))
    assert np.isfinite(float(out["loss_forward_sum"]))
    assert np.isfinite(float(out["loss_bin"]))


def test_train_step_improves_loss(model_and_state):
    model, state, batch = model_and_state
    step = make_train_step(model, bin_start=-1, bin_ramp=1, donate=False)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_pause_bias_override_and_curriculum():
    """The pause_bias apply-time override shifts pause occupancy, and
    the apply_extra hook threads a step-dependent bias through the
    jitted train step (pause-bias curriculum)."""
    model = OTAAligner(OTAConfig(vocab_size=50, dim=32, hidden=48,
                                 mas_implementation="lax",
                                 model_pauses=True, use_recon=True))
    batch = make_batch()
    state = create_train_state(jax.random.PRNGKey(0), model, batch,
                               learning_rate=1e-3)

    def occupancy(bias):
        out = model.apply({"params": state.params}, batch["tokens"],
                          batch["mel"], batch["text_lengths"],
                          batch["mel_lengths"], pause_bias=bias)
        return float(out["pause_durations"].sum()), out

    occ_neg, out_neg = occupancy(-20.0)
    occ_default, out_default = occupancy(None)
    # a -20 log-odds occupancy cost must forbid (or nearly forbid)
    # pause frames relative to the neutral default
    assert occ_neg <= occ_default
    assert occ_neg == 0.0
    # None must reproduce the config default exactly (bias 0 = no-op)
    np.testing.assert_allclose(np.asarray(out_default["log_attn"]),
                               np.asarray(occupancy(0.0)[1]["log_attn"]))

    # curriculum: bias is a traced function of the step counter inside
    # one compiled step (no recompiles, loss stays finite)
    sched = lambda s: {"pause_bias": -3.0 + 3.0 * jnp.clip(s / 4.0, 0, 1)}
    step = make_train_step(model, bin_start=-1, bin_ramp=1, donate=False,
                           apply_extra=sched)
    for _ in range(3):
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))


def test_sharded_train_step_on_virtual_mesh():
    assert len(jax.devices()) == 8, "conftest should give 8 CPU devices"
    mesh = make_mesh(n_data=4, n_model=2)
    model = OTAAligner(OTAConfig(vocab_size=50, dim=32, hidden=48,
                                 mas_implementation="lax"))
    batch = make_batch(B=8)
    state = create_train_state(jax.random.PRNGKey(0), model, batch,
                               learning_rate=1e-3, mesh=mesh)
    # params actually sharded over the model axis
    shardings = shard_params(state.params, mesh)
    kernels = [s for s in jax.tree.leaves(
        jax.tree.map(lambda s: s.spec, shardings,
                     is_leaf=lambda x: hasattr(x, "spec")))
        if "model" in str(s)]
    assert kernels, "expected at least one model-sharded parameter"

    step = make_train_step(model, mesh=mesh, bin_start=-1, bin_ramp=1,
                           donate=False)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # sharded result == unsharded result (same init, same data)
    state2 = create_train_state(jax.random.PRNGKey(0), model, batch,
                                learning_rate=1e-3)
    step2 = make_train_step(model, bin_start=-1, bin_ramp=1, donate=False)
    l2 = []
    for _ in range(4):
        state2, m2 = step2(state2, batch)
        l2.append(float(m2["loss"]))
    np.testing.assert_allclose(losses, l2, rtol=2e-4, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path, model_and_state):
    model, state, batch = model_and_state
    step = make_train_step(model, donate=False)
    state, _ = step(state, batch)
    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), state)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                 state.params, restored.params)
    assert int(restored.step) == int(state.step)


def test_full_wav_to_alignment_pipeline():
    """BASELINE.json config 3: mel extraction + soft attention + forward
    sum + hard MAS in one jitted program."""
    cfg = MelConfig(n_fft=256, hop_length=128, win_length=256)
    model = OTAAligner(OTAConfig(vocab_size=50, dim=32, hidden=48,
                                 n_mels=80, mas_implementation="lax"))
    rng = np.random.default_rng(0)
    B, T_x = 2, 12
    wav = jnp.asarray(rng.standard_normal((B, 4096)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(1, 50, (B, T_x)), jnp.int32)
    t_x = jnp.array([12, 7], jnp.int32)

    @jax.jit
    def full_step(params, wav):
        mel = log_mel_spectrogram(wav, cfg)
        t_y = jnp.full((B,), mel.shape[1], jnp.int32)
        return OTAAligner(OTAConfig(vocab_size=50, dim=32, hidden=48,
                                    mas_implementation="lax")).apply(
            {"params": params}, tokens, mel, t_x, t_y)

    mel = log_mel_spectrogram(wav, cfg)
    t_y = jnp.full((B,), mel.shape[1], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, mel, t_x, t_y)["params"]
    out = full_step(params, wav)
    assert np.isfinite(float(out["loss_forward_sum"]))
    assert out["hard_path"].shape[1] == mel.shape[1]


def test_ota_recon_auxiliary():
    model = OTAAligner(OTAConfig(vocab_size=50, dim=32, hidden=48,
                                 mas_implementation="lax", use_recon=True))
    batch = make_batch()
    state = create_train_state(jax.random.PRNGKey(0), model, batch,
                               learning_rate=1e-3)
    out = model.apply({"params": state.params}, batch["tokens"],
                      batch["mel"], batch["text_lengths"],
                      batch["mel_lengths"])
    assert float(out["loss_recon"]) > 0
    step = make_train_step(model, bin_start=-1, bin_ramp=1,
                           recon_weight=1.0, donate=False)
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_bfloat16_compute_dtype_trains():
    """compute_dtype='bfloat16' runs encoders/energies at MXU bf16 rate:
    params stay float32, the lattice and losses are float32, and
    training still converges."""
    model = OTAAligner(OTAConfig(vocab_size=50, dim=32, hidden=48,
                                 mas_implementation="lax",
                                 compute_dtype="bfloat16"))
    batch = make_batch()
    state = create_train_state(jax.random.PRNGKey(0), model, batch,
                               learning_rate=1e-3)
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(state.params))
    out = model.apply({"params": state.params}, batch["tokens"],
                      batch["mel"], batch["text_lengths"],
                      batch["mel_lengths"])
    assert out["log_attn"].dtype == jnp.float32
    assert np.isfinite(float(out["loss_forward_sum"]))
    ppf = np.asarray(out["hard_path"].sum(-1))
    for i in range(batch["tokens"].shape[0]):
        assert (ppf[i, :int(batch["mel_lengths"][i])] == 1).all()
    step = make_train_step(model, bin_start=-1, bin_ramp=1, donate=False)
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_lr_schedule_values():
    from aligner_tpu.train import make_lr_schedule

    const = make_lr_schedule(1e-3)
    assert float(const(0)) == pytest.approx(1e-3)
    warm = make_lr_schedule(1e-3, warmup_steps=100)
    assert float(warm(0)) == pytest.approx(0.0)
    assert float(warm(50)) == pytest.approx(5e-4)
    assert float(warm(100)) == pytest.approx(1e-3)
    cos = make_lr_schedule(1e-3, warmup_steps=10, decay_steps=100,
                           schedule="cosine", final_scale=0.1)
    assert float(cos(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(cos(100)) == pytest.approx(1e-4, rel=1e-2)
    with pytest.raises(ValueError, match="decay_steps"):
        make_lr_schedule(1e-3, schedule="cosine")
    with pytest.raises(ValueError, match="unknown schedule"):
        make_lr_schedule(1e-3, schedule="sawtooth")


def test_grad_clip_and_schedule_train(model_and_state):
    """Training with warmup schedule + global-norm clipping stays finite
    and actually updates params (even at step 0 where lr == 0)."""
    from aligner_tpu.train import make_lr_schedule

    model, _, batch = model_and_state
    sched = make_lr_schedule(1e-3, warmup_steps=4)
    state = create_train_state(jax.random.PRNGKey(0), model, batch,
                               learning_rate=sched, grad_clip_norm=0.5)
    step = make_train_step(model, bin_start=-1, bin_ramp=1, donate=False)
    p0 = jax.tree.map(np.asarray, state.params)
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: bool(np.any(a != np.asarray(b))), p0, state.params))
    assert any(changed)


def test_eval_step_and_loop_validation():
    """make_eval_step returns the training objective without an update;
    train_aligner logs val_* records for held-out batches."""
    from aligner_tpu.train import make_eval_step
    from aligner_tpu.train.loop import train_aligner

    model = OTAAligner(OTAConfig(vocab_size=50, dim=32, hidden=48,
                                 mas_implementation="lax"))
    batch = make_batch()
    state = create_train_state(jax.random.PRNGKey(0), model, batch,
                               learning_rate=1e-3)
    ev = make_eval_step(model, bin_start=-1, bin_ramp=1)
    m = ev(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert "loss_forward_sum" in m

    train_b = {k: np.asarray(v) for k, v in make_batch(seed=1).items()}
    val_b = {k: np.asarray(v) for k, v in make_batch(seed=2).items()}
    _, history = train_aligner(model, [train_b], steps=4,
                               learning_rate=1e-3, log_every=2,
                               eval_batches=[val_b], eval_every=2,
                               log_fn=lambda s: None)
    val_recs = [r for r in history if "val_loss" in r]
    assert val_recs and np.isfinite(val_recs[-1]["val_loss"])
    lr_recs = [r for r in history if "lr" in r]
    assert lr_recs and lr_recs[0]["lr"] == pytest.approx(1e-3)


def test_train_loop_resume(tmp_path):
    """resume=True picks up from the latest checkpoint and runs only the
    remaining steps; the resumed state's step counter continues."""
    from aligner_tpu.train.loop import train_aligner

    model = OTAAligner(OTAConfig(vocab_size=50, dim=32, hidden=48,
                                 mas_implementation="lax"))
    b = {k: np.asarray(v) for k, v in make_batch().items()}
    ckpt = str(tmp_path / "ckpt")
    state1, _ = train_aligner(model, [b], steps=3, learning_rate=1e-3,
                              checkpoint_dir=ckpt, checkpoint_every=100,
                              log_fn=lambda s: None)
    assert int(state1.step) == 3
    logs = []
    state2, hist = train_aligner(model, [b], steps=5, learning_rate=1e-3,
                                 checkpoint_dir=ckpt, resume=True,
                                 log_every=1, log_fn=logs.append)
    assert any("resumed" in s for s in logs)
    assert int(state2.step) == 5
    # only 2 additional steps were run
    steps_logged = [r["step"] for r in hist if "loss" in r]
    assert steps_logged and min(steps_logged) >= 4
    # params actually moved on from the checkpoint
    diff = jax.tree.leaves(jax.tree.map(
        lambda a, c: bool(np.any(np.asarray(a) != np.asarray(c))),
        state1.params, state2.params))
    assert any(diff)


def test_train_loop_seed_determinism(tmp_path):
    """Same seed → bit-identical history (init + shuffle are both seeded);
    a different seed changes the init and hence the loss. The seed is
    recorded in config.json (round-2 verdict item 5)."""
    import json

    from aligner_tpu.train.loop import train_aligner

    model = OTAAligner(OTAConfig(vocab_size=50, dim=32, hidden=48,
                                 mas_implementation="lax"))
    bs = [{k: np.asarray(v) for k, v in make_batch(seed=s).items()}
          for s in (1, 2, 3)]
    kw = dict(steps=3, learning_rate=1e-3, log_every=1,
              log_fn=lambda s: None)
    _, h1 = train_aligner(model, bs, seed=7, **kw)
    _, h2 = train_aligner(model, bs, seed=7, **kw)
    assert [r["loss"] for r in h1] == [r["loss"] for r in h2]
    _, h3 = train_aligner(model, bs, seed=8, **kw)
    assert [r["loss"] for r in h1] != [r["loss"] for r in h3]

    ckpt = str(tmp_path / "ckpt")
    train_aligner(model, bs, seed=7, checkpoint_dir=ckpt, **kw)
    cfg = json.load(open(tmp_path / "ckpt" / "config.json"))
    assert cfg["train_seed"] == 7


def test_load_run_config_backfills_pause_prior(tmp_path):
    """Pause-aware checkpoints saved before the pause_prior knob existed
    were trained under the then-only 'inherit' prior; the loader must
    back-fill that instead of letting OTAConfig's new 'bridge' default
    silently change the restored prior lattice."""
    import json

    from aligner_tpu.train.checkpoint import load_run_config

    rec = {"model_class": "OTA",
           "model_config": {"dim": 32, "model_pauses": True}}
    (tmp_path / "config.json").write_text(json.dumps(rec))
    cfg = load_run_config(str(tmp_path))
    assert cfg["model_config"]["pause_prior"] == "inherit"

    # a config that RECORDS pause_prior is left alone
    rec["model_config"]["pause_prior"] = "bridge"
    (tmp_path / "config.json").write_text(json.dumps(rec))
    assert load_run_config(str(tmp_path))["model_config"][
        "pause_prior"] == "bridge"

    # pause-free configs are untouched
    rec2 = {"model_class": "OTA", "model_config": {"dim": 32}}
    (tmp_path / "config.json").write_text(json.dumps(rec2))
    assert "pause_prior" not in load_run_config(
        str(tmp_path))["model_config"]


def test_resume_mismatch_preserves_config(tmp_path):
    """A mismatched resume must fail BEFORE this run's config can
    overwrite the checkpoint directory's config.json."""
    import json

    from aligner_tpu.train.loop import train_aligner

    b = {k: np.asarray(v) for k, v in make_batch().items()}
    ckpt = str(tmp_path / "ckpt")
    model32 = OTAAligner(OTAConfig(vocab_size=50, dim=32, hidden=48,
                                   mas_implementation="lax"))
    train_aligner(model32, [b], steps=2, learning_rate=1e-3,
                  checkpoint_dir=ckpt, log_fn=lambda s: None)
    model48 = OTAAligner(OTAConfig(vocab_size=50, dim=48, hidden=48,
                                   mas_implementation="lax"))
    with pytest.raises(Exception):
        train_aligner(model48, [b], steps=4, learning_rate=1e-3,
                      checkpoint_dir=ckpt, resume=True,
                      log_fn=lambda s: None)
    cfg = json.load(open(tmp_path / "ckpt" / "config.json"))
    assert cfg["model_config"]["dim"] == 32, \
        "failed resume overwrote the checkpoint's config.json"


def test_custom_objective_trains_mobo_and_romo():
    """make_train_step with a custom objective drives non-OTA models."""
    from aligner_tpu.models import MoBoAligner, MoBoConfig, RoMoAligner, \
        RoMoConfig

    batch = make_batch(B=4, T_x=8, T_y=32)
    for model, key in [
        (MoBoAligner(MoBoConfig(vocab_size=50, dim=24, hidden=32,
                                max_duration=8)), "loss_mobo"),
        (RoMoAligner(RoMoConfig(vocab_size=50, dim=24, hidden=32,
                                window=8, max_duration=10)), "loss"),
    ]:
        state = create_train_state(jax.random.PRNGKey(0), model, batch,
                                   learning_rate=1e-3)
        step = make_train_step(
            model, donate=False,
            objective=lambda out, _, k=key: (out[k], {}))
        losses = []
        for _ in range(3):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
