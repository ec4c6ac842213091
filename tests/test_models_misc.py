"""MoBoAligner model module + torch drop-in wrapper."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aligner_tpu.models import MoBoAligner, MoBoConfig


def test_mobo_model_end_to_end():
    model = MoBoAligner(MoBoConfig(vocab_size=40, dim=32, hidden=48,
                                   max_duration=6))
    rng = np.random.default_rng(0)
    B, T_x, T_y = 4, 10, 30
    tokens = jnp.asarray(rng.integers(1, 40, (B, T_x)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((B, T_y, 80)).astype(np.float32))
    t_x = jnp.array([10, 8, 5, 10], jnp.int32)
    t_y = jnp.array([30, 24, 25, 12], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, mel, t_x, t_y)["params"]
    out = jax.jit(lambda p: model.apply({"params": p}, tokens, mel, t_x,
                                        t_y))(params)
    assert np.isfinite(float(out["loss_mobo"]))
    d = np.asarray(out["hard_durations"])
    for i in range(B):
        assert d[i, :int(t_x[i])].sum() == int(t_y[i])
        assert (d[i, :int(t_x[i])] <= 6).all()
    g = np.asarray(out["soft_alignment"])
    np.testing.assert_allclose(g[0, :30].sum(-1), 1.0, atol=1e-4)
    # trainable
    grads = jax.grad(lambda p: model.apply(
        {"params": p}, tokens, mel, t_x, t_y,
        compute_hard=False)["loss_mobo"])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(grads))


def test_torch_compat_drop_in():
    torch = pytest.importorskip(
        "torch", reason="torch_compat shim needs torch (optional extra)")

    from aligner_tpu.torch_compat import maximum_path
    from aligner_tpu.ops.mas_reference import maximum_path_numpy
    from aligner_tpu.utils.masks import lattice_mask

    rng = np.random.default_rng(5)
    B, T_x, T_y = 4, 12, 25
    value_np = (rng.standard_normal((B, T_x, T_y)) * 2).astype(np.float32)
    t_xs = np.array([12, 6, 1, 9]); t_ys = np.array([25, 18, 7, 9])
    mask_np = np.asarray(lattice_mask(jnp.asarray(t_xs), jnp.asarray(t_ys),
                                      T_x, T_y))
    value = torch.from_numpy(value_np)
    mask = torch.from_numpy(mask_np)
    path = maximum_path(value, mask)
    assert isinstance(path, torch.Tensor)
    assert path.dtype == value.dtype
    want = maximum_path_numpy(value_np, mask_np)
    np.testing.assert_array_equal(path.numpy().astype(np.int32), want)


def test_romo_model_end_to_end():
    from aligner_tpu.models import RoMoAligner, RoMoConfig

    model = RoMoAligner(RoMoConfig(vocab_size=40, dim=32, hidden=48,
                                   window=6, max_duration=8))
    rng = np.random.default_rng(2)
    B, T_x, T_y = 3, 8, 32
    tokens = jnp.asarray(rng.integers(1, 40, (B, T_x)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((B, T_y, 80)).astype(np.float32))
    t_x = jnp.array([8, 6, 4], jnp.int32)
    t_y = jnp.array([32, 24, 20], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, mel, t_x, t_y)["params"]
    out = jax.jit(lambda p: model.apply({"params": p}, tokens, mel, t_x,
                                        t_y))(params)
    assert np.isfinite(float(out["loss"]))
    # anchors are monotone per item over real tokens
    a = np.asarray(out["anchors"])
    for i in range(B):
        assert (np.diff(a[i, :int(t_x[i])]) >= -1e-4).all()
    # refined hard durations cover the mel exactly
    d = np.asarray(out["hard_durations"])
    for i in range(B):
        assert d[i, :int(t_x[i])].sum() == int(t_y[i])
    # both stages trainable
    g = jax.grad(lambda p: model.apply(
        {"params": p}, tokens, mel, t_x, t_y,
        compute_hard=False)["loss"])(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
