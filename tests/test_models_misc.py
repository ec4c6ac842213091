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


def test_torch_compat_forward_sum_autograd():
    torch = pytest.importorskip(
        "torch", reason="torch_compat shim needs torch (optional extra)")

    from aligner_tpu.torch_compat import beta_binomial_prior, forward_sum_loss
    from aligner_tpu.ops.forward_sum import forward_sum_loss as fsl_jax
    from aligner_tpu.ops.prior import beta_binomial_log_prior

    rng = np.random.default_rng(7)
    B, T_x, T_y = 3, 9, 21
    logits = rng.standard_normal((B, T_y, T_x)).astype(np.float32)
    lp_np = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    t_x = np.array([9, 5, 8], np.int32)
    t_y = np.array([21, 14, 4], np.int32)  # item 2 invalid: t_x > t_y

    lp = torch.from_numpy(lp_np).requires_grad_(True)
    loss = forward_sum_loss(lp, torch.from_numpy(t_x), torch.from_numpy(t_y))
    assert loss.shape == (B,)
    want = np.asarray(fsl_jax(jnp.asarray(lp_np), jnp.asarray(t_x),
                              jnp.asarray(t_y)))
    np.testing.assert_allclose(loss.detach().numpy(), want, rtol=1e-5,
                               atol=1e-5)
    assert float(loss[2]) == 0.0

    # Backward: weighted sum so each item's cotangent differs; grad must
    # match jax.grad of the same weighted objective.
    w = np.array([1.0, 0.5, 2.0], np.float32)
    (loss * torch.from_numpy(w)).sum().backward()
    g_want = np.asarray(jax.grad(
        lambda v: jnp.sum(fsl_jax(v, jnp.asarray(t_x), jnp.asarray(t_y))
                          * jnp.asarray(w)))(jnp.asarray(lp_np)))
    np.testing.assert_allclose(lp.grad.numpy(), g_want, rtol=1e-5, atol=1e-6)
    assert np.abs(lp.grad.numpy()[2]).max() == 0.0

    # No-grad fast path: same values via the plain (alpha-only) loss, and
    # the returned tensor owns writable memory (ADVICE r3: no shared
    # non-writable JAX buffers at the boundary).
    with torch.no_grad():
        loss_ng = forward_sum_loss(lp, torch.from_numpy(t_x),
                                   torch.from_numpy(t_y))
    assert not loss_ng.requires_grad
    np.testing.assert_allclose(loss_ng.numpy(), want, rtol=1e-5, atol=1e-5)
    loss_ng[0] = 0.0  # must not raise (writable, owning)

    prior = beta_binomial_prior(torch.from_numpy(t_x), torch.from_numpy(t_y),
                                T_x, T_y)
    assert isinstance(prior, torch.Tensor) and prior.shape == (B, T_y, T_x)
    np.testing.assert_allclose(
        prior.numpy(),
        np.asarray(beta_binomial_log_prior(jnp.asarray(t_x),
                                           jnp.asarray(t_y), T_x, T_y)),
        rtol=1e-6)
    prior[0, 0, 0] = 0.0  # must not raise (writable, owning)


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
