"""Pallas forward-sum kernels vs the lax oracle (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aligner_tpu.ops.forward_sum import (_alpha_scan, _beta_scan,
                                         _masked_logp, _total_from_alphas)
from aligner_tpu.ops.forward_sum_pallas import (forward_sum_alpha_pallas,
                                                forward_sum_grad_pallas)


def make(seed, B=4, T_x=16, T_y=32):
    rng = np.random.default_rng(seed)
    raw = rng.standard_normal((B, T_y, T_x)).astype(np.float32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(raw), axis=-1))
    t_x = np.clip(rng.integers(1, T_x + 1, B), 1, T_x)
    t_y = np.maximum(t_x, rng.integers(1, T_y + 1, B))
    return (jnp.asarray(logp), jnp.asarray(t_x, jnp.int32),
            jnp.asarray(t_y, jnp.int32))


@pytest.mark.parametrize("pair", [None, False])
@pytest.mark.parametrize("seed", range(3))
def test_alpha_matches_lax(seed, pair):
    """pair=None auto-enables the two-frame composed sweep at these
    latency-regime shapes; pair=False keeps the per-frame body
    covered."""
    logp, t_x, t_y = make(seed)
    lp_tm = jnp.moveaxis(_masked_logp(logp, t_x), 0, 1)
    want = _alpha_scan(lp_tm, t_y)
    got, final = forward_sum_alpha_pallas(lp_tm, t_y, interpret=True,
                                          pair=pair)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(final), np.asarray(want)[-1],
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("pair", [None, False])
@pytest.mark.parametrize("seed", range(3))
def test_gamma_matches_lax(seed, pair):
    logp, t_x, t_y = make(seed)
    lp_tm = jnp.moveaxis(_masked_logp(logp, t_x), 0, 1)
    alphas = _alpha_scan(lp_tm, t_y)
    total = _total_from_alphas(alphas, t_x, t_y)
    betas = _beta_scan(lp_tm, t_x, t_y)
    gamma_lax = np.exp(np.asarray(alphas) + np.asarray(betas)
                       - np.asarray(total)[None, :, None])
    T_y, B, T_x = lp_tm.shape
    ys = np.arange(T_y); xs = np.arange(T_x)
    in_range = ((ys[:, None, None] < np.asarray(t_y)[None, :, None])
                & (xs[None, None, :] < np.asarray(t_x)[None, :, None]))
    gamma_lax = np.where(in_range, gamma_lax, 0.0)
    got = forward_sum_grad_pallas(lp_tm, alphas, total, t_x, t_y,
                                  interpret=True, pair=pair)
    np.testing.assert_allclose(np.asarray(got), gamma_lax, rtol=1e-4,
                               atol=1e-5)


def test_full_lengths_and_t_y_edge():
    B, T_x, T_y = 3, 8, 16
    rng = np.random.default_rng(9)
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T_y, T_x)).astype(np.float32)),
        -1)
    t_x = jnp.array([8, 1, 8]); t_y = jnp.array([16, 16, 8])
    lp_tm = jnp.moveaxis(_masked_logp(logp, t_x), 0, 1)
    want = _alpha_scan(lp_tm, t_y)
    got, _ = forward_sum_alpha_pallas(lp_tm, t_y, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


# ---------------------------------------------------------------------------
# Edge cases for the beta/grad kernel (round-3 verdict weak item 6: the
# on-chip sweep covered these; the unit suite, where regressions are
# cheapest to localize, did not).
# ---------------------------------------------------------------------------

def _gamma_oracle(lp_tm, t_x, t_y):
    alphas = _alpha_scan(lp_tm, t_y)
    total = _total_from_alphas(alphas, t_x, t_y)
    betas = _beta_scan(lp_tm, t_x, t_y)
    gamma = np.exp(np.asarray(alphas) + np.asarray(betas)
                   - np.asarray(total)[None, :, None])
    T_y, B, T_x = lp_tm.shape
    ys = np.arange(T_y); xs = np.arange(T_x)
    in_range = ((ys[:, None, None] < np.asarray(t_y)[None, :, None])
                & (xs[None, None, :] < np.asarray(t_x)[None, :, None]))
    return alphas, total, np.where(in_range, gamma, 0.0)


@pytest.mark.parametrize("pair", [None, False])
def test_t_y_equals_1(pair):
    """t_y == 1 forces t_x == 1 for validity: alpha is the init column
    only and beta's end column lands at y = 0. Mixed with normal items
    so the freeze logic is exercised in the same grid."""
    B, T_x, T_y = 3, 8, 16
    rng = np.random.default_rng(21)
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T_y, T_x)).astype(np.float32)),
        -1)
    t_x = jnp.array([1, 5, 8]); t_y = jnp.array([1, 12, 16])
    lp_tm = jnp.moveaxis(_masked_logp(logp, t_x), 0, 1)
    alphas, total, gamma_lax = _gamma_oracle(lp_tm, t_x, t_y)
    got_a, final = forward_sum_alpha_pallas(lp_tm, t_y, interpret=True,
                                            pair=pair)
    live = np.asarray(alphas) > 0.5 * -1e15
    np.testing.assert_allclose(np.asarray(got_a)[live],
                               np.asarray(alphas)[live],
                               rtol=1e-5, atol=1e-4)
    got_g = forward_sum_grad_pallas(lp_tm, alphas, total, t_x, t_y,
                                    interpret=True)
    assert np.isfinite(np.asarray(got_g)).all()
    np.testing.assert_allclose(np.asarray(got_g), gamma_lax, rtol=1e-4,
                               atol=1e-5)
    # the t_y == 1 item's posterior is exactly one cell: (y=0, x=0)
    g0 = np.asarray(got_g)[:, 0, :]
    np.testing.assert_allclose(g0[0, 0], 1.0, rtol=1e-5)
    assert g0.sum() == pytest.approx(1.0, rel=1e-5)


def test_all_invalid_batch_grad_is_zero():
    """Every item t_x > t_y: the public loss must be 0 with zero
    gradient, with no NaN leaking out of the kernels' exp."""
    from aligner_tpu.ops.forward_sum import forward_sum_loss

    B, T_x, T_y = 4, 8, 6
    rng = np.random.default_rng(23)
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T_y, T_x)).astype(np.float32)),
        -1)
    t_x = jnp.full((B,), 8); t_y = jnp.full((B,), 6)
    loss, grad = jax.value_and_grad(
        lambda lp: forward_sum_loss(lp, t_x, t_y).sum())(logp)
    assert float(loss) == 0.0
    np.testing.assert_array_equal(np.asarray(grad), 0.0)


def test_neg_saturated_banded_prior():
    """Most labels NEG-saturated per frame (a narrow band stays live, as
    an extreme beta-binomial prior produces): the backward kernel's
    lp <= NEG/2 dead-cell identification must match the lax oracle
    exactly, not just on benign inputs."""
    B, T_x, T_y = 2, 8, 16
    rng = np.random.default_rng(27)
    logp = np.array(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T_y, T_x)).astype(np.float32)),
        -1))
    t_x = jnp.array([6, 8]); t_y = jnp.array([16, 14])
    xs = np.arange(T_x)[None, None, :]
    # per-item diagonal band scaled to (t_x, t_y) so a feasible
    # monotone path survives the saturation
    center = (np.arange(T_y)[None, :, None]
              * np.asarray(t_x)[:, None, None]
              // np.asarray(t_y)[:, None, None])
    logp = np.where(np.abs(xs - center) <= 1, logp, -1e15)
    lp_tm = jnp.moveaxis(_masked_logp(jnp.asarray(logp), t_x), 0, 1)
    alphas, total, gamma_lax = _gamma_oracle(lp_tm, t_x, t_y)
    got_a, _ = forward_sum_alpha_pallas(lp_tm, t_y, interpret=True)
    assert not np.isnan(np.asarray(got_a)).any()
    live = np.asarray(alphas) > 0.5 * -1e15
    np.testing.assert_allclose(np.asarray(got_a)[live],
                               np.asarray(alphas)[live],
                               rtol=1e-5, atol=1e-4)
    got_g = forward_sum_grad_pallas(lp_tm, alphas, total, t_x, t_y,
                                    interpret=True)
    assert np.isfinite(np.asarray(got_g)).all()
    np.testing.assert_allclose(np.asarray(got_g), gamma_lax, rtol=1e-4,
                               atol=1e-5)
    # dead cells carry exactly zero posterior
    assert np.asarray(got_g)[np.moveaxis(
        np.asarray(logp) <= -5e14, 1, 0)].sum() == 0.0


def test_fully_dead_frame_no_nan():
    """A frame whose EVERY label is NEG (zero path mass — the posterior
    is 0/0-undefined there) must still come back NaN-free from both
    kernels; the loss layer's validity gate owns the semantics."""
    B, T_x, T_y = 2, 8, 16
    rng = np.random.default_rng(29)
    logp = np.array(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T_y, T_x)).astype(np.float32)),
        -1))
    logp[:, 5, :] = -1e15
    t_x = jnp.array([6, 8]); t_y = jnp.array([16, 14])
    lp_tm = jnp.moveaxis(_masked_logp(jnp.asarray(logp), t_x), 0, 1)
    got_a, final = forward_sum_alpha_pallas(lp_tm, t_y, interpret=True)
    assert not np.isnan(np.asarray(got_a)).any()
    assert not np.isnan(np.asarray(final)).any()
    total = _total_from_alphas(got_a, t_x, t_y)
    got_g = forward_sum_grad_pallas(lp_tm, got_a, total, t_x, t_y,
                                    interpret=True)
    assert not np.isnan(np.asarray(got_g)).any()
