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
