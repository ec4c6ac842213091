"""Forward-sum loss: brute-force oracle, gradient check, posterior sanity
(SURVEY.md §4: forward-sum oracle + jax.grad vs finite differences)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aligner_tpu.ops.forward_sum import (alignment_posteriors,
                                         forward_sum_loss)


def brute_force_logmarginal(logp, t_x, t_y):
    """logp: [T_y, T_x] (frame-major). Sum over all monotonic surjective
    paths of exp(path score), in log domain."""
    scores = []
    for cuts in itertools.combinations(range(1, t_y), t_x - 1):
        idx = np.zeros(t_y, np.int64)
        for c in cuts:
            idx[c:] += 1
        scores.append(sum(logp[y, idx[y]] for y in range(t_y)))
    m = max(scores)
    return m + np.log(sum(np.exp(s - m) for s in scores))


@pytest.mark.parametrize("t_x,t_y,seed", [
    (1, 1, 0), (1, 5, 1), (2, 2, 2), (3, 7, 3), (4, 6, 4), (5, 9, 5),
])
def test_loss_matches_brute_force(t_x, t_y, seed):
    rng = np.random.default_rng(seed)
    T_x, T_y = 6, 10
    raw = rng.standard_normal((1, T_y, T_x)).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(raw), axis=-1)
    loss = forward_sum_loss(logp, jnp.array([t_x]), jnp.array([t_y]))
    want = -brute_force_logmarginal(np.asarray(logp)[0], t_x, t_y)
    np.testing.assert_allclose(float(loss[0]), want, rtol=1e-5, atol=1e-5)


def test_batched_ragged():
    rng = np.random.default_rng(7)
    B, T_x, T_y = 5, 6, 11
    raw = rng.standard_normal((B, T_y, T_x)).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(raw), axis=-1)
    t_xs = np.array([1, 3, 6, 2, 4])
    t_ys = np.array([4, 7, 11, 2, 4])
    loss = forward_sum_loss(logp, jnp.asarray(t_xs), jnp.asarray(t_ys))
    for i in range(B):
        want = -brute_force_logmarginal(np.asarray(logp)[i],
                                        int(t_xs[i]), int(t_ys[i]))
        np.testing.assert_allclose(float(loss[i]), want, rtol=1e-5,
                                   atol=1e-5)


def test_gradient_matches_finite_differences():
    rng = np.random.default_rng(11)
    B, T_x, T_y = 2, 4, 7
    raw = jnp.asarray(rng.standard_normal((B, T_y, T_x)).astype(np.float32))
    t_x = jnp.array([4, 3])
    t_y = jnp.array([7, 5])

    def f(r):
        lp = jax.nn.log_softmax(r, axis=-1)
        return forward_sum_loss(lp, t_x, t_y).sum()

    g = jax.grad(f)(raw)
    eps = 1e-3
    rng2 = np.random.default_rng(0)
    for _ in range(10):
        b = rng2.integers(B); y = rng2.integers(T_y); x = rng2.integers(T_x)
        d = np.zeros_like(np.asarray(raw)); d[b, y, x] = eps
        fd = (float(f(raw + d)) - float(f(raw - d))) / (2 * eps)
        np.testing.assert_allclose(float(g[b, y, x]), fd, rtol=2e-2,
                                   atol=2e-3)


def test_gradient_is_negative_posterior():
    """d loss/d logp = -gamma when logp entries are free (no softmax)."""
    rng = np.random.default_rng(13)
    B, T_x, T_y = 3, 5, 9
    logp = jnp.asarray(rng.standard_normal((B, T_y, T_x)).astype(np.float32))
    t_x = jnp.array([5, 2, 4]); t_y = jnp.array([9, 6, 4])
    g = jax.grad(lambda lp: forward_sum_loss(lp, t_x, t_y).sum())(logp)
    gamma, _ = alignment_posteriors(logp, t_x, t_y)
    np.testing.assert_allclose(np.asarray(g), -np.asarray(gamma),
                               rtol=1e-5, atol=1e-6)


def test_posteriors_normalized_over_text():
    rng = np.random.default_rng(17)
    B, T_x, T_y = 3, 6, 12
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T_y, T_x)).astype(np.float32)),
        axis=-1)
    t_x = jnp.array([6, 3, 1]); t_y = jnp.array([12, 8, 5])
    gamma, _ = alignment_posteriors(logp, t_x, t_y)
    gamma = np.asarray(gamma)
    for i in range(B):
        sums = gamma[i, :int(t_y[i])].sum(-1)
        np.testing.assert_allclose(sums, 1.0, rtol=1e-4, atol=1e-4)
        assert gamma[i, int(t_y[i]):].sum() == 0
        assert gamma[i, :, int(t_x[i]):].sum() == 0


def test_jit_and_vmap_compatible():
    rng = np.random.default_rng(19)
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((2, 8, 4)).astype(np.float32)), -1)
    t_x = jnp.array([4, 3]); t_y = jnp.array([8, 6])
    f = jax.jit(forward_sum_loss)
    np.testing.assert_allclose(np.asarray(f(logp, t_x, t_y)),
                               np.asarray(forward_sum_loss(logp, t_x, t_y)),
                               rtol=1e-6)


def test_loss_with_posteriors_consistency():
    from aligner_tpu.ops.forward_sum import forward_sum_loss_with_posteriors

    rng = np.random.default_rng(29)
    B, T_x, T_y = 3, 5, 11
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T_y, T_x)).astype(np.float32)),
        -1)
    t_x = jnp.array([5, 3, 1]); t_y = jnp.array([11, 7, 4])
    loss, gamma = forward_sum_loss_with_posteriors(logp, t_x, t_y)
    np.testing.assert_allclose(np.asarray(loss),
                               np.asarray(forward_sum_loss(logp, t_x, t_y)),
                               rtol=1e-6)
    g_ref, _ = alignment_posteriors(logp, t_x, t_y)
    np.testing.assert_allclose(np.asarray(gamma), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
    # gradient of the loss output equals -gamma; gamma output is stop-grad
    g = jax.grad(lambda lp: forward_sum_loss_with_posteriors(
        lp, t_x, t_y)[0].sum())(logp)
    np.testing.assert_allclose(np.asarray(g), -np.asarray(gamma),
                               rtol=1e-5, atol=1e-6)
    g2 = jax.grad(lambda lp: forward_sum_loss_with_posteriors(
        lp, t_x, t_y)[1].sum())(logp)
    assert float(jnp.abs(g2).max()) == 0.0


def test_inf_masked_inputs_are_safe():
    """User-supplied -inf-masked log-probs must produce finite loss and
    zero gradient at the -inf cells (VERDICT r1 item 6: the Pallas
    dead-cell heuristic relied on _masked_logp's finite sentinel)."""
    rng = np.random.default_rng(11)
    B, T_y, T_x = 2, 6, 3
    logp = np.log(rng.dirichlet(np.ones(T_x), (B, T_y))).astype(np.float32)
    # user masks the last token of item 1 with a hard -inf
    logp[1, :, 2] = -np.inf
    t_x = jnp.array([3, 2], jnp.int32)
    t_y = jnp.array([6, 5], jnp.int32)

    def total(lp):
        return forward_sum_loss(lp, t_x, t_y).sum()

    loss, grad = jax.value_and_grad(total)(jnp.asarray(logp))
    assert np.isfinite(float(loss))
    g = np.asarray(grad)
    assert np.isfinite(g).all()
    assert (g[1, :, 2] == 0).all()  # no gradient into -inf cells
    # and the -inf column doesn't change item 0's loss
    per_item = forward_sum_loss(jnp.asarray(logp), t_x, t_y)
    clean = forward_sum_loss(
        jnp.asarray(np.where(np.isinf(logp), -1e15, logp)), t_x, t_y)
    np.testing.assert_allclose(np.asarray(per_item), np.asarray(clean))


def test_degenerate_lengths_defined_as_zero():
    """t_x = 0, t_y = 0, or t_x > t_y: loss defined as 0, gradient 0
    (documented divergence; the MAS oracles reject such lengths)."""
    rng = np.random.default_rng(3)
    logp = jnp.asarray(
        np.log(rng.dirichlet(np.ones(4), (3, 8))).astype(np.float32))
    t_x = jnp.array([0, 4, 2], jnp.int32)   # 0; > t_y; valid
    t_y = jnp.array([8, 3, 8], jnp.int32)

    def total(lp):
        return forward_sum_loss(lp, t_x, t_y).sum()

    loss_items = forward_sum_loss(logp, t_x, t_y)
    assert float(loss_items[0]) == 0.0
    assert float(loss_items[1]) == 0.0
    assert np.isfinite(float(loss_items[2])) and float(loss_items[2]) > 0
    _, grad = jax.value_and_grad(total)(logp)
    g = np.asarray(grad)
    assert np.isfinite(g).all()
    assert (g[0] == 0).all() and (g[1] == 0).all()
    assert (g[2] != 0).any()
