"""Skip-state DP (implicit pause modeling): brute-force conformance,
oracle/lax equality, tie rules, forward-sum gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aligner_tpu.ops.skip_dp import (forward_sum_skip_loss,
                                     forward_sum_skip_numpy, mas_skip_lax,
                                     mas_skip_single, n_states,
                                     skip_posteriors)


def all_skip_paths(t_x, t_y):
    """Enumerate every valid state sequence: start in {0, 1}, end in
    {T_s-2, T_s-1}, moves {0, 1, 2} with 2 only into odd states."""
    T_s = 2 * t_x + 1
    ends = {T_s - 2, T_s - 1}

    def rec(seq):
        s = seq[-1]
        if len(seq) == t_y:
            if s in ends:
                yield tuple(seq)
            return
        for m in (0, 1, 2):
            ns = s + m
            if ns >= T_s:
                continue
            if m == 2 and ns % 2 == 0:
                continue
            yield from rec(seq + [ns])

    for s0 in (0, 1):
        yield from rec([s0])


@pytest.mark.parametrize("t_x,t_y,seed", [
    (1, 1, 0), (1, 3, 1), (2, 2, 2), (2, 4, 3), (3, 5, 4), (3, 7, 5),
])
def test_viterbi_matches_brute_force(t_x, t_y, seed):
    rng = np.random.default_rng(seed)
    T_s = 2 * t_x + 1
    v = rng.standard_normal((T_s + 2, t_y + 3)).astype(np.float32)
    paths = list(all_skip_paths(t_x, t_y))
    assert paths, "no valid path in enumeration"
    scores = [sum(v[s, y] for y, s in enumerate(p)) for p in paths]
    best = paths[int(np.argmax(scores))]

    got = mas_skip_single(v.copy(), t_x, t_y)
    got_states = [int(np.argmax(got[:, y])) for y in range(t_y)]
    assert got[:, :t_y].sum(0).tolist() == [1] * t_y
    np.testing.assert_allclose(
        sum(v[s, y] for y, s in enumerate(got_states)), max(scores),
        rtol=1e-5)
    assert got_states == list(best)  # unique argmax a.s. for random v


@pytest.mark.parametrize("seed", range(4))
def test_lax_matches_oracle_ragged(seed):
    rng = np.random.default_rng(seed)
    B, T_x_max, T_y_max = 4, 5, 12
    T_s = 2 * T_x_max + 1
    v = rng.standard_normal((B, T_s, T_y_max)).astype(np.float32)
    t_x = rng.integers(1, T_x_max + 1, B).astype(np.int32)
    t_y = np.maximum(rng.integers(1, T_y_max + 1, B), t_x).astype(np.int32)
    got = np.asarray(mas_skip_lax(jnp.asarray(v), jnp.asarray(t_x),
                                  jnp.asarray(t_y)))
    for i in range(B):
        want = mas_skip_single(v[i].copy(), int(t_x[i]), int(t_y[i]))
        np.testing.assert_array_equal(got[i], want, err_msg=f"item {i}")


def test_all_zero_lattice_skips_all_pauses():
    """Tie rule: zero lattice -> token j at frame j (skips every pause),
    then stay on the last token — transitions as early as possible,
    mirroring the plain-MAS convention."""
    t_x, t_y = 4, 9
    T_s = 2 * t_x + 1
    v = np.zeros((T_s, t_y), np.float32)
    path = mas_skip_single(v, t_x, t_y)
    states = [int(np.argmax(path[:, y])) for y in range(t_y)]
    want = [2 * j + 1 for j in range(t_x)] + [2 * t_x - 1] * (t_y - t_x)
    assert states == want
    lax_path = np.asarray(mas_skip_lax(
        jnp.zeros((1, T_s, t_y)), jnp.array([t_x]), jnp.array([t_y])))[0]
    np.testing.assert_array_equal(lax_path, path)


def test_pause_absorbs_silence():
    """A lattice that loves the pause state mid-utterance routes frames
    through it; token states still get their frames."""
    t_x, t_y = 2, 6
    T_s = 2 * t_x + 1        # states: P0 t0 P1 t1 P2
    v = np.full((T_s, t_y), -5.0, np.float32)
    v[1, 0] = v[1, 1] = 0.0   # token 0: frames 0-1
    v[2, 2] = v[2, 3] = 0.0   # pause between tokens: frames 2-3
    v[3, 4] = v[3, 5] = 0.0   # token 1: frames 4-5
    path = mas_skip_single(v, t_x, t_y)
    states = [int(np.argmax(path[:, y])) for y in range(t_y)]
    assert states == [1, 1, 2, 2, 3, 3]


def test_invalid_lengths_zero_path():
    v = jnp.zeros((2, 7, 4))
    t_x = jnp.array([3, 0], jnp.int32)   # t_x > t_y; t_x = 0
    t_y = jnp.array([2, 4], jnp.int32)
    p = np.asarray(mas_skip_lax(v, t_x, t_y))
    assert (p == 0).all()


def brute_force_skip_logmarginal(logp_sm, t_x, t_y):
    scores = []
    for p in all_skip_paths(t_x, t_y):
        scores.append(sum(logp_sm[s, y] for y, s in enumerate(p)))
    m = max(scores)
    return m + np.log(sum(np.exp(s - m) for s in scores))


@pytest.mark.parametrize("t_x,t_y,seed", [
    (1, 1, 0), (1, 4, 1), (2, 3, 2), (2, 5, 3), (3, 6, 4),
])
def test_forward_sum_skip_matches_brute_force(t_x, t_y, seed):
    rng = np.random.default_rng(seed)
    T_s = 2 * t_x + 1
    lp_sm = np.log(rng.dirichlet(np.ones(T_s), t_y).T).astype(np.float32)
    want = brute_force_skip_logmarginal(lp_sm, t_x, t_y)
    # numpy reference
    np.testing.assert_allclose(forward_sum_skip_numpy(lp_sm, t_x, t_y),
                               want, rtol=1e-5)
    # jax loss (frame-major, padded)
    lp_fm = np.full((1, t_y + 2, T_s + 3), -1.0, np.float32)
    lp_fm[0, :t_y, :T_s] = lp_sm.T
    loss = forward_sum_skip_loss(jnp.asarray(lp_fm),
                                 jnp.array([t_x], jnp.int32),
                                 jnp.array([t_y], jnp.int32))
    np.testing.assert_allclose(float(loss[0]), -want, rtol=1e-5)


def test_forward_sum_skip_gradient_finite_differences():
    rng = np.random.default_rng(7)
    B, T_y, t_x = 2, 5, 2
    T_s = 2 * t_x + 1
    lp = rng.standard_normal((B, T_y, T_s)).astype(np.float32) - 1.0
    t_xs = jnp.array([2, 1], jnp.int32)
    t_ys = jnp.array([5, 4], jnp.int32)

    def total(x):
        return forward_sum_skip_loss(x, t_xs, t_ys).sum()

    g = np.asarray(jax.grad(total)(jnp.asarray(lp)))
    eps = 1e-3
    rng2 = np.random.default_rng(8)
    for _ in range(8):
        b = rng2.integers(0, B)
        y = rng2.integers(0, int(t_ys[b]))
        s = rng2.integers(0, 2 * int(t_xs[b]) + 1)
        d = np.zeros_like(lp)
        d[b, y, s] = eps
        fd = (float(total(jnp.asarray(lp + d)))
              - float(total(jnp.asarray(lp - d)))) / (2 * eps)
        np.testing.assert_allclose(g[b, y, s], fd, rtol=2e-2, atol=2e-3)


def test_skip_posteriors_normalized():
    rng = np.random.default_rng(3)
    B, T_y, t_x = 2, 6, 2
    T_s = 2 * t_x + 1
    lp = jnp.asarray(
        np.log(rng.dirichlet(np.ones(T_s), (B, T_y))).astype(np.float32))
    t_xs = jnp.array([2, 2], jnp.int32)
    t_ys = jnp.array([6, 4], jnp.int32)
    gamma, total = skip_posteriors(lp, t_xs, t_ys)
    gamma = np.asarray(gamma)
    for b in range(B):
        sums = gamma[b, :int(t_ys[b])].sum(-1)
        np.testing.assert_allclose(sums, 1.0, rtol=1e-4)
        assert (gamma[b, int(t_ys[b]):] == 0).all()


def test_forward_sum_skip_degenerate_and_inf_safe():
    rng = np.random.default_rng(1)
    lp = rng.standard_normal((3, 6, 9)).astype(np.float32)
    lp[2, :, 4] = -np.inf
    t_x = jnp.array([0, 5, 3], jnp.int32)   # invalid; t_x > t_y; valid
    t_y = jnp.array([6, 4, 6], jnp.int32)
    loss, grad = jax.value_and_grad(
        lambda x: forward_sum_skip_loss(x, t_x, t_y).sum())(jnp.asarray(lp))
    assert np.isfinite(float(loss))
    g = np.asarray(grad)
    assert np.isfinite(g).all()
    assert (g[0] == 0).all() and (g[1] == 0).all()
    assert (g[2, :, 4] == 0).all()


# ---------------------------------------------------------------------------
# Pallas kernels (interpret mode on CPU; real TPU covered by bench/verify)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("pair", [None, False])
@pytest.mark.parametrize("seed", range(3))
def test_mas_skip_pallas_matches_lax(seed, pair):
    """pair=None auto-enables the two-frame composed sweeps at these
    latency-regime shapes; pair=False keeps the per-frame bodies
    covered."""
    from aligner_tpu.ops.skip_dp_pallas import mas_skip_pallas

    rng = np.random.default_rng(seed)
    B, T_x_max, T_y = 4, 6, 24
    T_s = 2 * T_x_max + 1
    v = rng.standard_normal((B, T_s, T_y)).astype(np.float32)
    t_x = rng.integers(1, T_x_max + 1, B).astype(np.int32)
    t_y = np.maximum(rng.integers(2, T_y + 1, B), t_x).astype(np.int32)
    got = np.asarray(mas_skip_pallas(jnp.asarray(v), jnp.asarray(t_x),
                                     jnp.asarray(t_y), interpret=True,
                                     pair=pair))
    want = np.asarray(mas_skip_lax(jnp.asarray(v), jnp.asarray(t_x),
                                   jnp.asarray(t_y)))
    np.testing.assert_array_equal(got, want)


def test_mas_skip_pallas_ties_and_invalid():
    from aligner_tpu.ops.skip_dp_pallas import mas_skip_pallas

    t_x, T_y = 4, 16
    T_s = 2 * t_x + 1
    v = jnp.zeros((3, T_s, T_y))
    t_xs = jnp.array([t_x, t_x, 0], jnp.int32)
    t_ys = jnp.array([9, 16, 8], jnp.int32)
    got = np.asarray(mas_skip_pallas(v, t_xs, t_ys, interpret=True))
    want = np.asarray(mas_skip_lax(v, t_xs, t_ys))
    np.testing.assert_array_equal(got, want)
    assert (got[2] == 0).all()


@pytest.mark.parametrize("pair", [None, False])
@pytest.mark.parametrize("seed", range(2))
def test_forward_sum_skip_pallas_matches_lax(seed, pair):
    from aligner_tpu.ops.skip_dp import (_alpha_scan_skip, _beta_scan_skip,
                                         _masked_logp_skip, n_states,
                                         _total_from_alphas_skip)
    from aligner_tpu.ops.skip_dp_pallas import (
        forward_sum_skip_alpha_pallas, forward_sum_skip_gamma_pallas)

    rng = np.random.default_rng(seed)
    B, T_x_max, T_y = 3, 5, 16
    T_s = 2 * T_x_max + 1
    lp = rng.standard_normal((B, T_y, T_s)).astype(np.float32) - 1.0
    t_x = jnp.asarray(rng.integers(1, T_x_max + 1, B).astype(np.int32))
    t_y = jnp.asarray(np.maximum(
        rng.integers(4, T_y + 1, B), np.asarray(t_x)).astype(np.int32))
    lpm = _masked_logp_skip(jnp.asarray(lp), t_x)
    lp_tm = jnp.moveaxis(lpm, 0, 1)
    a_lax = _alpha_scan_skip(lp_tm, t_y)
    a_pl = forward_sum_skip_alpha_pallas(lp_tm, t_y, interpret=True,
                                         pair=pair)
    np.testing.assert_allclose(np.asarray(a_pl), np.asarray(a_lax),
                               rtol=1e-5, atol=1e-5)
    total = _total_from_alphas_skip(a_lax, t_x)
    g_pl = forward_sum_skip_gamma_pallas(lp_tm, a_lax, total, t_x, t_y,
                                         interpret=True)
    b_lax = _beta_scan_skip(lp_tm, t_x, t_y)
    g_lax = np.exp(np.asarray(a_lax) + np.asarray(b_lax)
                   - np.asarray(total)[None, :, None])
    ys = np.arange(T_y)[:, None, None]
    ss = np.arange(T_s)[None, None, :]
    in_range = ((ys < np.asarray(t_y)[None, :, None])
                & (ss < np.asarray(n_states(t_x))[None, :, None]))
    g_lax = np.where(in_range, g_lax, 0.0)
    np.testing.assert_allclose(np.asarray(g_pl), g_lax,
                               rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# Pause entry cost (round 4: pause-count prior / serving precision knob)
# ---------------------------------------------------------------------------

def _n_pauses(path_states):
    return len({s for s in path_states if s % 2 == 0})


@pytest.mark.parametrize("t_x,t_y,cost", [
    (2, 4, -1.5), (3, 5, -0.7), (3, 7, 0.9), (2, 2, -2.0),
])
def test_enter_cost_semantics_brute_force(t_x, t_y, cost):
    """enter_cost adds exactly cost * (#pauses used) to every path score
    (a monotonic path enters each pause once), for both the Viterbi
    argmax and the forward-sum marginal."""
    rng = np.random.default_rng(t_x * 10 + t_y)
    T_s = 2 * t_x + 1
    v = rng.standard_normal((T_s + 2, t_y + 3)).astype(np.float32)
    paths = list(all_skip_paths(t_x, t_y))
    scores = [sum(v[s, y] for y, s in enumerate(p)) + cost * _n_pauses(p)
              for p in paths]
    best = paths[int(np.argmax(scores))]

    got = mas_skip_single(v.copy(), t_x, t_y, enter_cost=cost)
    got_states = [int(np.argmax(got[:, y])) for y in range(t_y)]
    assert got_states == list(best)

    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(v), axis=0))
    lscores = [sum(lp[s, y] for y, s in enumerate(p))
               + cost * _n_pauses(p) for p in paths]
    want = float(np.logaddexp.reduce(lscores))
    np.testing.assert_allclose(
        forward_sum_skip_numpy(lp, t_x, t_y, enter_cost=cost), want,
        rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cost", [-1.5, 0.8])
def test_enter_cost_lax_matches_oracle(cost):
    rng = np.random.default_rng(101)
    B, T_s, T_y = 5, 13, 19
    v = rng.standard_normal((B, T_s, T_y)).astype(np.float32)
    t_x = np.array([6, 4, 1, 5, 3], np.int32)
    t_y = np.array([19, 12, 7, 16, 3], np.int32)
    got = np.asarray(mas_skip_lax(jnp.asarray(v), jnp.asarray(t_x),
                                  jnp.asarray(t_y), enter_cost=cost))
    for i in range(B):
        want = mas_skip_single(v[i], int(t_x[i]), int(t_y[i]),
                               enter_cost=cost)
        np.testing.assert_array_equal(got[i], want)


@pytest.mark.parametrize("pair", [False, True])
@pytest.mark.parametrize("cost", [-1.2, 0.6])
def test_enter_cost_pallas_matches_lax(cost, pair):
    from aligner_tpu.ops.skip_dp_pallas import mas_skip_pallas

    rng = np.random.default_rng(103)
    B, T_s, T_y = 4, 11, 24
    v = rng.standard_normal((B, T_s, T_y)).astype(np.float32)
    t_x = jnp.asarray(np.array([5, 3, 1, 4], np.int32))
    t_y = jnp.asarray(np.array([24, 15, 9, 20], np.int32))
    got = np.asarray(mas_skip_pallas(jnp.asarray(v), t_x, t_y,
                                     interpret=True, pair=pair,
                                     enter_cost=cost))
    want = np.asarray(mas_skip_lax(jnp.asarray(v), t_x, t_y,
                                   enter_cost=cost))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("pair", [False, True])
def test_enter_cost_forward_sum_pallas_matches_lax(pair):
    from aligner_tpu.ops.skip_dp import (_alpha_scan_skip,
                                         _beta_scan_skip,
                                         _masked_logp_skip,
                                         _total_from_alphas_skip)
    from aligner_tpu.ops.skip_dp_pallas import (
        forward_sum_skip_alpha_pallas, forward_sum_skip_gamma_pallas)

    cost = -1.3
    rng = np.random.default_rng(107)
    B, T_s, T_y = 3, 11, 24
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T_y, T_s)).astype(np.float32)),
        axis=2)
    t_x = jnp.asarray(np.array([5, 3, 4], np.int32))
    t_y = jnp.asarray(np.array([24, 15, 20], np.int32))
    lp_m = _masked_logp_skip(lp, t_x)
    lp_tm = jnp.moveaxis(lp_m, 0, 1)
    a_lax = _alpha_scan_skip(lp_tm, t_y, cost)
    a_pal = forward_sum_skip_alpha_pallas(lp_tm, t_y, interpret=True,
                                          pair=pair, enter_cost=cost)
    live = np.asarray(a_lax) > 0.5 * -1e15
    np.testing.assert_allclose(np.asarray(a_pal)[live],
                               np.asarray(a_lax)[live],
                               rtol=1e-5, atol=1e-5)
    total = _total_from_alphas_skip(a_lax, t_x)
    g_lax = jnp.exp(a_lax + _beta_scan_skip(lp_tm, t_x, t_y, cost)
                    - total[None, :, None])
    g_pal = forward_sum_skip_gamma_pallas(lp_tm, a_lax, total, t_x, t_y,
                                          interpret=True, enter_cost=cost)
    ys = np.arange(T_y)[:, None, None]
    ss = np.arange(T_s)[None, None, :]
    in_range = (ys < np.asarray(t_y)[None, :, None]) \
        & (ss < np.asarray(n_states(t_x))[None, :, None])
    np.testing.assert_allclose(np.asarray(g_pal)[in_range],
                               np.asarray(g_lax)[in_range],
                               rtol=1e-4, atol=1e-5)


def test_enter_cost_grad_matches_plain_autodiff():
    from aligner_tpu.ops.skip_dp import (_alpha_scan_skip,
                                         _masked_logp_skip,
                                         _total_from_alphas_skip,
                                         _valid_items_skip)

    rng = np.random.default_rng(109)
    B, T_s, T_y = 4, 11, 17
    v = rng.standard_normal((B, T_s, T_y)).astype(np.float32)
    t_x = jnp.asarray(np.array([5, 4, 3, 5], np.int32))
    t_y = jnp.asarray(np.array([17, 12, 9, 14], np.int32))
    lp_fm = jnp.transpose(jax.nn.log_softmax(jnp.asarray(v), axis=1),
                          (0, 2, 1))

    def plain_loss(x, c):
        lp = _masked_logp_skip(x.astype(jnp.float32), t_x)
        lp_tm = jnp.moveaxis(lp, 0, 1)
        alphas = _alpha_scan_skip(lp_tm, t_y, c)
        valid = _valid_items_skip(t_x, t_y)
        total = jnp.where(valid,
                          _total_from_alphas_skip(alphas, t_x), 0.0)
        return (-total).sum()

    for c in (0.0, -1.5, 0.8):
        g1 = jax.grad(lambda x: forward_sum_skip_loss(
            x, t_x, t_y, enter_cost=c).sum())(lp_fm)
        g2 = jax.grad(lambda x: plain_loss(x, c))(lp_fm)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5)
