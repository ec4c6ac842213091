"""Conformance tests: lax MAS vs the NumPy oracle and brute force.

Test strategy per SURVEY.md §4: golden-path equality on random lattices
(ragged batches, forced diagonal, t_x = 1, constant-lattice ties, band
edges), brute-force optimality on small shapes, masking invariance.
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aligner_tpu.ops.mas import mas_lax, maximum_path
from aligner_tpu.ops.mas_reference import mas_single, maximum_path_numpy
from aligner_tpu.utils.masks import lattice_mask


def random_lattice(rng, b, T_x, T_y, scale=4.0):
    return (rng.standard_normal((b, T_x, T_y)) * scale).astype(np.float32)


def run_lax(value, t_xs, t_ys):
    out = mas_lax(jnp.asarray(value), jnp.asarray(t_xs, jnp.int32),
                  jnp.asarray(t_ys, jnp.int32))
    return np.asarray(out).astype(np.int32)


def oracle(value, t_xs, t_ys):
    out = np.zeros(value.shape, np.int32)
    for i in range(value.shape[0]):
        out[i] = mas_single(value[i].astype(np.float32).copy(),
                            int(t_xs[i]), int(t_ys[i]))
    return out


@pytest.mark.parametrize("seed", range(5))
def test_matches_oracle_random_ragged(seed):
    rng = np.random.default_rng(seed)
    B, T_x, T_y = 8, 24, 40
    value = random_lattice(rng, B, T_x, T_y)
    t_xs = rng.integers(1, T_x + 1, B)
    t_ys = np.maximum(t_xs, rng.integers(1, T_y + 1, B))
    np.testing.assert_array_equal(run_lax(value, t_xs, t_ys),
                                  oracle(value, t_xs, t_ys))


def test_edge_shapes():
    rng = np.random.default_rng(0)
    cases = [(1, 1), (1, 17), (5, 5), (16, 16), (16, 17), (2, 40)]
    B = len(cases)
    T_x, T_y = 16, 40
    value = random_lattice(rng, B, T_x, T_y)
    t_xs = np.array([c[0] for c in cases])
    t_ys = np.array([c[1] for c in cases])
    np.testing.assert_array_equal(run_lax(value, t_xs, t_ys),
                                  oracle(value, t_xs, t_ys))


def test_tie_breaking_constant_lattice():
    """All-zero lattice: reference takes transitions as early as possible:
    diagonal to token t_x-1, then stay (SURVEY.md §2.2, verified empirically
    against the reference algorithm)."""
    T_x, T_y = 5, 9
    value = np.zeros((1, T_x, T_y), np.float32)
    got = run_lax(value, [T_x], [T_y])[0]
    want = np.zeros((T_x, T_y), np.int32)
    for y in range(T_y):
        want[min(y, T_x - 1), y] = 1
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, oracle(value, [T_x], [T_y])[0])


def brute_force(value, t_x, t_y):
    """Enumerate all monotonic surjective paths; reference tie rule: among
    co-optimal paths, transitions as early as possible (lexicographically
    smallest token index sequence is NOT it — earliest transition means the
    token index at each frame is maximal among co-optimal paths)."""
    best_score, best_path = None, None
    # path = positions of the t_x - 1 transitions among t_y - 1 gaps
    for cuts in itertools.combinations(range(1, t_y), t_x - 1):
        idx = np.zeros(t_y, np.int32)
        for c in cuts:
            idx[c:] += 1
        score = sum(value[idx[y], y] for y in range(t_y))
        key = (score, tuple(idx))  # larger idx tuple = earlier transitions
        if best_score is None or key > best_score:
            best_score, best_path = key, idx
    path = np.zeros((t_x, t_y), np.int32)
    for y in range(t_y):
        path[best_path[y], y] = 1
    return path


@pytest.mark.parametrize("t_x,t_y,seed", [
    (1, 1, 0), (1, 6, 1), (2, 3, 2), (3, 7, 3), (4, 6, 4),
    (5, 10, 5), (6, 6, 6), (7, 9, 7),
])
def test_brute_force_optimality(t_x, t_y, seed):
    rng = np.random.default_rng(seed)
    value = (rng.standard_normal((1, t_x, t_y))).astype(np.float32)
    got = run_lax(value, [t_x], [t_y])[0]
    want = brute_force(value[0], t_x, t_y)
    np.testing.assert_array_equal(got, want)


def test_padding_garbage_invariance():
    rng = np.random.default_rng(3)
    B, T_x, T_y = 4, 12, 20
    value = random_lattice(rng, B, T_x, T_y)
    t_xs = np.array([5, 12, 1, 7])
    t_ys = np.array([20, 12, 3, 19])
    base = run_lax(value, t_xs, t_ys)
    noisy = value.copy()
    for i in range(B):
        noisy[i, t_xs[i]:, :] = 1e6 * rng.standard_normal((T_x - t_xs[i], T_y))
        noisy[i, :, t_ys[i]:] = 1e6 * rng.standard_normal((T_x, T_y - t_ys[i]))
    np.testing.assert_array_equal(run_lax(noisy, t_xs, t_ys), base)


def test_t_x_greater_than_t_y_returns_zero_path():
    """Documented divergence: reference is silent UB here; we define zeros."""
    value = np.ones((1, 6, 4), np.float32)
    got = run_lax(value, [6], [4])
    np.testing.assert_array_equal(got, np.zeros_like(got))


def test_maximum_path_wrapper_matches_reference_semantics():
    rng = np.random.default_rng(9)
    B, T_x, T_y = 6, 15, 31
    value = random_lattice(rng, B, T_x, T_y)
    t_xs = rng.integers(1, T_x + 1, B)
    t_ys = np.maximum(t_xs, rng.integers(1, T_y + 1, B))
    mask = np.asarray(lattice_mask(jnp.asarray(t_xs), jnp.asarray(t_ys),
                                   T_x, T_y))
    got = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask),
                                  implementation="lax"))
    want = maximum_path_numpy(value, mask)
    np.testing.assert_array_equal(got.astype(np.int32), want)
    # dtype contract: path comes back in value's dtype
    assert got.dtype == value.dtype


def test_inside_jit_and_grad_context():
    """MAS must be usable inside a jitted train step (stop-gradient path)."""
    rng = np.random.default_rng(1)
    B, T_x, T_y = 2, 8, 16
    value = jnp.asarray(random_lattice(rng, B, T_x, T_y))
    mask = lattice_mask(jnp.array([8, 5]), jnp.array([16, 11]), T_x, T_y)

    @jax.jit
    def step(v):
        path = maximum_path(jax.lax.stop_gradient(v), mask,
                            implementation="lax")
        durations = path.sum(-1)
        return durations

    d = step(value)
    np.testing.assert_array_equal(np.asarray(d.sum(-1)), [16, 11])


def test_max_neg_val_knob_matches_oracle():
    """max_neg_val (core.pyx:40's one knob) is exposed through the whole
    stack. With lattice values below a weak sentinel (-1e2) the DP masking
    breaks down *identically* in oracle and kernels."""
    from aligner_tpu.ops.mas import mas_lax, maximum_path
    from aligner_tpu.ops.mas_reference import mas_single

    rng = np.random.default_rng(5)
    B, T_x, T_y = 3, 6, 10
    # values straddling the weak sentinel so it actually matters
    v = (rng.standard_normal((B, T_x, T_y)) * 200.0 - 150.0).astype(
        np.float32)
    t_x = np.array([6, 4, 1], np.int32)
    t_y = np.array([10, 7, 5], np.int32)
    for mnv in (-1e9, -1e2):
        want = np.stack([
            mas_single(v[i].copy(), int(t_x[i]), int(t_y[i]),
                       max_neg_val=mnv) for i in range(B)])
        got = np.asarray(mas_lax(jnp.asarray(v), jnp.asarray(t_x),
                                 jnp.asarray(t_y), max_neg_val=mnv))
        np.testing.assert_array_equal(got, want)
    # the two sentinels genuinely disagree on this lattice
    a = np.asarray(mas_lax(jnp.asarray(v), jnp.asarray(t_x),
                           jnp.asarray(t_y), max_neg_val=-1e9))
    b = np.asarray(mas_lax(jnp.asarray(v), jnp.asarray(t_x),
                           jnp.asarray(t_y), max_neg_val=-1e2))
    assert (a != b).any()
    # and the drop-in wrapper accepts the kwarg
    mask = ((np.arange(T_x)[None, :, None] < t_x[:, None, None])
            & (np.arange(T_y)[None, None, :] < t_y[:, None, None])
            ).astype(np.float32)
    w = np.asarray(maximum_path(jnp.asarray(v), jnp.asarray(mask),
                                implementation="lax", max_neg_val=-1e2))
    np.testing.assert_array_equal(
        w, np.asarray(maximum_path(jnp.asarray(v * mask),
                                   jnp.asarray(mask), implementation="lax",
                                   max_neg_val=-1e2)))
