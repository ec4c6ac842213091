"""C++ CPU oracle: bit-identity vs the NumPy oracle, threading, contract."""
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from aligner_tpu.ops.mas_reference import maximum_path_numpy
from aligner_tpu.utils.masks import lattice_mask

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="g++ not available")


def _batch(seed, B=8, T_x=24, T_y=48):
    rng = np.random.default_rng(seed)
    value = (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32)
    t_xs = rng.integers(1, T_x + 1, B)
    t_ys = np.maximum(t_xs, rng.integers(1, T_y + 1, B))
    mask = np.asarray(lattice_mask(jnp.asarray(t_xs), jnp.asarray(t_ys),
                                   T_x, T_y))
    return value, mask


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("n_threads", [1, 4])
def test_cpp_matches_numpy_oracle(seed, n_threads):
    from aligner_tpu.native import maximum_path_cpp
    value, mask = _batch(seed)
    got = maximum_path_cpp(value, mask, n_threads=n_threads)
    want = maximum_path_numpy(value, mask)
    np.testing.assert_array_equal(got, want)


def test_cpp_does_not_mutate_input():
    from aligner_tpu.native import maximum_path_cpp
    value, mask = _batch(7)
    before = value.copy()
    maximum_path_cpp(value, mask)
    np.testing.assert_array_equal(value, before)


def test_cpp_rejects_invalid_lengths():
    from aligner_tpu.native import maximum_path_cpp
    value = np.ones((1, 6, 4), np.float32)
    mask = np.ones((1, 6, 4), np.float32)  # t_x=6 > t_y=4
    with pytest.raises(ValueError):
        maximum_path_cpp(value, mask)
