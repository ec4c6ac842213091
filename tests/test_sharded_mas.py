"""Multi-chip MAS: batch sharding over the virtual 8-device mesh.

The structural claim (docs/design.md): batch-sharded MAS needs zero
cross-chip communication. These tests run maximum_path under jit with an
explicit batch sharding and under shard_map, asserting the paths equal
the single-device result and the output keeps the batch sharding.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from aligner_tpu.ops.mas import mas_lax, maximum_path
from aligner_tpu.parallel import batch_sharding, make_mesh
from aligner_tpu.utils.masks import lattice_mask


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8
    mesh = make_mesh(n_data=8, n_model=1)
    rng = np.random.default_rng(0)
    B, T_x, T_y = 16, 24, 48
    value = jnp.asarray((rng.standard_normal((B, T_x, T_y)) * 3)
                        .astype(np.float32))
    t_xs = rng.integers(1, T_x + 1, B)
    t_ys = np.maximum(t_xs, rng.integers(1, T_y + 1, B))
    mask = lattice_mask(jnp.asarray(t_xs), jnp.asarray(t_ys), T_x, T_y)
    return mesh, value, mask, jnp.asarray(t_xs, jnp.int32), \
        jnp.asarray(t_ys, jnp.int32)


def test_jit_batch_sharded_matches_single_device(setup):
    mesh, value, mask, t_xs, t_ys = setup
    data = batch_sharding(mesh)
    vs = jax.device_put(value, data)
    ms = jax.device_put(mask, data)
    f = jax.jit(lambda v, m: maximum_path(v, m, implementation="lax"))
    out = f(vs, ms)
    ref = maximum_path(value, mask, implementation="lax")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # output stays batch-sharded (no implicit gather)
    assert out.sharding.spec == P("data")


def test_shard_map_no_collectives(setup):
    mesh, value, mask, t_xs, t_ys = setup
    fn = shard_map(
        lambda v, tx, ty: mas_lax(v, tx, ty),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    out = jax.jit(fn)(value, t_xs, t_ys)
    ref = mas_lax(value, t_xs, t_ys)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_compiled_hlo_has_no_collectives(setup):
    mesh, value, mask, t_xs, t_ys = setup
    data = batch_sharding(mesh)
    f = jax.jit(lambda v, tx, ty: mas_lax(v, tx, ty),
                in_shardings=(data, data, data), out_shardings=data)
    compiled = f.lower(value, t_xs, t_ys).compile()
    hlo = compiled.as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "all-to-all", "reduce-scatter"):
        assert coll not in hlo, f"unexpected {coll} in batch-sharded MAS"


def test_sequence_parallel_mas_matches_single_device():
    """Mel axis sharded over 8 devices; pipelined carry via ppermute."""
    from aligner_tpu.parallel.sequence import mas_sequence_parallel

    mesh = make_mesh(n_data=8, n_model=1)
    rng = np.random.default_rng(5)
    B, T_x, T_y = 4, 24, 64   # 8 frames per device
    value = jnp.asarray((rng.standard_normal((B, T_x, T_y)) * 3)
                        .astype(np.float32))
    t_xs = jnp.asarray(rng.integers(1, T_x + 1, B), jnp.int32)
    t_ys = jnp.asarray(
        np.maximum(np.asarray(t_xs), rng.integers(1, T_y + 1, B)),
        jnp.int32)
    got = mas_sequence_parallel(value, t_xs, t_ys, mesh)
    ref = mas_lax(value, t_xs, t_ys)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("M", [2, 4, 8])
def test_sequence_parallel_pipelined_matches_single_device(M):
    """Overlapped microbatch schedule: same paths as the gated schedule
    and the single-device kernel, for fill ratios above/below/at P."""
    from aligner_tpu.parallel.sequence import mas_sequence_parallel

    mesh = make_mesh(n_data=8, n_model=1)
    rng = np.random.default_rng(11 + M)
    B, T_x, T_y = 8, 16, 64
    value = jnp.asarray((rng.standard_normal((B, T_x, T_y)) * 3)
                        .astype(np.float32))
    t_xs = jnp.asarray(rng.integers(1, T_x + 1, B), jnp.int32)
    t_ys = jnp.asarray(
        np.maximum(np.asarray(t_xs), rng.integers(1, T_y + 1, B)),
        jnp.int32)
    got = mas_sequence_parallel(value, t_xs, t_ys, mesh, microbatch=M)
    ref = mas_lax(value, t_xs, t_ys)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_sequence_parallel_pipelined_rejects_bad_microbatch():
    from aligner_tpu.parallel.sequence import mas_sequence_parallel

    mesh = make_mesh(n_data=8, n_model=1)
    with pytest.raises(ValueError, match="microbatch"):
        mas_sequence_parallel(jnp.zeros((6, 4, 64)),
                              jnp.full((6,), 4), jnp.full((6,), 64),
                              mesh, microbatch=4)


def test_sequence_parallel_rejects_indivisible():
    from aligner_tpu.parallel.sequence import mas_sequence_parallel

    mesh = make_mesh(n_data=8, n_model=1)
    with pytest.raises(ValueError, match="divisible"):
        mas_sequence_parallel(jnp.zeros((1, 4, 60)), jnp.array([4]),
                              jnp.array([60]), mesh)
