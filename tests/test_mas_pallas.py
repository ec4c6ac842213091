"""Pallas MAS kernel conformance (interpret mode on CPU) vs the oracle.

On-device validation runs in bench.py / the driver; here the same kernel
code path is exercised with interpret=True (SURVEY.md §5: Pallas grid
programs validated in interpreter mode against the oracle).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from aligner_tpu.ops.mas_pallas import mas_pallas
from aligner_tpu.ops.mas_reference import mas_single


def oracle(value, t_xs, t_ys):
    out = np.zeros(value.shape, np.int32)
    for i in range(value.shape[0]):
        out[i] = mas_single(value[i].astype(np.float32).copy(),
                            int(t_xs[i]), int(t_ys[i]))
    return out


def run_pallas(value, t_xs, t_ys, fuse=None, quad=None):
    out = mas_pallas(jnp.asarray(value), jnp.asarray(t_xs, jnp.int32),
                     jnp.asarray(t_ys, jnp.int32), interpret=True,
                     fuse=fuse, quad=quad)
    return np.asarray(out).astype(np.int32)


@pytest.mark.parametrize("quad", [None, False])
@pytest.mark.parametrize("seed", range(3))
def test_matches_oracle_ragged(seed, quad):
    """quad=None auto-enables the four-frame composed recurrences at
    these latency-regime shapes; quad=False keeps the pair kernels
    covered."""
    rng = np.random.default_rng(seed)
    B, T_x, T_y = 8, 16, 32
    value = (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32)
    t_xs = rng.integers(1, T_x + 1, B)
    t_ys = np.maximum(t_xs, rng.integers(1, T_y + 1, B))
    np.testing.assert_array_equal(run_pallas(value, t_xs, t_ys, quad=quad),
                                  oracle(value, t_xs, t_ys))


def test_full_lengths_and_ties():
    B, T_x, T_y = 4, 8, 24
    value = np.zeros((B, T_x, T_y), np.float32)
    t_xs = np.array([8, 8, 1, 5])
    t_ys = np.array([24, 8, 24, 5])
    np.testing.assert_array_equal(run_pallas(value, t_xs, t_ys),
                                  oracle(value, t_xs, t_ys))


def test_t_x_greater_than_t_y_zero_path():
    value = np.ones((2, 8, 16), np.float32)
    got = run_pallas(value, [8, 6], [4, 16])
    assert got[0].sum() == 0
    want1 = mas_single(value[1].astype(np.float32).copy(), 6, 16)
    np.testing.assert_array_equal(got[1], want1)


def test_nondivisible_chunk_shapes():
    """T_y not a multiple of the preferred chunk sizes."""
    rng = np.random.default_rng(7)
    B, T_x, T_y = 8, 8, 24  # chunk picker falls back to 8
    value = (rng.standard_normal((B, T_x, T_y)) * 2).astype(np.float32)
    t_xs = rng.integers(1, T_x + 1, B)
    t_ys = np.maximum(t_xs, rng.integers(1, T_y + 1, B))
    np.testing.assert_array_equal(run_pallas(value, t_xs, t_ys),
                                  oracle(value, t_xs, t_ys))


def test_t_x_one_lane():
    """T_x == 1: single-lane arrays exercise the single-step backtrack
    fallback (pair composition requires T_x >= 2)."""
    rng = np.random.default_rng(21)
    value = (rng.standard_normal((4, 1, 16))).astype(np.float32)
    t_xs = np.ones(4, np.int64); t_ys = np.array([16, 9, 1, 4])
    np.testing.assert_array_equal(run_pallas(value, t_xs, t_ys),
                                  oracle(value, t_xs, t_ys))


def test_minimal_t_y_eight():
    rng = np.random.default_rng(22)
    value = (rng.standard_normal((8, 8, 8)) * 2).astype(np.float32)
    t_xs = rng.integers(1, 9, 8); t_ys = np.maximum(t_xs, rng.integers(1, 9, 8))
    np.testing.assert_array_equal(run_pallas(value, t_xs, t_ys),
                                  oracle(value, t_xs, t_ys))


def test_input_validation():
    from aligner_tpu.ops.mas import maximum_path
    with pytest.raises(ValueError, match="expects"):
        maximum_path(jnp.zeros((2, 3)), jnp.zeros((2, 3)))
    with pytest.raises(ValueError, match="differ"):
        maximum_path(jnp.zeros((1, 2, 3)), jnp.zeros((1, 2, 4)))


def test_non_power_of_two_t_x():
    """T_x = 40 (not a lane multiple): full-dim lane blocks still work."""
    rng = np.random.default_rng(31)
    B, T_x, T_y = 4, 40, 64
    value = (rng.standard_normal((B, T_x, T_y)) * 2).astype(np.float32)
    t_xs = rng.integers(1, T_x + 1, B)
    t_ys = np.maximum(t_xs, rng.integers(1, T_y + 1, B))
    np.testing.assert_array_equal(run_pallas(value, t_xs, t_ys),
                                  oracle(value, t_xs, t_ys))


def test_odd_batch_sizes():
    """B not a multiple of 8 (full-dim sublane blocks)."""
    rng = np.random.default_rng(33)
    for B in (1, 5):
        value = (rng.standard_normal((B, 16, 32)) * 2).astype(np.float32)
        t_xs = rng.integers(1, 17, B)
        t_ys = np.maximum(t_xs, rng.integers(1, 33, B))
        np.testing.assert_array_equal(run_pallas(value, t_xs, t_ys),
                                      oracle(value, t_xs, t_ys))


def test_multi_lane_tile_t_x():
    """T_x > 128: lane rolls cross (8,128) tile boundaries."""
    rng = np.random.default_rng(41)
    B, T_x, T_y = 4, 256, 96
    value = (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32)
    t_xs = rng.integers(1, 97, B)  # keep t_x <= t_y
    t_ys = np.maximum(t_xs, rng.integers(1, T_y + 1, B))
    np.testing.assert_array_equal(run_pallas(value, t_xs, t_ys),
                                  oracle(value, t_xs, t_ys))


@pytest.mark.parametrize("fuse", [True, False])
@pytest.mark.parametrize("seed", range(2))
def test_fused_matches_oracle_ragged(seed, fuse):
    """The single-launch fused kernel and the two-kernel pipeline share
    the step helpers; both must be bit-identical to the oracle."""
    rng = np.random.default_rng(100 + seed)
    B, T_x, T_y = 5, 16, 48
    value = (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32)
    t_xs = rng.integers(1, T_x + 1, B)
    t_ys = np.maximum(t_xs, rng.integers(1, T_y + 1, B))
    np.testing.assert_array_equal(run_pallas(value, t_xs, t_ys, fuse=fuse),
                                  oracle(value, t_xs, t_ys))


def test_fused_edge_cases():
    """Ties, t_x > t_y, t_x == t_y, t_x == 1 through the fused kernel."""
    B, T_x, T_y = 4, 8, 24
    value = np.zeros((B, T_x, T_y), np.float32)
    t_xs = np.array([8, 8, 1, 5])
    t_ys = np.array([24, 8, 24, 3])  # last item: t_x > t_y -> zero path
    got = run_pallas(value, t_xs, t_ys, fuse=True)
    assert got[3].sum() == 0
    np.testing.assert_array_equal(
        got[:3], oracle(value[:3], t_xs[:3], t_ys[:3]))


def test_fused_t_x_one_lane():
    rng = np.random.default_rng(23)
    value = rng.standard_normal((3, 1, 16)).astype(np.float32)
    t_xs = np.ones(3, np.int64)
    t_ys = np.array([16, 9, 1])
    np.testing.assert_array_equal(run_pallas(value, t_xs, t_ys, fuse=True),
                                  oracle(value, t_xs, t_ys))


def test_fused_odd_t_y_padding():
    """Odd T_y exercises _pad_frames + the odd-chunk single-step top."""
    rng = np.random.default_rng(27)
    B, T_x, T_y = 3, 8, 21
    value = (rng.standard_normal((B, T_x, T_y)) * 2).astype(np.float32)
    t_xs = rng.integers(1, T_x + 1, B)
    t_ys = np.maximum(t_xs, rng.integers(1, T_y + 1, B))
    np.testing.assert_array_equal(run_pallas(value, t_xs, t_ys, fuse=True),
                                  oracle(value, t_xs, t_ys))


def test_natural_input_multichunk():
    """The natural-layout fused kernel (reference [B,T_x,T_y] input with
    in-kernel block transposes) across multiple chunks (three 16-frame
    chunks via the test-only _chunk override; the TPU config's 128-frame
    chunks are validated on-chip). On device this is the drop-in
    default; here it is called directly (the drop-in only routes to it
    off-interpret)."""
    from aligner_tpu.ops.mas_pallas import mas_pallas_fused_nat

    rng = np.random.default_rng(51)
    B, T_x, T_y = 2, 16, 48
    value = (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32)
    t_xs = rng.integers(1, T_x + 1, B)
    t_ys = np.maximum(t_xs, rng.integers(T_y // 2, T_y + 1, B))
    path_t = mas_pallas_fused_nat(
        jnp.asarray(value), jnp.asarray(t_xs, jnp.int32),
        jnp.asarray(t_ys, jnp.int32), interpret=True, _chunk=16)
    got = np.asarray(jnp.transpose(path_t, (1, 2, 0))).astype(np.int32)
    np.testing.assert_array_equal(got, oracle(value, t_xs, t_ys))


def test_natural_input_whole_axis_chunk():
    """T_y below 128: the natural kernel's chunk is the whole frame axis;
    also covers odd T_y (pads to a multiple of 8) and ties."""
    from aligner_tpu.ops.mas_pallas import mas_pallas_fused_nat

    rng = np.random.default_rng(53)
    B, T_x, T_y = 3, 8, 42
    value = (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32)
    value[0] = 0.0  # tie lattice
    t_xs = np.array([8, 1, 5])
    t_ys = np.array([42, 17, 5])
    path_t = mas_pallas_fused_nat(
        jnp.asarray(value), jnp.asarray(t_xs, jnp.int32),
        jnp.asarray(t_ys, jnp.int32), interpret=True)
    got = np.asarray(jnp.transpose(path_t, (1, 2, 0))).astype(np.int32)
    np.testing.assert_array_equal(got, oracle(value, t_xs, t_ys))


@pytest.mark.parametrize("quad", [None, False])
def test_tie_stress_quantized_lattice(quad):
    """Coarsely quantized values make equal DP sums common, stressing
    the tie rules (forward: ties stay; backtrack: strict <) through the
    composed recurrences."""
    rng = np.random.default_rng(77)
    B, T_x, T_y = 6, 12, 40
    value = rng.integers(-2, 3, (B, T_x, T_y)).astype(np.float32)
    t_xs = rng.integers(1, T_x + 1, B)
    t_ys = np.maximum(t_xs, rng.integers(1, T_y + 1, B))
    np.testing.assert_array_equal(run_pallas(value, t_xs, t_ys, quad=quad),
                                  oracle(value, t_xs, t_ys))


def test_natural_two_kernel_forward():
    """mas_pallas_bits_nat + the unchanged backtrack: the natural-input
    path for bit lattices beyond the fused VMEM budget."""
    from aligner_tpu.ops.mas_pallas import (mas_pallas_backtrack,
                                            mas_pallas_bits_nat)

    rng = np.random.default_rng(61)
    B, T_x, T_y = 3, 8, 40
    value = (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32)
    t_xs = rng.integers(1, T_x + 1, B)
    t_ys = np.maximum(t_xs, rng.integers(T_y // 2, T_y + 1, B))
    bits = mas_pallas_bits_nat(jnp.asarray(value), interpret=True,
                               _chunk=8)
    path_t = mas_pallas_backtrack(bits, jnp.asarray(t_xs, jnp.int32),
                                  jnp.asarray(t_ys, jnp.int32),
                                  interpret=True)
    got = np.asarray(jnp.transpose(path_t[:T_y], (1, 2, 0))) \
        .astype(np.int32)
    np.testing.assert_array_equal(got, oracle(value, t_xs, t_ys))


def test_natural_forward_batch_tiled():
    """The batch-tiled natural forward (grid axis over B-blocks with a
    per-block carry) must equal the single-block sweep — this is the
    serving route for B beyond NAT_FWD_MAX_ELEMS // T_x."""
    from aligner_tpu.ops.mas_pallas import (mas_pallas_backtrack,
                                            mas_pallas_bits_nat)

    rng = np.random.default_rng(62)
    B, T_x, T_y = 6, 8, 40
    value = (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32)
    t_xs = rng.integers(1, T_x + 1, B)
    t_ys = np.maximum(t_xs, rng.integers(T_y // 2, T_y + 1, B))
    for bb in (2, 3):
        bits = mas_pallas_bits_nat(jnp.asarray(value), interpret=True,
                                   _chunk=8, batch_block=bb)
        path_t = mas_pallas_backtrack(bits, jnp.asarray(t_xs, jnp.int32),
                                      jnp.asarray(t_ys, jnp.int32),
                                      interpret=True)
        got = np.asarray(jnp.transpose(path_t[:T_y], (1, 2, 0))) \
            .astype(np.int32)
        np.testing.assert_array_equal(got, oracle(value, t_xs, t_ys))


def test_natural_output_backtrack():
    """mas_pallas_backtrack_nat emits the path in the reference's
    [B, T_x, T_y] layout directly (no XLA transpose); must equal the
    time-major backtrack + transpose bit-for-bit."""
    from aligner_tpu.ops.mas_pallas import (mas_pallas_backtrack,
                                            mas_pallas_backtrack_nat,
                                            mas_pallas_bits_nat)

    rng = np.random.default_rng(63)
    B, T_x, T_y = 4, 8, 40
    value = (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32)
    t_xs = jnp.asarray(rng.integers(1, T_x + 1, B), jnp.int32)
    t_ys = jnp.asarray(np.maximum(np.asarray(t_xs),
                                  rng.integers(T_y // 2, T_y + 1, B)),
                       jnp.int32)
    # one invalid item: t_x > t_y must yield an all-zero path row-set
    t_xs = t_xs.at[1].set(T_x)
    t_ys = t_ys.at[1].set(2)
    bits = mas_pallas_bits_nat(jnp.asarray(value), interpret=True,
                               _chunk=8)
    want = np.asarray(jnp.transpose(
        mas_pallas_backtrack(bits, t_xs, t_ys, interpret=True)[:T_y],
        (1, 2, 0))).astype(np.int32)
    assert not want[1].any()
    for form in ("stage", "cmp"):
        for bb, chunk in ((2, 8), (4, 8), (4, 5)):  # chunk 5: odd walk
            got = np.asarray(mas_pallas_backtrack_nat(
                bits, t_xs, t_ys, interpret=True, batch_block=bb,
                _chunk=chunk, form=form))[:, :, :T_y].astype(np.int32)
            np.testing.assert_array_equal(got, want)


def test_natural_multi_chain_kernels():
    """The K-chain interleaved natural forward/backtrack (latency-hiding
    serving variants) must produce bit-identical bits and paths to the
    single-chain route — including ragged lengths, an invalid item, and
    an odd walk chunk."""
    from aligner_tpu.ops.mas_pallas import (
        mas_pallas_backtrack_nat, mas_pallas_backtrack_nat_multi,
        mas_pallas_bits_nat, mas_pallas_bits_nat_multi)

    rng = np.random.default_rng(64)
    B, T_x, T_y = 8, 8, 40
    value = (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32)
    t_xs = jnp.asarray(rng.integers(1, T_x + 1, B), jnp.int32)
    t_ys = jnp.asarray(np.maximum(np.asarray(t_xs),
                                  rng.integers(T_y // 2, T_y + 1, B)),
                       jnp.int32)
    t_xs = t_xs.at[1].set(T_x)  # invalid item: t_x > t_y
    t_ys = t_ys.at[1].set(2)
    bits1 = np.asarray(mas_pallas_bits_nat(jnp.asarray(value),
                                           interpret=True, _chunk=8))
    want = np.asarray(mas_pallas_backtrack_nat(
        jnp.asarray(bits1), t_xs, t_ys, interpret=True,
        _chunk=8))[:, :, :T_y].astype(np.int32)
    assert not want[1].any()
    for k in (2, 4):
        for q in (False, True):
            bits = mas_pallas_bits_nat_multi(jnp.asarray(value), chains=k,
                                             interpret=True, _chunk=8,
                                             quad=q)
            np.testing.assert_array_equal(np.asarray(bits), bits1)
            for chunk in (8, 5):  # chunk 5: odd walk prologue
                got = np.asarray(mas_pallas_backtrack_nat_multi(
                    bits, t_xs, t_ys, chains=k, interpret=True,
                    _chunk=chunk, quad=q))[:, :, :T_y].astype(np.int32)
                np.testing.assert_array_equal(got, want)
    # single-chain quad variants of the natural two-kernel route
    bits_q = mas_pallas_bits_nat(jnp.asarray(value), interpret=True,
                                 _chunk=8, quad=True)
    np.testing.assert_array_equal(np.asarray(bits_q), bits1)
    got = np.asarray(mas_pallas_backtrack_nat(
        jnp.asarray(bits1), t_xs, t_ys, interpret=True, _chunk=8,
        quad=True))[:, :, :T_y].astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_nat_fused_tiled():
    """Single-launch natural-in/natural-out pipeline (bits in VMEM) is
    bit-identical to the reference oracle across batch tiles, odd
    chunks, quad composition, and the invalid-item contract."""
    from aligner_tpu.ops.mas_pallas import mas_pallas_nat_fused_tiled

    rng = np.random.default_rng(64)
    B, T_x, T_y = 8, 16, 40
    value = (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32)
    t_xs = rng.integers(T_x // 2, T_x + 1, B).astype(np.int32)
    t_ys = np.maximum(t_xs, rng.integers(T_y // 2, T_y + 1, B)) \
        .astype(np.int32)
    want = oracle(value, t_xs, t_ys)
    t_xs[1], t_ys[1] = T_x, 2          # invalid: all-zero path
    want[1] = 0                        # (oracle raises on t_x > t_y)
    for bb, chunk, quad, quad_walk in (
            (2, 8, False, False), (4, 8, True, False), (8, 5, False, False),
            (4, 4, True, True), (2, 8, False, True)):
        got = np.asarray(mas_pallas_nat_fused_tiled(
            jnp.asarray(value), jnp.asarray(t_xs), jnp.asarray(t_ys),
            interpret=True, batch_block=bb, _chunk=chunk,
            quad=quad, quad_walk=quad_walk)).astype(np.int32)
        np.testing.assert_array_equal(got, want)


def test_fused_budget_error():
    from aligner_tpu.ops.mas_pallas import FUSED_BITS_BUDGET, mas_pallas_tm
    T_y = 8 * ((FUSED_BITS_BUDGET // (2 * 128)) // 8 + 8)
    big = jnp.zeros((T_y, 2, 128), jnp.float32)  # > budget
    with pytest.raises(ValueError, match="VMEM scratch"):
        mas_pallas_tm(big, jnp.ones(2, jnp.int32), jnp.ones(2, jnp.int32),
                      interpret=True, fuse=True)


def test_max_neg_val_kwarg_pallas_matches_lax():
    from aligner_tpu.ops.mas import mas_lax
    from aligner_tpu.ops.mas_pallas import mas_pallas

    rng = np.random.default_rng(9)
    v = (rng.standard_normal((2, 5, 8)) * 200.0 - 150.0).astype(np.float32)
    t_x = jnp.array([5, 3], jnp.int32)
    t_y = jnp.array([8, 6], jnp.int32)
    for mnv in (-1e9, -1e2):
        got = np.asarray(mas_pallas(jnp.asarray(v), t_x, t_y,
                                    max_neg_val=mnv))
        want = np.asarray(mas_lax(jnp.asarray(v), t_x, t_y,
                                  max_neg_val=mnv))
        np.testing.assert_array_equal(got, want)


def test_duration_walk_matches_oracle_ragged():
    """mas_pallas_durations + path_from_durations is bit-identical to
    the oracle (a MAS path is a monotone staircase, so durations
    determine it exactly); invalid items yield all-zero durations."""
    from aligner_tpu.ops.mas_pallas import (mas_pallas_bits_nat,
                                            mas_pallas_durations,
                                            path_from_durations)

    rng = np.random.default_rng(0)
    B, T_x, T_y = 16, 16, 64
    v = rng.standard_normal((B, T_x, T_y)).astype(np.float32)
    t_x = rng.integers(1, T_x + 1, B).astype(np.int32)
    t_y = np.maximum(rng.integers(1, T_y + 1, B), t_x).astype(np.int32)
    t_x[3], t_y[3] = 10, 5   # invalid item
    for i in range(B):       # sanitize padding like maximum_path does
        v[i, t_x[i]:, :] = 0
        v[i, :, t_y[i]:] = 0
    bits = mas_pallas_bits_nat(jnp.asarray(v), interpret=True)
    durs = mas_pallas_durations(bits, jnp.asarray(t_x), jnp.asarray(t_y),
                                interpret=True)
    path = np.asarray(path_from_durations(durs, bits.shape[0]))[:, :, :T_y]
    d_np = np.asarray(durs)
    for i in range(B):
        if t_x[i] > t_y[i]:
            assert path[i].sum() == 0 and d_np[i].sum() == 0
            continue
        want = mas_single(v[i], int(t_x[i]), int(t_y[i]))
        np.testing.assert_array_equal(path[i], want)
        np.testing.assert_array_equal(d_np[i], want.sum(-1))


def test_natural_output_backtrack_split():
    """The split form (walk-only packed-index kernel + parallel expand
    kernel) must match the cmp form bit-for-bit: same walk algebra,
    restructured emission. Covers ragged lengths, an invalid item
    (t_x > t_y -> zero rows), odd chunks, pair and quad walks, and walk
    tiles both smaller than and equal to the whole batch."""
    from aligner_tpu.ops.mas_pallas import (mas_pallas_backtrack_nat,
                                            mas_pallas_backtrack_nat_split,
                                            mas_pallas_bits_nat)

    rng = np.random.default_rng(64)
    B, T_x, T_y = 4, 8, 40
    value = (rng.standard_normal((B, T_x, T_y)) * 3).astype(np.float32)
    t_xs = jnp.asarray(rng.integers(1, T_x + 1, B), jnp.int32)
    t_ys = jnp.asarray(np.maximum(np.asarray(t_xs),
                                  rng.integers(T_y // 2, T_y + 1, B)),
                       jnp.int32)
    t_xs = t_xs.at[1].set(T_x)
    t_ys = t_ys.at[1].set(2)
    bits = mas_pallas_bits_nat(jnp.asarray(value), interpret=True,
                               _chunk=8)
    want = np.asarray(mas_pallas_backtrack_nat(
        bits, t_xs, t_ys, interpret=True, batch_block=4,
        _chunk=8))[:, :, :T_y].astype(np.int32)
    assert not want[1].any()
    for wb, eb, chunk in ((4, 2, 8), (2, 4, 8), (4, 4, 5)):
        for quad in (False, True):
            got = np.asarray(mas_pallas_backtrack_nat_split(
                bits, t_xs, t_ys, interpret=True, walk_block=wb,
                expand_block=eb, _chunk=chunk,
                quad=quad))[:, :, :T_y].astype(np.int32)
            np.testing.assert_array_equal(got, want)
