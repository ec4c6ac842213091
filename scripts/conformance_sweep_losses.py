"""On-device conformance sweep for the loss and skip-lattice kernels.

    python scripts/conformance_sweep_losses.py [--seeds 2] [--interpret]

Round-2 verdict item 1: the pause-aware flagship runs `mas_skip_pallas`
and the forward-sum alpha/gamma kernels on real TPU, but their contracts
were only checked in interpret mode on CPU. This script is the scripted
on-chip gate — the same evidence standard `scripts/conformance_sweep.py`
gives plain MAS (the reference contract of core.pyx:9-35 extended to
every kernel family, SURVEY.md §4):

* skip-lattice Viterbi (`mas_skip_pallas`, pair + per-frame routes):
  bit-identical paths vs the NumPy oracle `skip_dp.mas_skip_single`;
  invalid items (t_x > t_y) must give all-zero paths.
* skip forward-sum (`forward_sum_skip_alpha/gamma_pallas`): loss and
  posterior-occupancy gradient vs the lax oracles (plus the float64
  NumPy loss as an independent anchor).
* plain forward-sum (`forward_sum_alpha/grad_pallas`, pair + per-frame):
  same checks vs the lax `_alpha_scan`/`_beta_scan` oracles.

Tolerances are route-aware, measured on v5e: the per-frame kernels
execute the identical logaddexp nesting as the lax scans and match them
bit-for-bit on chip (asserted at atol 1e-4 for slack); the pair-composed
kernels evaluate an algebraically-equal FLATTENED logsumexp whose
different op sequence exposes the TPU's native exp/log precision
(~1e-7 relative per op), amplified by the O(T_y)-magnitude alphas —
measured <= 1.3e-3 absolute on gamma at the flagship 128x1024 shape,
asserted at 3e-3. (CPU interpret mode, with libm transcendentals,
agrees to ~3e-5 — the deviation is hardware exp/log, not algebra; a
0.1% perturbation of a posterior-occupancy gradient is far below SGD
noise.)

--interpret forces CPU + interpret-mode kernels so CI can run the
identical grid without TPU hardware (mirrored in
.github/workflows/test.yml).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--seeds", type=int, default=2)
ap.add_argument("--interpret", action="store_true",
                help="force CPU + interpret-mode kernels (CI mirror)")
args = ap.parse_args()

import jax  # noqa: E402

if args.interpret:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402

# (B, T_x, T_y, pair, note); pair None = auto route (B*T_s vs the
# 4096-element latency gate), True/False = forced; "invalid" rows mix in
# an item violating 1 <= t_x <= t_y.
SKIP_VITERBI = [
    (1, 16, 40, None, "pair auto, small"),
    (4, 16, 100, None, "odd T_y padding"),
    (8, 64, 256, None, "pair regime"),
    (16, 128, 512, None, "per-frame route (B*T_s > gate)"),
    (4, 64, 256, False, "forced per-frame"),
    (4, 64, 256, True, "forced pair"),
    (2, 16, 40, False, "forced per-frame (small, CI)"),
    (2, 16, 40, True, "forced pair (small, CI)"),
    (2, 1, 8, None, "t_x == 1"),
    (4, 24, 24, None, "t_x == t_y (all pauses skipped)"),
    (3, 8, 40, "invalid", "invalid item -> zero path"),
]
SKIP_FS = [
    (2, 16, 40, None, "small"),
    (4, 16, 100, None, "odd T_y padding"),
    (16, 128, 512, None, "per-frame route"),
    (4, 64, 256, True, "forced pair"),
    (4, 64, 256, False, "forced per-frame"),
    (2, 16, 40, True, "forced pair (small, CI)"),
    (2, 16, 40, False, "forced per-frame (small, CI)"),
    (3, 8, 40, "invalid", "invalid item -> zero loss/grad"),
]
PLAIN_FS = [
    (1, 64, 256, None, "pair auto, small"),
    (1, 16, 40, None, "pair auto (small, CI)"),
    (16, 128, 1024, None, "pair (flagship shape)"),
    (64, 128, 512, None, "per-frame route (B*T_x > gate)"),
    (4, 64, 200, True, "forced pair, odd T_y"),
    (4, 64, 200, False, "forced per-frame, odd T_y"),
    (2, 16, 40, True, "forced pair (small, CI)"),
    (2, 16, 40, False, "forced per-frame (small, CI)"),
    (3, 8, 40, "invalid", "invalid item -> zero loss/grad"),
]
# (B, T_x, T_y, D, note) — MoBo token sweeps (alpha/beta/backpointers)
MOBO = [
    (2, 10, 30, 4, "small (CI)"),
    (16, 128, 1024, 16, "config-4 shape"),
    (8, 33, 200, 8, "odd T_x (chunk padding), odd T_y"),
    (4, 24, 24, 2, "tight window (t_y == t_x, D = 2)"),
    (3, 6, 40, 4, "infeasible item (t_y > t_x * D -> dead lattice)"),
]


def lengths(rng, B, T_x, T_y, mode):
    """Ragged (t_x, t_y) with t_x <= t_y; 'invalid' puts t_x > t_y in
    item 0; T_x == T_y forces the diagonal t_x == t_y."""
    tx = rng.integers(1, min(T_x, T_y) + 1, B).astype(np.int32)
    ty = np.maximum(tx, rng.integers(1, T_y + 1, B)).astype(np.int32)
    if T_x == T_y:
        ty = tx.copy()
    if mode == "invalid":
        tx[0], ty[0] = min(T_x, 5), min(T_x, 5) - 1
    return tx, ty


def check_skip_viterbi(B, T_x, T_y, pair, note, seed):
    from aligner_tpu.ops.skip_dp import mas_skip_single
    from aligner_tpu.ops.skip_dp_pallas import mas_skip_pallas

    mode = pair if isinstance(pair, str) else None
    pair_kw = None if isinstance(pair, str) else pair
    rng = np.random.default_rng(7000 * seed + B + T_x + T_y)
    T_s = 2 * T_x + 1
    v = (rng.standard_normal((B, T_s, T_y)) * 3).astype(np.float32)
    tx, ty = lengths(rng, B, T_x, T_y, mode)
    got = np.asarray(mas_skip_pallas(
        jnp.asarray(v), jnp.asarray(tx), jnp.asarray(ty),
        interpret=args.interpret or None, pair=pair_kw)).astype(np.int32)
    want = np.zeros_like(got)
    for i in range(B):
        if 1 <= tx[i] <= ty[i]:
            want[i] = mas_skip_single(v[i].copy(), int(tx[i]), int(ty[i]))
    return np.array_equal(got, want), "bit"


def check_skip_fs(B, T_x, T_y, pair, note, seed):
    from aligner_tpu.ops.skip_dp import (_total_from_alphas_skip,
                                         _masked_logp_skip,
                                         _valid_items_skip,
                                         forward_sum_skip_numpy,
                                         skip_posteriors)
    from aligner_tpu.ops.skip_dp_pallas import (
        forward_sum_skip_alpha_pallas, forward_sum_skip_gamma_pallas)

    mode = pair if isinstance(pair, str) else None
    pair_kw = None if isinstance(pair, str) else pair
    rng = np.random.default_rng(8000 * seed + B + T_x + T_y)
    T_s = 2 * T_x + 1
    lp = (rng.standard_normal((B, T_y, T_s)) - 2).astype(np.float32)
    tx, ty = lengths(rng, B, T_x, T_y, mode)
    txj, tyj = jnp.asarray(tx), jnp.asarray(ty)
    lpj = jnp.asarray(lp)

    lp_m = _masked_logp_skip(lpj, txj)
    lp_tm = jnp.moveaxis(lp_m, 0, 1)
    valid = np.asarray(_valid_items_skip(txj, tyj))
    alphas = forward_sum_skip_alpha_pallas(lp_tm, tyj,
                                           interpret=args.interpret,
                                           pair=pair_kw)
    total = jnp.where(jnp.asarray(valid),
                      _total_from_alphas_skip(alphas, txj), 0.0)
    gamma = forward_sum_skip_gamma_pallas(lp_tm, alphas, total, txj, tyj,
                                          interpret=args.interpret)
    gamma = np.asarray(jnp.where(jnp.asarray(valid)[None, :, None],
                                 gamma, 0.0))
    total = np.asarray(total)

    # lax oracle (same f32 arithmetic class) + float64 NumPy loss anchor
    gamma_lax, total_lax = skip_posteriors(lpj, txj, tyj)
    gamma_lax = np.moveaxis(np.asarray(gamma_lax), 0, 1)
    total_lax = np.asarray(jnp.where(jnp.asarray(valid), total_lax, 0.0))
    loss_np = np.array([
        forward_sum_skip_numpy(lp[i].T, int(tx[i]), int(ty[i]))
        if valid[i] else 0.0 for i in range(B)])

    pair_eff = (pair_kw if pair_kw is not None
                else B * (2 * T_x + 1) <= 4096)
    atol = 3e-3 if pair_eff else 1e-4  # see module docstring
    ok = (np.allclose(total, total_lax, rtol=1e-5, atol=atol)
          and np.allclose(total, loss_np, rtol=1e-4, atol=atol)
          and np.allclose(gamma, gamma_lax, atol=atol))
    err_l = float(np.abs(total - total_lax).max())
    err_g = float(np.abs(gamma - gamma_lax).max())
    return ok, f"loss_err {err_l:.2e} gamma_err {err_g:.2e}"


def check_plain_fs(B, T_x, T_y, pair, note, seed):
    from aligner_tpu.ops.forward_sum import (_alpha_scan, _beta_scan,
                                             _masked_logp,
                                             _total_from_alphas,
                                             _valid_items)
    from aligner_tpu.ops.forward_sum_pallas import (
        forward_sum_alpha_pallas, forward_sum_grad_pallas)

    mode = pair if isinstance(pair, str) else None
    pair_kw = None if isinstance(pair, str) else pair
    rng = np.random.default_rng(9000 * seed + B + T_x + T_y)
    lp = (rng.standard_normal((B, T_y, T_x)) - 2).astype(np.float32)
    tx, ty = lengths(rng, B, T_x, T_y, mode)
    txj, tyj = jnp.asarray(tx), jnp.asarray(ty)

    lp_m = _masked_logp(jnp.asarray(lp), txj)
    lp_tm = jnp.moveaxis(lp_m, 0, 1)
    valid = np.asarray(_valid_items(txj, tyj))
    alphas, _ = forward_sum_alpha_pallas(lp_tm, tyj,
                                         interpret=args.interpret,
                                         pair=pair_kw)
    total = jnp.where(jnp.asarray(valid),
                      _total_from_alphas(alphas, txj, tyj), 0.0)
    gamma = forward_sum_grad_pallas(lp_tm, alphas, total, txj, tyj,
                                    interpret=args.interpret)
    gamma = np.asarray(jnp.where(jnp.asarray(valid)[None, :, None],
                                 gamma, 0.0))
    total = np.asarray(total)

    alphas_lax = _alpha_scan(lp_tm, tyj)
    total_lax = jnp.where(jnp.asarray(valid),
                          _total_from_alphas(alphas_lax, txj, tyj), 0.0)
    betas = _beta_scan(lp_tm, txj, tyj)
    g_lax = jnp.exp(alphas_lax + betas - total_lax[None, :, None])
    ys = jnp.arange(lp_tm.shape[0])[:, None, None]
    xs = jnp.arange(T_x)[None, None, :]
    g_lax = jnp.where((ys < tyj[None, :, None])
                      & (xs < txj[None, :, None])
                      & jnp.asarray(valid)[None, :, None], g_lax, 0.0)
    g_lax = np.asarray(g_lax)
    total_lax = np.asarray(total_lax)

    pair_eff = pair_kw if pair_kw is not None else B * T_x <= 4096
    atol = 3e-3 if pair_eff else 1e-4  # see module docstring
    ok = (np.allclose(total, total_lax, rtol=1e-5, atol=atol)
          and np.allclose(gamma, g_lax, atol=atol))
    err_l = float(np.abs(total - total_lax).max())
    err_g = float(np.abs(gamma - g_lax).max())
    return ok, f"loss_err {err_l:.2e} gamma_err {err_g:.2e}"


def check_mobo(B, T_x, T_y, D, note, seed):
    """MoBo token sweeps (round-3 Pallas kernels, 2.14x the XLA scan)
    vs the lax-scan oracles: alpha/beta live cells tight, dead cells
    both below the NEG threshold, backpointers equal on live tokens."""
    from aligner_tpu.ops.mobo import (NEG, _beta_scan, _boundary_scan,
                                      _prep_energies)
    from aligner_tpu.ops.mobo_pallas import (mobo_alpha_pallas,
                                             mobo_beta_pallas,
                                             mobo_bp_pallas)

    rng = np.random.default_rng(11000 * seed + B + T_x + T_y)
    e = jnp.asarray(rng.standard_normal((B, T_y, T_x)).astype(np.float32))
    tx = jnp.asarray(rng.integers(max(T_x // 2, 1), T_x + 1, B),
                     jnp.int32)
    ty_raw = rng.integers(max(T_y // 2, 1), T_y + 1, B)
    if "infeasible" in note:
        ty = jnp.asarray(ty_raw, jnp.int32)  # may violate t_y <= t_x*D
    else:
        ty = jnp.asarray(np.minimum(ty_raw, np.asarray(tx) * D),
                         jnp.int32)
    e_tm = _prep_energies(e, tx, ty)

    def delta(got, want):
        got, want = np.asarray(got), np.asarray(want)
        live = want > 0.5 * NEG
        dead_ok = (got[~live] <= 0.5 * NEG).all()
        err = (float(np.abs(got[live] - want[live]).max())
               if live.any() else 0.0)
        return err, dead_ok

    logB_lax, _ = _boundary_scan(e_tm, tx, ty, D, use_max=False)
    err_a, dead_a = delta(
        mobo_alpha_pallas(e_tm, tx, D, interpret=args.interpret),
        logB_lax)
    err_b, dead_b = delta(
        mobo_beta_pallas(e_tm, tx, ty, D, interpret=args.interpret),
        _beta_scan(e_tm, tx, ty, D))
    _, bps_lax = _boundary_scan(e_tm, tx, ty, D, use_max=True)
    got_bp = np.asarray(mobo_bp_pallas(e_tm, tx, D,
                                       interpret=args.interpret))
    want_bp = np.asarray(bps_lax)
    bp_ok = all(
        np.array_equal(got_bp[:int(tx[i]), i], want_bp[:int(tx[i]), i])
        for i in range(B))
    ok = (err_a <= 1e-4 and err_b <= 1e-4 and dead_a and dead_b
          and bp_ok)
    return ok, (f"alpha_err {err_a:.2e} beta_err {err_b:.2e} "
                f"bp {'ok' if bp_ok else 'MISMATCH'}")


def main():
    failures = total = 0
    for B, T_x, T_y, D, note in MOBO:
        if args.interpret and B * T_x * T_y > 30_000:
            print(f"SKIP mobo              B={B:3d} T_x={T_x:3d} "
                  f"T_y={T_y:4d} [{note}] (device-only size)")
            continue
        for seed in range(args.seeds):
            ok, detail = check_mobo(B, T_x, T_y, D, note, seed)
            total += 1
            failures += not ok
            print(f"{'OK  ' if ok else 'FAIL'} {'mobo':17s} B={B:3d} "
                  f"T_x={T_x:3d} T_y={T_y:4d} seed={seed} "
                  f"[{note}] {detail}")
    for name, grid, fn in (("skip-viterbi", SKIP_VITERBI,
                            check_skip_viterbi),
                           ("skip-forward-sum", SKIP_FS, check_skip_fs),
                           ("forward-sum", PLAIN_FS, check_plain_fs)):
        for B, T_x, T_y, pair, note in grid:
            if args.interpret and (B * T_x * T_y > 30_000
                                   or T_y % 16 == 0):
                # Interpret mode traces the unrolled chunk loop op by op;
                # the big auto-route rows are device-only. Their kernel
                # routes stay covered by the forced pair=True/False rows.
                print(f"SKIP {name:17s} B={B:3d} T_x={T_x:3d} "
                      f"T_y={T_y:4d} [{note}] (device-only size)")
                continue
            for seed in range(args.seeds):
                ok, detail = fn(B, T_x, T_y, pair, note, seed)
                total += 1
                failures += not ok
                print(f"{'OK  ' if ok else 'FAIL'} {name:17s} B={B:3d} "
                      f"T_x={T_x:3d} T_y={T_y:4d} seed={seed} "
                      f"[{note}] {detail}")
    if failures:
        print(f"{failures}/{total} FAILURES")
        return 1
    backend = jax.default_backend()
    print(f"all {total} cases conform "
          f"(backend={backend}, interpret={args.interpret})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
