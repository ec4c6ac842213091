"""Floor the config-5 encoder backward the way the MAS kernels were
floored (round-4 verdict weak item 5: the backward ladder closed with
"fused/blocked conv kernels ... out of proportion" *without* a
measured roofline — this script turns that judgment into a number).

The mel encoder at config 5 is ConvStack((256, 256, 192), (3, 3, 1))
over [64, 2048, 80] activations (models/encoders.py:62-70); the text
encoder's [64, 128] path is ~16x smaller. Its backward has BOTH a FLOP
floor and a byte floor:

* FLOP floor — dgrad + wgrad of the two k=3 256-channel convs are
  4 matmul-equivalents of the forward's 2; measured against the MXU
  rate this chip actually achieves on the matching im2col matmul
  ([B*T, 3*C] x [3*C, C]), not the paper peak.
* byte floor — every activation/cotangent tensor the backward must
  stream (dy, saved x per layer, dx per layer; the mel input needs no
  grad and embedding wgrad is a scatter over T_x only), at the
  HBM copy rate measured by the same harness as scripts/hbm_ceiling.py.

Roofline = max(flop_time, byte_time). Prints one JSON line per dtype:
measured encoder fwd/bwd (the ladder's fwd / value_and_grad delta
method, docs/design.md "Backward ladder"), both floors, and
%-of-roofline.

Run on the chip: python scripts/encoder_bwd_floor.py [--batch 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t-mel", type=int, default=2048)
    ap.add_argument("--t-text", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--dim", type=int, default=192)
    args = ap.parse_args()

    from aligner_tpu.models.encoders import MelEncoder, TextEncoder
    from aligner_tpu.utils.profiling import measure_device_time

    B, T, T_x = args.batch, args.t_mel, args.t_text
    H, D, M = args.hidden, args.dim, 80
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, T, M)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, 64, (B, T_x)), jnp.int32)
    mel_mask = jnp.ones((B, T), jnp.float32)
    txt_mask = jnp.ones((B, T_x), jnp.float32)

    for dtype_name in ("float32", "bfloat16"):
        dtype = jnp.dtype(dtype_name)
        s = dtype.itemsize
        menc = MelEncoder(dim=D, hidden=H, dtype=dtype)
        tenc = TextEncoder(vocab_size=64, dim=D, hidden=H, dtype=dtype)
        mp = menc.init(jax.random.PRNGKey(0), mel, mel_mask)["params"]
        tp = tenc.init(jax.random.PRNGKey(1), tokens, txt_mask)["params"]

        def fwd(mp, tp):
            q = menc.apply({"params": mp}, mel, mel_mask)
            k = tenc.apply({"params": tp}, tokens, txt_mask)
            # scalar head outside the encoders, negligible traffic
            return jnp.sum(q.astype(jnp.float32) ** 2) + \
                jnp.sum(k.astype(jnp.float32) ** 2)

        f_fwd = jax.jit(fwd)
        f_vg = jax.jit(jax.value_and_grad(fwd, argnums=(0, 1)))
        t_fwd = measure_device_time(lambda: f_fwd(mp, tp))
        t_vg = measure_device_time(lambda: f_vg(mp, tp))
        t_bwd = t_vg - t_fwd

        # --- FLOP floor: measured MXU rate on the matching matmul ---
        # One k=3 conv fwd == [B*T, 3H] x [3H, H]; dgrad+wgrad each
        # match it in FLOPs. Time the exact im2col GEMM at this dtype.
        a = jnp.asarray(rng.standard_normal((B * T, 3 * H)), dtype)
        b = jnp.asarray(rng.standard_normal((3 * H, H)), dtype)
        mm = jax.jit(lambda a, b: a @ b)
        t_mm = measure_device_time(lambda: mm(a, b))
        mm_flops = 2 * (B * T) * (3 * H) * H
        rate = mm_flops / t_mm  # achieved FLOP/s at this dtype
        # backward FLOPs: per conv layer dgrad+wgrad = 2x fwd FLOPs.
        # mel convs: 80->H (k3), H->H (k3), H->D (k1);
        # text convs over T_x: H->H, H->H (k3), H->D (k1) + embed wgrad
        # (scatter, FLOP-free).
        def conv_flops(t, cin, cout, k):
            return 2 * B * t * k * cin * cout
        fwd_flops = (conv_flops(T, M, H, 3) + conv_flops(T, H, H, 3) +
                     conv_flops(T, H, D, 1) +
                     conv_flops(T_x, H, H, 3) * 2 +
                     conv_flops(T_x, H, D, 1))
        bwd_flops = 2 * fwd_flops
        t_flop_floor = bwd_flops / rate

        # --- byte floor: measured HBM copy rate ---
        big = jnp.asarray(rng.standard_normal((64 * 1024 * 1024 // 4,)),
                          jnp.float32)
        cp = jax.jit(lambda x: x + 1.0)
        t_cp = measure_device_time(lambda: cp(big))
        bw = 2 * big.nbytes / t_cp  # read + write
        # backward streams (mel path; text path is T_x/T ~ 1/16):
        #   read dy[D] + x2[H] (conv3 wgrad) ; write dx2[H]
        #   read dx2[H] + x1[H] (conv2) ; write dx1[H]
        #   read dx1[H] + x0[M] (conv1 wgrad only; no dx0 for mel input)
        elems = B * T * (D + H + H + H + H + H + H + M) + \
            B * T_x * (D + 4 * H + H + H)  # text: ... + embed dx0[H]
        t_byte_floor = elems * s / bw

        roofline = max(t_flop_floor, t_byte_floor)
        print(json.dumps({
            "dtype": dtype_name,
            "encoder_fwd_ms": round(t_fwd * 1e3, 3),
            "encoder_bwd_ms": round(t_bwd * 1e3, 3),
            "mxu_rate_tflops": round(rate / 1e12, 1),
            "hbm_copy_gbps": round(bw / 1e9, 1),
            "flop_floor_ms": round(t_flop_floor * 1e3, 3),
            "byte_floor_ms": round(t_byte_floor * 1e3, 3),
            "roofline_ms": round(roofline * 1e3, 3),
            "pct_of_roofline": round(100 * roofline / t_bwd, 1),
        }))


if __name__ == "__main__":
    main()
