"""The last untried attention lever: int8 score/PV matmuls in-kernel.

docs/ROOFLINE.md's attention budget says the fused kernel sits at the
shape-imposed MXU bound for bf16 (d=64 half-fills the 128-wide
contraction; the 208-token edge wastes lane tiles) and flags "int8
scores (<5% expected)" as the one unmeasured lever. After static w8a8
(round 5) the quantized-GEMM share of the encode shrank ~1.8x, so
attention is now the LARGEST term on the serving critical path
(~2/3 of the 59 ms batch-256 step) — if the MXU's int8 double rate
applied to the score/PV matmuls, the upside would be far more than 5%.
This probe measures it instead of guessing.

RESULT (v5e, 2026-08-19, recorded in docs/ROOFLINE.md): int8_qk runs
at 9.6 T-ops/s vs fp32_scores' 16.9 — 1.76x SLOWER. The shape bound is
tile-occupancy (d=64 half-fills the contraction), which int8's
per-tile double rate cannot lift, and the in-kernel per-row quantize
is an un-amortizable VPU tax. Lever measured and rejected.

Three kernel contenders, same grid/BlockSpec as the production kernel
(``ops/pallas_attention.py``), one batch row per cell, heads unrolled:

  1. fp32_scores   — the production kernel's math (baseline)
  2. int8_qk       — q,k dynamically quantized per row IN-KERNEL
                     (VPU abs-max over d=64), QK^T as an int8 dot with
                     int32 accumulation, outer-product rescale; softmax
                     fp32; PV stays bf16
  3. int8_qk_pv    — additionally p (in [0,1], blanket 1/127 scale) and
                     v (per-column abs-max) to int8; PV as an int8 dot

plus the numeric deltas of 2/3 vs 1 (max / mean |out diff| on the
bf16 outputs), because a win that breaks prediction agreement is not a
win. Timing follows probe_int8_mxu's three tunnel rules (full-output
sum consumed, per-trial operand perturbation, short/long chain delta).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_int8_attention.py [B L D H]

Prints one JSON line per contender. Defaults: the batch-256 ViT-B/16
serving attention shape (B=256 rows, L=208 padded tokens, D=768, H=12).
"""

from __future__ import annotations

import functools
import json
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N_SHORT = 4
N_LONG = 16
N_TRIALS = 5


def _quant_rows(x, eps=1e-30):
    """Per-row symmetric int8 quantization on the VPU: [L, d] fp32 ->
    (int8 [L, d], fp32 scale [L, 1])."""
    s = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0 + eps
    return jnp.round(x / s).astype(jnp.int8), s


def _kernel(qkv_ref, mask_ref, o_ref, *, n_heads: int, variant: str):
    blk = qkv_ref[0]                                # [L, 3D]
    D = blk.shape[-1] // 3
    d = D // n_heads
    scale = 1.0 / (d ** 0.5)
    mask = mask_ref[...]                            # [L, L] fp32
    for h in range(n_heads):                        # static unroll
        q = blk[:, h * d:(h + 1) * d]
        k = blk[:, D + h * d:D + (h + 1) * d]
        v = blk[:, 2 * D + h * d:2 * D + (h + 1) * d]
        if variant == "fp32_scores":
            s = jnp.dot(q * scale, k.T,
                        preferred_element_type=jnp.float32) + mask
        else:
            qi, sq = _quant_rows(q.astype(jnp.float32) * scale)
            ki, sk = _quant_rows(k.astype(jnp.float32))
            si = jax.lax.dot_general(
                qi, ki, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)   # [L, L] qi @ ki.T
            s = si.astype(jnp.float32) * (sq * sk.T) + mask
        p = jax.nn.softmax(s, axis=-1)
        if variant == "int8_qk_pv":
            # p in [0, 1]: blanket 1/127 scale, no reduction needed
            pi = jnp.round(p * 127.0).astype(jnp.int8)
            vf = v.astype(jnp.float32)
            sv = jnp.max(jnp.abs(vf), axis=0,
                         keepdims=True) / 127.0 + 1e-30  # [1, d]
            vi = jnp.round(vf / sv).astype(jnp.int8)
            oi = jax.lax.dot_general(
                pi, vi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o = oi.astype(jnp.float32) * (sv / 127.0)
            o_ref[0, :, h * d:(h + 1) * d] = o.astype(v.dtype)
        else:
            o_ref[0, :, h * d:(h + 1) * d] = jnp.dot(
                p.astype(v.dtype), v,
                preferred_element_type=jnp.float32).astype(v.dtype)


def _attn(qkv, mask, n_heads, variant, interpret=False):
    B, L, D3 = qkv.shape
    return pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, variant=variant),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D3), lambda i: (i, 0, 0)),
            pl.BlockSpec((L, L), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, D3 // 3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, D3 // 3), qkv.dtype),
        interpret=interpret,
    )(qkv, mask)


def _rate(variant, qkv, mask, n_heads):
    """Median attention-math tera-ops/s via the short/long chain delta
    (probe_int8_mxu methodology; ratios are the product, absolutes
    carry the same +-15% tunnel caveats)."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(qkv, mask, t, n):
        def body(carry, _):
            pert, acc = carry
            out = _attn(qkv + pert, mask, n_heads, variant)
            s = jnp.sum(out.astype(jnp.float32))
            nxt = (s > 1e30).astype(qkv.dtype)
            return (pert + nxt, acc + s), None
        (_, acc), _ = jax.lax.scan(
            body, (t, jnp.zeros((), jnp.float32)), None, length=n)
        return acc

    def run(t, n):
        return float(jnp.asarray(chained(qkv, mask, t, n), jnp.float32))

    B, L, D3 = qkv.shape
    d = D3 // 3 // n_heads
    flops = 4.0 * B * n_heads * L * L * d * (N_LONG - N_SHORT)
    t0v = jnp.ones((), qkv.dtype)
    run(t0v, N_SHORT)
    run(t0v, N_LONG)
    trials = []
    for i in range(N_TRIALS):
        t = jnp.asarray(0.01 * (2 + i), qkv.dtype)
        t0 = time.perf_counter()
        run(t, N_SHORT)
        t1 = time.perf_counter()
        run(t, N_LONG)
        t2 = time.perf_counter()
        delta = (t2 - t1) - (t1 - t0)
        if delta > 0:
            trials.append((flops / delta / 1e12,
                           delta / (N_LONG - N_SHORT) * 1e3))
    if not trials:
        raise RuntimeError("all trials RTT-noise-dominated")
    trials.sort()
    tops, ms = trials[len(trials) // 2]
    return tops, ms


def main(argv):
    from clip_calibration_tpu.tools.platform import (
        enable_compilation_cache)

    enable_compilation_cache()
    if len(argv) == 5:
        B, L, D, H = map(int, argv[1:])
    else:
        B, L, D, H = 256, 208, 768, 12
    key = jax.random.PRNGKey(0)
    qkv = (jax.random.normal(key, (B, L, 3 * D), jnp.bfloat16)
           * jnp.bfloat16(0.5))
    # padding mask on the last 11 tokens, like the padded vision tower
    mask = jnp.zeros((L, L), jnp.float32).at[:, 197:].set(
        jnp.finfo(jnp.float32).min)

    ref = None
    for variant in ("fp32_scores", "int8_qk", "int8_qk_pv"):
        row = {"variant": variant, "shape": [B, L, D, H]}
        try:
            out = _attn(qkv, mask, H, variant)
            if ref is None:
                ref = jnp.asarray(out, jnp.float32)
            else:
                diff = jnp.abs(jnp.asarray(out, jnp.float32) - ref)
                row["max_abs_diff_vs_fp32"] = round(
                    float(jnp.max(diff)), 5)
                row["mean_abs_diff_vs_fp32"] = round(
                    float(jnp.mean(diff)), 6)
            tops, ms = _rate(variant, qkv, mask, H)
            row["tera_ops_per_s"] = round(tops, 1)
            row["ms_per_call"] = round(ms, 3)
        except Exception as e:  # noqa: BLE001 — a Mosaic rejection IS
            # a result worth recording
            row["error"] = repr(e)[:300]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main(sys.argv)
