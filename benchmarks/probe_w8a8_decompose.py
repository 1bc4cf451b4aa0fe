"""Where does the w8a8 end-to-end gap go? Per-weight-group decomposition.

The fixed ``probe_int8_mxu.py`` (round 4) measures XLA's int8 dot at
1.7-2.2x bf16 at the EXACT batch-256 ViT-B/16 serving GEMM shapes —
yet ``bench.py quant_serving`` measures the full w8a8 tower at 0.924x
bf16. The difference is per-matmul overhead (dynamic activation
quantize: one fused abs-max/scale/round pass over the activations per
GEMM; int32->fp32 rescale epilogue) plus the bf16 ops that do not
quantize (attention score/PV, LN, GELU). Overhead is proportional to
activation bytes, the double-rate win to GEMM FLOPs — so the win
should concentrate where FLOPs/byte is highest (the MLP pair and the
qkv projection) and can go negative on the skinny out-projection.

This probe times the batch-256 serving encode with int8 applied to
nested subsets of the weight groups, bf16 everywhere else:

  bf16        plain tower (baseline)
  mlp         mlp.w_fc + mlp.w_proj w8a8             (2/3 of GEMM FLOPs)
  mlp+qkv     + attn.wqkv                            (11/12)
  full        + attn.wo + patch_kernel + proj        (bench.py's w8a8)

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_w8a8_decompose.py

One JSON line per variant; speedup is vs the bf16 row.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

from clip_calibration_tpu.models import clip as M
from clip_calibration_tpu.ops.preprocess import normalize_images
from clip_calibration_tpu.ops.quant import quantize_int8

N_ITERS = 20
N_TRIALS = 5
BATCH = 256


def _quantize_groups(params, groups):
    """Copy of ``params`` with only ``groups`` quantized (subset of
    ops/quant.quantize_clip_params, which always takes all of them)."""
    v = dict(params["visual"])
    blocks = {k: dict(bv) for k, bv in v["blocks"].items()}
    for outer, key in groups:
        if outer == "stem":
            v[key] = quantize_int8(v[key])
        else:
            blocks[outer][key] = quantize_int8(v["blocks"][outer][key])
    v["blocks"] = blocks
    out = dict(params)
    out["visual"] = v
    return out


def main():
    from clip_calibration_tpu.tools.platform import (
        enable_compilation_cache)
    enable_compilation_cache()
    cfg = M.PRESETS["ViT-B/16"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg)

    @functools.partial(jax.jit, static_argnames=("n", "qmode"))
    def chained(params, images, n, qmode):
        def body(carry, _):
            x = normalize_images(images ^ carry)
            f = M.normalize(M.encode_image(params, cfg, x, qmode=qmode))
            nxt = (f[0, 0].astype(jnp.float32) > 1e9).astype(jnp.uint8)
            return carry + nxt, None
        c, _ = jax.lax.scan(body, jnp.uint8(0), None, length=n)
        return c

    res = cfg.image_resolution
    images = (jax.random.uniform(
        jax.random.PRNGKey(5), (BATCH, res, res, 3)) * 255
    ).astype(jnp.uint8)

    MLP = (("mlp", "w_fc"), ("mlp", "w_proj"))
    QKV = (("attn", "wqkv"),)
    REST = (("attn", "wo"), ("stem", "patch_kernel"), ("stem", "proj"))
    variants = [
        ("bf16", params, "dequant"),
        ("w8a8_mlp", _quantize_groups(params, MLP), "w8a8"),
        ("w8a8_mlp_qkv", _quantize_groups(params, MLP + QKV), "w8a8"),
        ("w8a8_full", _quantize_groups(params, MLP + QKV + REST),
         "w8a8"),
    ]

    base = None
    for name, p, qmode in variants:
        int(chained(p, images, N_ITERS, qmode))  # compile + warm
        trials = []
        for _ in range(N_TRIALS):
            t0 = time.perf_counter()
            int(chained(p, images, N_ITERS, qmode))
            trials.append(BATCH * N_ITERS / (time.perf_counter() - t0))
        trials.sort()
        ips = trials[len(trials) // 2]
        if base is None:
            base = ips
        print(json.dumps({"variant": name, "images_per_s": round(ips, 1),
                          "speedup_vs_bf16": round(ips / base, 3)}),
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
