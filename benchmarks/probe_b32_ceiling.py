"""Pin the batch-32 ViT-B/16 image-forward ceiling (VERDICT r3 #6).

The CoOp protocol trains at batch 32 (reference
``run/calibration/fewshot_scaling.sh:32-35``), where the image forward
measures ~56% MFU vs 65% at batch 128+ (docs/ROOFLINE.md). The round-2/3
analysis called the gap "shape-imposed" without measuring the bound;
this probe measures it: a chain of EXACTLY the matmuls the b32 forward
issues (same shapes, same dtypes, batched attention contractions
included) with every non-matmul op removed. Whatever rate that chain
achieves IS the MXU ceiling for this shape set — if the real forward is
close to it, the gap is the shape tax; if not, the difference is
fusible overhead (LN/softmax/layout) worth attacking.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_b32_ceiling.py [batch ...]

Prints one JSON line per batch size with the measured forward, the
matmul-only ceiling, and their ratio.
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

from clip_calibration_tpu.models import clip as M
from clip_calibration_tpu.ops.preprocess import normalize_images

N_ITERS = 20
N_TRIALS = 5


def _time_chained(fn, feed, batch):
    """Median img/s of fn chained N_ITERS times with varied inputs
    (tunnel methodology: one scalar fetched per call, data dependence
    between iterations so dispatches cannot be elided)."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(feed, n):
        def body(carry, _):
            out = fn(jax.tree.map(lambda a: a ^ carry if a.dtype ==
                                  jnp.uint8 else a, feed))
            nxt = (out > 1e9).astype(jnp.uint8)
            return carry + nxt, None
        c, _ = jax.lax.scan(body, jnp.uint8(0), None, length=n)
        return c

    int(run(feed, N_ITERS))  # compile + warm
    trials = []
    for _ in range(N_TRIALS):
        t0 = time.perf_counter()
        int(run(feed, N_ITERS))
        trials.append(batch * N_ITERS / (time.perf_counter() - t0))
    trials.sort()
    return trials[len(trials) // 2]


def measured_forward(cfg, params, batch):
    res = cfg.image_resolution
    images = (jax.random.uniform(jax.random.PRNGKey(1),
                                 (batch, res, res, 3)) * 255
              ).astype(jnp.uint8)

    def fwd(feed):
        x = normalize_images(feed["img"])
        f = M.normalize(M.encode_image(params, cfg, x))
        return f[0, 0].astype(jnp.float32)

    return _time_chained(fwd, {"img": images}, batch)


def matmul_ceiling(cfg, batch):
    """The same matmul set the b32 forward issues, nothing else.

    Per layer (tokens N = batch * seq, width D, heads H):
      qkv     [N, D] x [D, 3D]
      scores  [batch*H, L, hd] x [batch*H, hd, L]
      values  [batch*H, L, L] x [batch*H, L, hd]
      out     [N, D] x [D, D]
      mlp     [N, D] x [D, 4D] ; [N, 4D] x [4D, D]
    plus the patchify stem [batch*(L-1), 3p^2] x [3p^2, D] and the
    embed head [batch, D] x [D, E]. All bf16, accumulating through the
    chain so XLA cannot dead-code any matmul.
    """
    L = cfg.vision_seq_len
    D = cfg.vision_width
    H = cfg.vision_heads
    hd = D // H
    p = cfg.vision_patch_size
    N = batch * L
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 8)
    bf = jnp.bfloat16
    w = {
        "stem": jax.random.normal(ks[0], (3 * p * p, D), bf) * 0.02,
        "qkv": jax.random.normal(ks[1], (D, 3 * D), bf) * 0.02,
        "out": jax.random.normal(ks[2], (D, D), bf) * 0.02,
        "up": jax.random.normal(ks[3], (D, 4 * D), bf) * 0.02,
        "down": jax.random.normal(ks[4], (4 * D, D), bf) * 0.02,
        "head": jax.random.normal(ks[5], (D, cfg.embed_dim), bf) * 0.02,
    }
    patches = (jax.random.uniform(
        ks[6], (batch * (L - 1), 3 * p * p)) * 255).astype(jnp.uint8)

    def chain(feed):
        x0 = jnp.dot(feed["patches"].astype(bf), w["stem"])  # stem
        # pad the CLS row back in so token count matches the forward
        x = jnp.concatenate(
            [x0.reshape(batch, L - 1, D),
             jnp.zeros((batch, 1, D), bf)], axis=1).reshape(N, D)
        for _ in range(cfg.vision_layers):
            qkv = jnp.dot(x, w["qkv"])
            q, k, v = jnp.split(qkv.reshape(batch, L, 3 * D), 3, axis=-1)
            q = q.reshape(batch, L, H, hd).transpose(0, 2, 1, 3)
            k = k.reshape(batch, L, H, hd).transpose(0, 2, 1, 3)
            v = v.reshape(batch, L, H, hd).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhld,bhmd->bhlm", q, k)       # scores
            o = jnp.einsum("bhlm,bhmd->bhld", s * 0.01, v)  # values
            o = o.transpose(0, 2, 1, 3).reshape(N, D)
            x = jnp.dot(o, w["out"])                       # out proj
            h = jnp.dot(x, w["up"])                        # mlp up
            x = jnp.dot(h, w["down"])                      # mlp down
            x = x * 0.5  # keep magnitudes bounded; elementwise is free
        f = jnp.dot(x.reshape(batch, L, D)[:, 0], w["head"])
        return f[0, 0].astype(jnp.float32)

    return _time_chained(chain, {"patches": patches}, batch)


def main():
    batches = [int(b) for b in sys.argv[1:]] or [32, 128]
    cfg = M.PRESETS["ViT-B/16"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg)
    from bench import vit_encode_flops, PEAK_BF16_FLOPS
    flops = vit_encode_flops(cfg)
    for batch in batches:
        fwd = measured_forward(cfg, params, batch)
        ceil = matmul_ceiling(cfg, batch)
        print(json.dumps({
            "metric": "b32_forward_ceiling",
            "batch": batch,
            "forward_images_per_s": round(fwd, 1),
            "matmul_only_images_per_s": round(ceil, 1),
            "forward_vs_ceiling": round(fwd / ceil, 3),
            "forward_mfu": round(fwd * flops / PEAK_BF16_FLOPS, 4),
            "ceiling_mfu": round(ceil * flops / PEAK_BF16_FLOPS, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
