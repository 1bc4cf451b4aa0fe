"""int8 weight-only serving: measured speedup vs the bf16 path.

The quantized tower (``ops/quant.py``) halves the vision tower's HBM
weight traffic; at small serving batches the weight read dominates the
encode (the activations are tiny), so the win should approach 2x at
batch 1-8 and fade as the batch grows compute-bound. This benchmark
measures exactly that crossover: per batch size, the image-encode rate
with bf16 weights vs int8 weights on the SAME backbone.

Tunnel methodology (see bench.py): iterations are chained inside one
jit with a data dependence and only a scalar is fetched, because the
remote-device tunnel elides repeated identical dispatches.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_quant.py [backbone] [batch ...]

Prints one JSON line per batch size.
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
from clip_calibration_tpu.ops.quant import quantize_clip_params

N_ITERS = 20
N_TRIALS = 5


def _encode_rate(params, cfg, batch: int, qmode: str = "dequant") -> float:
    """Median images/s for the normalized image encode at ``batch``."""

    def encode(params, images):
        x = normalize_images(images)
        return M.normalize(M.encode_image(params, cfg, x, qmode=qmode))

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(params, images, n):
        def body(carry, _):
            f = encode(params, images ^ carry)
            nxt = (f[0, 0].astype(jnp.float32) > 1e9).astype(jnp.uint8)
            return carry + nxt, None
        c, _ = jax.lax.scan(body, jnp.uint8(0), None, length=n)
        return c

    res = cfg.image_resolution
    images = (jax.random.uniform(
        jax.random.PRNGKey(1), (batch, res, res, 3)) * 255
    ).astype(jnp.uint8)
    int(chained(params, images, N_ITERS))  # compile + warmup
    trials = []
    for _ in range(N_TRIALS):
        t0 = time.perf_counter()
        int(chained(params, images, N_ITERS))
        trials.append(batch * N_ITERS / (time.perf_counter() - t0))
    trials.sort()
    return trials[len(trials) // 2]


def main(argv):
    from clip_calibration_tpu.tools.platform import (
        enable_compilation_cache)
    enable_compilation_cache()
    backbone = argv[1] if len(argv) > 1 and not argv[1].isdigit() \
        else "ViT-B/16"
    batches = [int(a) for a in argv[1:] if a.isdigit()] or [1, 8, 32, 128]
    cfg = M.PRESETS[backbone]
    params = M.init_clip(jax.random.PRNGKey(0), cfg)
    qparams = quantize_clip_params(params)
    for batch in batches:
        bf16 = _encode_rate(params, cfg, batch)
        int8 = _encode_rate(qparams, cfg, batch)
        w8a8 = _encode_rate(qparams, cfg, batch, qmode="w8a8")
        print(json.dumps({
            "backbone": backbone, "batch": batch,
            "bf16_images_per_s": round(bf16, 1),
            "int8_images_per_s": round(int8, 1),
            "w8a8_images_per_s": round(w8a8, 1),
            "int8_speedup": round(int8 / bf16, 3),
            "w8a8_speedup": round(w8a8 / bf16, 3),
            "bf16_ms_per_batch": round(1e3 * batch / bf16, 3),
            "int8_ms_per_batch": round(1e3 * batch / int8, 3),
            "w8a8_ms_per_batch": round(1e3 * batch / w8a8, 3),
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv)
