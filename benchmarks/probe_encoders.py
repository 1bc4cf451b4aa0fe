"""On-chip image-encode throughput across the backbone zoo.

bench.py tracks ViT-B/16 (the reference's headline backbone,
``/root/reference/configs/trainers/**/vit_b16*.yaml``); this probe
extends the same chained-scan methodology to every preset the
reference's model zoo ships (``/root/reference/clip/clip.py:30-39``):
ViT-B/32, ViT-L/14, and the ModifiedResNet towers RN50/RN101 — the
NHWC conv + frozen-BN + attention-pool path that otherwise has no
on-chip number.

FLOPs: the ViT towers use the analytic formula (bench.py) — XLA's
cost analysis counts a ``lax.scan`` body ONCE, so it under-counts the
12/24-layer scanned towers ~12x (and cannot see inside the Pallas
attention custom call). The ResNet towers are unscanned pure-XLA
convs, where the compiled cost analysis is accurate. MFU is against
the 197 TFLOP/s nominal v5e bf16 roofline (BASELINE.md).

Run (real chip):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_encoders.py

Prints one JSON row per (preset, batch).
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

from clip_calibration_tpu.models import clip as M
from clip_calibration_tpu.ops.preprocess import normalize_images

PEAK_BF16_FLOPS = 197e12
N_TRIALS = 5
N_ITERS = 20


def _encode_flops(params, cfg, images) -> float:
    """FLOPs for ONE encode of ``images``: analytic for ViT (the
    scanned tower defeats XLA's cost analysis), XLA-estimated for the
    unscanned ResNet convs."""
    if cfg.is_vit:
        from bench import vit_encode_flops
        return vit_encode_flops(cfg) * images.shape[0]

    def encode(params, images):
        x = normalize_images(images)
        return M.normalize(M.encode_image(params, cfg, x))

    compiled = jax.jit(encode).lower(params, images).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost["flops"])


def probe(name: str, batches=(64, 128, 256)):
    dev = jax.devices()[0]
    cfg = M.PRESETS[name]
    params = M.init_clip(jax.random.PRNGKey(0), cfg)

    def encode(params, images):
        x = normalize_images(images)
        return M.normalize(M.encode_image(params, cfg, x))

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(params, images, n):
        def body(carry, _):
            f = encode(params, images ^ carry)
            nxt = (f[0, 0].astype(jnp.float32) > 1e9).astype(jnp.uint8)
            return carry + nxt, None
        c, _ = jax.lax.scan(body, jnp.uint8(0), None, length=n)
        return c

    res = cfg.image_resolution
    rows = []
    for batch in batches:
        images = (jax.random.uniform(
            jax.random.PRNGKey(1), (batch, res, res, 3)) * 255
        ).astype(jnp.uint8)
        images = jax.device_put(images, dev)
        flops = _encode_flops(params, cfg, images) / batch
        int(chained(params, images, N_ITERS))  # compile + warmup
        trials = []
        for _ in range(N_TRIALS):
            t0 = time.perf_counter()
            int(chained(params, images, N_ITERS))
            trials.append(batch * N_ITERS / (time.perf_counter() - t0))
        trials.sort()
        med = trials[len(trials) // 2]
        achieved = med * flops
        row = {
            "preset": name, "batch": batch,
            "images_per_s": round(med, 1),
            "spread": [round(trials[0], 1), round(trials[-1], 1)],
            "flops_per_image_g": round(flops / 1e9, 2),
            "achieved_tflops": round(achieved / 1e12, 1),
            "mfu": round(achieved / PEAK_BF16_FLOPS, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    import sys
    names = sys.argv[1:] or ["ViT-B/16", "ViT-B/32", "ViT-L/14",
                             "RN50", "RN101"]
    for n in names:
        probe(n)
