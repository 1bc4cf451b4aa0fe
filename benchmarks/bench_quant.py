"""int8 serving modes: measured speedup vs the bf16 path, per batch.

Per batch size, the image-encode rate with bf16 weights vs the three
int8 modes (weight-only dequant, dynamic w8a8, static-calibrated w8a8)
on the SAME backbone. Measured crossover (docs/PERFORMANCE.md): static
w8a8 wins every batch >= 8 (1.23-1.32x), dynamic wins at batch 1
(1.10x), weight-only is ~neutral for speed at every batch — the
original "weight-bandwidth-bound, approaches 2x at batch 1-8"
expectation was REFUTED by the batch-8 decomposition
(``probe_w8a8_decompose.py``: the win does not grow with quantized
weight bytes; small-batch encode is dispatch/non-GEMM-bound here).

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


_PROBE_WORDS = (
    "dog cat car airplane bird boat chair table tree flower horse sheep "
    "cow bicycle train truck bottle couch clock keyboard laptop pizza "
    "banana apple orange bed oven sink toilet door window book phone "
    "cup fork knife spoon bowl sandwich broccoli carrot donut cake vase "
    "scissors bear zebra giraffe elephant mouse remote toaster bench "
    "umbrella handbag tie suitcase frisbee snowboard kite skateboard "
    "surfboard racket glove helmet lamp").split()


def _agreement_report(params, qparams, sparams, cfg,
                      batch: int = 64) -> dict:
    """Prediction drift of the quantized paths vs the bf16 path on the
    LOADED backbone: zero-shot top-1 agreement over a fixed 64-class
    probe prompt set, max softmax-probability drift, and mean image-
    feature cosine. The error bounds pinned in tests/test_quant.py are
    fixture-measured; this is the per-checkpoint validation to run
    before serving real weights quantized (real CLIP towers carry
    activation outliers the w8a8 per-row scale can be sensitive to).
    Probe images are uniform noise — spot-check on real data via the
    serve CLI if this report is borderline.
    """
    from clip_calibration_tpu.models.tokenizer import tokenize

    tokens = jnp.asarray(tokenize(
        [f"a photo of a {w}." for w in _PROBE_WORDS],
        context_length=cfg.context_length))
    txt = M.normalize(
        M.encode_text(params, cfg, tokens).astype(jnp.float32))
    res = cfg.image_resolution
    images = (jax.random.uniform(
        jax.random.PRNGKey(7), (batch, res, res, 3)) * 255
    ).astype(jnp.uint8)

    @functools.partial(jax.jit, static_argnames=("qmode",))
    def probe(p, images, qmode):
        feats = M.normalize(M.encode_image(
            p, cfg, normalize_images(images), qmode=qmode
        ).astype(jnp.float32))
        probs = jax.nn.softmax(100.0 * feats @ txt.T, axis=-1)
        return feats, probs

    ref_f, ref_p = jax.device_get(probe(params, images, "dequant"))
    out = {"probe_batch": batch, "probe_classes": len(_PROBE_WORDS)}
    for mode, p_ in (("int8", qparams), ("w8a8", qparams),
                     ("w8a8_static", sparams)):
        f, p = jax.device_get(probe(
            p_, images, "dequant" if mode == "int8" else "w8a8"))
        out[mode] = {
            "top1_agreement": round(
                float((p.argmax(-1) == ref_p.argmax(-1)).mean()), 4),
            "max_abs_prob_diff": round(
                float(abs(p - ref_p).max()), 5),
            "mean_feature_cosine": round(
                float((f * ref_f).sum(-1).mean()), 6),
        }
    return out


def main(argv):
    from clip_calibration_tpu.tools.platform import (
        enable_compilation_cache)
    from clip_calibration_tpu.models.backbone import load_clip_backbone
    enable_compilation_cache()
    backbone = argv[1] if len(argv) > 1 and not argv[1].isdigit() \
        else "ViT-B/16"
    batches = [int(a) for a in argv[1:] if a.isdigit()] or [1, 8, 32, 128]
    # real weights when CLIP_CHECKPOINT_DIR (or ~/.cache/clip) resolves
    # the name; random init otherwise — the throughput rows are weight-
    # value-independent but the agreement row is only meaningful on the
    # checkpoint actually being deployed
    params, cfg = load_clip_backbone(backbone)
    qparams = quantize_clip_params(params)
    # static calibrated activation scales (the production w8a8
    # configuration — ops/quant.attach_act_scales): calibrate on a
    # 32-image batch of the same probe distribution
    from clip_calibration_tpu.ops.quant import (attach_act_scales,
                                                calibrate_image_act_scales)
    res = cfg.image_resolution
    cal = (jax.random.uniform(
        jax.random.PRNGKey(11), (32, res, res, 3)) * 255
    ).astype(jnp.uint8)
    sparams = attach_act_scales(
        qparams, calibrate_image_act_scales(qparams, cfg,
                                            normalize_images(cal)))
    print(json.dumps({"backbone": backbone,
                      "agreement_vs_bf16": _agreement_report(
                          params, qparams, sparams, cfg)}), flush=True)
    for batch in batches:
        bf16 = _encode_rate(params, cfg, batch)
        int8 = _encode_rate(qparams, cfg, batch)
        w8a8 = _encode_rate(qparams, cfg, batch, qmode="w8a8")
        w8a8s = _encode_rate(sparams, cfg, batch, qmode="w8a8")
        print(json.dumps({
            "backbone": backbone, "batch": batch,
            "bf16_images_per_s": round(bf16, 1),
            "int8_images_per_s": round(int8, 1),
            "w8a8_images_per_s": round(w8a8, 1),
            "w8a8_static_images_per_s": round(w8a8s, 1),
            "int8_speedup": round(int8 / bf16, 3),
            "w8a8_speedup": round(w8a8 / bf16, 3),
            "w8a8_static_speedup": round(w8a8s / bf16, 3),
            "bf16_ms_per_batch": round(1e3 * batch / bf16, 3),
            "int8_ms_per_batch": round(1e3 * batch / int8, 3),
            "w8a8_ms_per_batch": round(1e3 * batch / w8a8, 3),
            "w8a8_static_ms_per_batch": round(1e3 * batch / w8a8s, 3),
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv)
