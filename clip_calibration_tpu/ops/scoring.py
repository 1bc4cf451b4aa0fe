"""Fused calibrated scoring.

BASELINE.json north star: "cosine-similarity logits, learnable
logit-scale, and the DAC distance-aware temperature compute as a single
fused scoring kernel". This module provides that path: one jit-compiled
program taking raw image/text features and the DAC per-class confidences,
producing calibrated probabilities — normalize, MXU matmul, argmax row
scaling and softmax all fused by XLA with no host round-trips (the
reference runs DAC row scaling as a separate torch pass on GPU after a
numpy hop, ``trainers/calibration/distanse_aware_calibration.py:49-58``).

Also provides the device-side DAC fit (top-k text-distance scores) so the
whole calibrator can run on-chip for large class counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.clip import normalize


@functools.partial(jax.jit, static_argnames=("k", "base_thresh"))
def dac_class_confidence(base_zs: jnp.ndarray, cur_zs: jnp.ndarray,
                         base_tuned: jnp.ndarray, cur_tuned: jnp.ndarray,
                         k: int = 5,
                         base_thresh: float = 0.05) -> jnp.ndarray:
    """Device-side DAC fit: per-class confidence from top-k text-feature
    distances (math of ``dac.py``/reference ``fit``)."""
    def topk_scores(base, cur):
        d2 = (jnp.sum(cur ** 2, -1)[:, None]
              + jnp.sum(base ** 2, -1)[None, :]
              - 2.0 * cur @ base.T)
        d = jnp.sqrt(jnp.maximum(d2, 0.0))
        # fewer base classes than k: take them all, still divide by k
        # (reference semantics)
        k_eff = min(k, d.shape[1])
        neg_top, _ = jax.lax.top_k(-d, k_eff)
        top = -neg_top
        return jnp.exp(-jnp.sum(top, axis=1) / k), top.min(axis=1)

    zs_score, _ = topk_scores(base_zs.astype(jnp.float32),
                              cur_zs.astype(jnp.float32))
    fs_score, fs_min = topk_scores(base_tuned.astype(jnp.float32),
                                   cur_tuned.astype(jnp.float32))
    return jnp.where(fs_min < base_thresh, 1.0, fs_score / zs_score)


@functools.partial(jax.jit, static_argnames=("normalized",))
def fused_dac_scores(image_features: jnp.ndarray,
                     text_features: jnp.ndarray,
                     logit_scale: jnp.ndarray,
                     class_confidence: jnp.ndarray,
                     normalized: bool = False):
    """(img_f [B,E], txt_f [C,E], scalar log-scale, conf [C]) ->
    (calibrated probs [B,C], calibrated logits [B,C]).

    logits = scale * norm(img) @ norm(txt).T, each row multiplied by the
    DAC confidence of its argmax class, then softmax — one fused program.
    ``normalized=True`` skips the normalize (features already unit-norm;
    re-normalizing bf16-rounded features in fp32 would drift the logits
    by up to the bf16 rounding error vs the trainer's own inference).
    """
    if normalized:
        img = image_features.astype(jnp.float32)
        txt = text_features.astype(jnp.float32)
    else:
        img = normalize(image_features).astype(jnp.float32)
        txt = normalize(text_features).astype(jnp.float32)
    scale = jnp.exp(logit_scale.astype(jnp.float32))
    logits = scale * jnp.dot(img, txt.T,
                             preferred_element_type=jnp.float32)
    preds = jnp.argmax(logits, axis=1)
    logits = logits * class_confidence.astype(jnp.float32)[preds][:, None]
    return jax.nn.softmax(logits, axis=-1), logits
