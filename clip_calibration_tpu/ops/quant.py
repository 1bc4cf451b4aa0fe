"""Weight-only int8 quantization for serving (beyond-reference).

The reference serves fp16 at best (``/root/reference/clip/model.py:632-653``
convert_weights); this module halves the serving HBM footprint and weight
bandwidth instead: matmul weights are stored int8 with per-output-channel
fp32 scales and dequantized *inside* the jit program right where each
layer's slice is consumed. On TPU the weight read is the small-batch
serving bottleneck (an image-encode at batch<=8 is HBM-bandwidth-bound,
see docs/ROOFLINE.md), so int8 weights move the bandwidth roofline 2x;
activations and accumulation stay bf16/fp32 (symmetric 127-step
quantization per output channel; tests/test_quant.py pins error bounds
on the golden fixture backbone). Those bounds are fixture-measured, not
universal: real CLIP checkpoints carry activation outliers that the
``w8a8`` per-row dynamic activation scale can be sensitive to — validate
any production checkpoint with ``benchmarks/bench_quant.py``, which
reports top-1 agreement and probability drift vs the full-precision
path alongside throughput.

Design notes:
- a quantized weight is the pytree leaf pair ``{"int8": q, "scale": s}``
  with ``q`` int8 shaped like the weight and ``s`` fp32 broadcast-shaped
  (contraction axis reduced, kept as 1). Stacked per-layer weights
  [L, in, out] keep per-(layer, out-channel) scales [L, 1, out] — a
  ``lax.scan`` over the stacked blocks slices both leaves in lock-step,
  so the per-layer dequant happens in-loop and cannot be hoisted into a
  full-precision materialization of the whole stack.
- only the *towers'* matmul weights quantize (qkv/out-proj/MLP/patch
  kernel/projections). LayerNorms, embeddings, biases and logit_scale
  stay fp32 — mirroring the precision policy that already keeps those
  islands exact (CLAUDE.md conventions).
- quantization is a serving-side transform (``serving.Predictor(...,
  quantize="int8")``); training/eval and checkpoints never see int8
  leaves.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QuantizedWeight = Dict[str, jnp.ndarray]  # {"int8": ..., "scale": ...}


def quantize_int8(w: jnp.ndarray, axis: int = -2) -> QuantizedWeight:
    """Symmetric per-output-channel int8 quantization.

    ``axis`` is the contraction (fan-in) axis the scale reduces over —
    default -2 fits every ``[..., in, out]`` matmul weight here,
    including stacked ``[L, in, out]`` blocks (per-layer, per-column
    scales). All-zero columns get scale 1 so dequant stays exact.
    """
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"int8": q, "scale": scale}


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "int8" in w


def dequantize(w: QuantizedWeight, dtype=jnp.bfloat16) -> jnp.ndarray:
    """int8 x fp32 scale -> ``dtype``. The multiply runs in fp32 (int8
    magnitudes are exact in fp32; the only rounding is the final cast),
    and XLA fuses the convert+scale into the consuming matmul's operand
    read — the weight crosses HBM as int8."""
    return (w["int8"].astype(jnp.float32) * w["scale"]).astype(dtype)


def quantize_activations_int8(x: jnp.ndarray):
    """Dynamic symmetric per-row int8: scale over the feature (last)
    axis, recomputed per batch inside the jit — no calibration data
    needed. Returns (q int8, scale fp32 [..., 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def qdot(x: jnp.ndarray, w: Any, qmode: str = "dequant") -> jnp.ndarray:
    """``x @ w`` with quantization-aware dispatch (the model's single
    matmul entry point for maybe-quantized weights).

    - plain array ``w``: the ordinary dot in ``x.dtype``.
    - int8 pair + ``qmode="dequant"`` (weight-only): dequantize fused
      into the operand read — weights cross HBM as int8, the MXU runs
      bf16 (bandwidth win at small batch).
    - int8 pair + ``qmode="w8a8"``: the dot runs int8 x int8 -> int32
      on the MXU's double-rate int8 path (measured 1.6-2.2x bf16 at
      the serving GEMM shapes — docs/ROOFLINE.md "int8 weights",
      round-4 corrected probe); the fp32 rescale (activation scale x
      column scale) folds into the output epilogue. Activations
      quantize one of two ways:
        * the pair carries an ``"act_scale"`` leaf (static, calibrated
          — ``calibrate_image_act_scales`` + ``attach_act_scales``):
          the quantize is a pure elementwise scale/round/cast that XLA
          fuses into the producing op (LN/GELU writes int8 directly) —
          near-zero extra HBM traffic. The round-5 decomposition
          (docs/ROOFLINE.md) shows this is what makes w8a8 a net win.
        * no ``act_scale``: dynamic symmetric per-row scales,
          recomputed inside the jit. Calibration-free, but the abs-max
          reduce forces an extra read-reduce-rewrite pass over the
          activations before every GEMM — at batch 256 those passes
          eat the entire double-rate win (measured 0.92x end-to-end,
          ``benchmarks/probe_w8a8_decompose.py`` has the per-group
          breakdown).
    - int8 pair + ``qmode="w8a8_dynamic"``: w8a8 with the dynamic
      per-row activation path FORCED, ignoring any attached
      ``act_scale``. The serving predictor traces this for the
      1-row bucket, the one regime where the measured ordering
      inverts: a per-row scale on a single row is nearly free while
      the static epilogue has no rows to amortize over (b1: dynamic
      1.10x vs static 0.89x bf16; static already wins at b2 —
      docs/PERFORMANCE.md crossover sweep).

    Contracts x's last axis with w's first; any leading x batch dims
    ride along (matching ``jnp.dot`` for 2D w).
    """
    if not is_quantized(w):
        return jnp.dot(x, w.astype(x.dtype))
    if qmode == "dequant":
        return jnp.dot(x, dequantize(w, x.dtype))
    if qmode == "w8a8_kernel":
        # explicit Mosaic int8 kernel instead of XLA's int8 dot — kept
        # as the opt-in Mosaic reference point; it measured BELOW XLA's
        # int8 dot at every serving shape (docs/ROOFLINE.md round 4),
        # so "w8a8" is the production int8 mode. On non-TPU backends
        # fall through to the XLA branch (pallas compiled mode is
        # TPU-only; mirrors ops/attention._use_pallas)
        if jax.default_backend() == "tpu":
            from .pallas_int8_matmul import w8a8_matmul

            return w8a8_matmul(x, w["int8"], w["scale"])
        qmode = "w8a8"
    assert qmode in ("w8a8", "w8a8_dynamic"), qmode
    if qmode == "w8a8" and "act_scale" in w:
        # static calibrated scale: a per-(layer,)tensor scalar — the
        # quantize has no reduction, so XLA fuses it into the producer
        s = w["act_scale"]
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                      -127, 127).astype(jnp.int8)
        xs = s
    else:
        xq, xs = quantize_activations_int8(x)
    acc = jax.lax.dot_general(
        xq, w["int8"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    # w["scale"] keeps the contraction axis as 1 ([1, O] / [L, 1, O]
    # sliced to [1, O] in the scan); xs is [..., 1] (dynamic) or a
    # scalar (static) — both broadcast over the [..., O] accumulator
    return (acc.astype(jnp.float32) * xs
            * w["scale"].reshape(w["scale"].shape[-1])).astype(x.dtype)


_BLOCK_WEIGHTS = (("attn", "wqkv"), ("attn", "wo"),
                  ("mlp", "w_fc"), ("mlp", "w_proj"))


def _quantize_blocks(blocks: Dict[str, Any]) -> Dict[str, Any]:
    out = {k: dict(v) for k, v in blocks.items()}
    for outer, key in _BLOCK_WEIGHTS:
        out[outer][key] = quantize_int8(blocks[outer][key])
    return out


def quantize_clip_params(params: Dict[str, Any],
                         towers=("visual",)) -> Dict[str, Any]:
    """Copy of a CLIP param pytree with the chosen towers' matmul weights
    as int8 pairs (new dicts all the way down the touched paths — the
    input pytree is never mutated).

    Default quantizes the VISION tower only: text encodes once at
    predictor construction (full precision keeps the class features
    exact), while the image tower runs per request — that is where the
    weight bandwidth is paid. Pass ``towers=("visual", "text")`` to
    also shrink a resident text tower.

    ViT towers only: the ModifiedResNet tower is conv/BN-shaped and
    its serving path is not bandwidth-bound the same way (raises).
    """
    new = dict(params)
    if "visual" in towers:
        v = params["visual"]
        if "patch_kernel" not in v:
            raise ValueError(
                "int8 weight quantization covers the ViT towers only; "
                "serve ResNet backbones unquantized")
        v = dict(v)
        v["patch_kernel"] = quantize_int8(v["patch_kernel"])
        v["proj"] = quantize_int8(v["proj"])
        v["blocks"] = _quantize_blocks(v["blocks"])
        new["visual"] = v
    if "text" in towers:
        t = dict(params["text"])
        t["text_projection"] = quantize_int8(t["text_projection"])
        t["blocks"] = _quantize_blocks(t["blocks"])
        new["text"] = t
    return new


# ---------------------------------------------------------------------------
# Static activation scales (calibrated w8a8)
# ---------------------------------------------------------------------------

def calibrate_image_act_scales(qparams: Dict[str, Any], cfg,
                               images: jnp.ndarray):
    """Per-site activation absmax of the vision tower over a
    calibration batch, captured at every quantized-matmul input
    (``models/clip.encode_image collect_act_stats=``).

    ``images``: preprocessed fp [B, H, W, 3] at the model resolution
    (NOT raw uint8 — calibrate through the same normalize the serving
    path uses). Runs with the QUANTIZED weights in weight-only mode so
    the captured ranges include weight-rounding effects. Returns the
    stats pytree ``attach_act_scales`` consumes (scalars; [L] arrays
    for the stacked block sites).
    """
    from ..models import clip as M

    def run(p, x):
        _, stats = M.encode_image(p, cfg, x, qmode="dequant",
                                  collect_act_stats=True)
        return stats

    return jax.jit(run)(qparams, images)


def save_act_stats(path: str, stats) -> None:
    """Persist a calibration-stats pytree (``calibrate_image_act_scales``
    output) as npz — the whole thing is ~50 scalars/[L]-vectors, so a
    serving host can attach static scales without shipping the
    calibration images (``load_act_stats`` + ``attach_act_scales``;
    ``serving.Predictor(act_scales=path)``)."""
    import numpy as np
    flat = {"patch_kernel": np.asarray(stats["patch_kernel"]),
            "proj": np.asarray(stats["proj"])}
    for outer, key in _BLOCK_WEIGHTS:
        flat[f"blocks.{outer}.{key}"] = np.asarray(
            stats["blocks"][outer][key])
    with open(path, "wb") as f:
        np.savez(f, **flat)


def load_act_stats(path: str) -> Dict[str, Any]:
    """Inverse of ``save_act_stats``: npz -> the stats pytree
    ``attach_act_scales`` consumes."""
    import numpy as np
    with open(path, "rb") as f:
        data = np.load(f)
        flat = {k: data[k] for k in data.files}
    missing = ({"patch_kernel", "proj"}
               | {f"blocks.{o}.{k}" for o, k in _BLOCK_WEIGHTS}) \
        - set(flat)
    if missing:
        raise ValueError(
            f"{path}: not an activation-scale file (missing "
            f"{sorted(missing)}; write it with save_act_stats)")
    blocks: Dict[str, Any] = {}
    for outer, key in _BLOCK_WEIGHTS:
        blocks.setdefault(outer, {})[key] = flat[f"blocks.{outer}.{key}"]
    return {"patch_kernel": flat["patch_kernel"], "proj": flat["proj"],
            "blocks": blocks}


def attach_act_scales(qparams: Dict[str, Any], stats) -> Dict[str, Any]:
    """Copy of a quantized param pytree with static ``act_scale``
    leaves (absmax/127, zero-guarded) on every vision-tower quantized
    weight — flips ``qdot``'s w8a8 branch from dynamic per-row to
    static calibrated quantization. Out-of-range activations at serve
    time clip to ±127 scale steps (standard static-quant semantics);
    validate agreement with ``benchmarks/bench_quant.py``."""
    def scale(amax):
        amax = jnp.asarray(amax, jnp.float32)
        return jnp.where(amax > 0, amax / 127.0, 1.0)

    new = dict(qparams)
    v = dict(qparams["visual"])
    v["patch_kernel"] = dict(v["patch_kernel"],
                             act_scale=scale(stats["patch_kernel"]))
    v["proj"] = dict(v["proj"], act_scale=scale(stats["proj"]))
    blocks = {k: dict(bv) for k, bv in v["blocks"].items()}
    for outer, key in _BLOCK_WEIGHTS:
        blocks[outer][key] = dict(
            blocks[outer][key],
            act_scale=scale(stats["blocks"][outer][key]))
    v["blocks"] = blocks
    new["visual"] = v
    return new


def calibrate_text_act_scales(qparams: Dict[str, Any], cfg,
                              prompts: jnp.ndarray,
                              eot_pos: jnp.ndarray,
                              seq_len=None):
    """Per-site activation absmax of the TEXT tower over a
    representative embedded-prompt batch [N, 77, D]
    (``models/clip.encode_text_embedded collect_act_stats=``).

    The eval-time text fan-out (CoCoOp's per-image class encodes,
    ProDA's ``set_classifier`` sweep) is the one serving-relevant
    workload where the text tower runs per request; calibrating its
    activation ranges lets it take the same static-w8a8 MXU path the
    vision tower does (measured int8/bf16 dot ratio 1.35-1.86x at the
    fan-out GEMM shapes — docs/ROOFLINE.md "Quantized text fan-out").
    Unlike image calibration the inputs derive from the LEARNED prompt
    pytree, not the data distribution, so the captured ranges are
    deterministic given the checkpoint (no multi-host reduce needed).
    Returns the stats pytree ``attach_text_act_scales`` consumes.
    """
    from ..models import clip as M

    def run(p, x, e):
        _, stats = M.encode_text_embedded(p, cfg, x, e, seq_len=seq_len,
                                          qmode="dequant",
                                          collect_act_stats=True)
        return stats

    return jax.jit(run)(qparams, prompts, eot_pos)


def attach_text_act_scales(qparams: Dict[str, Any],
                           stats) -> Dict[str, Any]:
    """Copy of a quantized param pytree with static ``act_scale``
    leaves on every TEXT-tower quantized weight (text twin of
    ``attach_act_scales``; same absmax/127 semantics)."""
    def scale(amax):
        amax = jnp.asarray(amax, jnp.float32)
        return jnp.where(amax > 0, amax / 127.0, 1.0)

    new = dict(qparams)
    t = dict(qparams["text"])
    t["text_projection"] = dict(
        t["text_projection"], act_scale=scale(stats["text_projection"]))
    blocks = {k: dict(bv) for k, bv in t["blocks"].items()}
    for outer, key in _BLOCK_WEIGHTS:
        blocks[outer][key] = dict(
            blocks[outer][key],
            act_scale=scale(stats["blocks"][outer][key]))
    t["blocks"] = blocks
    new["text"] = t
    return new
