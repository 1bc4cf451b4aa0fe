"""CLIP dual-tower model, TPU-native.

Functional re-design of the reference's prompt-injectable CLIP
(``/root/reference/clip/model.py``):

- **pure functions over explicit param pytrees** — no module state. Prompt
  vectors are *inputs*, not buried parameters, so trainers differentiate
  only their own prompt pytree while the frozen backbone rides along in
  closure (the reference instead freezes via ``requires_grad_(False)``,
  ``trainers/classification/coop.py:250-253``).
- **batch-first [B, L, D]**, ``lax.scan`` over stacked per-layer weights
  (O(1) compile in depth), patchify-as-matmul instead of conv (feeds the
  MXU directly), bf16 compute with fp32 LayerNorm/softmax.
- **uniform prompt-injection interface** replacing the reference's three
  block variants (``ResidualAttentionBlock{,_IVLP,_MaPLe}``,
  ``clip/model.py:167-331``): each scanned layer may splice a per-layer
  prompt block into the token sequence, controlled by a static depth.
  Vision prompts live at the END of the sequence; text prompts at
  positions [1, 1+n_ctx) — matching the reference's splice coordinates.

Parity targets: ``encode_image``/``encode_text`` equal the reference within
mixed-precision tolerance; EOT pooling via argmax (``clip/model.py:611``);
``logit_scale`` init ln(1/0.07) (``clip/model.py:552``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import (causal_mask, layer_norm, multi_head_attention,
                             quick_gelu)
from ..ops.quant import qdot

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int
    image_resolution: int
    vision_layers: Union[int, Tuple[int, int, int, int]]
    vision_width: int
    vision_patch_size: Optional[int]
    transformer_width: int
    transformer_heads: int
    transformer_layers: int
    context_length: int = 77
    vocab_size: int = 49408

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)

    @property
    def vision_heads(self) -> int:
        if self.is_vit:
            return self.vision_width // 64
        return self.vision_width * 32 // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @property
    def vision_seq_len(self) -> int:
        return self.grid_size ** 2 + 1


# Architecture hyperparameters of the public OpenAI checkpoints; the
# reference infers these from state-dict shapes (``clip/model.py:656-699``)
# — ``config_from_torch_state_dict`` below does the same for imports.
PRESETS: Dict[str, CLIPConfig] = {
    "ViT-B/16": CLIPConfig(512, 224, 12, 768, 16, 512, 8, 12),
    "ViT-B/32": CLIPConfig(512, 224, 12, 768, 32, 512, 8, 12),
    "ViT-L/14": CLIPConfig(768, 224, 24, 1024, 14, 768, 12, 12),
    "ViT-L/14@336px": CLIPConfig(768, 336, 24, 1024, 14, 768, 12, 12),
    "RN50": CLIPConfig(1024, 224, (3, 4, 6, 3), 64, None, 512, 8, 12),
    "RN101": CLIPConfig(512, 224, (3, 4, 23, 3), 64, None, 512, 8, 12),
    # EfficientNet-style scaled ResNets (width/resolution scaled jointly,
    # reference ``clip/clip.py:30-39`` zoo)
    "RN50x4": CLIPConfig(640, 288, (4, 6, 10, 6), 80, None, 640, 10, 12),
    "RN50x16": CLIPConfig(768, 384, (6, 8, 18, 8), 96, None, 768, 12, 12),
    "RN50x64": CLIPConfig(1024, 448, (3, 15, 36, 10), 128, None,
                          1024, 16, 12),
    # tiny backbones for fast integration tests / demos (no public weights)
    "ViT-Test": CLIPConfig(32, 32, 2, 64, 8, 64, 4, 2),
    # ModifiedResNet tower at (1,1,1,1) depth: stem /4 then 3 strided
    # stages -> 1x1 attention-pool grid at 32px input
    "RN-Test": CLIPConfig(32, 32, (1, 1, 1, 1), 8, None, 64, 4, 2),
}


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_blocks(rng, n_layers: int, width: int) -> Params:
    """Stacked transformer block params [L, ...] (reference init
    distributions, ``clip/model.py:572-580``)."""
    ks = jax.random.split(rng, 4)
    proj_std = (width ** -0.5) * ((2 * n_layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    f32 = jnp.float32
    return {
        "ln_1": {"scale": jnp.ones((n_layers, width), f32),
                 "bias": jnp.zeros((n_layers, width), f32)},
        "ln_2": {"scale": jnp.ones((n_layers, width), f32),
                 "bias": jnp.zeros((n_layers, width), f32)},
        "attn": {
            "wqkv": (jax.random.normal(ks[0], (n_layers, width, 3 * width), f32)
                     * attn_std),
            "bqkv": jnp.zeros((n_layers, 3 * width), f32),
            "wo": (jax.random.normal(ks[1], (n_layers, width, width), f32)
                   * proj_std),
            "bo": jnp.zeros((n_layers, width), f32),
        },
        "mlp": {
            "w_fc": (jax.random.normal(ks[2], (n_layers, width, 4 * width), f32)
                     * fc_std),
            "b_fc": jnp.zeros((n_layers, 4 * width), f32),
            "w_proj": (jax.random.normal(
                ks[3], (n_layers, 4 * width, width), f32) * proj_std),
            "b_proj": jnp.zeros((n_layers, width), f32),
        },
    }


def init_clip(rng: jax.Array, cfg: CLIPConfig,
              dtype=jnp.bfloat16) -> Params:
    """Random-initialized CLIP params (matmul weights in ``dtype``,
    norms/embeddings fp32 — mirroring the reference's convert_weights
    fp16 policy, ``clip/model.py:632-653``)."""
    kv, kt, k1, k2, k3, k4, k5 = jax.random.split(rng, 7)
    tw = cfg.transformer_width

    if not cfg.is_vit:
        from .resnet import init_modified_resnet
        visual = init_modified_resnet(kv, cfg, dtype)
    else:
        vw = cfg.vision_width
        p = cfg.vision_patch_size
        scale = vw ** -0.5
        kp, kc, kpos, kproj = jax.random.split(kv, 4)
        visual = {
            # patchify kernel [(p*p*3), vw]: torch conv1 reshaped
            "patch_kernel": (jax.random.normal(kp, (p * p * 3, vw))
                             * scale).astype(dtype),
            "class_embedding": (jax.random.normal(kc, (vw,), jnp.float32)
                                * scale),
            "positional_embedding": (jax.random.normal(
                kpos, (cfg.vision_seq_len, vw), jnp.float32) * scale),
            "ln_pre": {"scale": jnp.ones((vw,), jnp.float32),
                       "bias": jnp.zeros((vw,), jnp.float32)},
            "blocks": jax.tree.map(
                lambda a: a.astype(dtype) if a.ndim >= 3 else a,
                _init_blocks(k1, cfg.vision_layers, vw)),
            "ln_post": {"scale": jnp.ones((vw,), jnp.float32),
                        "bias": jnp.zeros((vw,), jnp.float32)},
            "proj": (jax.random.normal(kproj, (vw, cfg.embed_dim))
                     * scale).astype(dtype),
        }

    text = {
        "token_embedding": (jax.random.normal(
            kt, (cfg.vocab_size, tw), jnp.float32) * 0.02),
        "positional_embedding": (jax.random.normal(
            k2, (cfg.context_length, tw), jnp.float32) * 0.01),
        "blocks": jax.tree.map(
            lambda a: a.astype(dtype) if a.ndim >= 3 else a,
            _init_blocks(k3, cfg.transformer_layers, tw)),
        "ln_final": {"scale": jnp.ones((tw,), jnp.float32),
                     "bias": jnp.zeros((tw,), jnp.float32)},
        "text_projection": (jax.random.normal(
            k4, (tw, cfg.embed_dim)) * tw ** -0.5).astype(dtype),
    }

    return {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(math.log(1 / 0.07), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Transformer with uniform prompt injection
# ---------------------------------------------------------------------------

def _splice_text(x: jnp.ndarray, prompt: jnp.ndarray,
                 real_len: int) -> jnp.ndarray:
    """Replace x[:, 1:1+n_ctx] with prompt (text-side splice,
    reference ``clip/model.py:247-256``)."""
    n_ctx = prompt.shape[0]
    tiled = jnp.broadcast_to(prompt.astype(x.dtype),
                             (x.shape[0],) + prompt.shape)
    return jnp.concatenate([x[:, :1], tiled, x[:, 1 + n_ctx:]], axis=1)


def _splice_vision(x: jnp.ndarray, prompt: jnp.ndarray,
                   real_len: int) -> jnp.ndarray:
    """Replace the trailing n_ctx REAL tokens with prompt (vision-side
    splice, reference ``clip/model.py:236-243``); any padding rows past
    ``real_len`` stay in place."""
    n_ctx = prompt.shape[0]
    tiled = jnp.broadcast_to(prompt.astype(x.dtype),
                             (x.shape[0],) + prompt.shape)
    return jnp.concatenate([x[:, :real_len - n_ctx], tiled,
                            x[:, real_len:]], axis=1)


def transformer(
    blocks: Params,
    x: jnp.ndarray,
    n_heads: int,
    mask: Optional[jnp.ndarray] = None,
    *,
    deep_prompts: Optional[jnp.ndarray] = None,
    deep_prompt_depth: int = 0,
    text_side: bool = False,
    remat: bool = False,
    tp=None,
    qmode: str = "dequant",
    collect_act_stats: bool = False,
) -> jnp.ndarray:
    """Scan the stacked residual blocks over x [B, L, D].

    collect_act_stats: also return per-layer absmax statistics of each
    quantized-matmul input site (qkv input, out-proj context, MLP fc
    and proj inputs) as [n_layers] arrays stacked by the scan — the
    calibration capture for static-scale w8a8 serving
    (``ops/quant.calibrate_image_act_scales``). Stats reduce over REAL
    tokens only (padding rows are excluded). Return becomes
    ``(out, stats)``.

    tp: optional ``parallel.tp.TowerTP`` — tensor-parallel execution:
    attention heads and the MLP hidden feature axis shard over the
    mesh's model axis (two XLA-inserted psums per layer); see
    parallel/tp.py. None (default) is the unsharded single-device
    program.

    deep_prompts: [n_layers, n_ctx, D] per-layer prompt tokens. Layer i in
    [1, deep_prompt_depth) splices prompt row i-1 into the sequence before
    attention (layer 0 never splices: the shallow prompt is already in x).
    ``deep_prompt_depth`` is static so XLA sees fixed control flow.

    remat: rematerialize each layer in the backward pass
    (``jax.checkpoint`` on the scan body — the canonical scan-of-remat
    pattern). Off, the scan stashes every layer's attention/MLP
    intermediates for backward, which is the right trade for the normal
    small-batch prompt-tuning steps; on, only the layer inputs survive
    the forward, bounding backward HBM at the big class/prompt fan-outs
    (ProDA's n_cls*P prompt batch, CoCoOp's image-conditioned per-class
    encodes — [2000, 80] token batches at ImageNet scale) at the cost of
    one extra forward.

    The token axis is padded ONCE here to the bf16 sublane multiple (16)
    for the whole tower — the fused attention kernel then needs no
    per-layer pad/slice, and XLA tiles the big matmuls on aligned shapes.
    Padded KEYS are masked to -inf so they get exactly zero probability;
    padded ROWS attend to token 0 only (keeps them finite — an all--inf
    row would softmax to NaN and poison the next layer's keys). Row-wise
    ops (LN/MLP/residual) never mix rows, so real-token outputs are
    unchanged; the pad is sliced off on return.
    """
    n_layers = blocks["ln_1"]["scale"].shape[0]
    L = x.shape[1]
    Lp = ((L + 15) // 16) * 16
    if Lp != L:
        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
        neg = jnp.finfo(jnp.float32).min
        full = jnp.zeros((Lp, Lp), jnp.float32)
        if mask is not None:
            full = full.at[:L, :L].set(mask.astype(jnp.float32))
        full = full.at[:, L:].set(neg)
        full = full.at[L:, :].set(neg)
        full = full.at[L:, 0].set(0.0)
        mask = full

    def body(carry, scanned):
        h = carry
        p, prompt, idx = scanned
        if deep_prompts is not None:
            splice = _splice_text if text_side else _splice_vision
            h = jnp.where((idx > 0) & (idx < deep_prompt_depth),
                          splice(h, prompt, L), h)
        # qdot: plain arrays run the ordinary dot; int8 serving pairs
        # (ops/quant.py) dequantize per scanned layer slice ("dequant")
        # or run the MXU int8 path ("w8a8")
        ln1 = layer_norm(h, p["ln_1"]["scale"], p["ln_1"]["bias"])
        attn = multi_head_attention(
            ln1, p["attn"]["wqkv"], p["attn"]["bqkv"],
            p["attn"]["wo"], p["attn"]["bo"],
            n_heads, mask, tp=tp, qmode=qmode,
            return_ctx=collect_act_stats)
        ctx = None
        if collect_act_stats:
            attn, ctx = attn
        h = h + attn
        y = layer_norm(h, p["ln_2"]["scale"], p["ln_2"]["bias"])
        fc_in = y
        y = qdot(y, p["mlp"]["w_fc"], qmode) \
            + p["mlp"]["b_fc"].astype(y.dtype)
        if tp is not None:
            # Megatron split: hidden features over the model axis —
            # w_fc partitions by column with zero comm; the down-
            # projection contracts the sharded dim (one psum)
            y = tp.shard_hidden(y)
        y = quick_gelu(y)
        proj_in = y
        y = qdot(y, p["mlp"]["w_proj"], qmode) \
            + p["mlp"]["b_proj"].astype(y.dtype)
        stats = None
        if collect_act_stats:
            def amax(a):
                return jnp.max(jnp.abs(a[:, :L].astype(jnp.float32)))
            stats = {"attn": {"wqkv": amax(ln1), "wo": amax(ctx)},
                     "mlp": {"w_fc": amax(fc_in),
                             "w_proj": amax(proj_in)}}
        return h + y, stats

    if deep_prompts is None:
        prompts = jnp.zeros((n_layers, 0, x.shape[-1]), x.dtype)
    else:
        # pad/trim the prompt stack to one row per layer (row i -> layer i,
        # layer 0 row stays zero and is never spliced)
        n_ctx = deep_prompts.shape[1]
        rows = min(deep_prompts.shape[0], n_layers - 1)
        prompts = jnp.zeros((n_layers, n_ctx, x.shape[-1]), x.dtype)
        prompts = prompts.at[1:1 + rows].set(
            deep_prompts.astype(x.dtype)[:rows])

    idxs = jnp.arange(n_layers)
    body_fn = jax.checkpoint(body) if remat else body
    out, stats = jax.lax.scan(body_fn, x, (blocks, prompts, idxs))
    out = out[:, :L] if Lp != L else out
    return (out, stats) if collect_act_stats else out


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------

def embed_tokens(params: Params, tokens: jnp.ndarray,
                 dtype=jnp.bfloat16) -> jnp.ndarray:
    """Token embedding lookup -> [N, L, D] in compute dtype."""
    return params["text"]["token_embedding"][tokens].astype(dtype)


def encode_text_embedded(
    params: Params,
    cfg: CLIPConfig,
    x: jnp.ndarray,
    eot_pos: jnp.ndarray,
    *,
    deep_prompts: Optional[jnp.ndarray] = None,
    deep_prompt_depth: int = 0,
    remat: bool = False,
    seq_len: Optional[int] = None,
    tp=None,
    qmode: str = "dequant",
    collect_act_stats: bool = False,
) -> jnp.ndarray:
    """Text tower over pre-embedded prompts [N, 77, D] (the PromptLearner
    path, reference TextEncoder ``trainers/classification/coop.py:47-67``).

    collect_act_stats: also return absmax statistics of every quantized-
    matmul input (the per-layer block sites and the pooled rows feeding
    ``text_projection``) for static-scale w8a8 calibration of a frozen
    text tower (``ops/quant.calibrate_text_act_scales``). Return becomes
    ``(features, stats)``. Rows past a prompt's own EOT are INCLUDED in
    the statistics deliberately: the quantized serving matmuls run over
    those rows too, so their range is part of what the scales must
    cover (their outputs are causally irrelevant to the pooled feature
    either way).

    eot_pos: [N] index of the EOT token per row (pooling position).
    remat: see ``transformer`` — use for gradient passes over big
    class/prompt fan-outs.
    seq_len: static sequence truncation (> max(eot_pos)). The text mask
      is causal, so positions <= EOT depend only on positions before
      them — tokens past the longest EOT are mathematically irrelevant
      to the pooled feature, yet the reference always runs all 77
      (``clip/model.py:598-613``). Prompt class sets typically pool at
      position ~20-30, so truncation cuts the text tower's work ~2.5x
      exactly. None keeps the full length.
    tp: optional ``parallel.tp.TowerTP`` (tensor-parallel tower; see
      ``transformer``).
    """
    txt_p = params["text"]
    if seq_len is not None and seq_len < x.shape[1]:
        # a too-small seq_len would CLAMP the pooling gather (jit
        # out-of-bounds semantics) and silently pool the wrong position;
        # enforce the contract whenever eot_pos is concrete (setup-time
        # calls — inside jit the caller's eot_seq_len is the contract)
        if not isinstance(eot_pos, jax.core.Tracer):
            mx = int(np.max(np.asarray(eot_pos)))
            if mx >= seq_len:
                raise ValueError(
                    f"seq_len={seq_len} drops an EOT at position {mx}; "
                    f"use eot_seq_len(eot_pos) (= max+1)")
        x = x[:, :seq_len]
    x = x + txt_p["positional_embedding"][:x.shape[1]].astype(x.dtype)
    mask = causal_mask(x.shape[1])
    x = transformer(txt_p["blocks"], x, cfg.transformer_heads, mask,
                    deep_prompts=deep_prompts,
                    deep_prompt_depth=deep_prompt_depth, text_side=True,
                    remat=remat, tp=tp, qmode=qmode,
                    collect_act_stats=collect_act_stats)
    stats = None
    if collect_act_stats:
        x, stats = x
        stats = {"blocks": stats}
    x = layer_norm(x, txt_p["ln_final"]["scale"],
                   txt_p["ln_final"]["bias"])
    pooled = x[jnp.arange(x.shape[0]), eot_pos]
    if collect_act_stats:
        stats["text_projection"] = jnp.max(
            jnp.abs(pooled.astype(jnp.float32)))
        return qdot(pooled, txt_p["text_projection"], qmode), stats
    return qdot(pooled, txt_p["text_projection"], qmode)


def eot_seq_len(tokens_or_eot) -> int:
    """Static truncation length for ``seq_len=``: one past the furthest
    EOT pooling position. Accepts raw [N, L] token rows (EOT is the max
    token id per row) or precomputed [N] EOT positions. Call host-side
    (concrete arrays)."""
    a = np.asarray(tokens_or_eot)
    if a.ndim == 2:
        a = a.argmax(-1)
    return int(np.max(a)) + 1


def encode_text(params: Params, cfg: CLIPConfig, tokens: jnp.ndarray,
                dtype=jnp.bfloat16, seq_len: Optional[int] = None,
                tp=None) -> jnp.ndarray:
    """Raw-token text encode (reference ``clip/model.py:598-613``)."""
    x = embed_tokens(params, tokens, dtype)
    # EOT position from the UNTRUNCATED row (EOT is the max token id);
    # truncation happens inside encode_text_embedded, whose concrete-eot
    # guard then rejects a seq_len that would drop a row's EOT instead
    # of silently pooling a clamped position.
    eot_pos = jnp.argmax(tokens, axis=-1)
    return encode_text_embedded(params, cfg, x, eot_pos, seq_len=seq_len,
                                tp=tp)


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, n_patches, p*p*3] — the conv-as-matmul layout.

    Patch vector ordering is (ph, pw, c) to match the converted torch conv
    kernel (see weights.convert_torch_clip).
    """
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B gh gw p p C
    return x.reshape(B, gh * gw, patch * patch * C)


def encode_image(
    params: Params,
    cfg: CLIPConfig,
    images: jnp.ndarray,
    *,
    shallow_prompts: Optional[jnp.ndarray] = None,
    deep_prompts: Optional[jnp.ndarray] = None,
    deep_prompt_depth: int = 0,
    dtype=jnp.bfloat16,
    tp=None,
    qmode: str = "dequant",
    collect_act_stats: bool = False,
) -> jnp.ndarray:
    """Vision tower. images: [B, H, W, 3] (NHWC, preprocessed).

    collect_act_stats: also return absmax statistics of every quantized-
    matmul input (patchified pixels, the per-layer block sites, the
    ln_post output feeding ``proj``) for static-scale w8a8 calibration
    (``ops/quant.calibrate_image_act_scales``); ViT only. Return becomes
    ``(features, stats)``.

    shallow_prompts: [n_ctx, width] tokens appended after the positional
    embedding (VPT/IVLP/MaPLe shallow path, ``clip/model.py:404-408``).
    deep_prompts: [depth-1, n_ctx, width] per-layer replacements.
    tp: optional ``parallel.tp.TowerTP`` (tensor-parallel tower; ViT
    only — the ModifiedResNet tower is data-parallel only, see
    parallel/tp.py).
    """
    if not cfg.is_vit:
        if collect_act_stats:
            raise ValueError(
                "activation-scale calibration covers the ViT towers "
                "only (int8 serving is ViT-only, ops/quant.py)")
        if tp is not None:
            raise ValueError(
                "Tensor-parallel execution covers the ViT towers only; "
                "serve ResNet backbones data-parallel (parallel/tp.py)")
        if shallow_prompts is not None or deep_prompts is not None:
            # the reference has no ResNet prompt path either (its
            # ModifiedResNet.forward takes no prompt arguments and MaPLe/
            # VPT on RN50 would TypeError there); fail loudly instead of
            # silently dropping the prompts
            raise ValueError(
                "Vision prompts are not supported with ResNet backbones; "
                "use a ViT backbone for prompt-injection trainers")
        from .resnet import modified_resnet_forward
        return modified_resnet_forward(params["visual"], cfg,
                                       images.astype(dtype))
    vp = params["visual"]
    x = patchify(images.astype(dtype), cfg.vision_patch_size)
    stats = {}
    if collect_act_stats:
        stats["patch_kernel"] = jnp.max(jnp.abs(x.astype(jnp.float32)))
    x = qdot(x, vp["patch_kernel"], qmode)
    cls = jnp.broadcast_to(vp["class_embedding"].astype(x.dtype),
                           (x.shape[0], 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vp["positional_embedding"].astype(x.dtype)
    if shallow_prompts is not None:
        tiled = jnp.broadcast_to(
            shallow_prompts.astype(x.dtype),
            (x.shape[0],) + shallow_prompts.shape)
        x = jnp.concatenate([x, tiled], axis=1)
    x = layer_norm(x, vp["ln_pre"]["scale"], vp["ln_pre"]["bias"])
    x = transformer(vp["blocks"], x, cfg.vision_heads, None,
                    deep_prompts=deep_prompts,
                    deep_prompt_depth=deep_prompt_depth, text_side=False,
                    tp=tp, qmode=qmode,
                    collect_act_stats=collect_act_stats)
    if collect_act_stats:
        x, stats["blocks"] = x
    x = layer_norm(x[:, 0], vp["ln_post"]["scale"], vp["ln_post"]["bias"])
    if collect_act_stats:
        stats["proj"] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        return qdot(x, vp["proj"], qmode), stats
    return qdot(x, vp["proj"], qmode)


# ---------------------------------------------------------------------------
# Scoring
# ---------------------------------------------------------------------------

def normalize(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                keepdims=True) + eps).astype(x.dtype)


def cosine_logits(image_features: jnp.ndarray, text_features: jnp.ndarray,
                  logit_scale: jnp.ndarray) -> jnp.ndarray:
    """scale * normalize(img) @ normalize(txt).T in fp32 (logit tails matter
    for calibration metrics — reference computes this in fp16,
    ``trainers/classification/coop.py:212-220``)."""
    img = normalize(image_features).astype(jnp.float32)
    txt = normalize(text_features).astype(jnp.float32)
    scale = jnp.exp(logit_scale.astype(jnp.float32))
    return scale * jnp.dot(img, txt.T, preferred_element_type=jnp.float32)
