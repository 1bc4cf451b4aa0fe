"""Multi-head attention for the CLIP towers.

TPU-first design notes:
- batch-first [B, L, D] layout end to end (no NLD<->LND permutes as in the
  reference's ``clip/model.py:605-607``) — XLA picks layouts.
- single fused [D, 3D] QKV projection feeding the MXU, fp32 softmax
  accumulation, bf16 elsewhere (reference computes fp16 with torch MHA,
  ``clip/model.py:167-188``).
- sequence lengths here are tiny (77 text / ~197 vision tokens), so a
  single fused XLA dot-softmax-dot is at speed of light for HBM traffic;
  a Pallas flash kernel (ops/pallas_attention.py) is used when the padded
  sequence blocks align and we're on TPU.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# attention backend: "auto" uses the Pallas fused kernel on TPU and the
# XLA path elsewhere; override with set_attention_impl or CLIP_CAL_ATTN
_ATTENTION_IMPL = os.environ.get("CLIP_CAL_ATTN", "auto")


def set_attention_impl(name: str) -> None:
    global _ATTENTION_IMPL
    assert name in ("auto", "pallas", "xla")
    _ATTENTION_IMPL = name


def _use_pallas() -> bool:
    if _ATTENTION_IMPL == "pallas":
        return True
    if _ATTENTION_IMPL == "xla":
        return False
    return jax.default_backend() == "tpu"


def causal_mask(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask matching the reference text mask
    (``clip/model.py:585-591``): 0 on/below diagonal, -inf above."""
    neg = jnp.finfo(dtype).min
    return jnp.triu(jnp.full((length, length), neg, dtype=dtype), k=1)


# Short-sequence row packing: the text fan-outs run MANY tiny sequences
# (e.g. ProDA: 400 rows x 26 tokens), and a grid cell per row leaves the
# kernel launch-overhead-bound (~0.9 us/cell x rows x layers = 39% of
# the tower forward, measured on v5e — docs/ROOFLINE.md round 3). Below
# this L, G rows are folded into one cell as a [G*L] sequence with a
# block-diagonal mask: same math (cross-row scores are -inf, their
# probabilities exactly 0), G x fewer cells, and [G*L, d] score matmuls
# that actually fill the MXU's 128-wide lanes.
_PACK_MAX_SEQ = 64
_PACK_MAX_ROWS = 512  # keep [G*L, G*L] fp32 scores <= 1 MB in VMEM


def _pack_rows(batch: int, length: int) -> int:
    """Largest G in {16, 8, 4, 2} dividing batch with G*L <= the score
    budget; 1 when packing is pointless (few rows or long sequences)."""
    if length > _PACK_MAX_SEQ:
        return 1
    for g in (16, 8, 4, 2):
        if batch % g == 0 and g * length <= _PACK_MAX_ROWS:
            return g
    return 1


def _blockdiag_mask(mask: jnp.ndarray, g: int) -> jnp.ndarray:
    """[L, L] additive mask -> [G*L, G*L]: per-row blocks keep the mask,
    cross-row blocks are fully masked."""
    L = mask.shape[0]
    neg = jnp.finfo(jnp.float32).min
    on_diag = jnp.kron(jnp.eye(g, dtype=jnp.int32),
                       jnp.ones((L, L), jnp.int32)).astype(bool)
    return jnp.where(on_diag, jnp.tile(mask.astype(jnp.float32), (g, g)),
                     neg)


def multi_head_attention(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    n_heads: int,
    mask: Optional[jnp.ndarray] = None,
    tp=None,
    qmode: str = "dequant",
    return_ctx: bool = False,
) -> jnp.ndarray:
    """Self-attention over [B, L, D].

    Args:
      x: [B, L, D] activations (any float dtype; compute follows x.dtype
         with fp32 softmax).
      wqkv: [D, 3D] fused projection (torch ``in_proj_weight`` transposed)
         — a plain array or an int8 serving pair (``ops/quant.py``).
      bqkv: [3D].
      wo: [D, D] output projection (torch ``out_proj.weight`` transposed)
         — plain or int8 pair.
      mask: optional [L, L] additive fp32 mask.
      tp: optional ``parallel.tp.TowerTP`` — heads shard over the mesh's
        model axis (GSPMD partitions the einsums; the Pallas kernel is a
        single-device program, so TP always takes the XLA path).
      qmode: int8 execution mode for quantized projections
        (``ops/quant.qdot``); ignored for plain arrays. The score/PV
        contractions are activation x activation and stay bf16/fp32.
      return_ctx: also return the pre-out-projection context [B, L, D]
        (the ``wo`` matmul's input — the activation-scale calibration
        capture site for static w8a8, ``ops/quant.py``).
    """
    from .quant import qdot

    B, L, D = x.shape
    head_dim = D // n_heads
    qkv = qdot(x, wqkv, qmode) + bqkv.astype(x.dtype)  # [B,L,3D]
    if tp is None and _use_pallas() and L % 16 == 0:
        # fused head-split/QK^T/softmax/PV directly on the packed qkv —
        # no head transposes, scores never leave VMEM. The tower pads L
        # to a sublane multiple once (models/clip.py::transformer) and
        # always supplies the padding mask.
        from .pallas_attention import pallas_mha_qkv
        if mask is None:
            mask = jnp.zeros((L, L), jnp.float32)
        g = _pack_rows(B, L)
        if g > 1:
            out = pallas_mha_qkv(
                qkv.reshape(B // g, g * L, 3 * D),
                _blockdiag_mask(mask, g), n_heads).reshape(B, L, D)
        else:
            out = pallas_mha_qkv(qkv, mask.astype(jnp.float32), n_heads)
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, L, n_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        if tp is not None:
            # heads are embarrassingly parallel: score/softmax/PV run
            # per-device on local heads, zero communication until the
            # out-projection's contraction (one psum, XLA-inserted)
            q, k, v = (tp.shard_heads(q), tp.shard_heads(k),
                       tp.shard_heads(v))
        scale = 1.0 / (head_dim ** 0.5)
        # fp32 accumulation on the MXU for the score matmul
        scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            scores = scores + mask.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        if tp is not None:
            out = tp.shard_concat(out)
    final = qdot(out, wo, qmode) + bo.astype(x.dtype)
    return (final, out) if return_ctx else final


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm computed in fp32 regardless of input dtype, cast back
    (reference fp16-safe LayerNorm, ``clip/model.py:153-159``)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(orig)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) (reference QuickGELU, ``clip/model.py:162-164``)."""
    return x * jax.nn.sigmoid(1.702 * x)
