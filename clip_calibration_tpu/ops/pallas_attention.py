"""Pallas fused attention kernel for the CLIP towers.

At CLIP sequence lengths (77 text / 197-257 vision tokens) the full
[L, L] fp32 score matrix fits comfortably in VMEM, so the kernel fuses
head-split -> QK^T -> softmax -> PV for EVERY head of one batch row per
grid cell, consuming the [B, L, 3D] fused-QKV matmul output directly.
That removes the two HBM costs that dominate the XLA path at these
shapes (measured on TPU v5e, batch 512 ViT-B/16):

- the [B, L, H, d] <-> [B, H, L, d] head transposes (4 per layer,
  ~1.3 GB/layer of HBM round-trips), and
- the materialized [B, H, L, L] score/prob tensors (~2.9 GB/layer).

Per grid cell the kernel streams 3*L*D bf16 in and L*D out — within ~2x
of the bandwidth lower bound for attention at these shapes. No
online-softmax machinery is needed (short-sequence regime of flash
attention). The caller pads the sequence once for the whole tower (see
``models/clip.py::transformer``) so L here is already a sublane multiple
and padded keys arrive masked via the additive mask.

Layout notes (see /opt/skills/guides/pallas_guide.md): grid (B,), whole
[L, 3D] block resident in VMEM (958 KB for ViT-B/16), heads unrolled
statically; scores are fp32 on the MXU with the query pre-scale applied
in-kernel on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _mha_qkv_kernel(qkv_ref, mask_ref, o_ref, *, n_heads: int):
    blk = qkv_ref[0]                                # [L, 3D]
    D = blk.shape[-1] // 3
    d = D // n_heads
    scale = 1.0 / (d ** 0.5)
    mask = mask_ref[...]                            # [L, L] fp32
    for h in range(n_heads):                        # static unroll
        q = blk[:, h * d:(h + 1) * d] * scale
        k = blk[:, D + h * d:D + (h + 1) * d]
        v = blk[:, 2 * D + h * d:2 * D + (h + 1) * d]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + mask
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o_ref[0, :, h * d:(h + 1) * d] = jnp.dot(
            p, v, preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_mha_qkv(qkv: jnp.ndarray, mask: jnp.ndarray, n_heads: int,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused multi-head attention over a packed QKV tensor.

    Args:
      qkv: [B, L, 3D] — the fused in-projection output, heads NOT split
        (q = [..., :D], k = [..., D:2D], v = [..., 2D:], head h of each
        at columns [h*d, (h+1)*d)). L must be a sublane multiple (the
        tower pads once, models/clip.py::transformer).
      mask: [L, L] additive fp32 mask (causal and/or key padding).
      n_heads: static head count.

    Returns [B, L, D] with heads concatenated — ready for the output
    projection, no transposes. Forward runs the Pallas kernel; the
    backward pass (custom VJP below) recomputes probabilities with XLA
    ops — pallas_call has no autodiff rule, and prompt tuning backprops
    through both towers.
    """
    return _fwd_impl(qkv, mask, n_heads, interpret)


def _fwd_impl(qkv, mask, n_heads, interpret):
    B, L, D3 = qkv.shape
    D = D3 // 3
    return pl.pallas_call(
        functools.partial(_mha_qkv_kernel, n_heads=n_heads),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D3), lambda i: (i, 0, 0)),
            pl.BlockSpec((L, L), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, D), qkv.dtype),
        interpret=interpret,
    )(qkv, mask)


def _fwd(qkv, mask, n_heads, interpret):
    return _fwd_impl(qkv, mask, n_heads, interpret), (qkv, mask)


def _mha_qkv_bwd_kernel(qkv_ref, mask_ref, g_ref, dqkv_ref, *,
                        n_heads: int):
    """Flash-style backward: recompute probabilities in VMEM, emit
    d(qkv) packed — same no-transpose / no-HBM-scores structure as the
    forward (the XLA einsum backward re-materializes [B, H, L, L] score
    tensors four times per layer)."""
    blk = qkv_ref[0]                                # [L, 3D]
    g = g_ref[0]                                    # [L, D]
    D = blk.shape[-1] // 3
    d = D // n_heads
    scale = 1.0 / (d ** 0.5)
    mask = mask_ref[...]
    for h in range(n_heads):
        q = blk[:, h * d:(h + 1) * d]
        k = blk[:, D + h * d:D + (h + 1) * d]
        v = blk[:, 2 * D + h * d:2 * D + (h + 1) * d]
        gh = g[:, h * d:(h + 1) * d]
        s = jnp.dot(q * scale, k.T,
                    preferred_element_type=jnp.float32) + mask
        p = jax.nn.softmax(s, axis=-1)              # fp32 [L, L]
        pb = p.astype(v.dtype)
        dv = jnp.dot(pb.T, gh, preferred_element_type=jnp.float32)
        dp = jnp.dot(gh, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(q.dtype)
        dq = scale * jnp.dot(dsb, k, preferred_element_type=jnp.float32)
        dk = scale * jnp.dot(dsb.T, q, preferred_element_type=jnp.float32)
        dqkv_ref[0, :, h * d:(h + 1) * d] = dq.astype(blk.dtype)
        dqkv_ref[0, :, D + h * d:D + (h + 1) * d] = dk.astype(blk.dtype)
        dqkv_ref[0, :, 2 * D + h * d:2 * D + (h + 1) * d] = \
            dv.astype(blk.dtype)


# Use the fused backward once the materialized score tensors would be
# big (XLA's einsum backward re-streams [B, H, L, L] four times; the
# kernel keeps them in VMEM). Below this the per-cell launch overhead
# loses to XLA — measured crossover on v5e: XLA wins at 100x8x80^2
# (5M elements), kernel wins 1.4x at 1000x8x80^2 and 2.1x at
# 256x12x208^2 (docs/ROOFLINE.md methodology).
_BWD_KERNEL_MIN_SCORE_ELEMS = 16_000_000


def _xla_bwd(qkv, mask, g, n_heads):
    """Einsum backward — faster at small shapes where scores fit cache."""
    B, L, D3 = qkv.shape
    D = D3 // 3
    d = D // n_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, L, n_heads, d).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scale = 1.0 / (d ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                   preferred_element_type=jnp.float32)
    s = s + mask.astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1)
    gh = heads(g).astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gh)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gh, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = scale * jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32))
    dk = scale * jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32))

    def merge(t):
        return t.transpose(0, 2, 1, 3).reshape(B, L, D)

    return jnp.concatenate(
        [merge(dq), merge(dk), merge(dv)], axis=-1).astype(qkv.dtype)


def _bwd(n_heads, interpret, residuals, g):
    qkv, mask = residuals
    B, L, D3 = qkv.shape
    if not interpret and B * n_heads * L * L < _BWD_KERNEL_MIN_SCORE_ELEMS:
        return _xla_bwd(qkv, mask, g, n_heads), jnp.zeros_like(mask)
    dqkv = pl.pallas_call(
        functools.partial(_mha_qkv_bwd_kernel, n_heads=n_heads),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, D3), lambda i: (i, 0, 0)),
            pl.BlockSpec((L, L), lambda i: (0, 0)),
            pl.BlockSpec((1, L, D3 // 3), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, D3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, D3), qkv.dtype),
        interpret=interpret,
    )(qkv, mask, g.astype(qkv.dtype))
    return dqkv, jnp.zeros_like(mask)


pallas_mha_qkv.defvjp(_fwd, _bwd)
