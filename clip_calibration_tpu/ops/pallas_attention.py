"""Pallas fused attention kernel for the CLIP towers.

At CLIP sequence lengths (77 text / 197-257 vision tokens) the full
[L, L] fp32 score matrix fits comfortably in VMEM, so the kernel is a
single fused QK^T -> softmax -> PV per (batch, head) grid cell — scores
never touch HBM (XLA materializes them: ~1 GB of fp32 score traffic per
ViT-B/16 layer at batch 512). No online-softmax machinery is needed at
these lengths; this is the short-sequence regime of flash attention.

Layout notes (see /opt/skills/guides/pallas_guide.md): grid is (B*H,) with
whole-sequence blocks resident in VMEM; sequence padded to the bf16
sublane multiple (16); padded keys are masked with -inf via the additive
mask, padded query rows are sliced off by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    q = q_ref[0]                                   # [Lp, D]
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    s = s + mask_ref[...]
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(
        v.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               mask: jnp.ndarray | None = None,
               interpret: bool = False) -> jnp.ndarray:
    """Fused attention over [B, H, L, D] (q pre-scaled by caller).

    mask: optional [L, L] additive fp32 mask (e.g. causal).
    """
    B, H, L, D = q.shape
    Lp = _round_up(L, 16)

    full_mask = jnp.zeros((Lp, Lp), jnp.float32)
    if mask is not None:
        full_mask = full_mask.at[:L, :L].set(mask.astype(jnp.float32))
    if Lp != L:
        # padded keys must never receive probability mass
        full_mask = full_mask.at[:, L:].set(jnp.finfo(jnp.float32).min)

    def pad(t):
        if Lp == L:
            return t.reshape(B * H, L, D)
        return jnp.pad(t, ((0, 0), (0, 0), (0, Lp - L), (0, 0))).reshape(
            B * H, Lp, D)

    qp, kp, vp = pad(q), pad(k), pad(v)

    out = pl.pallas_call(
        _attn_kernel,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Lp, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Lp, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Lp, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((Lp, Lp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Lp, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Lp, D), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, full_mask)

    return out.reshape(B, H, Lp, D)[:, :, :L, :]
