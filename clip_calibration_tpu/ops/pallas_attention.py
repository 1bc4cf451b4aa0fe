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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               mask: jnp.ndarray | None = None,
               interpret: bool = False) -> jnp.ndarray:
    """Fused attention over [B, H, L, D] (q pre-scaled by caller).

    mask: optional [L, L] additive fp32 mask (e.g. causal). Forward runs
    the Pallas kernel; the backward pass (custom VJP below) recomputes
    probabilities with XLA ops — pallas_call has no autodiff rule, and
    prompt-tuning backprops through both towers.
    """
    return _pallas_mha_fwd_impl(q, k, v, mask, interpret)


def _pallas_mha_fwd_impl(q, k, v, mask, interpret):
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


def _pallas_mha_fwd(q, k, v, mask, interpret):
    return _pallas_mha_fwd_impl(q, k, v, mask, interpret), (q, k, v, mask)


def _pallas_mha_bwd(interpret, residuals, g):
    """Standard attention backward, recomputing probs (XLA ops)."""
    q, k, v, mask = residuals
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    if mask is not None:
        s = s + mask.astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1)

    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32))
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dmask)


pallas_mha.defvjp(_pallas_mha_fwd, _pallas_mha_bwd)
