import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_calibration_tpu.ops.attention import (causal_mask,
                                                multi_head_attention)
from clip_calibration_tpu.ops.pallas_attention import pallas_mha


def _ref_attention(q, k, v, mask):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@pytest.mark.parametrize("L,mask_type", [(77, "causal"), (197, None),
                                         (64, None), (13, "causal")])
def test_pallas_mha_matches_reference(L, mask_type, rng):
    B, H, D = 2, 4, 32
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, L, D), jnp.float32) * 0.3
    k = jax.random.normal(kk, (B, H, L, D), jnp.float32) * 0.3
    v = jax.random.normal(kv, (B, H, L, D), jnp.float32)
    mask = causal_mask(L) if mask_type == "causal" else None

    want = _ref_attention(q, k, v, mask)
    got = pallas_mha(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_mha_wrapper_impl_switch(rng):
    """multi_head_attention must give identical results under both
    backends (pallas in interpreter mode on CPU)."""
    from clip_calibration_tpu.ops import attention as A
    from clip_calibration_tpu.ops import pallas_attention as PA
    B, L, D, H = 2, 77, 64, 4
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, L, D), jnp.float32) * 0.2
    ks = jax.random.split(key, 4)
    wqkv = jax.random.normal(ks[0], (D, 3 * D)) * 0.05
    bqkv = jnp.zeros((3 * D,))
    wo = jax.random.normal(ks[1], (D, D)) * 0.05
    bo = jnp.zeros((D,))
    mask = causal_mask(L)

    A.set_attention_impl("xla")
    want = multi_head_attention(x, wqkv, bqkv, wo, bo, H, mask)

    # patch pallas to interpreter mode for CPU execution
    orig = PA.pallas_mha
    PA_interp = lambda q, k, v, m=None, interpret=True: orig(
        q, k, v, m, interpret=True)
    PA.pallas_mha = PA_interp
    try:
        A.set_attention_impl("pallas")
        got = multi_head_attention(x, wqkv, bqkv, wo, bo, H, mask)
    finally:
        PA.pallas_mha = orig
        A.set_attention_impl("auto")

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pallas_mha_gradients_match_xla(rng):
    """The custom VJP must match XLA autodiff (training backprops
    through both towers on TPU where pallas is the default)."""
    B, H, L, D = 1, 2, 33, 16
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, L, D), jnp.float32) * 0.3
    k = jax.random.normal(kk, (B, H, L, D), jnp.float32) * 0.3
    v = jax.random.normal(kv, (B, H, L, D), jnp.float32)
    mask = causal_mask(L)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v, mask) ** 2)

    def loss_pallas(q, k, v):
        return jnp.sum(pallas_mha(q, k, v, mask, True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
