import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_calibration_tpu.ops.attention import (causal_mask,
                                                multi_head_attention)
from clip_calibration_tpu.ops.pallas_attention import pallas_mha_qkv


def _ref_attention_qkv(qkv, mask, n_heads):
    """Reference: split heads, scaled QK^T + mask, softmax, PV, merge."""
    B, L, D3 = qkv.shape
    D = D3 // 3
    d = D // n_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, L, n_heads, d).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q / (d ** 0.5), k,
                        preferred_element_type=jnp.float32)
    scores = scores + mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(B, L, D)


@pytest.mark.parametrize("L,mask_type", [(80, "causal"), (208, "none"),
                                         (64, "pad")])
def test_pallas_mha_qkv_matches_reference(L, mask_type):
    B, H, D = 2, 4, 64
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, L, 3 * D),
                            jnp.float32) * 0.3
    if mask_type == "causal":
        mask = causal_mask(L)
    elif mask_type == "pad":
        # padded keys masked, padded rows pinned to key 0 (the tower's
        # pad-once contract, models/clip.py::transformer)
        neg = jnp.finfo(jnp.float32).min
        mask = jnp.zeros((L, L), jnp.float32)
        mask = mask.at[:, 50:].set(neg).at[50:, :].set(neg)
        mask = mask.at[50:, 0].set(0.0)
    else:
        mask = jnp.zeros((L, L), jnp.float32)

    want = _ref_attention_qkv(qkv, mask, H)
    got = pallas_mha_qkv(qkv, mask, H, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_mha_wrapper_impl_switch():
    """multi_head_attention must give identical results under both
    backends (pallas in interpreter mode on CPU), including the
    non-multiple-of-16 length where the pallas wrapper falls back."""
    from clip_calibration_tpu.ops import attention as A
    from clip_calibration_tpu.ops import pallas_attention as PA
    B, D, H = 2, 64, 4
    for L in (80, 77):  # 80 -> kernel path, 77 -> XLA fallback
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

        orig = PA.pallas_mha_qkv

        def interp(qkv, m, n_heads, interpret=True):
            return orig(qkv, m, n_heads, True)

        PA.pallas_mha_qkv = interp
        try:
            A.set_attention_impl("pallas")
            got = multi_head_attention(x, wqkv, bqkv, wo, bo, H, mask)
        finally:
            PA.pallas_mha_qkv = orig
            A.set_attention_impl("auto")

        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_pallas_mha_qkv_gradients_match_xla():
    """The custom VJP must match XLA autodiff (training backprops
    through both towers on TPU where pallas is the default)."""
    B, H, L, D = 1, 2, 32, 32
    qkv = jax.random.normal(jax.random.PRNGKey(3), (B, L, 3 * D),
                            jnp.float32) * 0.3
    mask = causal_mask(L)

    def loss_ref(qkv):
        return jnp.sum(_ref_attention_qkv(qkv, mask, H) ** 2)

    def loss_pallas(qkv):
        return jnp.sum(pallas_mha_qkv(qkv, mask, H, True) ** 2)

    g_ref = jax.grad(loss_ref)(qkv)
    g_pal = jax.grad(loss_pallas)(qkv)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)


def test_short_seq_row_packing_matches_xla():
    """The short-sequence row packing (G rows folded into one [G*L]
    sequence with a block-diagonal mask — ops/attention.py::_pack_rows)
    must be exact: cross-row scores are -inf so their probabilities are
    exactly 0. Forward AND gradients vs the XLA path, at a shape where
    packing engages (B=8, L=32 -> G=8 one cell)."""
    from clip_calibration_tpu.ops import attention as A
    from clip_calibration_tpu.ops import pallas_attention as PA

    B, D, H, L = 8, 64, 4, 32
    assert A._pack_rows(B, L) == 8
    assert A._pack_rows(B, 80) == 1      # long seq: no packing
    assert A._pack_rows(7, L) == 1       # indivisible batch: no packing
    assert A._pack_rows(64, 32) == 16    # 16*32=512 fits the budget

    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (B, L, D), jnp.float32) * 0.2
    ks = jax.random.split(key, 4)
    wqkv = jax.random.normal(ks[0], (D, 3 * D)) * 0.05
    bqkv = jnp.zeros((3 * D,))
    wo = jax.random.normal(ks[1], (D, D)) * 0.05
    bo = jnp.zeros((D,))
    mask = causal_mask(L)

    def run():
        return multi_head_attention(x, wqkv, bqkv, wo, bo, H, mask)

    A.set_attention_impl("xla")
    want = run()
    want_g = jax.grad(lambda x: jnp.sum(multi_head_attention(
        x, wqkv, bqkv, wo, bo, H, mask) ** 2))(x)

    orig = PA.pallas_mha_qkv

    def interp(qkv, m, n_heads, interpret=True):
        # the packed call must arrive with ONE fused row of 8 sequences
        assert qkv.shape[:2] == (1, B * L)
        assert m.shape == (B * L, B * L)
        return orig(qkv, m, n_heads, True)

    PA.pallas_mha_qkv = interp
    try:
        A.set_attention_impl("pallas")
        got = run()
        got_g = jax.grad(lambda x: jnp.sum(multi_head_attention(
            x, wqkv, bqkv, wo, bo, H, mask) ** 2))(x)
    finally:
        PA.pallas_mha_qkv = orig
        A.set_attention_impl("auto")

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=2e-4, atol=2e-5)


def test_transformer_pad_once_equivalence():
    """Padding the token axis to the sublane multiple must not change
    real-token outputs (pad keys masked, pad rows pinned to key 0)."""
    from clip_calibration_tpu.models import clip as M
    cfg = M.PRESETS["ViT-Test"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 13, 64),
                          jnp.float32) * 0.1  # L=13 -> padded to 16
    out = M.transformer(params["text"]["blocks"], x, 4,
                        causal_mask(13))
    assert out.shape == (3, 13, 64)
    # reference: run each token count unpadded via the XLA einsum path
    from clip_calibration_tpu.ops import attention as A

    def unpadded(blocks, x, n_heads, mask):
        h = x
        n_layers = blocks["ln_1"]["scale"].shape[0]
        for i in range(n_layers):
            p = jax.tree.map(lambda a: a[i], blocks)
            h = h + multi_head_attention(
                A.layer_norm(h, p["ln_1"]["scale"], p["ln_1"]["bias"]),
                p["attn"]["wqkv"], p["attn"]["bqkv"],
                p["attn"]["wo"], p["attn"]["bo"], n_heads, mask)
            y = A.layer_norm(h, p["ln_2"]["scale"], p["ln_2"]["bias"])
            y = A.quick_gelu(y @ p["mlp"]["w_fc"] + p["mlp"]["b_fc"])
            h = h + (y @ p["mlp"]["w_proj"] + p["mlp"]["b_proj"])
        return h

    want = unpadded(params["text"]["blocks"], x, 4, causal_mask(13))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bwd_small_shape_xla_path_matches_kernel():
    """_bwd routes small shapes to the einsum backward (faster below the
    measured crossover); both paths must produce the same gradients."""
    from clip_calibration_tpu.ops import pallas_attention as PA
    B, H, L, D = 2, 2, 32, 32
    qkv = jax.random.normal(jax.random.PRNGKey(5), (B, L, 3 * D),
                            jnp.float32) * 0.3
    g = jax.random.normal(jax.random.PRNGKey(6), (B, L, D),
                          jnp.float32)
    mask = causal_mask(L)
    want = PA._xla_bwd(qkv, mask, g, H)
    got, _ = PA._bwd(H, True, (qkv, mask), g)  # interpret -> kernel
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
