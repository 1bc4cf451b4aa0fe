import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_calibration_tpu.models import clip as M
from clip_calibration_tpu.models.weights import (
    convert_torch_clip, flatten_params, load_params, save_params,
    unflatten_params)

FIXTURE = osp.join(osp.dirname(__file__), "fixtures", "clip_golden.npz")


@pytest.fixture(scope="module")
def golden():
    data = np.load(FIXTURE)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return {
        "sd": sd,
        "imgs": data["imgs"],
        "toks": data["toks"],
        "img_f": data["img_f"],
        "txt_f": data["txt_f"],
        "logits_per_image": data["logits_per_image"],
    }


def _fixture_cfg(golden):
    import dataclasses
    from clip_calibration_tpu.models.weights import (
        config_from_torch_state_dict)
    cfg = config_from_torch_state_dict(golden["sd"])
    # heads aren't recoverable from shapes for the tiny 48-wide fixture
    # (real checkpoints use width//64); the fixture model used 4 heads
    return dataclasses.replace(cfg, transformer_heads=4)


@pytest.fixture(scope="module")
def converted(golden):
    cfg = _fixture_cfg(golden)
    params, cfg = convert_torch_clip(golden["sd"], "float32", cfg=cfg)
    return params, cfg


def test_config_inference(golden):
    cfg = _fixture_cfg(golden)
    assert cfg.embed_dim == 32
    assert cfg.vision_layers == 2
    assert cfg.vision_width == 64
    assert cfg.vision_patch_size == 8
    assert cfg.image_resolution == 32
    assert cfg.transformer_width == 48
    assert cfg.transformer_layers == 2
    assert cfg.vocab_size == 500


def test_encode_image_parity(golden, converted):
    params, cfg = converted
    out = M.encode_image(params, cfg, jnp.asarray(golden["imgs"]),
                         dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), golden["img_f"],
                               rtol=2e-4, atol=2e-4)


def test_encode_text_parity(golden, converted):
    params, cfg = converted
    out = M.encode_text(params, cfg, jnp.asarray(golden["toks"]),
                        dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), golden["txt_f"],
                               rtol=2e-4, atol=2e-4)


def test_cosine_logits_parity(golden, converted):
    params, cfg = converted
    img_f = M.encode_image(params, cfg, jnp.asarray(golden["imgs"]),
                           dtype=jnp.float32)
    txt_f = M.encode_text(params, cfg, jnp.asarray(golden["toks"]),
                          dtype=jnp.float32)
    logits = M.cosine_logits(img_f, txt_f, params["logit_scale"])
    np.testing.assert_allclose(np.asarray(logits),
                               golden["logits_per_image"],
                               rtol=2e-4, atol=2e-3)


def test_bf16_encode_close(golden, converted):
    """bf16 compute should track fp32 within loose tolerance."""
    params32, cfg = converted
    params16, _ = convert_torch_clip(golden["sd"], "bfloat16")
    out32 = M.encode_image(params32, cfg, jnp.asarray(golden["imgs"]),
                           dtype=jnp.float32)
    out16 = M.encode_image(params16, cfg, jnp.asarray(golden["imgs"]),
                           dtype=jnp.bfloat16)
    cos = np.sum(
        np.asarray(out32) * np.asarray(out16, np.float32), -1) / (
        np.linalg.norm(np.asarray(out32), axis=-1)
        * np.linalg.norm(np.asarray(out16, np.float32), axis=-1))
    assert np.all(cos > 0.99)


def test_random_init_shapes():
    cfg = M.PRESETS["ViT-B/16"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg)
    assert params["visual"]["patch_kernel"].shape == (16 * 16 * 3, 768)
    assert params["visual"]["blocks"]["attn"]["wqkv"].shape == (
        12, 768, 3 * 768)
    assert params["text"]["token_embedding"].shape == (49408, 512)
    assert params["text"]["text_projection"].shape == (512, 512)
    assert float(params["logit_scale"]) == pytest.approx(np.log(1 / 0.07))


def test_prompt_injection_changes_output(golden, converted):
    """Deep prompts must change features; depth=0 must be a no-op."""
    params, cfg = converted
    imgs = jnp.asarray(golden["imgs"])
    rng = jax.random.PRNGKey(0)
    shallow = jax.random.normal(rng, (4, cfg.vision_width)) * 0.02
    deep = jax.random.normal(rng, (1, 4, cfg.vision_width)) * 0.02

    base = M.encode_image(params, cfg, imgs, dtype=jnp.float32)
    with_shallow = M.encode_image(params, cfg, imgs,
                                  shallow_prompts=shallow,
                                  dtype=jnp.float32)
    with_deep = M.encode_image(params, cfg, imgs, shallow_prompts=shallow,
                               deep_prompts=deep, deep_prompt_depth=2,
                               dtype=jnp.float32)
    assert not np.allclose(np.asarray(base), np.asarray(with_shallow))
    assert not np.allclose(np.asarray(with_shallow), np.asarray(with_deep))

    # depth 0/1 => no splice: identical to shallow-only
    no_splice = M.encode_image(params, cfg, imgs, shallow_prompts=shallow,
                               deep_prompts=deep, deep_prompt_depth=1,
                               dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(no_splice),
                               np.asarray(with_shallow), rtol=1e-5,
                               atol=1e-5)


def test_text_deep_prompt_splice_semantics(golden, converted):
    """A text deep prompt at layer 1 replaces positions [1, 1+n_ctx) —
    outputs pooled at EOT must differ from the unprompted run."""
    params, cfg = converted
    toks = jnp.asarray(golden["toks"])
    x = M.embed_tokens(params, toks, jnp.float32)
    eot = jnp.argmax(toks, axis=-1)
    deep = jax.random.normal(jax.random.PRNGKey(1), (1, 4, cfg.transformer_width))
    base = M.encode_text_embedded(params, cfg, x, eot)
    prompted = M.encode_text_embedded(params, cfg, x, eot,
                                      deep_prompts=deep,
                                      deep_prompt_depth=2)
    assert not np.allclose(np.asarray(base), np.asarray(prompted))


def test_save_load_roundtrip(tmp_path, converted):
    params, _ = converted
    path = str(tmp_path / "clip.npz")
    save_params(path, params)
    loaded = load_params(path)
    flat_a = flatten_params(params)
    flat_b = flatten_params(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]))


def test_save_load_bf16_roundtrip(tmp_path, golden):
    params, _ = convert_torch_clip(golden["sd"], "bfloat16")
    path = str(tmp_path / "clip_bf16.npz")
    save_params(path, params)
    loaded = load_params(path)
    pk = loaded["visual"]["patch_kernel"]
    assert str(pk.dtype) == "bfloat16"
    np.testing.assert_array_equal(
        np.asarray(params["visual"]["patch_kernel"]).view(np.uint16),
        np.asarray(pk).view(np.uint16))


def test_modified_resnet_parity():
    """Tiny ModifiedResNet vs reference torch activations (fp32)."""
    from clip_calibration_tpu.models.resnet import (
        convert_torch_resnet, modified_resnet_forward)
    data = np.load(osp.join(osp.dirname(__file__), "fixtures",
                            "resnet_golden.npz"))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    cfg = M.CLIPConfig(embed_dim=32, image_resolution=64,
                       vision_layers=(1, 1, 1, 1), vision_width=16,
                       vision_patch_size=None, transformer_width=64,
                       transformer_heads=2, transformer_layers=2)
    params = convert_torch_resnet(sd, cfg, np.float32)
    out = modified_resnet_forward(params, cfg,
                                  jnp.asarray(data["x"], jnp.float32))
    np.testing.assert_allclose(np.asarray(out), data["out"], rtol=2e-4,
                               atol=2e-4)


def test_rn50_preset_init_runs():
    from clip_calibration_tpu.models.resnet import (
        init_modified_resnet, modified_resnet_forward)
    cfg = M.PRESETS["RN50"]
    visual = init_modified_resnet(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 224, 224, 3))
    out = modified_resnet_forward(visual, cfg, x)
    assert out.shape == (1, 1024)


def test_deep_resnet_init_runs():
    """Regression: init's RNG key pool must size to the block count —
    a fixed 64-key pool crashed RN101's depth-23 layer3
    (33 blocks x up-to-4 convs). Tiny width keeps it fast; the layer
    depths are RN101's exact (3, 4, 23, 3)."""
    from clip_calibration_tpu.models.resnet import (
        init_modified_resnet, modified_resnet_forward)
    cfg = M.CLIPConfig(embed_dim=16, image_resolution=32,
                       vision_layers=(3, 4, 23, 3), vision_width=8,
                       vision_patch_size=None, transformer_width=64,
                       transformer_heads=2, transformer_layers=2)
    visual = init_modified_resnet(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    out = modified_resnet_forward(visual, cfg, x)
    assert out.shape == (1, 16)


def test_remat_text_encode_matches_plain_gradients():
    """remat=True must change memory behavior only: outputs and
    gradients (w.r.t. the prompt embeddings) identical to the plain
    scan, fp32."""
    cfg = M.PRESETS["ViT-Test"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    n, L, D = 6, cfg.context_length, cfg.transformer_width
    x = jax.random.normal(jax.random.PRNGKey(1), (n, L, D),
                          jnp.float32) * 0.02
    eot = jnp.full((n,), 5, jnp.int32)

    def loss(x, remat):
        f = M.encode_text_embedded(params, cfg, x, eot, remat=remat)
        return jnp.sum(f ** 2)

    v0, g0 = jax.value_and_grad(lambda x: loss(x, False))(x)
    v1, g1 = jax.value_and_grad(lambda x: loss(x, True))(x)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-7)


def test_eot_truncation_exact(golden, converted):
    """seq_len truncation must be mathematically exact, not approximate:
    the causal mask means positions <= EOT never attend past themselves,
    so encoding over seq_len = max(eot)+1 gives the same pooled feature
    as the full 77-position run (fp32; gradients too)."""
    params, cfg = converted
    toks = jnp.asarray(golden["toks"])
    seq = M.eot_seq_len(np.asarray(golden["toks"]).argmax(-1))
    assert seq < cfg.context_length  # the fixture must actually truncate

    full = M.encode_text(params, cfg, toks, dtype=jnp.float32)
    trunc = M.encode_text(params, cfg, toks, dtype=jnp.float32,
                          seq_len=seq)
    np.testing.assert_allclose(np.asarray(trunc), np.asarray(full),
                               rtol=1e-6, atol=1e-6)

    # embedded path + gradient w.r.t. the prompt embeddings
    x = M.embed_tokens(params, toks, jnp.float32)
    eot = jnp.argmax(toks, axis=-1)

    def loss(x, seq_len):
        f = M.encode_text_embedded(params, cfg, x, eot, seq_len=seq_len)
        return jnp.sum(f ** 2)

    v0, g0 = jax.value_and_grad(lambda x: loss(x, None))(x)
    v1, g1 = jax.value_and_grad(lambda x: loss(x, seq))(x)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-6)
    # grads past the truncation point are exactly zero in the full run
    # too (those positions feed nothing the pooling reads); compare the
    # live part. Different static shapes -> different XLA fusion order,
    # so allow fp32 reduction-order noise.
    np.testing.assert_allclose(np.asarray(g1)[:, :seq],
                               np.asarray(g0)[:, :seq],
                               rtol=1e-4, atol=1e-4)
    # and the dead tail of the full-length grad really is zero
    np.testing.assert_array_equal(np.asarray(g0)[:, seq:], 0.0)


def test_eot_truncation_rejects_dropped_eot(golden, converted):
    """A seq_len that drops an EOT must fail loudly on concrete inputs
    (under jit it would silently clamp the pooling gather)."""
    params, cfg = converted
    toks = jnp.asarray(golden["toks"])
    x = M.embed_tokens(params, toks, jnp.float32)
    eot = jnp.argmax(toks, axis=-1)
    bad = int(np.max(np.asarray(eot)))  # == max EOT -> drops it
    with pytest.raises(ValueError, match="drops an EOT"):
        M.encode_text_embedded(params, cfg, x, eot, seq_len=bad)


def test_encode_text_raw_tokens_rejects_dropped_eot(golden, converted):
    """The raw-token path must guard too: eot_pos comes from the
    UNTRUNCATED tokens, so a too-small seq_len trips the embedded path's
    concrete-eot ValueError instead of argmaxing a truncated window and
    silently pooling a wrong position (ADVICE r2 item 1)."""
    params, cfg = converted
    toks = jnp.asarray(golden["toks"])
    bad = int(np.asarray(toks).argmax(-1).max())  # == max EOT -> drops it
    with pytest.raises(ValueError, match="drops an EOT"):
        M.encode_text(params, cfg, toks, dtype=jnp.float32, seq_len=bad)


def test_available_models_and_name_resolution():
    """Reference public API parity (``clip/clip.py:84-86``): the full
    published zoo is listed, and zoo names resolve to the filesystem
    spellings OpenAI's published checkpoints use."""
    from clip_calibration_tpu.models.backbone import (_candidate_names,
                                                      available_models)
    zoo = {"RN50", "RN101", "RN50x4", "RN50x16", "RN50x64",
           "ViT-B/32", "ViT-B/16", "ViT-L/14", "ViT-L/14@336px"}
    assert zoo <= set(available_models())
    assert _candidate_names("ViT-B/16") == ["ViT-B-16"]
    assert _candidate_names("ViT-L/14@336px") == [
        "ViT-L-14@336px", "ViT-L-14-336px"]


def test_npz_outranks_pt_across_spellings(tmp_path, monkeypatch, capsys):
    """Resolution order: a native npz under ANY filesystem spelling
    outranks a .pt under another spelling in the same directory (the
    docstring's npz-first contract)."""
    import jax
    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.models.backbone import load_clip_backbone
    from clip_calibration_tpu.models.weights import save_params

    cfg = M.PRESETS["ViT-Test"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # npz under the @-preserving spelling, decoy .pt under the other;
    # ViT-Test has one spelling, so craft via the 336px name
    name = "ViT-L/14@336px"
    save_params(str(tmp_path / "ViT-L-14@336px.npz"), params)
    (tmp_path / "ViT-L-14-336px.pt").write_bytes(b"not a checkpoint")
    monkeypatch.setenv("CLIP_CHECKPOINT_DIR", str(tmp_path))
    # must pick the npz (the decoy .pt would raise in torch.load)
    loaded, _ = load_clip_backbone(name, "float32")
    assert "Loading CLIP weights" in capsys.readouterr().out
