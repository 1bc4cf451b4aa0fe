"""Full-preset fp32 parity against the live torch reference.

The randomized-architecture differentials (test_runtime_model_parity.py)
cover toy dims; this gate runs the EXACT configurations every real run
uses — the full zoo (ViT-B/16, ViT-B/32, ViT-L/14, ViT-L/14@336px,
RN50, RN101, RN50x4/x16/x64, ``/root/reference/clip/clip.py:30-39``)
at each preset's native resolution / 77 context (reference
``clip/model.py:394-424`` encode_image, ``:598-613`` encode_text) — by
instantiating the reference's own CLIP at the full preset with seeded
random weights, converting the state dict, and checking both encoders
plus the cosine logits in fp32 (VERDICT r2 item 6).

Slow-marked: each preset builds a ~100M-param torch model and runs both
stacks on CPU (deselect with ``-m "not slow"``).
"""

import dataclasses
import importlib.util
import os.path as osp
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from clip_calibration_tpu.models import clip as M
from clip_calibration_tpu.models.weights import (config_from_torch_state_dict,
                                                 convert_torch_clip)

REF = "/root/reference"

pytestmark = [
    pytest.mark.skipif(not osp.isdir(REF),
                       reason="reference checkout not available"),
    pytest.mark.slow,
]

VANILLA = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
           "vision_ctx": 0, "language_ctx": 0}

# name -> CLIP(...) positional args: (embed_dim, image_resolution,
# vision_layers, vision_width, vision_patch_size, context_length,
# vocab_size, transformer_width, transformer_heads, transformer_layers)
FULL_PRESETS = {
    "ViT-B/16": (512, 224, 12, 768, 16, 77, 49408, 512, 8, 12),
    "ViT-B/32": (512, 224, 12, 768, 32, 77, 49408, 512, 8, 12),
    "ViT-L/14": (768, 224, 24, 1024, 14, 77, 49408, 768, 12, 12),
    "ViT-L/14@336px": (768, 336, 24, 1024, 14, 77, 49408, 768, 12, 12),
    "RN50": (1024, 224, (3, 4, 6, 3), 64, None, 77, 49408, 512, 8, 12),
    "RN101": (512, 224, (3, 4, 23, 3), 64, None, 77, 49408, 512, 8, 12),
    "RN50x4": (640, 288, (4, 6, 10, 6), 80, None, 77, 49408, 640, 10, 12),
    "RN50x16": (768, 384, (6, 8, 18, 8), 96, None, 77, 49408, 768, 12, 12),
    "RN50x64": (1024, 448, (3, 15, 36, 10), 128, None, 77, 49408,
                1024, 16, 12),
}


def _ref_model_module():
    name = "ref_clip_model"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, osp.join(REF, "clip", "model.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _tokens(rng, n, vocab=49408, length=77):
    toks = np.zeros((n, length), np.int64)
    for i in range(n):
        k = int(rng.integers(4, 70))  # includes near-full-context rows
        toks[i, 0] = vocab - 2                      # SOT
        toks[i, 1:1 + k] = rng.integers(1, vocab - 2, k)
        toks[i, 1 + k] = vocab - 1                  # EOT (max id)
    return toks


@pytest.mark.parametrize("preset", sorted(FULL_PRESETS),
                         ids=lambda p: p.replace("/", "-"))
def test_full_preset_fp32_parity(preset):
    import torch
    args = FULL_PRESETS[preset]
    # the preset table must agree with models/clip.PRESETS (what
    # load_clip_backbone builds for real runs)
    ours_cfg = M.PRESETS[preset]
    assert (ours_cfg.embed_dim, ours_cfg.image_resolution,
            ours_cfg.vision_layers, ours_cfg.vision_width,
            ours_cfg.vision_patch_size, ours_cfg.transformer_width,
            ours_cfg.transformer_heads,
            ours_cfg.transformer_layers) == args[:5] + args[7:]

    mod = _ref_model_module()
    torch.manual_seed(0)
    ref = mod.CLIP(*args, dict(VANILLA)).float().eval()

    rng = np.random.default_rng(16)
    res = args[1]
    imgs = rng.normal(0, 1, (2, res, res, 3)).astype(np.float32)
    toks = _tokens(rng, 4)

    with torch.no_grad():
        t_imgs = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        t_toks = torch.from_numpy(toks)
        ref_img = ref.encode_image(t_imgs).numpy()
        ref_txt = ref.encode_text(t_toks).numpy()
        ref_logits, _ = ref(t_imgs, t_toks)
        ref_logits = ref_logits.numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    heads = args[8]
    cfg = dataclasses.replace(config_from_torch_state_dict(sd),
                              transformer_heads=heads)
    assert cfg == ours_cfg  # shape inference reproduces the preset
    params, cfg = convert_torch_clip(sd, "float32", cfg=cfg)

    img_f = np.asarray(M.encode_image(params, cfg, jnp.asarray(imgs),
                                      dtype=jnp.float32))
    txt_f = np.asarray(M.encode_text(params, cfg, jnp.asarray(toks),
                                     dtype=jnp.float32))
    # fp32 end-to-end; random-init activations are O(1), so absolute
    # tolerance ~1e-4 (VERDICT r2 item 6) covers the fp32 accumulation
    # differences between torch (sequential) and XLA (fused) at
    # 12-layer width-768 depth
    np.testing.assert_allclose(img_f, ref_img, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(txt_f, ref_txt, rtol=2e-4, atol=2e-4)

    my_logits = np.asarray(
        M.cosine_logits(jnp.asarray(img_f), jnp.asarray(txt_f),
                        params["logit_scale"]))
    np.testing.assert_allclose(my_logits, ref_logits, rtol=2e-4,
                               atol=2e-3)


def test_full_preset_ivlp_injection_parity(monkeypatch):
    """Deep prompt injection at the production preset: the toy-scale
    IVLP goldens (test_prompt_injection_parity.py) leave the
    injection x full-dims cross uncovered — this instantiates the
    reference CLIP at ViT-B/16 dims with the IVLP design
    (``clip/model.py:191-256``: per-layer VPT_shallow replacing the
    previous layer's prompt tokens, vision trailing / text [1, 1+n_ctx))
    and checks both encoders against our uniform splice interface in
    fp32. The reference hardcodes ``.half()`` on the spliced contexts
    (``clip/model.py:240,407``) — its fp16 policy, neutralized here for
    the fp32 comparison (same treatment the toy fixtures used)."""
    import torch
    monkeypatch.setattr(torch.Tensor, "half", lambda self: self)

    mod = _ref_model_module()
    torch.manual_seed(3)
    design = {"trainer": "IVLP", "vision_depth": 3, "language_depth": 3,
              "vision_ctx": 2, "language_ctx": 2}
    ref = mod.CLIP(*FULL_PRESETS["ViT-B/16"], design).float().eval()

    rng = np.random.default_rng(7)
    imgs = rng.normal(0, 1, (2, 224, 224, 3)).astype(np.float32)
    toks = _tokens(rng, 3)

    with torch.no_grad():
        ref_img = ref.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(toks)).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    backbone_sd = {k: v for k, v in sd.items() if "VPT" not in k}
    cfg = dataclasses.replace(config_from_torch_state_dict(backbone_sd),
                              transformer_heads=8)
    params, cfg = convert_torch_clip(backbone_sd, "float32", cfg=cfg)

    shallow = jnp.asarray(sd["visual.VPT"])
    deep_v = jnp.stack([
        jnp.asarray(sd[f"visual.transformer.resblocks.{i}.VPT_shallow"])
        for i in (1, 2)])
    img_f = M.encode_image(params, cfg, jnp.asarray(imgs),
                           shallow_prompts=shallow, deep_prompts=deep_v,
                           deep_prompt_depth=3, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(img_f), ref_img, rtol=2e-4,
                               atol=2e-4)

    deep_t = jnp.stack([
        jnp.asarray(sd[f"transformer.resblocks.{i}.VPT_shallow"])
        for i in (1, 2)])
    x = M.embed_tokens(params, jnp.asarray(toks), jnp.float32)
    txt_f = M.encode_text_embedded(params, cfg, x,
                                   jnp.argmax(jnp.asarray(toks), -1),
                                   deep_prompts=deep_t,
                                   deep_prompt_depth=3)
    np.testing.assert_allclose(np.asarray(txt_f), ref_txt, rtol=2e-4,
                               atol=2e-4)
