"""Randomized-architecture differential against the reference CLIP.

The committed golden fixture (`clip_golden.npz`) pins one tiny
architecture; this builds the reference's OWN ``clip/model.py`` CLIP
(importlib-loaded, PUBLIC UNTRUSTED CONTENT used as a numeric oracle)
at several randomized architectures per run, converts the fresh torch
state dict with ``convert_torch_clip``, and checks both encoders and
the cosine logits in fp32 — exercising the converter and shape
inference across dims the fixture never covers.
"""

import dataclasses
import importlib.util
import os.path as osp
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from clip_calibration_tpu.models import clip as M
from clip_calibration_tpu.models.weights import convert_torch_clip

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not osp.isdir(REF), reason="reference checkout not available")

VANILLA = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
           "vision_ctx": 0, "language_ctx": 0}

# (embed, res, vlayers, vwidth, patch, twidth, theads, tlayers, vocab)
ARCHS = [
    (32, 32, 2, 64, 8, 48, 4, 2, 500),
    (64, 48, 3, 128, 16, 64, 2, 3, 600),
    (48, 64, 2, 192, 32, 96, 6, 4, 800),
]


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


def _tokens(rng, n, vocab, length=77):
    toks = np.zeros((n, length), np.int64)
    for i in range(n):
        k = int(rng.integers(3, 12))
        toks[i, 0] = vocab - 2                      # SOT
        toks[i, 1:1 + k] = rng.integers(1, vocab - 2, k)
        toks[i, 1 + k] = vocab - 1                  # EOT (max id)
    return toks


@pytest.mark.parametrize("arch", ARCHS,
                         ids=["tiny", "wide", "deep"])
def test_random_arch_parity(arch):
    import torch
    (embed, res, vlayers, vwidth, patch, twidth, theads, tlayers,
     vocab) = arch
    mod = _ref_model_module()
    torch.manual_seed(embed * 7 + vwidth)
    ref = mod.CLIP(embed, res, vlayers, vwidth, patch, 77, vocab,
                   twidth, theads, tlayers, dict(VANILLA)).float().eval()

    rng = np.random.default_rng(arch[0])
    imgs = rng.normal(0, 1, (3, res, res, 3)).astype(np.float32)
    toks = _tokens(rng, 5, vocab)

    with torch.no_grad():
        ref_img = ref.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(toks)).numpy()
        logits, _ = ref(torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
                        torch.from_numpy(toks))
        ref_logits = logits.numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    from clip_calibration_tpu.models.weights import (
        config_from_torch_state_dict)
    cfg = dataclasses.replace(config_from_torch_state_dict(sd),
                              transformer_heads=theads)
    params, cfg = convert_torch_clip(sd, "float32", cfg=cfg)

    img_f = M.encode_image(params, cfg, jnp.asarray(imgs),
                           dtype=jnp.float32)
    txt_f = M.encode_text(params, cfg, jnp.asarray(toks),
                          dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(img_f), ref_img,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(txt_f), ref_txt,
                               rtol=2e-4, atol=2e-4)
    my_logits = M.cosine_logits(img_f, txt_f, params["logit_scale"])
    np.testing.assert_allclose(np.asarray(my_logits), ref_logits,
                               rtol=2e-4, atol=2e-3)


RESNET_ARCHS = [
    ((1, 1, 1, 1), 16, 64, 32),   # (layers, width, res, embed)
    ((2, 1, 2, 1), 32, 64, 48),
    ((1, 2, 1, 2), 24, 96, 64),
]


@pytest.mark.parametrize("arch", RESNET_ARCHS,
                         ids=["rn-tiny", "rn-mixed", "rn-tall"])
def test_random_modified_resnet_parity(arch):
    import torch
    layers, width, res, embed = arch
    mod = _ref_model_module()
    torch.manual_seed(width * 13 + res)
    ref = mod.ModifiedResNet(layers=layers, output_dim=embed,
                             heads=width * 32 // 64,
                             input_resolution=res, width=width
                             ).float().eval()

    rng = np.random.default_rng(width)
    x = rng.normal(0, 1, (2, res, res, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    from clip_calibration_tpu.models.resnet import (
        convert_torch_resnet, modified_resnet_forward)
    sd = {f"visual.{k}": v.numpy() for k, v in ref.state_dict().items()}
    cfg = M.CLIPConfig(embed_dim=embed, image_resolution=res,
                       vision_layers=layers, vision_width=width,
                       vision_patch_size=None, transformer_width=64,
                       transformer_heads=2, transformer_layers=2)
    params = convert_torch_resnet(sd, cfg, np.float32)
    out = modified_resnet_forward(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4,
                               atol=2e-4)


IVLP_ARCHS = [
    # (embed, res, vlayers, vwidth, patch, twidth, theads, tlayers,
    #  vocab, depth, n_ctx)
    (32, 32, 3, 64, 8, 48, 4, 3, 500, 2, 2),
    (32, 48, 4, 64, 16, 48, 4, 4, 500, 3, 4),
]


@pytest.mark.parametrize("arch", IVLP_ARCHS, ids=["d2c2", "d3c4"])
def test_random_ivlp_prompt_injection_parity(arch):
    """The uniform splice interface must reproduce the reference's IVLP
    blocks (learnable per-layer prompts replacing the previous layer's,
    clip/model.py:191-256) at depths/ctx sizes beyond the committed
    fixture — prompts extracted from the reference model's own state."""
    import torch
    (embed, res, vlayers, vwidth, patch, twidth, theads, tlayers,
     vocab, depth, n_ctx) = arch
    mod = _ref_model_module()
    torch.manual_seed(depth * 31 + n_ctx)
    dd = {"trainer": "IVLP", "vision_depth": depth,
          "language_depth": depth, "vision_ctx": n_ctx,
          "language_ctx": n_ctx}
    ref = mod.CLIP(embed, res, vlayers, vwidth, patch, 77, vocab,
                   twidth, theads, tlayers, dd).float().eval()

    rng = np.random.default_rng(depth)
    imgs = rng.normal(0, 1, (2, res, res, 3)).astype(np.float32)
    toks = _tokens(rng, 3, vocab)
    with torch.no_grad():
        ref_img = ref.encode_image(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(toks)).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    backbone_sd = {k: v for k, v in sd.items() if "VPT" not in k}
    from clip_calibration_tpu.models.weights import (
        config_from_torch_state_dict)
    cfg = dataclasses.replace(config_from_torch_state_dict(backbone_sd),
                              transformer_heads=theads)
    params, cfg = convert_torch_clip(backbone_sd, "float32", cfg=cfg)

    shallow = jnp.asarray(sd["visual.VPT"])
    deep_vis = jnp.stack(
        [jnp.asarray(sd[f"visual.transformer.resblocks.{i}.VPT_shallow"])
         for i in range(1, depth)])
    img_f = M.encode_image(params, cfg, jnp.asarray(imgs),
                           shallow_prompts=shallow,
                           deep_prompts=deep_vis,
                           deep_prompt_depth=depth, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(img_f), ref_img,
                               rtol=3e-4, atol=3e-4)

    deep_txt = jnp.stack(
        [jnp.asarray(sd[f"transformer.resblocks.{i}.VPT_shallow"])
         for i in range(1, depth)])
    x = M.embed_tokens(params, jnp.asarray(toks), jnp.float32)
    txt_f = M.encode_text_embedded(params, cfg, x,
                                   jnp.argmax(jnp.asarray(toks), -1),
                                   deep_prompts=deep_txt,
                                   deep_prompt_depth=depth)
    np.testing.assert_allclose(np.asarray(txt_f), ref_txt,
                               rtol=3e-4, atol=3e-4)
