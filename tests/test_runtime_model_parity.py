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
