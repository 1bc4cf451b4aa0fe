"""Golden parity for the deep prompt-injection paths.

Fixtures were generated from the reference's IVLP and MaPLe transformer
blocks (``clip/model.py:191-331``) on tiny fp32 models; these tests prove
the uniform splice interface reproduces both injection patterns exactly:
vision prompts replace the trailing tokens, text prompts replace
positions [1, 1+n_ctx), layers 1..depth-1 only.
"""

import dataclasses
import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_calibration_tpu.models import clip as M
from clip_calibration_tpu.models.weights import (config_from_torch_state_dict,
                                                 convert_torch_clip)

FIXDIR = osp.join(osp.dirname(__file__), "fixtures")


def _load(name):
    data = np.load(osp.join(FIXDIR, name))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    cfg = dataclasses.replace(config_from_torch_state_dict(sd),
                              transformer_heads=4)
    # strip reference prompt params before conversion (ours are inputs)
    backbone_sd = {k: v for k, v in sd.items() if "VPT" not in k}
    params, cfg = convert_torch_clip(backbone_sd, "float32", cfg=cfg)
    return data, sd, params, cfg


def test_ivlp_vision_parity():
    data, sd, params, cfg = _load("ivlp_golden.npz")
    shallow = jnp.asarray(sd["visual.VPT"])                     # [2, 64]
    deep = jnp.asarray(sd["visual.transformer.resblocks.1.VPT_shallow"]
                       )[None]                                  # [1, 2, 64]
    out = M.encode_image(params, cfg, jnp.asarray(data["imgs"]),
                         shallow_prompts=shallow, deep_prompts=deep,
                         deep_prompt_depth=2, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), data["img_f"], rtol=3e-4,
                               atol=3e-4)


def test_ivlp_text_parity():
    data, sd, params, cfg = _load("ivlp_golden.npz")
    toks = jnp.asarray(data["toks"])
    x = M.embed_tokens(params, toks, jnp.float32)
    deep = jnp.asarray(sd["transformer.resblocks.1.VPT_shallow"])[None]
    out = M.encode_text_embedded(params, cfg, x,
                                 jnp.argmax(toks, axis=-1),
                                 deep_prompts=deep, deep_prompt_depth=2)
    np.testing.assert_allclose(np.asarray(out), data["txt_f"], rtol=3e-4,
                               atol=3e-4)


def test_maple_vision_parity():
    data, sd, params, cfg = _load("maple_golden.npz")
    out = M.encode_image(
        params, cfg, jnp.asarray(data["imgs"]),
        shallow_prompts=jnp.asarray(data["shared_ctx"]),
        deep_prompts=jnp.asarray(data["deep_vis"])[None],
        deep_prompt_depth=2, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), data["img_f"], rtol=3e-4,
                               atol=3e-4)


def test_maple_text_parity():
    data, sd, params, cfg = _load("maple_golden.npz")
    toks = jnp.asarray(data["toks"])
    x = M.embed_tokens(params, toks, jnp.float32)
    out = M.encode_text_embedded(
        params, cfg, x, jnp.argmax(toks, axis=-1),
        deep_prompts=jnp.asarray(data["deep_text"])[None],
        deep_prompt_depth=2)
    np.testing.assert_allclose(np.asarray(out), data["txt_f"], rtol=3e-4,
                               atol=3e-4)
