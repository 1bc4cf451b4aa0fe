"""Loading checkpoints with the reference's torch key layouts.

Builds each trainer on the synthetic dataset, writes a torch checkpoint
using the reference implementation's registered-module key names (e.g.
CoCoOp's meta_net.linear1.weight, MaPLe's whole-model
MultiModalPromptLearner dict), loads it through trainer.load_model, and
asserts the converted arrays landed in the right pytree slots.
"""

import os
import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

from clip_calibration_tpu.config import get_cfg_default
from clip_calibration_tpu.data.base import set_random_seed
from clip_calibration_tpu.engine.registry import TRAINER_REGISTRY
import clip_calibration_tpu.data.datasets  # noqa: F401
import clip_calibration_tpu.trainers  # noqa: F401
import clip_calibration_tpu.evaluators.vl_evaluator  # noqa: F401


@pytest.fixture(scope="module")
def base_cfg(tmp_path_factory):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path_factory.mktemp("data"))
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.NUM_SHOTS = 4
    cfg.DATASET.SUBSAMPLE_CLASSES = "base"
    cfg.SEED = 1
    cfg.MODEL.BACKBONE.NAME = "ViT-Test"
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.INTERPOLATION = "bicubic"
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.DATALOADER.TEST.BATCH_SIZE = 16
    cfg.TEST.EVALUATOR = "VLClassification"
    cfg.OPTIM.NAME = "sgd"
    return cfg


def _build(base_cfg, trainer, opts):
    cfg = base_cfg.clone()
    for key, value in opts.items():
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        setattr(node, parts[-1], value)
    cfg.TRAINER.NAME = trainer
    set_random_seed(1)
    return TRAINER_REGISTRY.get(trainer)(cfg)


def _save_torch(tmp_path, subdir, sd, epoch=3):
    import torch
    d = tmp_path / subdir
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"model.pth.tar-{epoch}"
    torch.save({"state_dict": {k: torch.as_tensor(np.asarray(v))
                               for k, v in sd.items()},
                "epoch": epoch}, str(path))
    return str(tmp_path)


def test_cocoop_reference_ckpt(base_cfg, tmp_path):
    t = _build(base_cfg, "CoCoOp", {"TRAINER.COCOOP.N_CTX": 4})
    p = t._models["prompt_learner"]["params"]
    rng = np.random.default_rng(0)
    ctx = rng.normal(size=np.asarray(p["ctx"]).shape).astype(np.float32)
    w1 = rng.normal(size=np.asarray(p["meta"]["w1"]).shape).astype(
        np.float32)
    sd = {
        "ctx": ctx,
        "token_prefix": np.zeros((5, 1, 64), np.float32),
        "token_suffix": np.zeros((5, 72, 64), np.float32),
        "meta_net.linear1.weight": w1.T,  # torch [out, in]
        "meta_net.linear1.bias": np.zeros(w1.shape[1], np.float32),
        "meta_net.linear2.weight":
            np.asarray(p["meta"]["w2"], np.float32).T,
        "meta_net.linear2.bias": np.zeros(
            np.asarray(p["meta"]["b2"]).shape, np.float32),
    }
    t.load_model(_save_torch(tmp_path, "prompt_learner", sd), epoch=3)
    got = t._models["prompt_learner"]["params"]
    np.testing.assert_allclose(np.asarray(got["ctx"]), ctx, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["meta"]["w1"]), w1,
                               rtol=1e-6)


def test_maple_reference_ckpt(base_cfg, tmp_path):
    t = _build(base_cfg, "MaPLe", {"TRAINER.MAPLE.PROMPT_DEPTH": 2,
                                   "TRAINER.MAPLE.N_CTX": 2})
    p = t._models["prompt_learner"]["params"]
    rng = np.random.default_rng(1)
    ctx = rng.normal(size=np.asarray(p["ctx"]).shape).astype(np.float32)
    proj_w = rng.normal(size=np.asarray(p["proj_w"]).shape).astype(
        np.float32)
    comp0 = rng.normal(
        size=np.asarray(p["compound_text"][0]).shape).astype(np.float32)
    cproj_w = rng.normal(
        size=np.asarray(p["compound_proj_w"][0]).shape).astype(np.float32)
    sd = {
        "prompt_learner.ctx": ctx,
        "prompt_learner.proj.weight": proj_w.T,
        "prompt_learner.proj.bias":
            np.zeros(proj_w.shape[1], np.float32),
        "prompt_learner.compound_prompts_text.0": comp0,
        "prompt_learner.compound_prompt_projections.0.weight": cproj_w.T,
        "prompt_learner.compound_prompt_projections.0.bias":
            np.zeros(cproj_w.shape[1], np.float32),
        "prompt_learner.token_prefix": np.zeros((5, 1, 64), np.float32),
        "prompt_learner.token_suffix": np.zeros((5, 72, 64), np.float32),
    }
    # reference registers the whole model as MultiModalPromptLearner
    t.load_model(_save_torch(tmp_path, "MultiModalPromptLearner", sd),
                 epoch=3)
    got = t._models["prompt_learner"]["params"]
    np.testing.assert_allclose(np.asarray(got["ctx"]), ctx, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["proj_w"]), proj_w,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["compound_text"][0]), comp0,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["compound_proj_w"][0]),
                               cproj_w, rtol=1e-6)


def test_vpt_reference_ckpt(base_cfg, tmp_path):
    t = _build(base_cfg, "VPT",
               {"TRAINER.VPT.PROMPT_DEPTH_VISION": 2,
                "TRAINER.VPT.N_CTX_VISION": 4})
    p = t._models["vpt_prompts"]["params"]
    rng = np.random.default_rng(2)
    shallow = rng.normal(size=np.asarray(p["shallow"]).shape).astype(
        np.float32)
    deep1 = rng.normal(size=np.asarray(p["deep"][0]).shape).astype(
        np.float32)
    sd = {
        "image_encoder.VPT": shallow,
        "image_encoder.transformer.resblocks.1.VPT_shallow": deep1,
    }
    t.load_model(_save_torch(tmp_path, "prompt_learner", sd), epoch=3)
    got = t._models["vpt_prompts"]["params"]
    np.testing.assert_allclose(np.asarray(got["shallow"]), shallow,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["deep"][0]), deep1,
                               rtol=1e-6)


def test_promptsrc_reference_ckpt(base_cfg, tmp_path):
    t = _build(base_cfg, "PromptSRC",
               {"TRAINER.PROMPTSRC.PROMPT_DEPTH_VISION": 2,
                "TRAINER.PROMPTSRC.PROMPT_DEPTH_TEXT": 2})
    p = t._models["prompt_learner"]["params"]
    rng = np.random.default_rng(3)
    ctx = rng.normal(size=np.asarray(p["ctx"]).shape).astype(np.float32)
    vpt = rng.normal(size=np.asarray(p["vpt_shallow"]).shape).astype(
        np.float32)
    dt = rng.normal(size=np.asarray(p["deep_text"][0]).shape).astype(
        np.float32)
    sd = {
        "prompt_learner.ctx": ctx,
        "prompt_learner.token_prefix": np.zeros((5, 1, 64), np.float32),
        "prompt_learner.token_suffix": np.zeros((5, 72, 64), np.float32),
        "image_encoder.VPT": vpt,
        "image_encoder.transformer.resblocks.1.VPT_shallow":
            np.asarray(p["deep_vis"][0], np.float32),
        "text_encoder.transformer.resblocks.1.VPT_shallow": dt,
    }
    t.load_model(_save_torch(tmp_path, "prompt_learner", sd), epoch=3)
    got = t._models["prompt_learner"]["params"]
    np.testing.assert_allclose(np.asarray(got["ctx"]), ctx, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["vpt_shallow"]), vpt,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["deep_text"][0]), dt,
                               rtol=1e-6)


def test_taskres_and_adapter_reference_ckpt(base_cfg, tmp_path):
    t = _build(base_cfg, "TaskRes", {})
    res = np.random.default_rng(4).normal(
        size=np.asarray(
            t._models["taskres_learner"]["params"]["residual"]).shape
    ).astype(np.float32)
    sd = {"base_text_features": np.zeros_like(res),
          "text_feature_residuals": res}
    t.load_model(_save_torch(tmp_path / "tr", "prompt_learner", sd),
                 epoch=3)
    np.testing.assert_allclose(
        np.asarray(t._models["taskres_learner"]["params"]["residual"]),
        res, rtol=1e-6)

    a = _build(base_cfg, "CLIP_Adapter", {})
    w1 = np.random.default_rng(5).normal(
        size=np.asarray(a._models["adapter"]["params"]["w1"]).shape
    ).astype(np.float32)
    sd = {"fc.0.weight": w1.T,
          "fc.2.weight": np.asarray(a._models["adapter"]["params"]["w2"],
                                    np.float32).T}
    a.load_model(_save_torch(tmp_path / "ad", "adapter", sd), epoch=3)
    np.testing.assert_allclose(
        np.asarray(a._models["adapter"]["params"]["w1"]), w1, rtol=1e-6)
