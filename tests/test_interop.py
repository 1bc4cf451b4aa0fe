"""Interop with reference-produced artifacts (torch checkpoints and
feature caches) plus resume/cross-dataset loading behaviors."""

import os
import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def test_load_torch_prompt_checkpoint(tmp_path):
    """A torch .pth.tar prompt checkpoint (as the reference saves) must
    load through load_checkpoint with dots mapped to pytree levels."""
    import torch
    from clip_calibration_tpu.engine.checkpoint import load_checkpoint
    ckpt = {
        "state_dict": {
            "ctx": torch.randn(4, 64),
            "token_prefix": torch.randn(5, 1, 64),
            "meta.w1": torch.randn(8, 4),
        },
        "epoch": 7,
    }
    path = str(tmp_path / "model.pth.tar-7")
    torch.save(ckpt, path)
    loaded = load_checkpoint(path)
    assert loaded["epoch"] == 7
    sd = loaded["state_dict"]
    np.testing.assert_allclose(sd["ctx"],
                               ckpt["state_dict"]["ctx"].numpy(),
                               rtol=1e-6)
    assert sd["meta"]["w1"].shape == (8, 4)


def test_load_torch_feature_cache(tmp_path):
    """base_features.pt written by the torch reference must be readable."""
    import torch
    from clip_calibration_tpu.trainers.base_learner import (
        _load_feature_dict, _save_feature_dict)
    d = {
        "val_logits": torch.randn(10, 5).numpy(),
        "val_labels": np.arange(10),
        "val_image_features": np.random.default_rng(0).normal(
            size=(10, 8)).astype(np.float32),
        "val_text_features": np.ones((5, 8), np.float32),
        "val_image_knn_dists": np.ones((10, 5), np.float32),
    }
    torch_path = str(tmp_path / "base_features.pt")
    torch.save({k: torch.as_tensor(v) for k, v in d.items()}, torch_path)
    loaded = _load_feature_dict(torch_path)
    np.testing.assert_allclose(loaded["val_logits"], d["val_logits"],
                               rtol=1e-6)

    # and our own npz payload under the same filename round-trips
    ours = str(tmp_path / "ours" / "base_features.pt")
    _save_feature_dict(ours, d)
    loaded2 = _load_feature_dict(ours)
    np.testing.assert_allclose(loaded2["val_image_features"],
                               d["val_image_features"])


def test_resume_restores_epoch(tmp_path):
    from clip_calibration_tpu.engine.checkpoint import save_checkpoint
    from clip_calibration_tpu.engine.trainer import TrainerX
    import jax.numpy as jnp

    t = TrainerX.__new__(TrainerX)
    t._models = {}
    t.start_epoch = 0
    t.register_model("prompt_learner",
                     {"ctx": jnp.zeros((4, 8), jnp.float32)})
    save_checkpoint(
        {"state_dict": {"ctx": np.ones((4, 8), np.float32)}, "epoch": 5},
        str(tmp_path / "prompt_learner"), 5)
    t.resume_model_if_exist(str(tmp_path))
    assert t.start_epoch == 5
    np.testing.assert_allclose(
        np.asarray(t._models["prompt_learner"]["params"]["ctx"]), 1.0)


def test_taskres_ar_subsetting():
    """1000-class residuals subset to 200 A/R classes at load."""
    import jax.numpy as jnp
    from clip_calibration_tpu.config import get_cfg_default
    from clip_calibration_tpu.trainers.taskres import TaskRes

    t = TaskRes.__new__(TaskRes)
    cfg = get_cfg_default()
    cfg.DATASET.NAME = "ImageNetA"
    t.cfg = cfg
    t._models = {}
    t.register_model("taskres_learner",
                     {"residual": jnp.zeros((200, 16), jnp.float32)})
    res_1000 = np.arange(1000, dtype=np.float32)[:, None].repeat(16, 1)
    t._set_params("taskres_learner", {"residual": res_1000})
    got = np.asarray(t._models["taskres_learner"]["params"]["residual"])
    assert got.shape == (200, 16)
    import json
    idx = json.load(open(osp.join(REPO, "clip_calibration_tpu", "assets",
                                  "imagenet_a_r_indexes.json")))
    np.testing.assert_allclose(got[:, 0], np.asarray(idx["imagenet_a"],
                                                     np.float32))


def test_coop_csc_assembly():
    """Class-specific contexts gather per-class rows."""
    import jax
    import jax.numpy as jnp
    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.trainers.coop import (assemble_prompts,
                                                    build_prompt_assembly)
    cfg = M.PRESETS["ViT-Test"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    names = ["cat", "dog", "bird"]
    asm = build_prompt_assembly(names, 4, "end", "", params, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (3, 4, cfg.transformer_width))
    out = np.asarray(assemble_prompts(ctx, asm))
    for c in range(3):
        np.testing.assert_allclose(out[c, 1:5],
                                   np.asarray(ctx[c], np.float32),
                                   atol=1e-6)


def test_resume_prefers_latest_epoch_over_model_best(tmp_path):
    """Auto-resume must pick the highest-epoch periodic checkpoint, not
    model-best: a best_val run whose best epoch is old would otherwise
    silently rewind and retrain completed epochs."""
    from clip_calibration_tpu.engine.checkpoint import (
        resolve_model_file, save_checkpoint)
    from clip_calibration_tpu.engine.trainer import TrainerX
    import jax.numpy as jnp

    d = tmp_path / "prompt_learner"
    save_checkpoint(
        {"state_dict": {"ctx": np.full((4, 8), 7.0, np.float32)},
         "epoch": 7},
        str(d), 7, is_best=True)
    save_checkpoint(
        {"state_dict": {"ctx": np.full((4, 8), 40.0, np.float32)},
         "epoch": 40},
        str(d), 40)

    # load_model (deploy) still prefers model-best...
    assert resolve_model_file(str(d)).endswith("model-best.pth.tar")
    # ...but resume takes the latest periodic file
    assert resolve_model_file(str(d), latest=True).endswith(
        "model.pth.tar-40")

    t = TrainerX.__new__(TrainerX)
    t._models = {}
    t.start_epoch = 0
    t.register_model("prompt_learner",
                     {"ctx": jnp.zeros((4, 8), jnp.float32)})
    t.resume_model_if_exist(str(tmp_path))
    assert t.start_epoch == 40
    np.testing.assert_allclose(
        np.asarray(t._models["prompt_learner"]["params"]["ctx"]), 40.0)

    # best-only dir (CHECKPOINT_FREQ=0 run killed early): resume falls
    # back to the best snapshot instead of starting from scratch
    d2 = tmp_path / "only_best" / "prompt_learner"
    save_checkpoint(
        {"state_dict": {"ctx": np.full((4, 8), 3.0, np.float32)},
         "epoch": 3},
        str(d2), 3, is_best=True)
    os.remove(str(d2 / "model.pth.tar-3"))
    assert resolve_model_file(str(d2), latest=True).endswith(
        "model-best.pth.tar")
