"""Shared test helpers (plain functions — importable from any test via
the tests-dir sys.path entry pytest prepends).

``build_synthetic_trainer`` is THE synthetic ViT-Test trainer builder:
test_parallel, test_serving and test_export_reference_ckpt all
construct the same tiny trainer and previously carried three diverging
copies of this cfg block.
"""

from __future__ import annotations


def build_synthetic_trainer(name, data_root, seed=1, output_dir=None,
                            num_shots=4, mesh_shape=None,
                            trainer_cfg=None, overrides=None,
                            freeze=False):
    """Registered trainer over the Synthetic dataset on the ViT-Test
    backbone (32x32 inputs).

    ``trainer_cfg``: kwargs set on the trainer's own config node
    (``cfg.TRAINER.<NAME>``). ``overrides``: dotted-key cfg settings
    (e.g. ``{"DATALOADER.TEST.BATCH_SIZE": 16}``) applied before the
    trainer node.
    """
    from clip_calibration_tpu.config import get_cfg_default
    from clip_calibration_tpu.data.base import set_random_seed
    from clip_calibration_tpu.engine.registry import TRAINER_REGISTRY
    import clip_calibration_tpu.trainers  # noqa: F401
    import clip_calibration_tpu.data.datasets  # noqa: F401
    import clip_calibration_tpu.evaluators.vl_evaluator  # noqa: F401

    cfg = get_cfg_default()
    cfg.TEST.EVALUATOR = "VLClassification"
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.ROOT = str(data_root)
    cfg.DATASET.NUM_SHOTS = num_shots
    cfg.SEED = seed
    if output_dir is not None:
        cfg.OUTPUT_DIR = str(output_dir)
    cfg.MODEL.BACKBONE.NAME = "ViT-Test"
    cfg.INPUT.SIZE = (32, 32)
    # mirror the reference trainer yamls (every one sets the CLIP pixel
    # stats with "normalize" in TRANSFORMS) so the synthetic trainer
    # exercises the same device-side normalize as real runs and as the
    # serving Predictor's CLIP-constant default
    from clip_calibration_tpu.ops.preprocess import (CLIP_PIXEL_MEAN,
                                                     CLIP_PIXEL_STD)
    cfg.INPUT.PIXEL_MEAN = list(CLIP_PIXEL_MEAN)
    cfg.INPUT.PIXEL_STD = list(CLIP_PIXEL_STD)
    cfg.INPUT.TRANSFORMS = ("random_resized_crop", "random_flip",
                            "normalize")
    cfg.TRAINER.NAME = name
    if mesh_shape is not None:
        cfg.TPU.MESH_SHAPE = mesh_shape
    for key, v in (overrides or {}).items():
        node = cfg
        *parts, last = key.split(".")
        for p in parts:
            node = getattr(node, p)
        setattr(node, last, v)
    node = getattr(cfg.TRAINER, name.upper().replace("-", "_"), None)
    if trainer_cfg and node is None:
        raise ValueError(
            f"trainer {name!r} has no cfg.TRAINER."
            f"{name.upper().replace('-', '_')} node to apply "
            f"{sorted(trainer_cfg)} to")
    for k, v in (trainer_cfg or {}).items():
        setattr(node, k, v)
    if freeze:
        cfg.freeze()
    set_random_seed(seed)
    return TRAINER_REGISTRY.get(name)(cfg)


def golden_test_images(classes):
    """Golden-fixture test-split images through the eval geometry
    (48 -> 32, BICUBIC) with labels relabeled onto sorted(classes).
    Shared by test_serving and test_quant (previously two verbatim
    copies that could drift apart with the fixture layout)."""
    import json
    import os.path as osp

    import numpy as np
    from PIL import Image

    fix = osp.join(osp.dirname(osp.abspath(__file__)),
                   "fixtures", "golden_e2e")
    split = json.load(open(osp.join(
        fix, "data", "caltech-101", "split_zhou_Caltech101.json")))
    img_root = osp.join(fix, "data", "caltech-101",
                        "101_ObjectCategories")
    imgs, labels = [], []
    relabel = {c: i for i, c in enumerate(sorted(classes))}
    for rel, lab, _ in split["test"]:
        if lab in classes:
            img = Image.open(osp.join(img_root, rel)).convert("RGB")
            img = img.resize((32, 32), Image.BICUBIC)
            imgs.append(np.asarray(img, np.uint8))
            labels.append(relabel[lab])
    return np.stack(imgs), np.asarray(labels)
