import os
import tempfile

import pytest

from clip_calibration_tpu.config import CfgNode, get_cfg_default


def test_defaults_tree():
    cfg = get_cfg_default()
    assert cfg.TRAINER.COOP.N_CTX == 16
    assert cfg.CALIBRATION.SCALING.INIT_TEMP == 4.6052
    assert cfg.CALIBRATION.DAC.K == 5
    assert cfg.CALIBRATION.METRICS.ECE_BINS == 10
    assert cfg.DATASET.SUBSAMPLE_CLASSES == "all"
    assert cfg.CALIBRATION.BASE_CALIBRATION_MODE is None


def test_merge_from_file_reference_style_yaml():
    yaml_text = """
DATALOADER:
  TRAIN_X:
    BATCH_SIZE: 32
  TEST:
    BATCH_SIZE: 100
INPUT:
  SIZE: (224, 224)
  INTERPOLATION: "bicubic"
  PIXEL_MEAN: [0.48145466, 0.4578275, 0.40821073]
  TRANSFORMS: ["random_resized_crop", "random_flip", "normalize"]
OPTIM:
  NAME: "sgd"
  LR: 0.002
  WARMUP_CONS_LR: 1e-5
TRAINER:
  COOP:
    N_CTX: 16
    PREC: "fp16"
"""
    cfg = get_cfg_default()
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write(yaml_text)
        path = f.name
    try:
        cfg.merge_from_file(path)
    finally:
        os.unlink(path)
    assert cfg.INPUT.SIZE == (224, 224)  # "(224, 224)" literal_eval'd
    assert cfg.INPUT.INTERPOLATION == "bicubic"
    assert cfg.OPTIM.LR == 0.002
    assert cfg.OPTIM.WARMUP_CONS_LR == 1e-5
    assert cfg.DATALOADER.TEST.BATCH_SIZE == 100
    assert cfg.INPUT.TRANSFORMS == ("random_resized_crop", "random_flip",
                                    "normalize")


def test_merge_from_list():
    cfg = get_cfg_default()
    cfg.merge_from_list([
        "DATASET.NUM_SHOTS", "16",
        "DATASET.SUBSAMPLE_CLASSES", "base",
        "OPTIM.LR", "0.05",
        "CALIBRATION.DAC.IF_DAC", "True",
    ])
    assert cfg.DATASET.NUM_SHOTS == 16
    assert cfg.DATASET.SUBSAMPLE_CLASSES == "base"
    assert cfg.OPTIM.LR == 0.05
    assert cfg.CALIBRATION.DAC.IF_DAC is True


def test_merge_rejects_unknown_key():
    cfg = get_cfg_default()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOT.A.KEY", "1"])


def test_freeze():
    cfg = get_cfg_default()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SEED = 3
    with pytest.raises(AttributeError):
        cfg.OPTIM.LR = 1.0
    cfg.defrost()
    cfg.SEED = 3
    assert cfg.SEED == 3


def test_clone_independent():
    cfg = get_cfg_default()
    c2 = cfg.clone()
    c2.OPTIM.LR = 9.0
    assert cfg.OPTIM.LR != 9.0


def test_registry():
    from clip_calibration_tpu.engine.registry import Registry
    reg = Registry("toy")

    @reg.register()
    class Foo:
        pass

    assert reg.get("Foo") is Foo
    assert "Foo" in reg
    with pytest.raises(KeyError):
        reg.get("Bar")


def test_every_repo_config_merges_cleanly():
    """Cheap regression probe: all shipped yamls (datasets, trainers,
    calibration) must merge into the default tree without unknown keys."""
    import glob
    import os.path as osp
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    paths = glob.glob(osp.join(repo, "configs", "**", "*.yaml"),
                      recursive=True)
    assert len(paths) > 50
    for path in paths:
        cfg = get_cfg_default()
        cfg.merge_from_file(path)


def test_zeroshotclip_variant_configs_present():
    """Reference-style invocations name these files
    (/root/reference/configs/trainers/ZeroshotCLIP/)."""
    import os.path as osp
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    d = osp.join(repo, "configs", "trainers", "ZeroshotCLIP")
    for name in ("rn50", "vit_b16", "vit_b32", "vit_l14"):
        assert osp.exists(osp.join(d, name + ".yaml")), name
        assert osp.exists(osp.join(d, name + "_c0_ep0_batch0.yaml")), name


def test_reference_configs_merge_cleanly():
    """The REFERENCE repo's own yamls (when mounted) must merge into our
    default tree — the strongest cheap probe that the config schema stays
    drop-in compatible (reference train.py:278-299 merge order)."""
    import glob
    import os.path as osp
    import pytest
    ref = "/root/reference/configs"
    if not osp.isdir(ref):
        pytest.skip("reference repo not mounted")
    paths = glob.glob(osp.join(ref, "**", "*.yaml"), recursive=True)
    assert len(paths) > 50
    for path in paths:
        cfg = get_cfg_default()
        cfg.merge_from_file(path)
