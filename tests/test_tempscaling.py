"""End-to-end temperature scaling: ZeroshotCLIP base -> CoOp base train ->
TempScaling calibration train -> scaling eval on new classes, all through
the CLI with the reference's calibration-config JSON protocol."""

import json
import os
import os.path as osp
import re
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

DATA_OPTS = [
    "--dataset-config-file", osp.join(REPO, "configs/datasets/synthetic.yaml"),
    "--config-file", osp.join(REPO, "configs/trainers/CoOp/vit_test_ep3.yaml"),
    "--seed", "1",
]
SHARED = ["DATASET.NUM_SHOTS", "8"]
SCALING_JSON = json.dumps({
    "BASE_CALIBRATION_MODE": "scaling_based",
    "SCALING_CONFIG": osp.join(
        REPO, "configs/calibration/TempScaling/ep5_lr5e-2.yaml"),
    "BIN_CALIBRATOR_NAME": None, "IF_DAC": False, "IF_PROCAL": False})


def _run(args):
    from train import build_parser, main
    main(build_parser().parse_args(args))


def test_scaling_pipeline(tmp_path):
    old = os.getcwd()
    os.chdir(tmp_path)
    root = str(tmp_path / "data")
    try:
        # 1. zero-shot base features (pipeline prerequisite)
        _run(["--root", root, "--trainer", "ZeroshotCLIP",
              "--output-dir", "output/zs_base/seed1"] + DATA_OPTS +
             SHARED + ["DATASET.SUBSAMPLE_CLASSES", "base"])

        # 2. CoOp base training (3 epochs)
        _run(["--root", root, "--trainer", "CoOp",
              "--output-dir", "output/train_base/seed1"] + DATA_OPTS +
             SHARED + ["DATASET.SUBSAMPLE_CLASSES", "base"])
        assert osp.exists(
            "output/train_base/seed1/prompt_learner/model.pth.tar-3")

        # 3. TempScaling calibration training on the base run
        _run(["--root", root, "--trainer", "CoOp",
              "--output-dir", "output/train_base/seed1",
              "--base-dir", "output/train_base/seed1",
              "--calibration-config", SCALING_JSON] + DATA_OPTS +
             SHARED + ["DATASET.SUBSAMPLE_CLASSES", "base"])
        ckpt = ("output/train_base/seed1/scale_learner/"
                "model-calibrated.pth.tar-5")
        assert osp.exists(ckpt)
        log = open("output/train_base/seed1/log_TempScaling.txt").read()
        assert "temperature" in log
        assert "=> result" in log

        # learned temperature moved away from init (exp(4.6052) = 100)
        from clip_calibration_tpu.engine.checkpoint import load_checkpoint
        scale = float(np.asarray(
            load_checkpoint(ckpt)["state_dict"]["scale"]))
        assert scale != pytest.approx(4.6052)

        # 4. scaling eval on new classes (eval-only, loads calibrated ckpt)
        _run(["--root", root, "--trainer", "CoOp",
              "--output-dir", "output/test_new/seed1",
              "--base-dir", "output/train_base/seed1",
              "--model-dir", "output/train_base/seed1",
              "--eval-only",
              "--calibration-config", SCALING_JSON] + DATA_OPTS +
             SHARED + ["DATASET.SUBSAMPLE_CLASSES", "new"])
        log = open("output/test_new/seed1/log_TempScaling.txt").read()
        assert "=> result" in log
        m = re.search(r"\* ece: (\d+\.\d+)%", log)
        assert m, "ece missing from scaling eval log"

        # 5. the paper's headline combo: TempScaling + DAC on new
        #    classes (reference run/calibration/fewshot_scaling.sh
        #    CALIBRATION=TempScaling_dac -> log_TempScaling_dac.txt)
        dac_json = json.loads(SCALING_JSON)
        dac_json["IF_DAC"] = True
        _run(["--root", root, "--trainer", "CoOp",
              "--output-dir", "output/test_new/seed1",
              "--base-dir", "output/train_base/seed1",
              "--model-dir", "output/train_base/seed1",
              "--eval-only",
              "--calibration-config", json.dumps(dac_json)] + DATA_OPTS +
             SHARED + ["DATASET.SUBSAMPLE_CLASSES", "new"])
        log = open("output/test_new/seed1/log_TempScaling_dac.txt").read()
        assert "=> result" in log
        assert re.search(r"\* ece: (\d+\.\d+)%", log)
    finally:
        os.chdir(old)
        sys.stdout = sys.__stdout__


PTS_JSON = json.dumps({
    "BASE_CALIBRATION_MODE": "scaling_based",
    "SCALING_CONFIG": osp.join(
        REPO,
        "configs/calibration/ParameterizedTempScaling/ep5_lr5e-2.yaml"),
    "BIN_CALIBRATOR_NAME": None, "IF_DAC": False, "IF_PROCAL": False})


def test_parameterized_tempscaling(tmp_path):
    """PTS end-to-end: zs base -> CoOp base -> PTS scaling train."""
    old = os.getcwd()
    os.chdir(tmp_path)
    root = str(tmp_path / "data")
    try:
        _run(["--root", root, "--trainer", "ZeroshotCLIP",
              "--output-dir", "output/zs_base/seed1"] + DATA_OPTS +
             SHARED + ["DATASET.SUBSAMPLE_CLASSES", "base"])
        _run(["--root", root, "--trainer", "CoOp",
              "--output-dir", "output/train_base/seed1"] + DATA_OPTS +
             SHARED + ["DATASET.SUBSAMPLE_CLASSES", "base"])
        _run(["--root", root, "--trainer", "CoOp",
              "--output-dir", "output/train_base/seed1",
              "--base-dir", "output/train_base/seed1",
              "--calibration-config", PTS_JSON] + DATA_OPTS +
             SHARED + ["DATASET.SUBSAMPLE_CLASSES", "base"])
        assert osp.exists("output/train_base/seed1/scale_learner/"
                          "model-calibrated.pth.tar-5")
        log = open(
            "output/train_base/seed1/"
            "log_ParameterizedTempScaling.txt").read()
        assert "=> result" in log
    finally:
        os.chdir(old)
        sys.stdout = sys.__stdout__
