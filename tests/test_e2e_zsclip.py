"""End-to-end: ZeroshotCLIP base run -> new-class eval with DAC through the
real CLI entry point, on the synthetic dataset with the tiny backbone.

Exercises the complete reference pipeline contract: inference loop, base
feature cache under ./temp, 4-way text features, VLCalibration, KNN
proximity cache, evaluator output, log files, reliability PNG.
"""

import json
import os
import os.path as osp
import re
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def _run_train(args):
    from train import build_parser, main
    main(build_parser().parse_args(args))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("e2e")
    old = os.getcwd()
    os.chdir(wd)  # ./temp caches are cwd-relative (reference contract)
    yield str(wd)
    os.chdir(old)
    # restore stdout tee
    sys.stdout = sys.__stdout__


COMMON = [
    "--trainer", "ZeroshotCLIP", "--seed", "1",
    "--dataset-config-file",
    osp.join(REPO, "configs/datasets/synthetic.yaml"),
    "--backbone", "ViT-Test",
]
OPTS = ["DATASET.NUM_SHOTS", "16", "DATALOADER.TEST.BATCH_SIZE", "32",
        "INPUT.SIZE", "(32, 32)", "INPUT.INTERPOLATION", "bicubic"]


def test_base_then_new_with_dac(workdir):
    # ---- base run: saves base features, evaluates base classes
    _run_train(COMMON + [
        "--root", osp.join(workdir, "data"),
        "--output-dir", "output/train_base/seed1",
    ] + OPTS + ["DATASET.SUBSAMPLE_CLASSES", "base"])

    feat = ("temp/base_features/Synthetic/ZeroshotCLIP/shots16/ViT-Test/"
            "base/seed1/base_features.pt")
    assert osp.exists(feat)
    assert osp.exists("output/train_base/seed1/log.txt")
    log = open("output/train_base/seed1/log.txt").read()
    assert "=> result" in log
    assert re.search(r"\* ece: \d+\.\d+%", log)

    # ---- new-class eval with DAC
    _run_train(COMMON + [
        "--root", osp.join(workdir, "data"),
        "--output-dir", "output/test_new/seed1",
        "--calibration-config", json.dumps({
            "BASE_CALIBRATION_MODE": None, "SCALING_CONFIG": None,
            "BIN_CALIBRATOR_NAME": None, "IF_DAC": True,
            "IF_PROCAL": False}),
    ] + OPTS + ["DATASET.SUBSAMPLE_CLASSES", "new"])

    assert osp.exists("output/test_new/seed1/log_dac.txt")
    log = open("output/test_new/seed1/log_dac.txt").read()
    assert "=> result" in log
    assert osp.exists(
        "output/test_new/seed1/Synthetic_ZeroshotCLIP_dac_ece.png")
    assert osp.exists(
        "temp/knndist/Synthetic/ZeroshotCLIP/shots16/ViT-Test/new/seed1/"
        "nn5/knndist.npy")

    # scalars written for every metric
    scalars = [json.loads(line) for line in
               open("output/test_new/seed1/scalars.jsonl")]
    tags = {s["tag"] for s in scalars}
    assert {"test/accuracy", "test/ece", "test/piece"} <= tags


def test_bin_calibrator_via_cli(workdir):
    _run_train(COMMON + [
        "--root", osp.join(workdir, "data"),
        "--output-dir", "output/test_new_bin/seed1",
        "--calibration-config", json.dumps({
            "BASE_CALIBRATION_MODE": "bin_based", "SCALING_CONFIG": None,
            "BIN_CALIBRATOR_NAME": "multi_isotonic_regression",
            "IF_DAC": False, "IF_PROCAL": False}),
    ] + OPTS + ["DATASET.SUBSAMPLE_CLASSES", "new"])
    assert osp.exists(
        "output/test_new_bin/seed1/log_multi_isotonic_regression.txt")


def test_procal_via_cli(workdir):
    """ProCal (DensityRatioCalibration) through the real CLI: mode
    scaling_based + IF_PROCAL fits the 2-D (confidence x proximity) KDE
    on the cached base-val dict and rescales test probs (reference
    vl_calibrator.py:112-121); log name gains the _procal suffix
    (reference train.py:308-325)."""
    _run_train(COMMON + [
        "--root", osp.join(workdir, "data"),
        "--output-dir", "output/test_new_procal/seed1",
        "--calibration-config", json.dumps({
            "BASE_CALIBRATION_MODE": "scaling_based",
            "SCALING_CONFIG": None, "BIN_CALIBRATOR_NAME": None,
            "IF_DAC": False, "IF_PROCAL": True}),
    ] + OPTS + ["DATASET.SUBSAMPLE_CLASSES", "new"])
    assert osp.exists("output/test_new_procal/seed1/log_procal.txt")
    log = open("output/test_new_procal/seed1/log_procal.txt").read()
    assert "=> result" in log
    assert re.search(r"\* ece: \d+\.\d+%", log)


def test_bin_meanshift_procal_via_cli(workdir):
    """bin_based + IF_PROCAL composes BinMeanShift around the bin
    calibrator (reference vl_calibrator.py:121-134): proximity-binned
    per-bin histogram binning, fit on the cached base-val dict."""
    _run_train(COMMON + [
        "--root", osp.join(workdir, "data"),
        "--output-dir", "output/test_new_bms/seed1",
        "--calibration-config", json.dumps({
            "BASE_CALIBRATION_MODE": "bin_based", "SCALING_CONFIG": None,
            "BIN_CALIBRATOR_NAME": "histogram_binning",
            "IF_DAC": False, "IF_PROCAL": True}),
    ] + OPTS + ["DATASET.SUBSAMPLE_CLASSES", "new"])
    logs = [f for f in os.listdir("output/test_new_bms/seed1")
            if f.startswith("log")]
    assert logs, "no log written"
    log = open(osp.join("output/test_new_bms/seed1", logs[0])).read()
    assert "=> result" in log
    assert re.search(r"\* ece: \d+\.\d+%", log)
