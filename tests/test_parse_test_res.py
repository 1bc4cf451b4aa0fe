"""parse_test_res.py end to end: real multi-seed CLI runs -> log scrape
-> mean/std aggregation -> CSV append (reference parse_test_res.py
regex/sentinel/CSV contract)."""

import json
import os
import os.path as osp
import re
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def _train(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "train.py")] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr


def _parse(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, osp.join(REPO, "parse_test_res.py")] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout


def test_multi_seed_aggregation_and_csv(tmp_path):
    flags = ["--trainer", "ZeroshotCLIP",
             "--dataset-config-file",
             osp.join(REPO, "configs/datasets/synthetic.yaml"),
             "--backbone", "ViT-Test",
             "--root", str(tmp_path / "data")]
    opts = ["DATASET.NUM_SHOTS", "8", "DATASET.SUBSAMPLE_CLASSES", "base",
            "INPUT.SIZE", "(32, 32)", "INPUT.INTERPOLATION", "bicubic"]
    run_dir = ("output/base2new/train_base/synthetic/shots_8/"
               "ZeroshotCLIP/vit_test")
    accs = {}
    for seed in (1, 2):
        _train(flags + ["--seed", str(seed),
                        "--output-dir", f"{run_dir}/seed{seed}"] + opts,
               tmp_path)
        log = (tmp_path / run_dir / f"seed{seed}" / "log.txt").read_text()
        accs[seed] = float(
            re.search(r"\* accuracy: (\d+\.\d+)%", log).group(1))

    out = _parse([run_dir, "--test-log", "--keyword", "accuracy"],
                 tmp_path)
    mean = sum(accs.values()) / 2
    # the summary line reports the across-seed mean
    m = re.search(r"accuracy: (\d+\.\d+)% \+-", out)
    assert m, out
    assert float(m.group(1)) == pytest.approx(mean, abs=0.011)

    # CSV row appended under the reference's fixed path/side-layout
    csv_path = tmp_path / "output/base2new/logs_base2new.csv"
    assert csv_path.exists(), out
    text = csv_path.read_text()
    assert "synthetic" in text and "ZeroshotCLIP" in text

    # calibrator-combo log name reconstruction (log_dac.txt etc.)
    from parse_test_res import log_basename
    assert log_basename(json.dumps(
        {"BASE_CALIBRATION_MODE": None, "IF_DAC": True,
         "IF_PROCAL": False})) == "log_dac.txt"
    assert log_basename(json.dumps(
        {"BASE_CALIBRATION_MODE": "bin_based",
         "BIN_CALIBRATOR_NAME": "multi_isotonic_regression",
         "IF_DAC": False, "IF_PROCAL": True})) == \
        "log_multi_isotonic_regression_procal.txt"
