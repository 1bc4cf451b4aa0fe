"""Script-level idempotency/resume (reference scripts/*: dir-exists
branches + Dassl auto-resume from the output dir).

Re-running a finished base2new_fewshot_train.sh invocation must resume at
the final epoch (no retraining) instead of restarting from scratch; the
xd test wrappers must skip entirely when their output dir exists.
"""

import os
import os.path as osp
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture()
def script_cwd(tmp_path):
    """A scratch cwd with train.py + configs visible, as the reference
    wrappers expect to run from the repo root."""
    os.symlink(osp.join(REPO, "train.py"), tmp_path / "train.py")
    os.symlink(osp.join(REPO, "configs"), tmp_path / "configs")
    return tmp_path


def _run(script, args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        ["bash", osp.join(REPO, "scripts", script)] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout


def test_train_wrapper_resumes_finished_run(script_cwd):
    data = str(script_cwd / "data")

    # zero-shot base run fills the ./temp feature cache CoOp's test needs
    out = _run("classification/base2new_zeroshot_base.sh",
               ["vit_test", "synthetic", data, "8", "1", ""], script_cwd)
    assert "=> result" in out

    train_args = ["CoOp", "vit_test_ep3", "synthetic", data, "8", "1", ""]
    out1 = _run("classification/base2new_fewshot_train.sh", train_args,
                script_cwd)
    assert "Run this job and save the output to" in out1
    assert "epoch [3/3]" in out1  # trained to completion

    # second invocation: dir exists -> resume at the last checkpoint,
    # retrain nothing, re-run the final evaluation
    out2 = _run("classification/base2new_fewshot_train.sh", train_args,
                script_cwd)
    assert "Resuming..." in out2
    assert "Resumed from" in out2 and "(epoch 3)" in out2
    assert "epoch [" not in out2  # no training epochs re-run
    assert "=> result" in out2


def test_xd_test_wrapper_skips_existing_dir(script_cwd):
    d = script_cwd / ("output/xd/xd_test/ZeroshotCLIP/vit_test/"
                      "synthetic/seed1")
    d.mkdir(parents=True)
    out = _run("classification/xd_zeroshot_test.sh",
               ["vit_test", "synthetic", str(script_cwd / "data"), "1",
                ""], script_cwd)
    assert "Skip this job" in out
    assert not (d / "log.txt").exists()  # python never ran


def test_resume_skips_corrupt_checkpoint(tmp_path):
    """A run killed mid-save leaves a truncated checkpoint; auto-resume
    must start fresh instead of crashing every subsequent rerun."""
    import numpy as np
    from clip_calibration_tpu.engine.trainer import TrainerX

    t = TrainerX.__new__(TrainerX)
    t._models = {"m": {"params": {"w": np.zeros(3)}, "opt": None,
                       "opt_state": None, "step": 0}}
    t.start_epoch = 0
    d = tmp_path / "m"
    d.mkdir()
    (d / "model.pth.tar-3").write_bytes(b"truncated-garbage")
    t.resume_model_if_exist(str(tmp_path))
    assert t.start_epoch == 0  # fresh start, no exception


def test_tempscaling_cache_bypassed_on_shuffled_loader():
    """Datasets without a val split scale on the SHUFFLED train loader;
    the per-batch logit cache must be bypassed there (its keys change
    every epoch — caching would grow unboundedly and trip the bound
    assert)."""
    import numpy as np
    from clip_calibration_tpu.trainers.calibration.tempscaling import (
        TempScaling)

    ts = TempScaling.__new__(TempScaling)
    ts.train_loader_x = object()  # not the val loader
    ts.val_loader = None
    ts._cos_cache = {}
    ts._fingerprint_checked = False
    ts.parse_batch_train = lambda b: (b["img"], b["label"])
    ts._unit_logits = lambda images: (
        np.ones((2, 3), np.float32), None, None)
    batch = {"img": 0, "label": np.array([0, 1]), "n_real": 2,
             "impath": ["a", "b"]}
    cos, labels = ts._cached_cos(batch)
    assert cos.shape == (2, 3) and ts._cos_cache == {}


def test_xd_zeroshot_wrapper_end_to_end(script_cwd):
    """Cross-dataset eval flow: a base run fills the 'base' feature
    cache (the reference hardcodes that subdir even for SUBSAMPLE=all
    runs, base_learner.py:106-107), then the xd wrapper evaluates all
    classes against it."""
    data = str(script_cwd / "data")
    # the xd wrapper takes no SHOTS argument (reference parity), so its
    # cache lookup uses NUM_SHOTS=-1 — the base run must match
    _run("classification/base2new_zeroshot_base.sh",
         ["vit_test", "synthetic", data, "-1", "1", ""], script_cwd)
    out = _run("classification/xd_zeroshot_test.sh",
               ["vit_test", "synthetic", data, "1", ""], script_cwd)
    assert "Run this job and save the output to" in out
    log_dir = (script_cwd / "output/xd/xd_test/ZeroshotCLIP/vit_test/"
               "synthetic/seed1")
    log = (log_dir / "log.txt").read_text()
    assert "=> result" in log


def test_interpret_prompt_cli(tmp_path):
    """interpret_prompts utility: nearest vocabulary words for a learned
    prompt checkpoint (reference interpret_prompts/interpret_prompt.py),
    through the real CLI on a reference-format torch checkpoint."""
    import subprocess

    import numpy as np
    import torch

    ck = tmp_path / "model.pth.tar-3"
    torch.save({"state_dict": {
        "ctx": torch.randn(4, 64) * 0.02,
        "compound_text": torch.randn(2, 4, 64) * 0.02,
    }, "epoch": 3}, ck)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable,
         osp.join(REPO, "interpret_prompts", "interpret_prompt.py"),
         str(ck), "3", "--backbone", "ViT-Test"],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "SHOWING RESULTS FOR: shallow ctx" in proc.stdout
    assert "layer 1 (compound_text)" in proc.stdout
    assert proc.stdout.count("1: [") >= 2  # word lists printed
