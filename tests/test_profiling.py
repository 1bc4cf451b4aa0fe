"""Profiling hooks: the TPU.PROFILE_DIR path must actually emit a trace
(the reference offers wall-clock only; SURVEY §5.1)."""

import json
import os.path as osp
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def test_trace_context_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp
    from clip_calibration_tpu.tools.profiling import trace

    with trace(str(tmp_path)):
        jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    # jax.profiler writes plugins/profile/<run>/*.xplane.pb
    found = list(tmp_path.rglob("*.xplane.pb"))
    assert found, f"no trace written under {tmp_path}"


def test_step_timer_report():
    import time
    from clip_calibration_tpu.tools.profiling import StepTimer

    t = StepTimer()
    for _ in range(5):
        t.start()
        time.sleep(0.002)
        t.stop()
    rep = t.report()
    assert rep["steps"] == 5
    assert rep["mean_s"] > 0


def test_profile_dir_config_traces_first_epoch(tmp_path):
    """End-to-end: TPU.PROFILE_DIR on a real (tiny) training run emits a
    trace of the first TPU.PROFILE_STEPS steps (engine/trainer.run_epoch)."""
    import os
    from train import build_parser, main

    # the CoOp test pipeline needs the zero-shot base feature cache
    old = os.getcwd()
    os.chdir(tmp_path)
    common = ["--root", str(tmp_path / "data"), "--seed", "1",
              "--backbone", "ViT-Test",
              "--dataset-config-file",
              osp.join(REPO, "configs/datasets/synthetic.yaml"),
              "DATASET.NUM_SHOTS", "4",
              "DATASET.SUBSAMPLE_CLASSES", "base",
              "INPUT.SIZE", "(32, 32)", "INPUT.INTERPOLATION", "bicubic"]
    try:
        main(build_parser().parse_args(
            ["--trainer", "ZeroshotCLIP", "--output-dir", "out/zs"]
            + common))
        sys.stdout = sys.__stdout__
        main(build_parser().parse_args(
            ["--trainer", "CoOp", "--output-dir", "out/coop"] + common
            + ["TRAINER.COOP.N_CTX", "2", "OPTIM.MAX_EPOCH", "1",
               "OPTIM.NAME", "sgd",
               "TPU.PROFILE_DIR", str(tmp_path / "prof"),
               "TPU.PROFILE_STEPS", "2"]))
        sys.stdout = sys.__stdout__
        found = list((tmp_path / "prof").rglob("*.xplane.pb"))
        assert found, "no trace written by the TPU.PROFILE_DIR hook"
    finally:
        os.chdir(old)
        sys.stdout = sys.__stdout__
