import json
import os.path as osp

import numpy as np
import pytest

from clip_calibration_tpu.tools.metrics import ECE, MCE, AdaptiveECE, PIECE

FIXTURE = osp.join(osp.dirname(__file__), "fixtures", "metrics_golden.json")


@pytest.fixture(scope="module")
def cases():
    with open(FIXTURE) as f:
        return json.load(f)


def _arrays(c):
    return (np.array(c["conf"]), np.array(c["pred"]), np.array(c["gt"]),
            np.array(c["prox"]))


def test_ece_parity(cases):
    for c in cases:
        conf, pred, gt, _ = _arrays(c)
        assert ECE(conf, pred, gt, 10) == pytest.approx(c["ece"], abs=1e-12)
        assert ECE(conf, pred, gt, 15) == pytest.approx(c["ece15"],
                                                        abs=1e-12)


def test_mce_parity(cases):
    for c in cases:
        conf, pred, gt, _ = _arrays(c)
        assert MCE(conf, pred, gt, 10) == pytest.approx(c["mce"], abs=1e-12)


def test_ace_parity(cases):
    for c in cases:
        conf, pred, gt, _ = _arrays(c)
        bins = c.get("ace_bins", 10)
        assert AdaptiveECE(conf, pred, gt, bins) == pytest.approx(
            c["ace"], abs=1e-12)


def test_piece_parity(cases):
    for c in cases:
        conf, pred, gt, prox = _arrays(c)
        dist_bins = c.get("piece_dist_bins", 10)
        assert PIECE(conf, prox, pred, gt, dist_bins, 10) == pytest.approx(
            c["piece"], abs=1e-12)


def test_perfect_calibration_is_zero():
    rng = np.random.default_rng(0)
    n = 200000
    conf = rng.uniform(0.5, 1.0, n)
    pred = np.zeros(n, dtype=int)
    gt = np.where(rng.random(n) < conf, 0, 1)
    assert ECE(conf, pred, gt, 10) < 0.01


def test_ece_conf_one_quirk():
    """conf == 1.0 contributes histogram weight but no bin accuracy —
    reference digitize/histogram mismatch must be preserved."""
    conf = np.array([1.0, 1.0])
    pred = np.array([0, 0])
    gt = np.array([0, 0])
    # all mass in last bin, bin_acc/bin_conf are zero there -> |0-0|*1 = 0
    assert ECE(conf, pred, gt, 10) == 0.0


def test_evaluator_process_accumulation():
    """Library users can feed the evaluator batch-wise and evaluate from
    its accumulated logits/labels."""
    from clip_calibration_tpu.config import get_cfg_default
    from clip_calibration_tpu.evaluators.vl_evaluator import (
        VLClassification)
    rng = np.random.default_rng(3)
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = "/tmp"
    ev = VLClassification(cfg)
    all_logits, all_labels = [], []
    for _ in range(3):
        logits = rng.normal(size=(8, 4)).astype(np.float32)
        labels = rng.integers(0, 4, 8)
        ev.process(logits, labels)
        all_logits.append(logits)
        all_labels.append(labels)
    np.testing.assert_allclose(ev.logits, np.concatenate(all_logits))
    np.testing.assert_array_equal(ev.labels, np.concatenate(all_labels))
    probs = np.exp(ev.logits)
    probs /= probs.sum(1, keepdims=True)
    res = ev.evaluate(probs, ev.labels, rng.random(24))
    assert 0 <= res["accuracy"] <= 100
    ev.reset()
    assert ev._y_score == []
