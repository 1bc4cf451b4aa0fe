"""Smoke tests for the plotting suite: every public function of the
reference ``tools/plot.py`` has an equivalent that renders a PNG."""

import os.path as osp

import numpy as np
import pytest

from clip_calibration_tpu.tools.plot import (compute_ece,
                                             plot_proximity_acc_ece,
                                             plot_proximity_conf,
                                             plot_reliability_diagram,
                                             reliability_diagram)


@pytest.fixture()
def fake_eval(rng):
    n = 400
    conf = rng.uniform(0.2, 1.0, n)
    pred = rng.integers(0, 5, n)
    label = np.where(rng.uniform(size=n) < conf, pred,
                     rng.integers(0, 5, n))
    prox = rng.uniform(0.0, 1.0, n)
    return pred, conf, label, prox


def test_plot_reliability_diagram_saves_png(tmp_path, fake_eval):
    pred, conf, label, _ = fake_eval
    out = tmp_path / "rel.png"
    ece = plot_reliability_diagram(pred, conf, label, n_bins=15,
                                   title="t", save_dir=str(out))
    assert out.exists() and out.stat().st_size > 0
    assert 0.0 <= ece <= 1.0


def test_reliability_diagram_returns_fig_and_ece(fake_eval, tmp_path):
    pred, conf, label, _ = fake_eval
    fig, ece = reliability_diagram(pred, conf, label)
    assert 0.0 <= ece <= 1.0
    fig.savefig(tmp_path / "fig.png")  # callers use .savefig (ref :177)
    assert (tmp_path / "fig.png").stat().st_size > 0


def test_plot_proximity_conf_directory_contract(tmp_path, fake_eval):
    _, conf, _, prox = fake_eval
    d = tmp_path / "sub" / "dir"  # created by the function
    plot_proximity_conf(prox, conf, str(d), sort_by_conf=True)
    assert (d / "proximity_conf_plot_sorted.png").exists()
    plot_proximity_conf(prox, conf, str(d), sort_by_conf=False)
    assert (d / "proximity_conf_plot.png").exists()
    with pytest.raises(ValueError):
        plot_proximity_conf(prox[:-1], conf, str(d))


def test_plot_proximity_acc_ece_outputs(tmp_path, fake_eval):
    pred, conf, label, prox = fake_eval
    d = tmp_path / "panels"
    plot_proximity_acc_ece(prox, pred, label, conf, str(d))
    for i in range(10):  # per-bin reliability diagrams (ref :177)
        assert (d / f"{i}_.png").exists()
    assert (d / "proximity_acc_ece.png").exists()


def test_compute_ece_matches_reference_formula(rng):
    probs = rng.uniform(0, 1, 500)
    labels = (probs + rng.normal(0, 0.2, 500) > 0.5).astype(int)
    ece = compute_ece(probs, labels, num_bins=10)
    # direct reference transcription (sklearn accuracy == mean equality)
    edges = np.linspace(0, 1, 11)
    want = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        in_bin = (probs >= lo) & (probs < hi)
        if in_bin.mean() > 0:
            acc = np.mean(labels[in_bin] == np.round(probs[in_bin]))
            want += abs(acc - probs[in_bin].mean()) * in_bin.mean()
    assert abs(ece - want) < 1e-12
