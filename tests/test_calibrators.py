import json
import os.path as osp

import numpy as np
import pytest

from clip_calibration_tpu.trainers.calibration.dac import (
    DistanceAwareCalibration)
from clip_calibration_tpu.trainers.calibration.proximity import (
    get_knn_dists, get_val_image_knn_dists, proximity_from_dists)
from clip_calibration_tpu.trainers.calibration.binning import (
    HistogramBinning, IsotonicRegression, MultiIsotonicRegression)
from clip_calibration_tpu.trainers.calibration.bin_mean_shift import (
    BinMeanShift)
from clip_calibration_tpu.trainers.calibration.density_ratio import (
    DensityRatioCalibration)

FIXDIR = osp.join(osp.dirname(__file__), "fixtures")


# ---------------------------------------------------------------- DAC

def test_dac_fit_parity():
    with open(osp.join(FIXDIR, "dac_golden.json")) as f:
        g = json.load(f)
    dac = DistanceAwareCalibration()
    dac.fit(np.array(g["base_zs"]), np.array(g["cur_zs"]),
            np.array(g["base_t"]), np.array(g["cur_t"]), k=g["k"])
    np.testing.assert_allclose(dac.class_confidence,
                               np.array(g["class_confidence"]),
                               rtol=1e-10, atol=1e-12)


def test_dac_predict_scales_argmax_row():
    dac = DistanceAwareCalibration()
    dac.class_confidence = np.array([0.5, 1.0, 2.0])
    logits = np.array([[3.0, 1.0, 0.0],   # argmax 0 -> x0.5
                       [0.0, 5.0, 1.0],   # argmax 1 -> x1.0
                       [0.0, 1.0, 4.0]])  # argmax 2 -> x2.0
    out = dac.predict(logits)
    np.testing.assert_allclose(out[0], logits[0] * 0.5)
    np.testing.assert_allclose(out[1], logits[1])
    np.testing.assert_allclose(out[2], logits[2] * 2.0)


# ---------------------------------------------------------------- KNN

def test_knn_dists_against_bruteforce(rng):
    base = rng.normal(size=(100, 16)).astype(np.float32)
    cur = rng.normal(size=(37, 16)).astype(np.float32)
    got = get_knn_dists(base, cur, 5, chunk=16)
    # brute force
    d = np.linalg.norm(cur[:, None] - base[None], axis=-1)
    want = np.sort(d, axis=1)[:, :5]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_val_self_knn_excludes_self(rng):
    feats = rng.normal(size=(50, 8)).astype(np.float32)
    got = get_val_image_knn_dists(feats, 3)
    assert got.shape == (50, 3)
    assert np.all(got > 1e-5)  # self distance (0) excluded
    d = np.linalg.norm(feats[:, None] - feats[None], axis=-1)
    want = np.sort(d, axis=1)[:, 1:4]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_proximity_from_dists():
    d = np.array([[1.0, 2.0], [0.0, 0.0]])
    np.testing.assert_allclose(proximity_from_dists(d),
                               [np.exp(-1.5), 1.0])


# ---------------------------------------------------------------- binning

def _synthetic_probs(rng, n=2000, c=6, acc=0.7, overconf=1.5):
    logits = rng.normal(0, 2, (n, c)) * overconf
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    preds = probs.argmax(1)
    labels = np.where(rng.random(n) < acc, preds, rng.integers(0, c, n))
    return probs, labels


def test_histogram_binning_reduces_ece(rng):
    from clip_calibration_tpu.tools.metrics import ECE
    probs, labels = _synthetic_probs(rng)
    hb = HistogramBinning(bins=10)
    out = hb.fit_transform(probs, labels)
    assert out.shape == probs.shape
    np.testing.assert_allclose(out.sum(1), 1.0, atol=1e-9)
    conf0 = probs.max(1)
    conf1 = out.max(1)
    pred0, pred1 = probs.argmax(1), out.argmax(1)
    assert ECE(conf1, pred1, labels) < ECE(conf0, pred0, labels)


def test_isotonic_regression_reduces_ece(rng):
    from clip_calibration_tpu.tools.metrics import ECE
    probs, labels = _synthetic_probs(rng)
    iso = IsotonicRegression()
    out = iso.fit(probs, labels).transform(probs)
    np.testing.assert_allclose(out.sum(1), 1.0, atol=1e-9)
    assert ECE(out.max(1), out.argmax(1), labels) < \
        ECE(probs.max(1), probs.argmax(1), labels)


def test_multi_isotonic_parity_formula(rng):
    """Exact check against the reference Mix-n-Match formula using
    sklearn's isotonic directly."""
    from sklearn.isotonic import IsotonicRegression as SkIso
    probs, labels = _synthetic_probs(rng, n=300, c=4)
    mir = MultiIsotonicRegression()
    out = mir.fit_transform(probs, labels)
    # reference formula
    p = np.exp(probs) / np.exp(probs).sum(1, keepdims=True)
    onehot = np.zeros_like(p)
    onehot[np.arange(len(labels)), labels] = 1
    iso = SkIso(out_of_bounds="clip")
    want = iso.fit_transform(p.flatten(), onehot.flatten()).reshape(
        p.shape) + 1e-9 * p
    np.testing.assert_allclose(out, want, atol=1e-12)


def test_bin_mean_shift_roundtrip(rng):
    probs, labels = _synthetic_probs(rng, n=600, c=5)
    prox = rng.gamma(2.0, 1.0, 600)
    bms = BinMeanShift("multi_isotonic_regression", MultiIsotonicRegression,
                       bin_strategy="quantile", proximity_bin=5)
    out = bms.fit_transform(probs, prox, labels)
    assert out.shape == probs.shape
    out2 = bms.transform(probs, prox)
    assert out2.shape == probs.shape
    # scatter-back ordering: transform of identical inputs must be
    # deterministic and aligned with input rows
    np.testing.assert_allclose(out2, bms.transform(probs, prox))


def test_bin_mean_shift_kmeans_and_uniform(rng):
    probs, labels = _synthetic_probs(rng, n=400, c=4)
    prox = rng.random(400)
    for strat in ("kmeans", "uniform"):
        bms = BinMeanShift("isotonic_regression", IsotonicRegression,
                           bin_strategy=strat, proximity_bin=3)
        out = bms.fit_transform(probs, prox, labels)
        assert out.shape == probs.shape


# ---------------------------------------------------------------- ProCal

def test_density_ratio_calibration(rng):
    probs, labels = _synthetic_probs(rng, n=1500, c=5)
    preds = probs.argmax(1)
    correct = preds == labels
    # proximity correlated with correctness
    prox = np.where(correct, rng.normal(0.7, 0.1, 1500),
                    rng.normal(0.3, 0.1, 1500)).clip(0, 1)
    cal = DensityRatioCalibration()
    cal.fit(probs, preds, labels, prox)
    out = cal.predict(probs, prox)
    assert out.shape == probs.shape
    np.testing.assert_allclose(out.sum(1), 1.0, atol=1e-8)
    # high-proximity (likely-correct) samples get higher calibrated conf
    hi = out[np.arange(1500), preds][prox > 0.6].mean()
    lo = out[np.arange(1500), preds][prox < 0.4].mean()
    assert hi > lo


# ---------------------------------------------------------------- facade

def test_vl_calibration_facade(rng):
    from clip_calibration_tpu.config import get_cfg_default
    from clip_calibration_tpu.trainers.calibration.vl_calibrator import (
        VLCalibration)
    cfg = get_cfg_default()
    n, c = 400, 8
    probs, labels = _synthetic_probs(rng, n=n, c=c)
    logits = np.log(probs + 1e-12) * 3
    knn = rng.gamma(2.0, 0.5, (n, 5))
    val_dict = {
        "val_logits": logits, "val_labels": labels,
        "val_image_knn_dists": knn,
        "val_image_features": rng.normal(size=(n, 16)),
        "val_text_features": rng.normal(size=(c, 16)),
    }
    tf = {k: rng.normal(size=(c, 16)) for k in
          ["base_text_features_zs", "current_text_features_zs",
           "base_text_features_tuned", "current_text_features_tuned"]}

    test_logits = logits[:100]
    test_prox = np.exp(-knn.mean(1))[:100]

    # plain softmax (no calibrators)
    cal = VLCalibration(cfg, None, None, False, False, val_dict, tf)
    cal.fit()
    out = cal.predict(test_logits, test_prox)
    from scipy.special import softmax
    np.testing.assert_allclose(out, softmax(test_logits, axis=-1))

    # DAC on
    cal = VLCalibration(cfg, None, None, True, False, val_dict, tf)
    cal.fit()
    out_dac = cal.predict(test_logits, test_prox)
    assert out_dac.shape == out.shape
    assert not np.allclose(out_dac, out)

    # bin_based + each calibrator name
    for name in ("histogram_binning", "isotonic_regression",
                 "multi_isotonic_regression"):
        cal = VLCalibration(cfg, "bin_based", name, False, False,
                            val_dict, tf)
        cal.fit()
        out_b = cal.predict(test_logits, test_prox)
        assert out_b.shape == (100, c)

    # bin_based + procal (BinMeanShift wrap)
    cal = VLCalibration(cfg, "bin_based", "multi_isotonic_regression",
                        False, True, val_dict, tf)
    cal.fit()
    assert cal.predict(test_logits, test_prox).shape == (100, c)

    # scaling_based + procal (density ratio)
    cal = VLCalibration(cfg, "scaling_based", None, False, True,
                        val_dict, tf)
    cal.fit()
    out_p = cal.predict(test_logits, test_prox)
    np.testing.assert_allclose(out_p.sum(1), 1.0, atol=1e-8)


def test_val_self_knn_rejects_single_sample():
    """A 1-sample val set has zero neighbors; must raise, not emit NaN
    proximities into the calibrator fit."""
    import numpy as np
    import pytest

    from clip_calibration_tpu.trainers.calibration.proximity import (
        get_val_image_knn_dists)

    with pytest.raises(ValueError, match="val set too small"):
        get_val_image_knn_dists(np.ones((1, 8), np.float32), k_nns=5)


def test_density_ratio_degenerate_split_identity():
    """<2 correct or incorrect val samples (common for 4-shot val sets
    at high accuracy) must fall back to identity calibration instead of
    NaN bandwidths / ZeroDivisionError."""
    from clip_calibration_tpu.trainers.calibration.density_ratio import (
        DensityRatioCalibration)
    rng = np.random.default_rng(0)
    probs = rng.dirichlet(np.ones(5), 20)
    preds = probs.argmax(1)
    prox = rng.random(20)

    for true in (preds.copy(),                       # 0 incorrect
                 np.where(np.arange(20) == 3, (preds + 1) % 5, preds)):
        cal = DensityRatioCalibration()              # 1 incorrect
        cal.fit(probs, preds, true, prox)
        out = cal.predict(probs, prox)
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out, probs)


def test_bin_mean_shift_empty_bin_passthrough():
    """Tied proximities collapse quantile edges; test samples routed to
    a bin that was empty at fit time pass through uncalibrated instead
    of crashing on an unfitted calibrator."""
    from clip_calibration_tpu.trainers.calibration.bin_mean_shift import (
        BinMeanShift)
    from clip_calibration_tpu.trainers.calibration.binning import (
        HistogramBinning)
    rng = np.random.default_rng(1)
    logits = rng.normal(0, 2, (40, 5))
    gt = rng.integers(0, 5, 40)
    prox = np.r_[np.full(30, 0.5), np.linspace(0.6, 0.9, 10)]

    bms = BinMeanShift("histogram_binning", HistogramBinning,
                       bin_strategy="quantile", proximity_bin=5)
    bms.fit_transform(logits, prox, gt)
    tlogits = rng.normal(0, 2, (4, 5))
    out = bms.transform(tlogits, np.array([0.1, 0.5, 0.7, 0.95]))
    assert out.shape == (4, 5)
    assert np.isfinite(out).all()


def test_customized_density_ratio_matches_reference(rng):
    """Live oracle: our CustomizedDensityRatioCalibration (mirrored-
    boundary, scalar-bandwidth full-covariance Gaussian KDE) against
    the reference's own class (``density_ratio_calibration.py:173-459``,
    kernel='scipy_gaussian_kde') — dead code in the reference
    (vl_calibrator imports only DensityRatioCalibration) but carried
    for belt-and-braces parity. Exercises mirror on AND off."""
    import importlib.util
    import sys
    import types

    ref_path = ("/root/reference/trainers/calibration/"
                "density_ratio_calibration.py")
    if not osp.exists(ref_path):
        pytest.skip("reference checkout not available")
    if "statsmodels" not in sys.modules:
        # the module imports statsmodels at top level; the
        # scipy_gaussian_kde code path never touches it
        sm = types.ModuleType("statsmodels")
        sm.api = types.ModuleType("statsmodels.api")
        sys.modules["statsmodels"] = sm
        sys.modules["statsmodels.api"] = sm.api
    spec = importlib.util.spec_from_file_location("ref_drc", ref_path)
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    from clip_calibration_tpu.trainers.calibration.density_ratio import (
        CustomizedDensityRatioCalibration)

    n, c = 400, 5
    logits = rng.normal(0, 2.0, (n, c))
    labels = rng.integers(0, c, n)
    preds = logits.argmax(1)
    correct = preds == labels
    prox = np.where(correct, rng.normal(0.7, 0.1, n),
                    rng.normal(0.3, 0.1, n)).clip(0.01, 0.99)

    test_logits = rng.normal(0, 2.0, (120, c))
    test_prox = rng.uniform(0.05, 0.95, 120)

    for mirror in (False, True):
        theirs = ref_mod.CustomizedDensityRatioCalibration(
            kernel="scipy_gaussian_kde", kernel_func=None,
            mirror=mirror, bandwidth=0.1)
        theirs.fit(logits, preds, labels, prox, is_conf=False)
        want = theirs.predict(test_logits, test_prox, is_conf=False)

        ours = CustomizedDensityRatioCalibration(mirror=mirror,
                                                 bandwidth=0.1)
        ours.fit(logits, preds, labels, prox)
        got = ours.predict(test_logits, test_prox)

        assert abs(ours.false_true_ratio
                   - float(theirs.false_true_ratio)) < 1e-12
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12,
                                   err_msg=f"mirror={mirror}")
        np.testing.assert_allclose(got.sum(1), 1.0, atol=1e-8)


def test_customized_density_ratio_degenerate_and_onehot(rng):
    """Guards mirrored from DensityRatioCalibration: all-correct (or
    all-wrong) val splits fall back to identity instead of NaN
    covariances, and a one-hot float64 softmax row (zero non-argmax
    mass) must not divide by zero."""
    from clip_calibration_tpu.trainers.calibration.density_ratio import (
        CustomizedDensityRatioCalibration)

    n, c = 50, 4
    logits = rng.normal(0, 1.0, (n, c))
    preds = logits.argmax(1)
    prox = rng.uniform(0.1, 0.9, n)

    cal = CustomizedDensityRatioCalibration(mirror=True, bandwidth=0.1)
    cal.fit(logits, preds, preds.copy(), prox)  # every sample correct
    assert cal.degenerate
    out = cal.predict(logits, prox)
    np.testing.assert_allclose(out.sum(1), 1.0, atol=1e-8)
    assert np.isfinite(out).all()

    labels = rng.integers(0, c, n)
    cal = CustomizedDensityRatioCalibration(mirror=False, bandwidth=0.1)
    cal.fit(logits, preds, labels, prox)
    onehot = logits.copy()
    onehot[0, preds[0]] += 800.0  # exp underflow: one-hot in float64
    out = cal.predict(onehot, prox)
    assert np.isfinite(out).all()  # the guarded row: no 0/0 NaNs
    # the one-hot row has zero redistributable mass, so it sums to its
    # calibrated confidence (sibling-class semantics); the rest to 1
    np.testing.assert_allclose(out[1:].sum(1), 1.0, atol=1e-8)
    np.testing.assert_allclose(out[0].sum(), out[0, preds[0]], atol=1e-12)
