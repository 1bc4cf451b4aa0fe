import os
import os.path as osp
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

from clip_calibration_tpu.ops.scoring import (dac_class_confidence,
                                              fused_dac_scores)
from clip_calibration_tpu.trainers.calibration.dac import (
    DistanceAwareCalibration)


def _features(rng, nb=20, nc=12, d=32):
    base_zs = rng.normal(size=(nb, d))
    base_zs /= np.linalg.norm(base_zs, axis=1, keepdims=True)
    cur_zs = rng.normal(size=(nc, d))
    cur_zs /= np.linalg.norm(cur_zs, axis=1, keepdims=True)
    base_t = base_zs + rng.normal(size=(nb, d)) * 0.1
    cur_t = cur_zs + rng.normal(size=(nc, d)) * 0.1
    cur_t[0] = base_t[3]  # base-class-aware case
    return base_zs, cur_zs, base_t, cur_t


def test_device_dac_fit_matches_host(rng):
    base_zs, cur_zs, base_t, cur_t = _features(rng)
    host = DistanceAwareCalibration()
    host.fit(base_zs, cur_zs, base_t, cur_t, k=5)
    dev = dac_class_confidence(jnp.asarray(base_zs), jnp.asarray(cur_zs),
                               jnp.asarray(base_t), jnp.asarray(cur_t))
    np.testing.assert_allclose(np.asarray(dev), host.class_confidence,
                               rtol=1e-5, atol=1e-6)


def test_fused_scores_match_composed_pipeline(rng):
    from scipy.special import softmax
    from clip_calibration_tpu.models.clip import cosine_logits
    B, C, E = 16, 12, 32
    img_f = rng.normal(size=(B, E)).astype(np.float32)
    txt_f = rng.normal(size=(C, E)).astype(np.float32)
    conf = rng.uniform(0.5, 1.5, C)
    log_scale = np.float32(2.0)

    probs, logits = fused_dac_scores(jnp.asarray(img_f),
                                     jnp.asarray(txt_f),
                                     jnp.asarray(log_scale),
                                     jnp.asarray(conf))

    # composed reference: cosine logits -> host DAC predict -> softmax
    ref_logits = np.asarray(cosine_logits(jnp.asarray(img_f),
                                          jnp.asarray(txt_f),
                                          jnp.asarray(log_scale)))
    dac = DistanceAwareCalibration()
    dac.class_confidence = conf
    ref_logits = dac.predict(ref_logits)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(probs),
                               softmax(ref_logits, axis=-1), rtol=1e-4,
                               atol=1e-6)


def test_fused_dac_eval_path_matches_numpy_on_pipeline(tmp_path):
    """The fused device-side scoring path VLBaseLearner.test() takes in
    the DAC-only configuration must match the numpy calibrator on real
    pipeline outputs (features + logits from the actual eval loop)."""
    from train import build_parser, main, setup_cfg
    from clip_calibration_tpu.engine.registry import build_trainer
    from clip_calibration_tpu.trainers.base_learner import (
        _load_feature_dict)
    from clip_calibration_tpu.trainers.calibration.vl_calibrator import (
        VLCalibration)

    common = ["--trainer", "ZeroshotCLIP", "--seed", "1",
              "--dataset-config-file",
              osp.join(REPO, "configs/datasets/synthetic.yaml"),
              "--backbone", "ViT-Test",
              "--root", str(tmp_path / "data")]
    opts = ["DATASET.NUM_SHOTS", "8", "INPUT.SIZE", "(32, 32)",
            "INPUT.INTERPOLATION", "bicubic",
            "DATALOADER.TEST.BATCH_SIZE", "32"]
    old = os.getcwd()
    os.chdir(tmp_path)  # ./temp caches are cwd-relative
    try:
        # base run populates the feature cache
        main(build_parser().parse_args(
            common + ["--output-dir", "output/base/seed1"] + opts
            + ["DATASET.SUBSAMPLE_CLASSES", "base"]))
        sys.stdout = sys.__stdout__  # undo the run's logger tee

        # new-class trainer, built directly so both paths can be compared
        import json
        args = build_parser().parse_args(
            common + ["--output-dir", "output/new/seed1", "--no-train",
                      "--calibration-config", json.dumps(
                          {"BASE_CALIBRATION_MODE": None, "IF_DAC": True,
                           "IF_PROCAL": False})]
            + opts + ["DATASET.SUBSAMPLE_CLASSES", "new"])
        cfg = setup_cfg(args)
        trainer = build_trainer(cfg)
        assert type(trainer).fused_dac_scoring is True

        logits, labels, img_f, txt_f = trainer._run_inference(
            trainer.test_loader)
        val_dict = _load_feature_dict(
            osp.join(trainer._base_feature_dir("base"), "base_features.pt"))
        calibrator = VLCalibration(
            cfg, None, None, True, False, val_dict,
            trainer.get_text_features(txt_f, val_dict=val_dict))
        calibrator.fit()
        assert calibrator.dac_calibrator is not None
        assert calibrator.base_calibrator is None

        prox = np.ones(len(logits))
        fused = trainer._calibrated_probs(calibrator, logits, img_f,
                                          txt_f, prox)

        # (a) exact-math parity: the numpy calibrator fed the SAME cosine
        # logits the fused kernel computes must reproduce its probs
        scale = float(np.asarray(trainer.clip_params["logit_scale"]))
        rec_logits = np.exp(scale) * img_f.astype(np.float32) \
            @ txt_f.astype(np.float32).T
        host_same_inputs = calibrator.predict(rec_logits, prox)
        np.testing.assert_allclose(fused, host_same_inputs, rtol=1e-4,
                                   atol=1e-5)

        # (b) end-to-end closeness: vs the numpy fallback on the trainer's
        # own logits. Those were computed inside jit from pre-bf16-rounding
        # activations (XLA elides the convert round-trip), while the
        # returned features are bf16-rounded — so agreement is bounded by
        # bf16 rounding, not fp32.
        trainer.fused_dac_scoring = False  # force the numpy fallback
        host = trainer._calibrated_probs(calibrator, logits, img_f,
                                         txt_f, prox)
        np.testing.assert_allclose(fused, host, atol=8e-3)
        agree = (fused.argmax(1) == host.argmax(1)).mean()
        assert agree >= 0.98, f"argmax agreement {agree}"
    finally:
        os.chdir(old)
        sys.stdout = sys.__stdout__
