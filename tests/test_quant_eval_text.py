"""Quantized eval-time text fan-out (TRAINER.QUANT_EVAL_TEXT).

Beyond-reference: the reference evaluates CoCoOp by looping every
image's n_cls text encodes on host at full precision
(``/root/reference/trainers/classification/cocoop.py:193-199``) and
ProDA's set_classifier the same way (``proda.py:316-331``). Here the
frozen text tower can run int8 (weight-only) or static-calibrated w8a8
at EVAL — no gradients flow at eval, so unlike the train step (prompt
gradients traverse the text tower, pinning it to full precision) the
per-request fan-out can take the int8 MXU path. Measured int8/bf16 dot
ratios at the fan-out GEMM shapes: 1.35-1.86x (docs/ROOFLINE.md
"Quantized text fan-out"). The train path must be BIT-identical with
the flag on.
"""

import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

from helpers import build_synthetic_trainer  # noqa: E402


def _pair(name, tmp_path, mode="w8a8", tcfg=None):
    plain = build_synthetic_trainer(name, tmp_path / "data",
                                    trainer_cfg=tcfg)
    quant = build_synthetic_trainer(
        name, tmp_path / "data", trainer_cfg=tcfg,
        overrides={"TRAINER.QUANT_EVAL_TEXT": mode})
    return plain, quant


def test_cocoop_w8a8_eval_text(tmp_path):
    plain, quant = _pair("CoCoOp", tmp_path, tcfg={"N_CTX": 4})

    # the TRAIN step never sees the quantized text tower: losses on the
    # same batch must be bit-identical (gradients flow through text)
    batch = next(iter(plain.train_loader_x))
    lp = float(np.asarray(plain.forward_backward(batch)["loss"]))
    lq = float(np.asarray(quant.forward_backward(batch)["loss"]))
    assert lp == lq

    imgs = next(iter(plain.test_loader))["img"]
    l0, _, t0 = plain.model_inference(imgs)
    l1, _, t1 = quant.model_inference(imgs)
    l0 = np.asarray(l0, np.float32)
    l1 = np.asarray(l1, np.float32)
    np.testing.assert_array_equal(l0.argmax(-1), l1.argmax(-1))
    # per-class text features of the last image within quant noise
    t0 = np.asarray(t0, np.float32)
    t1 = np.asarray(t1, np.float32)
    cos = np.sum(t0 * t1, -1) / (np.linalg.norm(t0, axis=-1)
                                 * np.linalg.norm(t1, axis=-1))
    assert float(cos.min()) > 0.99, float(cos.min())

    # the quantized pytree: text matmul weights are int8 pairs with
    # static act scales; vision leaves are untouched plain arrays
    from clip_calibration_tpu.ops import quant as Q
    qp = quant.eval_text_clip_params()
    assert Q.is_quantized(qp["text"]["text_projection"])
    assert "act_scale" in qp["text"]["text_projection"]
    assert not Q.is_quantized(qp["visual"]["proj"])

    # any train step invalidates the calibrated scales (ctx moved)
    quant.forward_backward(batch)
    assert quant._eval_text_params is None
    quant.model_inference(imgs)
    assert quant._eval_text_params is not None


def test_proda_w8a8_classifier(tmp_path):
    tcfg = {"N_PROMPT": 4, "PROMPT_BS": 2, "N_CTX": 4}
    plain, quant = _pair("ProDA", tmp_path, tcfg=tcfg)
    batch = next(iter(plain.train_loader_x))
    lp = float(np.asarray(plain.forward_backward(batch)["loss"]))
    lq = float(np.asarray(quant.forward_backward(batch)["loss"]))
    assert lp == lq  # train path untouched

    plain.set_classifier()
    quant.set_classifier()
    t0 = np.asarray(plain.text_features, np.float32)
    t1 = np.asarray(quant.text_features, np.float32)
    cos = np.sum(t0 * t1, -1) / (np.linalg.norm(t0, axis=-1)
                                 * np.linalg.norm(t1, axis=-1))
    assert float(cos.min()) > 0.99, float(cos.min())

    imgs = next(iter(plain.test_loader))["img"]
    l0, *_ = plain.model_inference(imgs)
    l1, *_ = quant.model_inference(imgs)
    np.testing.assert_array_equal(
        np.asarray(l0, np.float32).argmax(-1),
        np.asarray(l1, np.float32).argmax(-1))

    # training invalidates BOTH the classifier and the text scales
    quant.forward_backward(batch)
    assert quant.text_features is None
    assert quant._eval_text_params is None


def test_cocoop_int8_weight_only(tmp_path):
    _, quant = _pair("CoCoOp", tmp_path, mode="int8",
                     tcfg={"N_CTX": 4})
    from clip_calibration_tpu.ops import quant as Q
    qp = quant.eval_text_clip_params()
    assert Q.is_quantized(qp["text"]["text_projection"])
    assert "act_scale" not in qp["text"]["text_projection"]
    imgs = next(iter(quant.test_loader))["img"]
    logits, *_ = quant.model_inference(imgs)
    assert np.all(np.isfinite(np.asarray(logits, np.float32)))


def test_one_shot_trainers_refuse(tmp_path):
    # CoOp-family class features are encoded once per eval: quantizing
    # that single pass buys nothing and would silently change the
    # parity-exact features — the flag must raise, not no-op
    with pytest.raises(ValueError, match="once per eval"):
        build_synthetic_trainer(
            "CoOp", tmp_path / "data", trainer_cfg={"N_CTX": 4},
            overrides={"TRAINER.QUANT_EVAL_TEXT": "w8a8"})


def test_unknown_mode_rejected(tmp_path):
    with pytest.raises(ValueError, match="expected"):
        build_synthetic_trainer(
            "CoCoOp", tmp_path / "data", trainer_cfg={"N_CTX": 4},
            overrides={"TRAINER.QUANT_EVAL_TEXT": "fp4"})
