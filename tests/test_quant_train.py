"""Quantized frozen-vision-tower training (TRAINER.QUANT_FROZEN_VISION).

Beyond-reference: the reference's only precision knob is fp16
convert_weights (``/root/reference/clip/model.py:632-653``) and it always
trains the frozen CLIP tower at full rate. Here trainers whose image
tower takes no trainable inputs can run it int8 (weight-only) or
static-calibrated w8a8 during training/eval — gradients flow only to the
prompt/adapter/residual pytrees, so the tower is off the gradient path
and quantization changes the trajectory only by feature-level
quantization noise. Measured step speedups: docs/PERFORMANCE.md
("Quantized frozen-tower training").
"""

import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

from helpers import build_synthetic_trainer  # noqa: E402


def _first_batch(trainer):
    return next(iter(trainer.train_loader_x))


def _steps(trainer, n=3):
    losses = []
    for _ in range(n):
        batch = _first_batch(trainer)
        losses.append(float(np.asarray(
            trainer.forward_backward(batch)["loss"])))
    return losses


def test_coop_w8a8_frozen_vision_trains(tmp_path):
    import jax.numpy as jnp

    from clip_calibration_tpu.ops import quant as Q

    plain = build_synthetic_trainer(
        "CoOp", tmp_path / "data", trainer_cfg={"N_CTX": 4})
    quant = build_synthetic_trainer(
        "CoOp", tmp_path / "data", trainer_cfg={"N_CTX": 4},
        overrides={"TRAINER.QUANT_FROZEN_VISION": "w8a8"})

    # the quantized pytree: vision matmul weights are int8 pairs with
    # static act scales; text leaves are THE SAME objects (bit-identical
    # text path); checkpoints still see the plain params
    sp = quant.step_clip_params
    assert Q.is_quantized(sp["visual"]["proj"])
    assert "act_scale" in sp["visual"]["proj"]
    assert sp["text"] is quant.clip_params["text"]
    assert not Q.is_quantized(quant.clip_params["visual"]["proj"])

    l_plain = _steps(plain)
    l_quant = _steps(quant)
    assert all(np.isfinite(l_plain)) and all(np.isfinite(l_quant))
    # same data order (same seed/loader): the quantized trajectory tracks
    # the plain one within quantization noise
    np.testing.assert_allclose(l_quant, l_plain, rtol=0.2, atol=0.2)

    # the learned ctx updates point the same way
    u_p = np.asarray(plain._models["prompt_learner"]["params"]["ctx"],
                     np.float32).ravel()
    u_q = np.asarray(quant._models["prompt_learner"]["params"]["ctx"],
                     np.float32).ravel()
    cos = float(u_p @ u_q / (np.linalg.norm(u_p) * np.linalg.norm(u_q)))
    assert cos > 0.95, cos

    # eval inference agrees: same argmax on a test batch
    batch = next(iter(plain.test_loader))
    imgs = batch["img"]
    lp, fp, _ = plain.model_inference(imgs)
    lq, fq, _ = quant.model_inference(imgs)
    # per-row feature cosine within quantization noise
    fp = np.asarray(fp, np.float32)
    fq = np.asarray(fq, np.float32)
    fp /= np.linalg.norm(fp, axis=-1, keepdims=True)
    fq /= np.linalg.norm(fq, axis=-1, keepdims=True)
    assert float(np.min(np.sum(fp * fq, -1))) > 0.99
    # the b-shaped eval bucket keeps the static qmode (rows > 1)
    assert quant.vision_qmode_for(int(imgs.shape[0])) == "w8a8"
    assert quant.vision_qmode_for(1) == "w8a8_dynamic"

    del jnp  # imported for parity with the trainer path


def test_coop_int8_weight_only_mode(tmp_path):
    quant = build_synthetic_trainer(
        "CoOp", tmp_path / "data", trainer_cfg={"N_CTX": 4},
        overrides={"TRAINER.QUANT_FROZEN_VISION": "int8"})
    from clip_calibration_tpu.ops import quant as Q
    sp = quant.step_clip_params
    assert Q.is_quantized(sp["visual"]["proj"])
    assert "act_scale" not in sp["visual"]["proj"]
    assert quant.vision_qmode == "dequant"
    assert quant.vision_qmode_for(1) == "dequant"  # no w8a8 epilogue
    assert all(np.isfinite(_steps(quant, 2)))


@pytest.mark.parametrize("name", ["TaskRes", "CLIP_Adapter", "CoCoOp",
                                  "ProDA"])
def test_frozen_vision_w8a8_trainer_smoke(tmp_path, name):
    tcfg = {}
    if name == "CoCoOp":
        tcfg = {"N_CTX": 4}
    elif name == "ProDA":
        tcfg = {"N_PROMPT": 4, "PROMPT_BS": 2, "N_CTX": 4}
    trainer = build_synthetic_trainer(
        name, tmp_path / "data", trainer_cfg=tcfg or None,
        overrides={"TRAINER.QUANT_FROZEN_VISION": "w8a8"})
    assert all(np.isfinite(_steps(trainer, 2)))
    if name == "ProDA":
        trainer.set_classifier()
    logits, *_ = trainer.model_inference(
        next(iter(trainer.test_loader))["img"])
    assert np.all(np.isfinite(np.asarray(logits, np.float32)))


@pytest.mark.parametrize("name", ["VPT", "MaPLe"])
def test_vision_prompt_trainers_refuse(tmp_path, name):
    tcfg = {"PROMPT_DEPTH": 2} if name == "MaPLe" else None
    with pytest.raises(ValueError, match="gradient path|does not support"):
        build_synthetic_trainer(
            name, tmp_path / "data", trainer_cfg=tcfg,
            overrides={"TRAINER.QUANT_FROZEN_VISION": "w8a8"})


def test_unknown_mode_rejected(tmp_path):
    with pytest.raises(ValueError, match="expected"):
        build_synthetic_trainer(
            "CoOp", tmp_path / "data", trainer_cfg={"N_CTX": 4},
            overrides={"TRAINER.QUANT_FROZEN_VISION": "fp4"})


def test_dataset_free_serving_build_paths():
    """A w8a8-flagged checkpoint served dataset-free has no loader to
    draw a calibration batch from: the build must fail with the
    override recipe, not crash in next(iter(...)); int8 (weight-only,
    calibration-free) must build and serve."""
    from clip_calibration_tpu.ops import quant as Q
    from clip_calibration_tpu.serving import build_serving_trainer

    with pytest.raises(ValueError, match="dataset-free serving builds"):
        build_serving_trainer(
            ["cat", "dog"], trainer_name="CoOp", backbone="ViT-Test",
            opts=["INPUT.SIZE", "(32, 32)",
                  "TRAINER.QUANT_FROZEN_VISION", "w8a8"])

    served = build_serving_trainer(
        ["cat", "dog"], trainer_name="CoOp", backbone="ViT-Test",
        opts=["INPUT.SIZE", "(32, 32)",
              "TRAINER.QUANT_FROZEN_VISION", "int8"])
    assert Q.is_quantized(served.step_clip_params["visual"]["proj"])
    logits, *_ = served.model_inference(
        np.zeros((2, 32, 32, 3), np.float32))
    assert np.all(np.isfinite(np.asarray(logits, np.float32)))


def test_zeroshot_clip_w8a8_eval(tmp_path):
    plain = build_synthetic_trainer("ZeroshotCLIP", tmp_path / "data")
    quant = build_synthetic_trainer(
        "ZeroshotCLIP", tmp_path / "data",
        overrides={"TRAINER.QUANT_FROZEN_VISION": "w8a8"})
    batch = next(iter(plain.test_loader))
    lp, *_ = plain.model_inference(batch["img"])
    lq, *_ = quant.model_inference(batch["img"])
    lp = np.asarray(lp, np.float32)
    lq = np.asarray(lq, np.float32)
    assert np.array_equal(lp.argmax(-1), lq.argmax(-1))
