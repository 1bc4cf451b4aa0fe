"""Standalone serving API: dataset-free calibrated inference.

Validated against the reference-generated golden fixture: the Predictor
built from the fixture's CoOp prompt checkpoint must reproduce the
golden base-split accuracy, and zero-shot / DAC / temperature knobs must
match the corresponding pipeline math.
"""

import json
import os
import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
FIX = osp.join(REPO, "tests", "fixtures", "golden_e2e")

GOLDEN = json.load(open(osp.join(FIX, "golden.json")))
CLASSNAMES = ["amber", "basalt", "cobalt", "dune"]
BASE = CLASSNAMES[:2]


@pytest.fixture(autouse=True)
def _fixture_weights(monkeypatch):
    monkeypatch.setenv("CLIP_CHECKPOINT_DIR", osp.join(FIX, "weights"))
    # the backbone cache keys on this env var (base_learner._zs_clip)


from helpers import golden_test_images as _test_images  # noqa: E402


def test_zero_shot_predictor_matches_golden_accuracy():
    from clip_calibration_tpu.serving import Predictor

    images, labels = _test_images({0, 1})
    pred = Predictor("ViT-Test", BASE, precision="fp32", batch_size=8)
    out = pred.predict(images)
    acc = 100.0 * (out["preds"] == labels).mean()
    assert acc == pytest.approx(GOLDEN["zsclip_base"]["accuracy"],
                                abs=0.01)
    assert out["probs"].shape == (len(labels), 2)
    np.testing.assert_allclose(out["probs"].sum(1), 1.0, atol=1e-5)


def test_prompt_checkpoint_predictor_matches_golden_accuracy():
    from clip_calibration_tpu.serving import Predictor

    images, labels = _test_images({0, 1})
    pred = Predictor.from_prompt_checkpoint(
        "ViT-Test", BASE, osp.join(FIX, "coop_model"),
        n_ctx=4, precision="fp32", batch_size=8)
    out = pred.predict(images)
    acc = 100.0 * (out["preds"] == labels).mean()
    assert acc == pytest.approx(GOLDEN["coop_base"]["accuracy"],
                                abs=0.01)


def test_dac_confidence_and_temperature_paths():
    from clip_calibration_tpu.serving import Predictor

    images, labels = _test_images({2, 3})
    conf = np.asarray(GOLDEN["dac_class_confidence"])
    new = CLASSNAMES[2:]
    base_kwargs = dict(n_ctx=4, precision="fp32", batch_size=8)
    plain = Predictor.from_prompt_checkpoint(
        "ViT-Test", new, osp.join(FIX, "coop_model"), **base_kwargs)
    dac = Predictor.from_prompt_checkpoint(
        "ViT-Test", new, osp.join(FIX, "coop_model"),
        class_confidence=conf, **base_kwargs)

    p0 = plain.predict(images)["probs"]
    p1 = dac.predict(images)["probs"]
    # DAC row scaling is argmax-preserving (confidences > 0) but must
    # change the probabilities when confidence != 1
    np.testing.assert_array_equal(p0.argmax(1), p1.argmax(1))
    assert not np.allclose(p0, p1)

    # temperature replaces exp(logit_scale)
    temp = Predictor.from_prompt_checkpoint(
        "ViT-Test", new, osp.join(FIX, "coop_model"),
        temperature=GOLDEN["tempscaling_temperature"], **base_kwargs)
    p2 = temp.predict(images)["probs"]
    assert not np.allclose(p0, p2)
    np.testing.assert_array_equal(p0.argmax(1), p2.argmax(1))


def test_rejects_float_images():
    from clip_calibration_tpu.serving import (Predictor, TrainerPredictor,
                                              build_serving_trainer)

    pred = Predictor("ViT-Test", BASE, precision="fp32", batch_size=4)
    with pytest.raises(ValueError):
        pred.predict(np.zeros((2, 32, 32, 3), np.float32))
    with pytest.raises(ValueError):
        Predictor("ViT-Test", BASE, class_confidence=np.ones(3))

    tp = TrainerPredictor(build_serving_trainer(
        BASE, trainer_name="CoOp", backbone="ViT-Test",
        opts=["INPUT.SIZE", "(32, 32)"]), batch_size=4)
    with pytest.raises(ValueError):
        tp.predict(np.zeros((2, 32, 32, 3), np.float32))
    # channels-first uint8 (torch habit) would silently mix channels
    # into spatial positions — must raise, not mis-normalize
    with pytest.raises(ValueError):
        pred.predict(np.zeros((2, 3, 32, 32), np.uint8))
    with pytest.raises(ValueError):
        tp.predict(np.zeros((2, 3, 32, 32), np.uint8))


def test_empty_batch_returns_empty_result():
    """Upstream filters can drop every image; predict must return empty
    arrays instead of crashing in np.concatenate — including a bare []
    (float64 dtype: the empty check must precede dtype validation)."""
    from clip_calibration_tpu.serving import (Predictor, TrainerPredictor,
                                              build_serving_trainer)

    pred = Predictor("ViT-Test", BASE, precision="fp32", batch_size=8)
    for empty in (np.zeros((0, 32, 32, 3), np.uint8), []):
        out = pred.predict(empty)
        assert out["probs"].shape == (0, len(BASE))
        assert out["preds"].shape == (0,)
        assert out["confidences"].shape == (0,)
    tp = TrainerPredictor(build_serving_trainer(
        BASE, trainer_name="CoOp", backbone="ViT-Test",
        opts=["INPUT.SIZE", "(32, 32)"]), batch_size=4)
    out = tp.predict([])
    assert out["probs"].shape == (0, len(BASE))
    assert out["preds"].shape == (0,)


def test_mesh_sharded_predictor_matches_single_device():
    """SPMD serving: batch sharded over the mesh 'data' axis must
    reproduce single-device probabilities (weights replicated, XLA
    collectives only)."""
    import jax

    from clip_calibration_tpu.parallel.mesh import make_mesh
    from clip_calibration_tpu.serving import Predictor

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    mesh = make_mesh((8, 1), ("data", "model"))

    images, _ = _test_images({0, 1})
    single = Predictor("ViT-Test", BASE, precision="fp32", batch_size=8)
    sharded = Predictor("ViT-Test", BASE, precision="fp32", batch_size=6,
                        mesh=mesh)
    assert sharded.batch_size == 8  # rounded up to the data-axis size
    out_s = single.predict(images)
    out_m = sharded.predict(images)
    np.testing.assert_allclose(out_m["probs"], out_s["probs"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(out_m["preds"], out_s["preds"])


def _build_maple_trainer(tmp_path):
    from helpers import build_synthetic_trainer

    return build_synthetic_trainer(
        "MaPLe", tmp_path, output_dir=tmp_path / "out",
        trainer_cfg=dict(N_CTX=2, PROMPT_DEPTH=2),  # ViT-Test: 2 layers
        freeze=True)


def test_trainer_predictor_from_checkpoint_dataset_free(tmp_path):
    """VERDICT r2 item 7: a MaPLe checkpoint must serve end-to-end with
    NO dataset directory (classnames + config + checkpoint only) and
    with DAC + softmax computed on device, matching the dataset-built
    trainer's own inference bit-for-bit at fp32."""
    from clip_calibration_tpu.serving import TrainerPredictor

    ref = _build_maple_trainer(tmp_path)
    ckpt_dir = str(tmp_path / "ckpt")
    ref.save_model(0, ckpt_dir)

    classnames = ref.dm.dataset.classnames
    served = TrainerPredictor.from_checkpoint(
        ckpt_dir, classnames, trainer_name="MaPLe",
        backbone="ViT-Test",
        opts=["TRAINER.MAPLE.N_CTX", "2",
              "TRAINER.MAPLE.PROMPT_DEPTH", "2",
              "INPUT.SIZE", "(32, 32)"],
        batch_size=4)
    # the serving trainer never saw a dataset directory
    assert served.trainer.test_loader is None

    rng = np.random.default_rng(3)
    imgs = (rng.random((6, 32, 32, 3)) * 255).astype(np.uint8)
    out = served.predict(imgs)

    direct = TrainerPredictor(ref, batch_size=4).predict(imgs)
    np.testing.assert_allclose(out["probs"], direct["probs"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(out["preds"], direct["preds"])

    # DAC confidences through the device-side scoring path
    conf = rng.random(len(classnames)).astype(np.float32) + 0.5
    out_dac = TrainerPredictor.from_checkpoint(
        ckpt_dir, classnames, trainer_name="MaPLe",
        backbone="ViT-Test",
        opts=["TRAINER.MAPLE.N_CTX", "2",
              "TRAINER.MAPLE.PROMPT_DEPTH", "2",
              "INPUT.SIZE", "(32, 32)"],
        class_confidence=conf, batch_size=4).predict(imgs)
    logits, _, _ = ref.model_inference(imgs[:4])
    lg = np.asarray(logits, np.float32)
    scaled = lg * conf[lg.argmax(axis=1)][:, None]
    from scipy.special import softmax
    np.testing.assert_allclose(out_dac["probs"][:4],
                               softmax(scaled, axis=1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name,opts", [
    ("PromptSRC", ["TRAINER.PROMPTSRC.N_CTX_TEXT", "2",
                   "TRAINER.PROMPTSRC.N_CTX_VISION", "2",
                   "TRAINER.PROMPTSRC.PROMPT_DEPTH_TEXT", "2",
                   "TRAINER.PROMPTSRC.PROMPT_DEPTH_VISION", "2"]),
    ("VPT", ["TRAINER.VPT.N_CTX_VISION", "2",
             "TRAINER.VPT.PROMPT_DEPTH_VISION", "2"]),
    ("CoCoOp", ["TRAINER.COCOOP.N_CTX", "2"]),
    ("ProDA", ["TRAINER.PRODA.N_CTX", "2", "TRAINER.PRODA.N_PROMPT",
               "4", "TRAINER.PRODA.PROMPT_BS", "2"]),
])
def test_serving_trainer_builds_dataset_free(name, opts):
    """Every prompt family Predictor cannot serve must at least build
    and run inference dataset-free through build_serving_trainer."""
    from clip_calibration_tpu.serving import (TrainerPredictor,
                                              build_serving_trainer)

    trainer = build_serving_trainer(
        ["apple", "bus", "cat"], trainer_name=name, backbone="ViT-Test",
        opts=opts + ["INPUT.SIZE", "(32, 32)"])
    tp = TrainerPredictor(trainer, batch_size=4)
    rng = np.random.default_rng(0)
    out = tp.predict((rng.random((3, 32, 32, 3)) * 255)
                     .astype(np.uint8))
    assert out["probs"].shape == (3, 3)
    np.testing.assert_allclose(out["probs"].sum(1), 1.0, atol=1e-5)


def test_tempscaling_serving_dataset_free(tmp_path):
    """Calibrated checkpoints (model-calibrated.pth.tar-N) must serve
    dataset-free too: TempScaling's nested base-learner build goes
    through the same serving stub (reference serves calibrated models
    via basemodel_loader mirrors). Tempered probs == softmax(T * cos)."""
    import jax.numpy as jnp
    from scipy.special import softmax
    from clip_calibration_tpu.serving import (TrainerPredictor,
                                              build_serving_trainer)

    opts = ["CALIBRATION.SCALING.BASE_LEARNER", "CoOp",
            "CALIBRATION.SCALING.BASE_DIR", osp.join(FIX, "coop_model"),
            "CALIBRATION.SCALING.BASE_EPOCH", "3",
            "TRAINER.COOP.N_CTX", "4", "INPUT.SIZE", "(32, 32)",
            "MODEL.PRECISION", "fp32", "TRAINER.COOP.PREC", "fp32"]
    fitted = build_serving_trainer(BASE, trainer_name="TempScaling",
                                   backbone="ViT-Test", opts=opts)
    assert fitted.test_loader is None
    assert fitted.base.test_loader is None  # nested build is stub too
    fitted._models["scale_learner"]["params"]["scale"] = jnp.asarray(
        np.log(2.5), jnp.float32)
    ck = str(tmp_path / "calibrated")
    fitted.save_model(0, ck)
    assert osp.exists(osp.join(ck, "scale_learner",
                               "model-calibrated.pth.tar-1"))

    srv = TrainerPredictor.from_checkpoint(
        ck, BASE, trainer_name="TempScaling", backbone="ViT-Test",
        opts=opts, epoch=1, batch_size=8)
    images, _ = _test_images({0, 1})
    out = srv.predict(images)

    cos, _, _ = srv.trainer._unit_logits(images[:8])
    want = softmax(2.5 * cos, axis=1)
    np.testing.assert_allclose(out["probs"][:8], want, rtol=1e-5,
                               atol=1e-6)


def test_trainer_predictor_serves_any_trainer(tmp_path):
    """TrainerPredictor must reproduce the trainer's own inference math
    (incl. padding/trim) for a trainer Predictor cannot serve (MaPLe's
    deep prompts), and apply DAC confidences with the eval pipeline's
    logits-then-softmax order."""
    from scipy.special import softmax
    from clip_calibration_tpu.config import get_cfg_default
    from clip_calibration_tpu.engine.registry import build_trainer
    import clip_calibration_tpu.trainers  # noqa: F401
    import clip_calibration_tpu.data.datasets  # noqa: F401
    import clip_calibration_tpu.evaluators.vl_evaluator  # noqa: F401
    from clip_calibration_tpu.serving import TrainerPredictor

    cfg = get_cfg_default()
    cfg.TEST.EVALUATOR = "VLClassification"
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NUM_SHOTS = 4
    cfg.SEED = 1
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.MODEL.BACKBONE.NAME = "ViT-Test"
    cfg.INPUT.SIZE = (32, 32)
    cfg.TRAINER.NAME = "MaPLe"
    cfg.TRAINER.MAPLE.N_CTX = 2
    cfg.TRAINER.MAPLE.PROMPT_DEPTH = 2  # ViT-Test: 2 layers
    cfg.freeze()
    trainer = build_trainer(cfg)

    rng = np.random.default_rng(0)
    imgs = (rng.random((5, 32, 32, 3)) * 255).astype(np.uint8)

    tp = TrainerPredictor(trainer, batch_size=4)  # forces pad+trim
    out = tp.predict(imgs)

    direct = []
    for chunk in (imgs[:4], np.concatenate(
            [imgs[4:], np.repeat(imgs[4:5], 3, axis=0)])):
        logits, _, _ = trainer.model_inference(chunk)
        direct.append(np.asarray(logits, np.float32))
    logits = np.concatenate(direct)[:5]
    np.testing.assert_allclose(out["probs"], softmax(logits, axis=1),
                               rtol=1e-5, atol=1e-6)

    conf = rng.random(trainer.dm.num_classes).astype(np.float32)
    out_dac = TrainerPredictor(trainer, class_confidence=conf,
                               batch_size=4).predict(imgs)
    scaled = logits * conf[logits.argmax(axis=1)][:, None]
    np.testing.assert_allclose(out_dac["probs"],
                               softmax(scaled, axis=1),
                               rtol=1e-5, atol=1e-6)


def test_serving_build_does_not_leak_into_other_threads(tmp_path):
    """The dataset-free serving build wraps TRAINER_REGISTRY.get
    thread-locally; a concurrent build_trainer on another thread must
    get the REAL trainer class, never a serving subclass (which would
    silently train nothing — its loader stub is empty)."""
    import threading

    from clip_calibration_tpu.engine.registry import TRAINER_REGISTRY
    import clip_calibration_tpu.trainers  # noqa: F401

    real = TRAINER_REGISTRY.get("CoOp")
    seen = {}

    with TRAINER_REGISTRY.wrapped(lambda cls: ("wrapped", cls)):
        assert TRAINER_REGISTRY.get("CoOp") == ("wrapped", real)

        def other():
            seen["cls"] = TRAINER_REGISTRY.get("CoOp")

        th = threading.Thread(target=other)
        th.start()
        th.join()
    assert seen["cls"] is real                 # other thread: unwrapped
    assert TRAINER_REGISTRY.get("CoOp") is real  # restored after exit


def test_serving_config_file_controls_normalize(tmp_path):
    """A config_file reproduces the training run verbatim — including
    NOT normalizing: the serving default normalize block must only
    apply when no config_file is given (else a yaml without an INPUT
    section would serve normalized while training was ToTensor-only)."""
    from clip_calibration_tpu.serving import build_serving_trainer

    bare = tmp_path / "bare.yaml"
    bare.write_text("TRAINER:\n  COOP:\n    N_CTX: 2\n")
    t = build_serving_trainer(["a", "b"], trainer_name="CoOp",
                              backbone="ViT-Test",
                              config_file=str(bare),
                              opts=["INPUT.SIZE", "(32, 32)"])
    assert t.pixel_stats == (None, None)

    t_default = build_serving_trainer(["a", "b"], trainer_name="CoOp",
                                      backbone="ViT-Test",
                                      opts=["INPUT.SIZE", "(32, 32)"])
    mean, _ = t_default.pixel_stats
    assert mean is not None  # CLIP constants


def test_predictor_pixel_stats_knob():
    """Predictor(pixel_stats=(None, None)) serves a ToTensor-only
    model: probs must differ from the CLIP-normalized default on the
    same images."""
    from clip_calibration_tpu.serving import Predictor

    rng = np.random.default_rng(5)
    imgs = (rng.random((3, 32, 32, 3)) * 255).astype(np.uint8)
    names = ["a", "b", "c"]
    p_norm = Predictor("ViT-Test", names, precision="fp32",
                       batch_size=4)
    p_raw = Predictor("ViT-Test", names, precision="fp32",
                      batch_size=4, pixel_stats=(None, None))
    probs_n = p_norm.predict(imgs)["probs"]
    probs_r = p_raw.predict(imgs)["probs"]
    assert not np.allclose(probs_n, probs_r)


def test_predictor_device_preprocess_crop_parity():
    """preprocess_on_device with a source whose shorter side already
    equals the model resolution: the resize is identity, so the device
    center-crop must match host-side cropping exactly."""
    from clip_calibration_tpu.serving import Predictor

    rng = np.random.default_rng(11)
    wide = (rng.random((4, 32, 64, 3)) * 255).astype(np.uint8)
    left = int(round((64 - 32) / 2.0))  # data/transforms._center_crop
    cropped = wide[:, :, left:left + 32, :]

    names = ["a", "b", "c"]
    p_dev = Predictor("ViT-Test", names, precision="fp32",
                      batch_size=4, preprocess_on_device=True)
    p_host = Predictor("ViT-Test", names, precision="fp32",
                       batch_size=4)
    out_dev = p_dev.predict(wide)
    out_host = p_host.predict(cropped)
    np.testing.assert_allclose(out_dev["probs"], out_host["probs"],
                               rtol=1e-5, atol=1e-6)
    # model-res inputs keep working on the same predictor (second
    # program, same weights)
    out_same = p_dev.predict(cropped)
    np.testing.assert_allclose(out_same["probs"], out_host["probs"],
                               rtol=1e-5, atol=1e-6)


def test_device_preprocess_resize_matches_pil():
    """Device bicubic downscale tracks PIL's resampler on smooth
    images (the interpolators differ slightly at edges; ~1/255 on
    low-frequency content)."""
    from PIL import Image

    import jax.numpy as jnp

    from clip_calibration_tpu.ops.preprocess import device_preprocess

    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    smooth = (127 + 60 * np.sin(xx / 11.0) * np.cos(yy / 13.0))
    img = np.repeat(smooth[..., None], 3, axis=2).astype(np.uint8)

    ours = np.asarray(device_preprocess(
        jnp.asarray(img[None]), 32, mean=None, dtype=jnp.float32))[0]
    pil = np.asarray(Image.fromarray(img).resize(
        (32, 32), Image.BICUBIC), np.float32) / 255.0
    assert np.abs(ours - pil).max() < 0.02


def test_serve_cli_zeroshot(tmp_path):
    """python -m clip_calibration_tpu.serve end to end: directory of
    images -> one JSON line per image, with top-k and out-file modes."""
    from PIL import Image

    from clip_calibration_tpu.serve import main

    rng = np.random.default_rng(7)
    imdir = tmp_path / "imgs"
    imdir.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (48, 40, 3),
                                     dtype=np.uint8)
                        ).save(str(imdir / f"im{i}.png"))
    out = str(tmp_path / "preds.jsonl")
    rc = main(["--backbone", "ViT-Test", "--classnames", *BASE,
               "--images", str(imdir), "--out", out,
               "--precision", "fp32", "--topk", "2"])
    assert rc == 0
    rows = [json.loads(ln) for ln in open(out)]
    assert len(rows) == 3
    for row in rows:
        assert row["pred"] in BASE
        assert len(row["topk"]) == 2
        assert 0.0 <= row["confidence"] <= 1.0


def test_serve_cli_coop_checkpoint(tmp_path):
    """--coop-prompt serves a CoOp prompt checkpoint through the CLI."""
    from PIL import Image

    from clip_calibration_tpu.serve import main

    rng = np.random.default_rng(8)
    img = tmp_path / "one.png"
    Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                 dtype=np.uint8)).save(str(img))
    out = str(tmp_path / "preds.jsonl")
    rc = main(["--backbone", "ViT-Test", "--classnames", *BASE,
               "--images", str(img), "--out", out,
               "--checkpoint-dir", osp.join(FIX, "coop_model"),
               "--coop-prompt", "--precision", "fp32"])
    assert rc == 0
    rows = [json.loads(ln) for ln in open(out)]
    assert len(rows) == 1 and rows[0]["pred"] in BASE


def test_serve_cli_tempscaling_checkpoint(tmp_path):
    """main() end-to-end over a TempScaling checkpoint — the exact path
    the CLI's --temperature error message directs users to. Exercises
    the resolution lookup on a scaling trainer (clip_cfg lives on the
    wrapped base learner, exposed by delegation)."""
    import jax.numpy as jnp
    from PIL import Image

    from clip_calibration_tpu.serve import main
    from clip_calibration_tpu.serving import build_serving_trainer

    opts = ["CALIBRATION.SCALING.BASE_LEARNER", "CoOp",
            "CALIBRATION.SCALING.BASE_DIR", osp.join(FIX, "coop_model"),
            "CALIBRATION.SCALING.BASE_EPOCH", "3",
            "TRAINER.COOP.N_CTX", "4", "INPUT.SIZE", "(32, 32)",
            "MODEL.PRECISION", "fp32", "TRAINER.COOP.PREC", "fp32"]
    fitted = build_serving_trainer(BASE, trainer_name="TempScaling",
                                   backbone="ViT-Test", opts=opts)
    fitted._models["scale_learner"]["params"]["scale"] = jnp.asarray(
        np.log(2.5), jnp.float32)
    ck = str(tmp_path / "calibrated")
    fitted.save_model(0, ck)

    rng = np.random.default_rng(9)
    img = tmp_path / "one.png"
    Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                 dtype=np.uint8)).save(str(img))
    out = str(tmp_path / "preds.jsonl")
    rc = main(["--backbone", "ViT-Test", "--classnames", *BASE,
               "--images", str(img), "--out", out,
               "--checkpoint-dir", ck, "--trainer", "TempScaling",
               "--epoch", "1", "--precision", "fp32", *opts])
    assert rc == 0
    rows = [json.loads(ln) for ln in open(out)]
    assert len(rows) == 1 and rows[0]["pred"] in BASE


def test_serve_cli_trainer_path_flag_guards(tmp_path, monkeypatch):
    """Flags the trainer-checkpoint path cannot honor must fail loudly,
    and --mesh must translate into TPU.MESH_SHAPE (data-parallel serving
    through the trainer's own put_batch), not be silently dropped."""
    from clip_calibration_tpu import serve, serving

    base = ["--images", str(tmp_path), "--classnames", *BASE,
            "--checkpoint-dir", osp.join(FIX, "coop_model"),
            "--trainer", "CoOp"]
    # --temperature cannot reach a trainer build: serving untempered
    # probabilities silently would be the miscalibration bug class
    with pytest.raises(SystemExit):
        serve.build_predictor(
            serve.build_parser().parse_args(base + ["--temperature",
                                                    "2.0"]), BASE)
    # TrainerPredictor has no device-geometry path
    with pytest.raises(SystemExit):
        serve.build_predictor(
            serve.build_parser().parse_args(
                base + ["--preprocess-on-device"]), BASE)

    captured = {}

    def fake_from_checkpoint(*a, **kw):
        captured.update(kw)
        return "sentinel"

    monkeypatch.setattr(serving.TrainerPredictor, "from_checkpoint",
                        staticmethod(fake_from_checkpoint))
    monkeypatch.setattr(serve, "TrainerPredictor", serving.TrainerPredictor,
                        raising=False)
    args = serve.build_parser().parse_args(base + ["--mesh", "4,2"])
    assert serve.build_predictor(args, BASE) == "sentinel"
    opts = captured["opts"]
    assert opts[opts.index("TPU.MESH_SHAPE") + 1] == "(4, 2)"


def test_serve_host_geometry_honors_config_interpolation(tmp_path):
    """Without --config-file the host transform is bicubic (the geometry
    of every shipped yaml and the reference CLIP eval pipeline,
    clip/clip.py:74-81) — NOT the bare Dassl bilinear default; with one,
    the yaml's INPUT tree wins. Served pixels must match training-time
    eval geometry or probabilities shift between the two paths."""
    from PIL import Image

    from clip_calibration_tpu.serve import build_parser, _host_transform

    src = Image.fromarray(
        (np.mgrid[0:64, 0:48][0] * 3 % 256).astype(np.uint8)
    ).convert("RGB")

    args = build_parser().parse_args(
        ["--images", "x", "--classnames", "a"])
    got = _host_transform(args, 32)(src)
    # shorter side 48 -> 32, long side truncates to 42, center crop
    want = np.asarray(
        src.resize((32, 42), Image.BICUBIC))[5:37, :, :]
    # same resampler + geometry -> identical bytes
    assert got.shape == (32, 32, 3)
    assert np.array_equal(got, want)

    cfgf = tmp_path / "bilinear.yaml"
    cfgf.write_text("INPUT:\n  INTERPOLATION: bilinear\n")
    args2 = build_parser().parse_args(
        ["--images", "x", "--classnames", "a",
         "--config-file", str(cfgf)])
    got2 = _host_transform(args2, 32)(src)
    want2 = np.asarray(
        src.resize((32, 42), Image.BILINEAR))[5:37, :, :]
    assert np.array_equal(got2, want2)
    assert not np.array_equal(got, got2)


def test_build_serving_trainer_rejects_conflicting_cfg():
    """An explicit cfg plus trainer_name/backbone/config_file/opts must
    raise — silently ignoring the overrides would build a prompt layout
    that cannot match the checkpoint loaded next."""
    from clip_calibration_tpu.config import get_cfg_default
    from clip_calibration_tpu.serving import build_serving_trainer

    cfg = get_cfg_default()
    with pytest.raises(ValueError, match="trainer_name"):
        build_serving_trainer(BASE, trainer_name="CoOp", cfg=cfg)
    with pytest.raises(ValueError, match="opts"):
        build_serving_trainer(BASE, opts=["INPUT.SIZE", "(32, 32)"],
                              cfg=cfg)


def test_bucketed_short_batches_match_full_padding():
    """Short chunks pad to the next power-of-two bucket (lone-request
    latency: a 1-image request costs a 1-image encode, not a
    batch_size one) — results identical to full padding for every
    ragged N."""
    from clip_calibration_tpu.serving import Predictor

    images, _ = _test_images({0, 1, 2, 3})
    pred = Predictor("ViT-Test", CLASSNAMES, precision="fp32",
                     batch_size=8)
    full = pred.predict(images)
    for n in (1, 3, 5, 8, 11):
        if n > len(images):
            break
        out = pred.predict(images[:n])
        np.testing.assert_array_equal(out["preds"], full["preds"][:n])
        np.testing.assert_allclose(out["probs"], full["probs"][:n],
                                   rtol=0, atol=1e-6)
