"""Multi-chip SPMD tests on the virtual 8-device CPU mesh."""

import sys
import os.path as osp

import jax
import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    from clip_calibration_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    mesh = make_mesh((4, 2))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh((3, 2))


def test_dryrun_multichip_executes():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_vs_single_device_same_loss():
    """The sharded train step must compute the same loss as unsharded."""
    import __graft_entry__ as g
    import optax
    import jax.numpy as jnp
    ccfg, params, ctx, embedding, eot_pos, images, labels = g._setup(
        "ViT-Test", n_cls=8, batch=8, n_ctx=2)
    loss_single = jax.jit(
        lambda *a: g._loss_fn(*a, ccfg, 2))(
        ctx, params, embedding, eot_pos, images, labels)

    from clip_calibration_tpu.parallel.mesh import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh((4, 2))
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    cls_sh = NamedSharding(mesh, P("model"))
    f = jax.jit(lambda *a: g._loss_fn(*a, ccfg, 2),
                in_shardings=(repl, repl, cls_sh, cls_sh, data_sh,
                              data_sh))
    with mesh:
        loss_sharded = f(jax.device_put(ctx, repl),
                         jax.device_put(params, repl),
                         jax.device_put(embedding, cls_sh),
                         jax.device_put(eot_pos, cls_sh),
                         jax.device_put(images, data_sh),
                         jax.device_put(labels, data_sh))
    np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                               rtol=2e-5)


def test_mesh_from_cfg():
    from clip_calibration_tpu.config import get_cfg_default
    from clip_calibration_tpu.parallel.mesh import mesh_from_cfg
    cfg = get_cfg_default()
    cfg.TPU.MESH_SHAPE = (4, 2)
    mesh = mesh_from_cfg(cfg)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "model": 2}


def test_trainer_data_parallel_matches_single_device(tmp_path):
    """A CoOp trainer on the 8-device mesh (batches sharded over the data
    axis via put_batch) must produce the same losses and inference logits
    as the single-device path."""
    from clip_calibration_tpu.config import get_cfg_default
    from clip_calibration_tpu.data.base import set_random_seed
    from clip_calibration_tpu.engine.registry import TRAINER_REGISTRY
    import clip_calibration_tpu.trainers  # noqa: F401
    import clip_calibration_tpu.data.datasets  # noqa: F401
    import clip_calibration_tpu.evaluators.vl_evaluator  # noqa: F401

    def build():
        cfg = get_cfg_default()
        cfg.DATASET.ROOT = str(tmp_path / "data")
        cfg.DATASET.NAME = "Synthetic"
        cfg.DATASET.NUM_SHOTS = 4
        cfg.DATASET.SUBSAMPLE_CLASSES = "base"
        cfg.SEED = 1
        cfg.MODEL.BACKBONE.NAME = "ViT-Test"
        cfg.INPUT.SIZE = (32, 32)
        cfg.INPUT.INTERPOLATION = "bicubic"
        cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8   # divisible by 8 devices
        cfg.DATALOADER.TEST.BATCH_SIZE = 16
        cfg.TEST.EVALUATOR = "VLClassification"
        cfg.OPTIM.NAME = "sgd"
        cfg.OPTIM.LR = 0.02
        cfg.TRAINER.NAME = "CoOp"
        cfg.TRAINER.COOP.N_CTX = 4
        set_random_seed(1)
        return TRAINER_REGISTRY.get("CoOp")(cfg)

    t_mesh = build()
    assert t_mesh.mesh is not None  # 8 virtual devices active

    t_single = build()
    t_single._mesh = None  # force single-device path

    batch = next(iter(t_mesh.train_loader_x))
    loss_m = float(t_mesh.forward_backward(batch)["loss"])
    loss_s = float(t_single.forward_backward(batch)["loss"])
    assert loss_m == pytest.approx(loss_s, rel=2e-5)

    logits_m, _, _ = t_mesh.model_inference(batch["img"])
    logits_s, _, _ = t_single.model_inference(batch["img"])
    np.testing.assert_allclose(np.asarray(logits_m),
                               np.asarray(logits_s), rtol=2e-4, atol=2e-4)


def _build_trainer(name, tmp_path, mesh_shape, **tcfg):
    """Real trainer on the synthetic dataset; mesh_shape=None forces the
    single-device path."""
    from helpers import build_synthetic_trainer

    trainer = build_synthetic_trainer(
        name, tmp_path / "data", mesh_shape=mesh_shape,
        trainer_cfg=tcfg,
        overrides={
            "DATASET.SUBSAMPLE_CLASSES": "base",
            "INPUT.INTERPOLATION": "bicubic",
            "DATALOADER.TRAIN_X.BATCH_SIZE": 8,  # divides the data axis
            "DATALOADER.TEST.BATCH_SIZE": 16,
            "OPTIM.NAME": "sgd",
            "OPTIM.LR": 0.02,
        })
    if mesh_shape is None:
        trainer._mesh = None  # force single-device path
        # rebuild steps so the fan-out constraint reflects the mesh
        if hasattr(trainer, "_build_steps"):
            trainer._build_steps()
    return trainer


def _assert_sharded_matches_single(name, tmp_path, **tcfg):
    """One REAL forward_backward step + model_inference on the (4, 2)
    mesh (class fan-out sharded over the model axis) must match the
    single-device run (VERDICT r2 item 1)."""
    t_mesh = _build_trainer(name, tmp_path, (4, 2), **tcfg)
    assert t_mesh._fanout is not None  # the class sharding is ACTIVE
    t_single = _build_trainer(name, tmp_path, None, **tcfg)
    assert t_single._fanout is None

    batch = next(iter(t_mesh.train_loader_x))
    loss_m = float(t_mesh.forward_backward(batch)["loss"])
    loss_s = float(t_single.forward_backward(batch)["loss"])
    assert loss_m == pytest.approx(loss_s, rel=2e-5)

    logits_m, _, _ = t_mesh.model_inference(batch["img"])
    logits_s, _, _ = t_single.model_inference(batch["img"])
    np.testing.assert_allclose(np.asarray(logits_m),
                               np.asarray(logits_s), rtol=2e-4, atol=2e-4)
    return t_mesh, t_single


def test_cocoop_class_sharded_matches_single_device(tmp_path):
    """CoCoOp's chunked per-image text fan-out, images over 'data' x
    classes over 'model' (reference cocoop.py:193-199; SURVEY §5.8)."""
    _assert_sharded_matches_single("CoCoOp", tmp_path, N_CTX=2, PREC="fp32")


def test_proda_class_sharded_matches_single_device(tmp_path):
    """ProDA's n_cls x P prompt fan-out, class axis over 'model'
    (reference proda.py:163; SURVEY §5.8), including the eval-time
    set_classifier sweep."""
    t_mesh, t_single = _assert_sharded_matches_single(
        "ProDA", tmp_path, N_CTX=2, N_PROMPT=4, PROMPT_BS=2, PREC="fp32")
    t_mesh.set_classifier()
    t_single.set_classifier()
    np.testing.assert_allclose(np.asarray(t_mesh.text_features),
                               np.asarray(t_single.text_features),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Tensor-parallel tower (parallel/tp.py)
# ---------------------------------------------------------------------------

def _tp_cfg():
    # 2 vision heads (width 128) / 4 text heads: the (4, 2) mesh divides
    # both exactly; the (1, 8) mesh oversubscribes them, so that case
    # additionally exercises GSPMD's padded (uneven) head sharding —
    # both must be numerically inert
    from clip_calibration_tpu.models import clip as M
    return M.CLIPConfig(32, 32, 2, 128, 8, 64, 4, 2)


def test_tower_tp_gating():
    """tower_tp returns None unless the mesh has a model axis > 1 (the
    DP-only path must not pay constraint tracing)."""
    from clip_calibration_tpu.parallel.mesh import make_mesh
    from clip_calibration_tpu.parallel.tp import tower_tp
    assert tower_tp(None) is None
    assert tower_tp(make_mesh((8, 1))) is None
    tp = tower_tp(make_mesh((4, 2)))
    assert tp is not None and tp.batch_axis == "data"
    assert tower_tp(make_mesh((1, 8))).batch_axis is None


@pytest.mark.parametrize("mesh_shape", [(1, 8), (4, 2)],
                         ids=["pure-tp", "dp-x-tp"])
def test_tensor_parallel_encode_matches_single_device(mesh_shape):
    """TP towers (heads/hidden over 'model', parallel/tp.py) must be
    numerically equal to the unsharded fp32 program: head-parallel
    attention partitions an embarrassingly parallel axis and the two
    per-layer psums sum the same partial products."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.parallel.mesh import make_mesh
    from clip_calibration_tpu.parallel.tp import tower_tp

    cfg = _tp_cfg()
    params = M.init_clip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)
    toks = np.zeros((8, 77), np.int64)
    for i in range(8):
        k = int(rng.integers(3, 20))
        toks[i, 0] = cfg.vocab_size - 2
        toks[i, 1:1 + k] = rng.integers(1, cfg.vocab_size - 2, k)
        toks[i, 1 + k] = cfg.vocab_size - 1
    toks = jnp.asarray(toks)

    img_single = jax.jit(lambda p, x: M.encode_image(
        p, cfg, x, dtype=jnp.float32))(params, imgs)
    txt_single = jax.jit(lambda p, t: M.encode_text(
        p, cfg, t, dtype=jnp.float32))(params, toks)

    mesh = make_mesh(mesh_shape)
    tp = tower_tp(mesh)
    assert tp is not None
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    p_sh = jax.device_put(params, repl)
    img_tp = jax.jit(
        lambda p, x: M.encode_image(p, cfg, x, dtype=jnp.float32, tp=tp),
        in_shardings=(repl, data_sh), out_shardings=repl)(
        p_sh, jax.device_put(imgs, data_sh))
    txt_tp = jax.jit(
        lambda p, t: M.encode_text(p, cfg, t, dtype=jnp.float32, tp=tp),
        in_shardings=(repl, data_sh), out_shardings=repl)(
        p_sh, jax.device_put(toks, data_sh))

    np.testing.assert_allclose(np.asarray(img_tp), np.asarray(img_single),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(txt_tp), np.asarray(txt_single),
                               rtol=2e-5, atol=2e-5)


def test_tensor_parallel_rejects_resnet():
    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.parallel.mesh import make_mesh
    from clip_calibration_tpu.parallel.tp import tower_tp
    import jax.numpy as jnp
    cfg = M.PRESETS["RN-Test"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tp = tower_tp(make_mesh((1, 8)))
    with pytest.raises(ValueError, match="data-parallel"):
        M.encode_image(params, cfg,
                       jnp.zeros((2, 32, 32, 3), jnp.float32), tp=tp)


def test_serving_predictor_tensor_parallel(tmp_path, monkeypatch):
    """Predictor on a (2, 4) mesh: batch over 'data', ViT tower heads/
    hidden over 'model' — probabilities must match the meshless
    predictor exactly (fp32)."""
    from clip_calibration_tpu.parallel.mesh import make_mesh
    from clip_calibration_tpu.serving import Predictor

    fixdir = osp.join(osp.dirname(__file__), "fixtures", "golden_e2e",
                      "weights")
    if not osp.isdir(fixdir):
        pytest.skip("golden_e2e fixture not generated")
    monkeypatch.setenv("CLIP_CHECKPOINT_DIR", fixdir)

    classes = ["cat", "dog", "pelican"]
    rng = np.random.default_rng(11)
    images = rng.integers(0, 256, (10, 32, 32, 3), dtype=np.uint8)

    plain = Predictor("ViT-Test", classes, precision="fp32",
                      batch_size=8)
    tp = Predictor("ViT-Test", classes, precision="fp32", batch_size=8,
                   mesh=make_mesh((2, 4)))
    out_plain = plain.predict(images)
    out_tp = tp.predict(images)
    np.testing.assert_allclose(out_tp["probs"], out_plain["probs"],
                               rtol=2e-5, atol=2e-5)
    assert (out_tp["preds"] == out_plain["preds"]).all()


def test_serving_predictor_rejects_resnet_tp(tmp_path, monkeypatch):
    """ResNet + model-axis mesh must fail at CONSTRUCTION (a deployment
    misconfiguration should not pass startup and die on first request)."""
    from clip_calibration_tpu.parallel.mesh import make_mesh
    from clip_calibration_tpu.serving import Predictor
    with pytest.raises(ValueError, match="data-only"):
        Predictor("RN-Test", ["a", "b"], precision="fp32",
                  mesh=make_mesh((1, 8)))
