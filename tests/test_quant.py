"""Weight-only int8 serving quantization (ops/quant.py).

Beyond-reference feature (the reference serves fp16 at best —
``clip/model.py:632-653``), so there is no oracle; these are property
and behavioral gates instead: exact quantization error bounds, pytree
hygiene, and end-to-end prediction agreement on the golden fixture
backbone.
"""

import json
import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
FIX = osp.join(REPO, "tests", "fixtures", "golden_e2e")

CLASSNAMES = ["amber", "basalt", "cobalt", "dune"]


@pytest.fixture(autouse=True)
def _fixture_weights(monkeypatch):
    monkeypatch.setenv("CLIP_CHECKPOINT_DIR", osp.join(FIX, "weights"))


def test_quantize_int8_error_bound():
    """Per-element dequant error is bounded by scale/2 (symmetric
    round-to-nearest over 127 steps), with exact zero columns."""
    from clip_calibration_tpu.ops.quant import dequantize, quantize_int8
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    w = rng.normal(size=(3, 16, 8)).astype(np.float32) * \
        rng.uniform(0.1, 10, size=(3, 1, 8)).astype(np.float32)
    w[:, :, 2] = 0.0  # all-zero output channel
    q = quantize_int8(jnp.asarray(w))
    assert q["int8"].dtype == jnp.int8
    assert q["scale"].shape == (3, 1, 8)
    deq = np.asarray(dequantize(q, jnp.float32))
    bound = np.asarray(q["scale"]) / 2 + 1e-7
    assert (np.abs(deq - w) <= bound).all()
    np.testing.assert_array_equal(deq[:, :, 2], 0.0)
    # max-magnitude elements are exactly representable (|q| = 127)
    flat_max = np.abs(w).max(axis=1)
    got_max = np.abs(deq).max(axis=1)
    np.testing.assert_allclose(got_max, flat_max, rtol=1e-5)


def test_quantize_clip_params_structure():
    """Vision matmul weights become int8 pairs; LN/embeddings/biases/
    text tower/logit_scale stay untouched (same arrays, not copies)."""
    import jax
    import jax.numpy as jnp
    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.ops.quant import (is_quantized,
                                                quantize_clip_params)

    cfg = M.PRESETS["ViT-Test"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg)
    qp = quantize_clip_params(params)

    v = qp["visual"]
    for leaf in (v["patch_kernel"], v["proj"],
                 v["blocks"]["attn"]["wqkv"], v["blocks"]["attn"]["wo"],
                 v["blocks"]["mlp"]["w_fc"],
                 v["blocks"]["mlp"]["w_proj"]):
        assert is_quantized(leaf)
        assert leaf["int8"].dtype == jnp.int8
    # stacked scales keep the layer axis so lax.scan slices in lock-step
    L = cfg.vision_layers
    assert v["blocks"]["attn"]["wqkv"]["scale"].shape[0] == L
    # untouched leaves are the SAME objects (no silent copies)
    assert v["class_embedding"] is params["visual"]["class_embedding"]
    assert v["ln_pre"] is params["visual"]["ln_pre"]
    assert v["blocks"]["attn"]["bqkv"] is \
        params["visual"]["blocks"]["attn"]["bqkv"]
    assert qp["text"] is params["text"]
    assert qp["logit_scale"] is params["logit_scale"]
    # the input pytree was not mutated
    assert not is_quantized(params["visual"]["patch_kernel"])


def test_qdot_modes_match_reference_matmul():
    """qdot: plain arrays take the exact dot; int8 pairs track the fp32
    product within quantization noise in BOTH execution modes (weight-
    only dequant and the int8 x int8 'w8a8' path)."""
    import jax.numpy as jnp
    from clip_calibration_tpu.ops.quant import qdot, quantize_int8

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(5, 7, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 12)).astype(np.float32))
    ref = np.asarray(x) @ np.asarray(w)
    np.testing.assert_allclose(np.asarray(qdot(x, w)), ref, rtol=1e-5,
                               atol=1e-5)
    pair = quantize_int8(w)
    for mode in ("dequant", "w8a8"):
        got = np.asarray(qdot(x, pair, mode))
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 0.02, (mode, rel)


@pytest.mark.parametrize("mode", ["dequant", "w8a8"])
def test_quantized_encode_matches_full_precision(mode):
    """encode_image over int8 weights tracks the fp32 path closely
    (cosine similarity of the pooled features), in both execution
    modes."""
    import jax
    import jax.numpy as jnp
    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.models.backbone import load_clip_backbone
    from clip_calibration_tpu.ops.quant import quantize_clip_params

    params, cfg = load_clip_backbone("ViT-Test", "float32")
    qp = quantize_clip_params(params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3),
                           jnp.float32, -1, 1)
    full = np.asarray(M.normalize(
        M.encode_image(params, cfg, x, dtype=jnp.float32)))
    quant = np.asarray(M.normalize(
        M.encode_image(qp, cfg, x, dtype=jnp.float32, qmode=mode)))
    cos = (full * quant).sum(axis=-1)
    assert cos.min() > 0.999


def test_attach_act_scales_structure_and_static_qdot():
    """Static activation scales: attach_act_scales puts a [L] act_scale
    on every stacked block weight (lax.scan slices it in lock-step with
    the int8/scale leaves) and a scalar on the unstacked stem/head
    weights; qdot's static branch then matches the reference product
    within quantization noise with NO per-row reduce."""
    import jax
    import jax.numpy as jnp
    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.ops.preprocess import normalize_images
    from clip_calibration_tpu.ops.quant import (
        attach_act_scales, calibrate_image_act_scales, qdot,
        quantize_clip_params, quantize_int8)

    cfg = M.PRESETS["ViT-Test"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg)
    qp = quantize_clip_params(params)
    imgs = (jax.random.uniform(jax.random.PRNGKey(2),
                               (4, 32, 32, 3)) * 255).astype(jnp.uint8)
    stats = calibrate_image_act_scales(qp, cfg, normalize_images(imgs))
    qps = attach_act_scales(qp, stats)

    L = cfg.vision_layers
    v = qps["visual"]
    assert v["blocks"]["attn"]["wqkv"]["act_scale"].shape == (L,)
    assert v["blocks"]["mlp"]["w_proj"]["act_scale"].shape == (L,)
    assert v["patch_kernel"]["act_scale"].shape == ()
    assert v["proj"]["act_scale"].shape == ()
    # the non-static pytree is untouched
    assert "act_scale" not in qp["visual"]["patch_kernel"]

    # unit: static vs manual computation at a known scale
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(6, 16)).astype(np.float32))
    pair = quantize_int8(jnp.asarray(
        rng.normal(size=(16, 12)).astype(np.float32)))
    amax = float(np.abs(np.asarray(x)).max())
    spair = dict(pair, act_scale=jnp.float32(amax / 127.0))
    ref = np.asarray(x) @ (np.asarray(pair["int8"], np.float32)
                           * np.asarray(pair["scale"]))
    got = np.asarray(qdot(x, spair, "w8a8"))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel


def test_static_w8a8_encode_matches_full_precision():
    """encode_image with calibrated static act scales tracks the fp32
    path as closely as the dynamic w8a8 path does (cosine > 0.999 on
    the fixture backbone) — the speed lever costs no extra accuracy
    when the calibration batch covers the serving distribution."""
    import jax
    import jax.numpy as jnp
    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.models.backbone import load_clip_backbone
    from clip_calibration_tpu.ops.quant import (
        attach_act_scales, calibrate_image_act_scales,
        quantize_clip_params)

    params, cfg = load_clip_backbone("ViT-Test", "float32")
    qp = quantize_clip_params(params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3),
                           jnp.float32, -1, 1)
    qps = attach_act_scales(qp, calibrate_image_act_scales(qp, cfg, x))
    full = np.asarray(M.normalize(
        M.encode_image(params, cfg, x, dtype=jnp.float32)))
    quant = np.asarray(M.normalize(
        M.encode_image(qps, cfg, x, dtype=jnp.float32, qmode="w8a8")))
    cos = (full * quant).sum(axis=-1)
    assert cos.min() > 0.999


def test_resnet_quantization_rejected():
    import jax
    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.ops.quant import quantize_clip_params

    params = M.init_clip(jax.random.PRNGKey(0), M.PRESETS["RN-Test"])
    with pytest.raises(ValueError, match="ViT"):
        quantize_clip_params(params)


from helpers import golden_test_images as _test_images  # noqa: E402


@pytest.mark.parametrize("mode", ["int8", "w8a8"])
def test_quantized_predictor_agrees_with_full(mode):
    """Predictor(quantize=...) predictions agree with the
    unquantized Predictor on the golden fixture backbone — same top-1
    on every image, probabilities within quantization noise — in both
    the weight-only and the full-int8-matmul modes."""
    from clip_calibration_tpu.serving import Predictor

    images, _ = _test_images({0, 1, 2, 3})
    full = Predictor("ViT-Test", CLASSNAMES, precision="fp32",
                     batch_size=8)
    quant = Predictor("ViT-Test", CLASSNAMES, precision="fp32",
                      batch_size=8, quantize=mode)
    assert quant.quantize == mode
    out_f = full.predict(images)
    out_q = quant.predict(images)
    assert (out_f["preds"] == out_q["preds"]).all()
    np.testing.assert_allclose(out_q["probs"], out_f["probs"], atol=0.02)
    # the calibration knobs ride on top unchanged
    conf = np.asarray([1.2, 0.8, 1.0, 1.1], np.float32)
    out_qc = Predictor("ViT-Test", CLASSNAMES, precision="fp32",
                       batch_size=8, quantize="int8",
                       class_confidence=conf,
                       temperature=50.0).predict(images)
    np.testing.assert_allclose(out_qc["probs"].sum(1), 1.0, atol=1e-5)


def test_quantize_rejects_unknown_mode():
    from clip_calibration_tpu.serving import Predictor

    with pytest.raises(ValueError, match="quantize"):
        Predictor("ViT-Test", CLASSNAMES, quantize="int4")


def test_quantized_prompt_checkpoint_predictor():
    """from_prompt_checkpoint(quantize='int8'): the prompt text encode
    runs BEFORE quantization touches nothing it needs (text tower stays
    full precision), so the tuned predictor agrees with its
    unquantized twin."""
    from clip_calibration_tpu.serving import Predictor

    ckpt = osp.join(FIX, "coop_model")
    images, _ = _test_images({0, 1})
    base = ["amber", "basalt"]
    full = Predictor.from_prompt_checkpoint(
        "ViT-Test", base, ckpt, n_ctx=4, precision="fp32", batch_size=8)
    quant = Predictor.from_prompt_checkpoint(
        "ViT-Test", base, ckpt, n_ctx=4, precision="fp32", batch_size=8,
        quantize="int8")
    # tuned text features are bit-identical: only the vision tower
    # quantizes, and it is not involved in the prompt encode
    np.testing.assert_array_equal(np.asarray(full.text_features),
                                  np.asarray(quant.text_features))
    out_f = full.predict(images)
    out_q = quant.predict(images)
    assert (out_f["preds"] == out_q["preds"]).all()
    np.testing.assert_allclose(out_q["probs"], out_f["probs"], atol=0.02)


def test_serve_cli_quantize(tmp_path):
    """--quantize int8 through the serving CLI: zero-shot path serves,
    trainer-checkpoint path is rejected (eval parity stays exact)."""
    import json as _json

    from PIL import Image

    from clip_calibration_tpu.serve import main

    rng = np.random.default_rng(11)
    img = tmp_path / "one.png"
    Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                 dtype=np.uint8)).save(str(img))
    out = str(tmp_path / "preds.jsonl")
    rc = main(["--backbone", "ViT-Test", "--classnames", *CLASSNAMES,
               "--images", str(img), "--out", out,
               "--precision", "fp32", "--quantize", "int8"])
    assert rc == 0
    rows = [_json.loads(ln) for ln in open(out)]
    assert len(rows) == 1 and rows[0]["pred"] in CLASSNAMES

    with pytest.raises(SystemExit, match="quantize"):
        main(["--backbone", "ViT-Test", "--classnames", *CLASSNAMES,
              "--images", str(img), "--trainer", "ZeroshotCLIP",
              "--checkpoint-dir", str(tmp_path), "--quantize", "int8"])


@pytest.mark.parametrize("mode", ["int8", "w8a8"])
def test_quantized_sharded_serving_matches_single(mode):
    """Quantization composes with SPMD + tensor-parallel serving:
    int8 leaves replicate over the mesh, dequant (or the int8 x int8
    dot + rescale, 'w8a8') happens inside the partitioned program,
    results match the single-device quantized path exactly."""
    import jax

    from clip_calibration_tpu.parallel.mesh import make_mesh
    from clip_calibration_tpu.serving import Predictor

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    mesh = make_mesh((4, 2), ("data", "model"))

    images, _ = _test_images({0, 1})
    single = Predictor("ViT-Test", CLASSNAMES[:2], precision="fp32",
                       batch_size=8, quantize=mode)
    sharded = Predictor("ViT-Test", CLASSNAMES[:2], precision="fp32",
                        batch_size=8, quantize=mode, mesh=mesh)
    out_s = single.predict(images)
    out_m = sharded.predict(images)
    np.testing.assert_allclose(out_m["probs"], out_s["probs"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(out_m["preds"], out_s["preds"])


def test_qdot_w8a8_kernel_cpu_fallback():
    """qmode='w8a8_kernel' == 'w8a8' off-TPU (the kernel path engages
    on the TPU backend only — compiled pallas is TPU-only; mirrors
    ops/attention's backend dispatch). Bit-equality, not closeness:
    the fallback IS the w8a8 branch."""
    import jax.numpy as jnp

    from clip_calibration_tpu.ops.quant import qdot, quantize_int8

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(16, 96)).astype(np.float32))
    wq = quantize_int8(jnp.asarray(
        rng.normal(size=(96, 80)).astype(np.float32)))
    np.testing.assert_array_equal(
        np.asarray(qdot(x, wq, qmode="w8a8_kernel")),
        np.asarray(qdot(x, wq, qmode="w8a8")))


def test_predictor_w8a8_kernel_mode_removed():
    """quantize='w8a8_kernel' was demoted from the serving surface in
    round 5 (the Mosaic kernel measured strictly slower than XLA's
    int8 dot at every serving shape — docs/ROOFLINE.md); the Predictor
    rejects it with a pointer to the benchmarks-only qdot path."""
    from clip_calibration_tpu.serving import Predictor

    with pytest.raises(ValueError, match="no longer a serving mode"):
        Predictor("ViT-Test", CLASSNAMES[:2], quantize="w8a8_kernel")


def test_predictor_static_w8a8_calibration_images():
    """Predictor(quantize='w8a8', calibration_images=...) attaches
    static activation scales and still agrees with dynamic w8a8 on
    well-separated test images; calibration_images with any other
    quantize mode is rejected."""
    from clip_calibration_tpu.serving import Predictor

    images, labels = _test_images({0, 1})
    cal = images  # representative = the same distribution
    a = Predictor("ViT-Test", CLASSNAMES[:2], precision="fp32",
                  batch_size=8, quantize="w8a8")
    b = Predictor("ViT-Test", CLASSNAMES[:2], precision="fp32",
                  batch_size=8, quantize="w8a8",
                  calibration_images=cal)
    assert "act_scale" in b.params["visual"]["patch_kernel"]
    assert "act_scale" not in a.params["visual"]["patch_kernel"]
    out_a, out_b = a.predict(images), b.predict(images)
    np.testing.assert_array_equal(out_a["preds"], out_b["preds"])
    np.testing.assert_allclose(out_a["probs"], out_b["probs"],
                               atol=0.05)
    with pytest.raises(ValueError, match="calibration_images"):
        Predictor("ViT-Test", CLASSNAMES[:2], quantize="int8",
                  calibration_images=cal)


def test_act_scales_roundtrip_predictor(tmp_path):
    """save_act_stats/load_act_stats + Predictor(act_scales=path):
    a predictor rebuilt from persisted stats is BITWISE identical to
    the one that calibrated live — the deployment path that avoids
    shipping calibration images to serving hosts."""
    from clip_calibration_tpu.ops.quant import (load_act_stats,
                                                save_act_stats)
    from clip_calibration_tpu.serving import Predictor

    images, _ = _test_images({0, 1})
    live = Predictor("ViT-Test", CLASSNAMES[:2], precision="fp32",
                     batch_size=8, quantize="w8a8",
                     calibration_images=images)
    path = str(tmp_path / "scales.npz")
    save_act_stats(path, live.act_stats)
    loaded = load_act_stats(path)
    assert set(loaded) == {"patch_kernel", "proj", "blocks"}
    replay = Predictor("ViT-Test", CLASSNAMES[:2], precision="fp32",
                       batch_size=8, quantize="w8a8", act_scales=path)
    out_a, out_b = live.predict(images), replay.predict(images)
    np.testing.assert_array_equal(out_a["probs"], out_b["probs"])
    # guards: act_scales needs w8a8; both sources at once is ambiguous
    with pytest.raises(ValueError, match="act_scales"):
        Predictor("ViT-Test", CLASSNAMES[:2], quantize="int8",
                  act_scales=path)
    with pytest.raises(ValueError, match="not both"):
        Predictor("ViT-Test", CLASSNAMES[:2], quantize="w8a8",
                  act_scales=path, calibration_images=images)
    # a non-scale npz is rejected with a pointer at the writer
    import numpy as onp
    bad = str(tmp_path / "bad.npz")
    onp.savez(bad, foo=onp.zeros(3))
    with pytest.raises(ValueError, match="save_act_stats"):
        Predictor("ViT-Test", CLASSNAMES[:2], quantize="w8a8",
                  act_scales=bad)


def test_qdot_w8a8_dynamic_ignores_act_scale():
    """qmode='w8a8_dynamic' forces the per-row activation path even
    when the pair carries a static act_scale — bitwise-equal to the
    dynamic path on the scale-free pair (the serving predictor traces
    this for the 1-row bucket; docs/PERFORMANCE.md crossover)."""
    import jax.numpy as jnp
    from clip_calibration_tpu.ops.quant import qdot, quantize_int8

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
    pair = quantize_int8(jnp.asarray(
        rng.normal(size=(16, 12)).astype(np.float32)))
    spair = dict(pair, act_scale=jnp.float32(0.5))  # wrong on purpose
    dyn = np.asarray(qdot(x, pair, "w8a8"))
    forced = np.asarray(qdot(x, spair, "w8a8_dynamic"))
    np.testing.assert_array_equal(dyn, forced)
    # sanity: the static path DOES consume the (wrong) scale
    static = np.asarray(qdot(x, spair, "w8a8"))
    assert np.abs(static - dyn).max() > 0


def test_calibrated_eval_pipeline_static_w8a8_agrees():
    """The full calibrated-eval pipeline (uint8 normalize + encode +
    fused DAC scoring — the per-batch device program of the reference's
    ``base_learner.py:59-152`` and the ``eval_pipeline_w8a8`` bench key)
    over a static-calibrated int8 backbone agrees with the fp32
    pipeline: same argmax class per image, probabilities within
    quantization noise."""
    import jax
    import jax.numpy as jnp
    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.models.backbone import load_clip_backbone
    from clip_calibration_tpu.ops.preprocess import normalize_images
    from clip_calibration_tpu.ops.quant import (
        attach_act_scales, calibrate_image_act_scales,
        quantize_clip_params)
    from clip_calibration_tpu.ops.scoring import fused_dac_scores

    params, cfg = load_clip_backbone("ViT-Test", "float32")
    images, _ = _test_images({0, 1, 2, 3})
    x = normalize_images(jnp.asarray(images))
    qp = quantize_clip_params(params)
    sp = attach_act_scales(qp, calibrate_image_act_scales(qp, cfg, x))
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    txt = M.normalize(jax.random.normal(
        k1, (len(CLASSNAMES), cfg.embed_dim), jnp.float32))
    conf = jax.random.uniform(k2, (len(CLASSNAMES),), jnp.float32,
                              0.8, 1.2)

    def pipeline(p, qmode):
        img_f = M.normalize(M.encode_image(p, cfg, x, dtype=jnp.float32,
                                           qmode=qmode))
        probs, _ = fused_dac_scores(img_f, txt, params["logit_scale"],
                                    conf, normalized=True)
        return np.asarray(probs)

    full = pipeline(params, "dequant")
    quant = pipeline(sp, "w8a8")
    np.testing.assert_array_equal(full.argmax(1), quant.argmax(1))
    np.testing.assert_allclose(quant, full, atol=0.02)


def test_static_w8a8_b1_bucket_uses_dynamic_epilogue():
    """A static-calibrated predictor serving a single image (the 1-row
    bucket) traces the dynamic per-row epilogue: its outputs are
    bitwise-identical to an uncalibrated dynamic-w8a8 predictor at
    that bucket, while any batch >= 2 runs the static scales
    (docs/PERFORMANCE.md: b1 is the one regime where static loses)."""
    from clip_calibration_tpu.serving import Predictor

    images, _ = _test_images({0, 1})
    a = Predictor("ViT-Test", CLASSNAMES[:2], precision="fp32",
                  batch_size=8, quantize="w8a8")
    b = Predictor("ViT-Test", CLASSNAMES[:2], precision="fp32",
                  batch_size=8, quantize="w8a8",
                  calibration_images=images)
    np.testing.assert_array_equal(a.predict(images[:1])["probs"],
                                  b.predict(images[:1])["probs"])
