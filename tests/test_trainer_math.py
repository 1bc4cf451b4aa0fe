"""Pure-math checks for trainer-specific loss mechanics against literal
numpy transcriptions of the reference torch equations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_proda_covariance_correction(rng):
    """ProDA's covariance-corrected logits (reference proda.py:283-292):
    cov[d,i,k] = sum_p c[i,p,d] c[k,p,d] / (P+1);
    refined = einsum(img^2, cov); sigma via label/diag cross terms."""
    n_cls, P, E, B = 5, 6, 8, 4
    tf = rng.normal(size=(n_cls, P, E)).astype(np.float32)
    img = rng.normal(size=(B, E)).astype(np.float32)
    labels = rng.integers(0, n_cls, B)
    scale = 2.5

    # literal numpy transcription of the torch code
    text_mean = tf.mean(axis=1)
    logits_np = scale * img @ text_mean.T
    centered = tf - text_mean[:, None]
    cov = np.einsum("ipd,kpd->dik", centered, centered) / (P + 1)
    refined = np.einsum("bd,dik->bik", img ** 2, cov)
    b = np.arange(B)
    diag = refined[:, np.arange(n_cls), np.arange(n_cls)]
    sigma = (refined[b, labels, labels][:, None] + diag
             - 2 * refined[b, labels, :])
    want = logits_np + 0.5 * scale ** 2 * sigma

    # the reassociated jax expression used inside ProDA's loss: only the
    # diagonal and the label row of `refined` are computed, so the
    # [E, n_cls, n_cls] covariance never materializes (proda.py loss_fn)
    tf_j = jnp.asarray(tf)
    text_mean_j = tf_j.mean(axis=1)
    logits_j = scale * jnp.asarray(img) @ text_mean_j.T
    centered_j = tf_j - text_mean_j[:, None]
    lj = jnp.asarray(labels)
    img2_j = jnp.asarray(img) ** 2
    diag_j = jnp.dot(img2_j, jnp.sum(centered_j ** 2, axis=1).T) / (P + 1)
    cl_j = centered_j[lj]
    row_j = jnp.einsum("bpd,kpd->bk", img2_j[:, None] * cl_j,
                       centered_j) / (P + 1)
    row_ll_j = jnp.take_along_axis(row_j, lj[:, None], axis=1)
    sigma_j = row_ll_j + diag_j - 2 * row_j
    got = logits_j + 0.5 * scale ** 2 * sigma_j

    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)


def test_prograd_projection_matches_reference_rule(rng):
    """Per-tensor rule (reference prograd.py:396-405): project only when
    normalized gradients conflict; projection uses the unnormalized CE
    grad dotted with the normalized KL direction."""
    from clip_calibration_tpu.trainers.prograd import prograd_project

    g_ce = {"a": rng.normal(size=(4, 3)).astype(np.float32),
            "b": rng.normal(size=(5,)).astype(np.float32)}
    # force conflict on "a" (opposite direction), agreement on "b"
    g_kl = {"a": (-g_ce["a"] + rng.normal(size=(4, 3)) * 0.1
                  ).astype(np.float32),
            "b": (g_ce["b"] + rng.normal(size=(5,)) * 0.1
                  ).astype(np.float32)}
    lam = 0.7

    out = prograd_project(jax.tree.map(jnp.asarray, g_ce),
                          jax.tree.map(jnp.asarray, g_kl), lam)

    for key in ("a", "b"):
        a, bgrad = g_ce[key], g_kl[key]
        b_hat = bgrad / np.linalg.norm(bgrad)
        a_hat = a / np.linalg.norm(a)
        if np.vdot(a_hat, b_hat) < 0:
            want = a - lam * np.vdot(a, b_hat) * b_hat
        else:
            want = a
        np.testing.assert_allclose(np.asarray(out[key]), want, rtol=1e-5,
                                   atol=1e-6)
    # sanity: "a" projected (changed), "b" untouched
    assert not np.allclose(np.asarray(out["a"]), g_ce["a"])
    np.testing.assert_allclose(np.asarray(out["b"]), g_ce["b"])


def test_promptsrc_gpa_weights_sum_to_one():
    from clip_calibration_tpu.trainers.promptsrc import gpa_schedule
    gauss = gpa_schedule(50, 30, 30)
    assert gauss.shape == (50,)
    assert gauss.sum() == pytest.approx(1.0)
    assert gauss[29] == gauss.max()  # peak at epoch == mean
    # a GPA accumulation with these weights reproduces a weighted average
    vals = np.arange(50, dtype=np.float64)
    accum = 0.0
    for epoch in range(50):
        accum = accum + gauss[epoch] * vals[epoch]
    assert accum == pytest.approx(np.dot(gauss, vals))


def test_kgcoop_regularizer_zero_when_aligned(rng):
    """w * (1 - mean cos) term vanishes when tuned == zero-shot."""
    import jax.numpy as jnp
    from clip_calibration_tpu.models.clip import normalize
    zs = rng.normal(size=(5, 8)).astype(np.float32)
    zs /= np.linalg.norm(zs, axis=1, keepdims=True)
    txt_n = normalize(jnp.asarray(zs)).astype(jnp.float32)
    score = 1.0 - jnp.mean(jnp.sum(txt_n * jnp.asarray(zs), axis=-1))
    assert float(score) == pytest.approx(0.0, abs=1e-6)


def test_cocoop_chunked_forward_invariant_to_chunk_size(rng, tmp_path,
                                                        monkeypatch):
    """CoCoOp's chunked per-image text encode must produce identical
    logits for any chunk size (incl. the padded final chunk)."""
    import jax.numpy as jnp
    from clip_calibration_tpu.config import get_cfg_default
    from clip_calibration_tpu.data.base import set_random_seed
    from clip_calibration_tpu.engine.registry import TRAINER_REGISTRY
    import clip_calibration_tpu.data.datasets  # noqa: F401
    import clip_calibration_tpu.trainers  # noqa: F401
    import clip_calibration_tpu.evaluators.vl_evaluator  # noqa: F401
    from clip_calibration_tpu.trainers import cocoop as C

    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(tmp_path)
    cfg.DATASET.NAME = "Synthetic"
    cfg.DATASET.NUM_SHOTS = 4
    cfg.DATASET.SUBSAMPLE_CLASSES = "base"
    cfg.SEED = 1
    cfg.MODEL.BACKBONE.NAME = "ViT-Test"
    cfg.INPUT.SIZE = (32, 32)
    cfg.INPUT.INTERPOLATION = "bicubic"
    cfg.TEST.EVALUATOR = "VLClassification"
    cfg.TRAINER.NAME = "CoCoOp"
    cfg.TRAINER.COCOOP.N_CTX = 4
    set_random_seed(1)
    trainer = TRAINER_REGISTRY.get("CoCoOp")(cfg)

    images = (rng.random((7, 32, 32, 3)) * 255).astype("uint8")
    params = trainer._models["prompt_learner"]["params"]

    outs = []
    for rows in (1, 2 * len(trainer.dm.dataset.classnames) + 1, 10_000):
        monkeypatch.setattr(C, "_CHUNK_TARGET_ROWS", rows)
        # bypass the jitted cached step: call _forward directly
        logits, img_f, txt_last = trainer._forward(
            params, trainer.clip_params, jnp.asarray(images))
        outs.append((np.asarray(logits), np.asarray(txt_last)))
    for logits, txt_last in outs[1:]:
        np.testing.assert_allclose(logits, outs[0][0], rtol=2e-3,
                                   atol=2e-3)
        np.testing.assert_allclose(txt_last, outs[0][1], rtol=2e-3,
                                   atol=2e-3)
