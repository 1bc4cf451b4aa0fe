import os
import os.path as osp
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

from clip_calibration_tpu.models import clip as M
from clip_calibration_tpu.models.tokenizer import tokenize, CLIPTokenizer
from clip_calibration_tpu.trainers.coop import (assemble_prompts,
                                                build_prompt_assembly)

CLASSNAMES = ["golden retriever", "tabby cat", "red fox"]


@pytest.fixture(scope="module")
def clip_small():
    cfg = M.PRESETS["ViT-Test"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return params, cfg


def _ref_assembly_end(asm, ctx, params, n_ctx):
    """Straightforward reference: [SOS | ctx | suffix] concat."""
    emb = np.asarray(asm["embedding"], np.float32)
    prefix = emb[:, :1]
    suffix = emb[:, 1 + n_ctx:]
    ctx_np = np.asarray(ctx, np.float32)
    tiled = np.broadcast_to(ctx_np, (emb.shape[0],) + ctx_np.shape)
    return np.concatenate([prefix, tiled, suffix], axis=1)


def test_assembly_end_matches_concat(clip_small):
    params, cfg = clip_small
    n_ctx = 4
    asm = build_prompt_assembly(CLASSNAMES, n_ctx, "end", "", params,
                                jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (n_ctx, cfg.transformer_width))
    got = np.asarray(assemble_prompts(ctx, asm))
    want = _ref_assembly_end(asm, ctx, params, n_ctx)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_assembly_middle_front_positions(clip_small):
    params, cfg = clip_small
    n_ctx = 4
    tok = CLIPTokenizer()
    name_lens = [len(tok.encode(c)) for c in CLASSNAMES]
    toks = tokenize([" ".join(["X"] * n_ctx) + " " + c + "." for c in
                     CLASSNAMES])
    emb_table = np.asarray(params["text"]["token_embedding"], np.float32)

    for position in ("middle", "front"):
        asm = build_prompt_assembly(CLASSNAMES, n_ctx, position, "",
                                    params, jnp.float32)
        ctx = jax.random.normal(jax.random.PRNGKey(2),
                                (n_ctx, cfg.transformer_width))
        out = np.asarray(assemble_prompts(ctx, asm))
        ctx_np = np.asarray(ctx, np.float32)
        for c, name in enumerate(CLASSNAMES):
            nl = name_lens[c]
            name_emb = emb_table[toks[c, 1 + n_ctx:1 + n_ctx + nl]]
            # SOS at 0 always
            np.testing.assert_allclose(out[c, 0], emb_table[toks[c, 0]],
                                       atol=1e-6)
            if position == "front":
                np.testing.assert_allclose(out[c, 1:1 + nl], name_emb,
                                           atol=1e-6, err_msg=name)
                np.testing.assert_allclose(out[c, 1 + nl:1 + nl + n_ctx],
                                           ctx_np, atol=1e-6)
            else:  # middle
                half = n_ctx // 2
                np.testing.assert_allclose(out[c, 1:1 + half],
                                           ctx_np[:half], atol=1e-6)
                np.testing.assert_allclose(out[c, 1 + half:1 + half + nl],
                                           name_emb, atol=1e-6)
                np.testing.assert_allclose(
                    out[c, 1 + half + nl:1 + nl + n_ctx],
                    ctx_np[half:], atol=1e-6)
            # EOT position unchanged (argmax pooling contract)
            eot = toks[c].argmax()
            np.testing.assert_allclose(out[c, eot],
                                       emb_table[toks[c, eot]], atol=1e-6)


def test_ctx_init_words(clip_small):
    params, _ = clip_small
    asm = build_prompt_assembly(CLASSNAMES, 16, "end", "a photo of a",
                                params, jnp.float32)
    assert asm["n_ctx"] == 4  # overridden by init words
    toks = tokenize("a photo of a")
    want = np.asarray(params["text"]["token_embedding"],
                      np.float32)[toks[0, 1:5]]
    np.testing.assert_allclose(asm["ctx_vectors"], want, atol=1e-6)


def test_coop_trains_on_synthetic(tmp_path):
    """Short CoOp run through the CLI: loss decreases, checkpoint saved."""
    import json
    from train import build_parser, main
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        # the pipeline contract requires a ZeroshotCLIP base run first
        # (reference base_learner.py:253-255)
        main(build_parser().parse_args([
            "--root", str(tmp_path / "data"),
            "--trainer", "ZeroshotCLIP", "--seed", "1",
            "--dataset-config-file",
            osp.join(REPO, "configs/datasets/synthetic.yaml"),
            "--backbone", "ViT-Test",
            "--output-dir", "output/zs/seed1",
            "DATASET.NUM_SHOTS", "8",
            "DATASET.SUBSAMPLE_CLASSES", "base",
            "INPUT.SIZE", "(32, 32)",
            "INPUT.INTERPOLATION", "bicubic",
            "DATALOADER.TEST.BATCH_SIZE", "32",
        ]))
        main(build_parser().parse_args([
            "--root", str(tmp_path / "data"),
            "--trainer", "CoOp", "--seed", "1",
            "--dataset-config-file",
            osp.join(REPO, "configs/datasets/synthetic.yaml"),
            "--backbone", "ViT-Test",
            "--output-dir", "output/coop/seed1",
            "DATASET.NUM_SHOTS", "8",
            "DATASET.SUBSAMPLE_CLASSES", "base",
            "INPUT.SIZE", "(32, 32)",
            "INPUT.INTERPOLATION", "bicubic",
            "INPUT.TRANSFORMS", "('random_resized_crop','random_flip','normalize')",
            "DATALOADER.TRAIN_X.BATCH_SIZE", "8",
            "DATALOADER.TEST.BATCH_SIZE", "32",
            "OPTIM.NAME", "sgd", "OPTIM.LR", "0.02",
            "OPTIM.MAX_EPOCH", "8", "OPTIM.LR_SCHEDULER", "cosine",
            "OPTIM.WARMUP_EPOCH", "1", "OPTIM.WARMUP_TYPE", "constant",
            "OPTIM.WARMUP_CONS_LR", "1e-5",
            "TRAINER.COOP.N_CTX", "4",
        ]))
        log = open("output/coop/seed1/log.txt").read()
        assert "=> result" in log
        # checkpoint exists with the reference layout
        assert osp.exists(
            "output/coop/seed1/prompt_learner/model.pth.tar-8")
        # loss decreased over training
        import re
        losses = [float(m) for m in
                  re.findall(r"loss (\d+\.\d+) \(", log)]
        assert len(losses) > 2
        assert losses[-1] < losses[0]
    finally:
        os.chdir(old)
        sys.stdout = sys.__stdout__


def test_assembly_class_specific_context(clip_small):
    """CSC (class-specific ctx [n_cls, n_ctx, D], reference coop.py
    PromptLearner csc branch): each class gets its own context rows."""
    params, cfg = clip_small
    n_ctx = 4
    asm = build_prompt_assembly(CLASSNAMES, n_ctx, "end", "", params,
                                jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (len(CLASSNAMES), n_ctx,
                             cfg.transformer_width))
    got = np.asarray(assemble_prompts(ctx, asm))
    emb = np.asarray(asm["embedding"], np.float32)
    for c in range(len(CLASSNAMES)):
        want_c = np.concatenate(
            [emb[c:c + 1, :1],
             np.asarray(ctx)[c][None],
             emb[c:c + 1, 1 + n_ctx:]], axis=1)[0]
        np.testing.assert_allclose(got[c], want_c, atol=1e-6)


def test_prograd_ctx_init_tail_assembly():
    """ProGrad's CTX_INIT scheme (reference prograd.py:88-105): ALL
    n_ctx positions learnable, zero-initialized, with the init phrase's
    token embeddings in the LAST slots and X placeholders leading."""
    import jax
    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.models.tokenizer import tokenize

    cfg = M.PRESETS["ViT-Test"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    asm = build_prompt_assembly(["cat", "dog"], 8, "end", "a photo of a",
                                params, jnp.float32, ctx_init_tail=True)
    cv = np.asarray(asm["ctx_vectors"])
    assert cv.shape == (8, cfg.transformer_width)
    assert asm["n_ctx"] == 8
    np.testing.assert_array_equal(cv[:4], 0.0)
    toks = tokenize("a photo of a")
    emb = np.asarray(params["text"]["token_embedding"])[
        np.asarray(toks)[0, 1:5]]
    np.testing.assert_allclose(cv[4:], emb, rtol=1e-6)
    assert asm["prompt_prefix"] == "X X X X a photo of a"
