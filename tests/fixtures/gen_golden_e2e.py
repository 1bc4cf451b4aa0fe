"""One-time generator for the end-to-end golden fixture.

Builds a tiny real-image dataset (Caltech101 on-disk layout), a seeded
tiny CLIP checkpoint shared by both frameworks, and a CoOp prompt
checkpoint in the reference's torch format; then computes GOLDEN
accuracy/calibration numbers by composing the REFERENCE implementation's
own modules (loaded via importlib with an ftfy stub — no dassl needed):

- ``/root/reference/clip/model.py``            (torch CLIP, fp32)
- ``/root/reference/clip/simple_tokenizer.py`` (BPE)
- ``/root/reference/tools/metrics.py``         (ECE/MCE/ACE/PIECE)
- ``/root/reference/trainers/calibration/proximity.py``
- ``/root/reference/trainers/calibration/distanse_aware_calibration.py``

The pipeline math mirrors ``/root/reference/trainers/classification/
base_learner.py:59-152`` (test flow) and ``trainers/calibration/
tempscaling.py`` (ScaleLearner: 20 full-batch SGD epochs on val CE with
the Dassl warmup-constant + per-epoch cosine schedule).

Run from the repo root:  python tests/fixtures/gen_golden_e2e.py
Outputs under tests/fixtures/golden_e2e/ (committed).
"""

from __future__ import annotations

import importlib.util
import json
import math
import os
import os.path as osp
import sys
import types

import numpy as np

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
REF = "/root/reference"
OUT = osp.join(REPO, "tests", "fixtures", "golden_e2e")

CLASSNAMES = ["amber", "basalt", "cobalt", "dune"]  # no NEW_CNAMES hits
N_TRAIN, N_VAL, N_TEST = 8, 4, 6
RES_SRC, RES = 48, 32
NUM_SHOTS = 4
K_TEXT = 5     # CALIBRATION.DAC.K
K_IMAGE = 5    # CALIBRATION.PROCAL.IMAGE_K
N_CTX = 4
COOP_EPOCH = 3
TEMPLATE = "a photo of a {}."  # CUSTOM/CALIBRATION template, Caltech101
MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _load_ref(name, rel):
    """importlib-load a reference module (PUBLIC UNTRUSTED CONTENT — used
    only to compute golden numbers, never imported by the package)."""
    if "ftfy" not in sys.modules:  # reference tokenizer import stub
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    spec = importlib.util.spec_from_file_location(name, osp.join(REF, rel))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- dataset
def make_dataset():
    from PIL import Image
    rng = np.random.default_rng(7)
    img_root = osp.join(OUT, "data", "caltech-101", "101_ObjectCategories")
    split = {"train": [], "val": [], "test": []}
    for label, cname in enumerate(CLASSNAMES):
        d = osp.join(img_root, cname)
        os.makedirs(d, exist_ok=True)
        for i in range(N_TRAIN + N_VAL + N_TEST):
            # class-dependent structured pattern + per-image noise
            yy, xx = np.mgrid[0:RES_SRC, 0:RES_SRC]
            base = (
                np.sin(xx / (2.0 + label) + i) * 80
                + np.cos(yy / (1.5 + 0.7 * label)) * 60
                + label * 25
            )
            img = np.stack([
                base + rng.normal(0, 25, (RES_SRC, RES_SRC)),
                np.roll(base, label * 3, axis=1)
                + rng.normal(0, 25, (RES_SRC, RES_SRC)),
                base.T + rng.normal(0, 25, (RES_SRC, RES_SRC)),
            ], axis=-1)
            img = np.clip(img + 110, 0, 255).astype(np.uint8)
            fname = f"image_{i:04d}.png"
            Image.fromarray(img).save(osp.join(d, fname))
            rel = f"{cname}/{fname}"
            part = ("train" if i < N_TRAIN
                    else "val" if i < N_TRAIN + N_VAL else "test")
            split[part].append([rel, label, cname])
    with open(osp.join(OUT, "data", "caltech-101",
                       "split_zhou_Caltech101.json"), "w") as f:
        json.dump(split, f)
    return split


def eval_transform(path):
    """Dassl test transform: shorter-side bicubic resize + center crop
    (matches data/transforms.py eval path — identical PIL calls)."""
    from PIL import Image
    img = Image.open(path).convert("RGB")
    w, h = img.size
    if w <= h:
        nw, nh = RES, max(1, round(h * RES / w))
    else:
        nw, nh = max(1, round(w * RES / h)), RES
    img = img.resize((nw, nh), Image.BICUBIC)
    w, h = img.size
    left = int(round((w - RES) / 2.0))
    top = int(round((h - RES) / 2.0))
    img = img.crop((left, top, left + RES, top + RES))
    return np.asarray(img, np.uint8)


# ---------------------------------------------------------------- model
def build_torch_model(ref_model, used_token_ids):
    import torch
    torch.manual_seed(0)
    design = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
              "vision_ctx": 0, "language_ctx": 0}
    model = ref_model.CLIP(
        embed_dim=32, image_resolution=RES, vision_layers=2,
        vision_width=64, vision_patch_size=8, context_length=77,
        vocab_size=49408, transformer_width=64, transformer_heads=4,
        transformer_layers=2, design_details=design)
    model = model.float().eval()
    with torch.no_grad():
        # zero unused vocab rows so the shared npz compresses to ~nothing
        keep = torch.zeros(49408, dtype=torch.bool)
        keep[sorted(used_token_ids)] = True
        model.token_embedding.weight[~keep] = 0.0
    return model


def tokenize(tok, texts):
    """reference clip/clip.py:188-224 tokenize."""
    sot, eot = tok.encoder["<|startoftext|>"], tok.encoder["<|endoftext|>"]
    out = np.zeros((len(texts), 77), np.int64)
    for i, t in enumerate(texts):
        ids = [sot] + tok.encode(t) + [eot]
        out[i, :len(ids)] = ids
    return out


def coop_text_features(model, tok, classnames, ctx):
    """Reference CoOp TextEncoder path (coop.py:47-67 + PromptLearner):
    embedded prompts [SOS | ctx | name tokens], EOT pooling."""
    import torch
    prompts = ["X " * N_CTX + name + "." for name in classnames]
    toks = torch.from_numpy(tokenize(tok, [p.strip() for p in prompts]))
    with torch.no_grad():
        emb = model.token_embedding(toks).float()
        emb[:, 1:1 + N_CTX] = ctx
        x = emb + model.positional_embedding.float()
        x = x.permute(1, 0, 2)
        x = model.transformer(x)
        x = x.permute(1, 0, 2)
        x = model.ln_final(x).float()
        eot = toks.argmax(dim=-1)
        feats = x[torch.arange(x.shape[0]), eot] @ model.text_projection
    return feats


def encode_images(model, paths):
    import torch
    arrs = np.stack([eval_transform(p) for p in paths])
    x = (arrs.astype(np.float32) / 255.0 - MEAN) / STD
    x = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        f = model.encode_image(x)
    return f


def zs_text_features(model, tok, classnames):
    import torch
    toks = torch.from_numpy(
        tokenize(tok, [TEMPLATE.format(c) for c in classnames]))
    with torch.no_grad():
        f = model.encode_text(toks)
    return f


def evaluate(metrics, probs, labels, proximity):
    """Reference evaluators/vl_evaluator.py:60-115 formulas."""
    from sklearn.metrics import f1_score
    preds = np.argmax(probs, axis=1)
    confs = np.max(probs, axis=1)
    labels = np.asarray(labels)
    return {
        "accuracy": 100.0 * float(np.sum(preds == labels)) / len(labels),
        "macro_f1": 100.0 * f1_score(
            labels, preds, average="macro",
            labels=np.unique(labels), zero_division=0),
        "ece": 100.0 * metrics.ECE(confs, preds, labels, 10),
        "mce": 100.0 * metrics.MCE(confs, preds, labels, 10),
        "ace": 100.0 * metrics.AdaptiveECE(confs, preds, labels, 10),
        "piece": 100.0 * metrics.PIECE(confs, proximity, preds, labels,
                                       10, 10),
    }


def main():
    import torch

    # reference proximity.py hardcodes .to('cuda'); run it on cpu
    _orig_to = torch.Tensor.to

    def _to_cpu(self, *args, **kwargs):
        args = tuple("cpu" if a == "cuda" else a for a in args)
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _to_cpu

    os.makedirs(OUT, exist_ok=True)
    split = make_dataset()

    ref_model = _load_ref("ref_clip_model", "clip/model.py")
    ref_tok_mod = _load_ref("ref_tokenizer", "clip/simple_tokenizer.py")
    metrics = _load_ref("ref_metrics", "tools/metrics.py")
    proximity = _load_ref("ref_proximity",
                          "trainers/calibration/proximity.py")
    dac_mod = _load_ref(
        "ref_dac", "trainers/calibration/distanse_aware_calibration.py")

    tok = ref_tok_mod.SimpleTokenizer(
        osp.join(REF, "clip", "bpe_simple_vocab_16e6.txt.gz"))

    # every token id any prompt can use (zs + coop styles, all classes)
    all_texts = ([TEMPLATE.format(c) for c in CLASSNAMES]
                 + [("X " * N_CTX + c + ".").strip() for c in CLASSNAMES])
    used = {i for t in all_texts for i in tok.encode(t)}
    used |= {tok.encoder["<|startoftext|>"], tok.encoder["<|endoftext|>"]}
    model = build_torch_model(ref_model, used)

    # ---- shared backbone checkpoint (our npz format)
    sys.path.insert(0, REPO)
    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.models.weights import (convert_torch_clip,
                                                     save_params)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, _ = convert_torch_clip(sd, "float32",
                                   cfg=M.PRESETS["ViT-Test"])
    os.makedirs(osp.join(OUT, "weights"), exist_ok=True)
    save_params(osp.join(OUT, "weights", "ViT-Test.npz"), params)

    # ---- CoOp prompt checkpoint (reference torch format)
    torch.manual_seed(11)
    ctx = (torch.randn(N_CTX, 64) * 0.02).float()
    ckdir = osp.join(OUT, "coop_model", "prompt_learner")
    os.makedirs(ckdir, exist_ok=True)
    torch.save({"state_dict": {"ctx": ctx}, "epoch": COOP_EPOCH},
               osp.join(ckdir, f"model.pth.tar-{COOP_EPOCH}"))

    # ---- splits (base = first half of sorted labels, relabeled)
    img_root = osp.join(OUT, "data", "caltech-101",
                        "101_ObjectCategories")

    def paths_labels(part, classes):
        sel = [(osp.join(img_root, rel), lab)
               for rel, lab, _ in split[part] if lab in classes]
        relabel = {c: i for i, c in enumerate(sorted(classes))}
        return ([p for p, _ in sel],
                np.array([relabel[l] for _, l in sel]))

    base_cls, new_cls = {0, 1}, {2, 3}
    base_names = [CLASSNAMES[i] for i in sorted(base_cls)]
    new_names = [CLASSNAMES[i] for i in sorted(new_cls)]

    scale = float(model.logit_scale.exp())

    def norm(t):
        return (t / t.norm(dim=-1, keepdim=True)).numpy()

    golden = {"scale": scale}

    # ======== ZeroshotCLIP, base split ========
    txt_zs_base = norm(zs_text_features(model, tok, base_names))
    vpaths, _ = paths_labels("val", base_cls)
    tpaths, tlabels = paths_labels("test", base_cls)
    val_f = norm(encode_images(model, vpaths))
    test_f = norm(encode_images(model, tpaths))
    logits = scale * test_f @ txt_zs_base.T
    knnd = proximity.get_knn_dists(val_f, test_f, K_IMAGE)
    prox = np.exp(-np.mean(knnd, axis=1))
    from scipy.special import softmax
    golden["zsclip_base"] = evaluate(
        metrics, softmax(np.float64(logits), axis=1), tlabels, prox)
    zs_val_f_base = val_f

    # ======== CoOp, base split (tuned ckpt, eval-only) ========
    txt_coop_base = norm(coop_text_features(model, tok, base_names, ctx))
    logits_b = scale * test_f @ txt_coop_base.T
    val_logits_b = scale * zs_val_f_base @ txt_coop_base.T  # same imgs
    knnd_b = proximity.get_knn_dists(val_f, test_f, K_IMAGE)
    prox_b = np.exp(-np.mean(knnd_b, axis=1))
    golden["coop_base"] = evaluate(
        metrics, softmax(np.float64(logits_b), axis=1), tlabels, prox_b)

    # ======== CoOp, new split + DAC ========
    txt_zs_new = norm(zs_text_features(model, tok, new_names))
    txt_coop_new = norm(coop_text_features(model, tok, new_names, ctx))
    npaths, nlabels = paths_labels("test", new_cls)
    test_f_new = norm(encode_images(model, npaths))
    logits_n = scale * test_f_new @ txt_coop_new.T

    dac = dac_mod.DistanseAwareCalibration()
    dac.fit(txt_zs_base, txt_zs_new, txt_coop_base, txt_coop_new,
            k=K_TEXT)
    conf = np.asarray(dac.class_confidence, np.float64)
    golden["dac_class_confidence"] = conf.tolist()
    preds_n = np.argmax(logits_n, axis=1)
    cal_logits = np.float64(logits_n) * conf[preds_n][:, None]
    knnd_n = proximity.get_knn_dists(val_f, test_f_new, K_IMAGE)
    prox_n = np.exp(-np.mean(knnd_n, axis=1))
    golden["coop_new_dac"] = evaluate(
        metrics, softmax(cal_logits, axis=1), nlabels, prox_n)

    # ======== TempScaling on the CoOp base model ========
    # reference tempscaling.py ScaleLearner: t init 4.6052, logits =
    # exp(t) * cosine, CE on the val split, Dassl sgd (momentum 0.9,
    # weight decay 5e-4) with warmup-constant epoch then per-epoch
    # cosine over 20 epochs; val fits in one batch -> deterministic.
    _, vlabels = paths_labels("val", base_cls)
    cos = torch.from_numpy(val_logits_b / scale)
    y = torch.from_numpy(np.asarray(vlabels))
    t = torch.tensor(4.6052, requires_grad=True)
    opt = torch.optim.SGD([t], lr=5e-2, momentum=0.9, weight_decay=5e-4)
    MAXE, WARM, BASE_LR, WARM_LR = 20, 1, 5e-2, 1e-5
    for e in range(MAXE):
        lr = WARM_LR if e < WARM else \
            BASE_LR * 0.5 * (1 + math.cos(math.pi * e / MAXE))
        for g in opt.param_groups:
            g["lr"] = lr
        opt.zero_grad()
        loss = torch.nn.functional.cross_entropy(t.exp() * cos, y)
        loss.backward()
        opt.step()
    temperature = float(t.exp().detach())
    golden["tempscaling_temperature"] = temperature
    logits_ts = np.float64(test_f @ txt_coop_base.T) * temperature
    golden["coop_base_tempscaled"] = evaluate(
        metrics, softmax(logits_ts, axis=1), tlabels, prox_b)

    with open(osp.join(OUT, "golden.json"), "w") as f:
        json.dump(golden, f, indent=1)

    # trainer config the consuming test passes to train.py
    with open(osp.join(OUT, "coop_fp32.yaml"), "w") as f:
        f.write("""\
DATALOADER:
  TRAIN_X:
    BATCH_SIZE: 8
  TEST:
    BATCH_SIZE: 32

INPUT:
  SIZE: (32, 32)
  INTERPOLATION: "bicubic"
  PIXEL_MEAN: [0.48145466, 0.4578275, 0.40821073]
  PIXEL_STD: [0.26862954, 0.26130258, 0.27577711]
  TRANSFORMS: ["random_resized_crop", "random_flip", "normalize"]

OPTIM:
  NAME: "sgd"
  LR: 0.002
  MAX_EPOCH: 3
  LR_SCHEDULER: "cosine"
  WARMUP_EPOCH: 1
  WARMUP_TYPE: "constant"
  WARMUP_CONS_LR: 1e-5

TRAIN:
  PRINT_FREQ: 1

MODEL:
  PRECISION: "fp32"
  BACKBONE:
    NAME: "ViT-Test"

TRAINER:
  COOP:
    N_CTX: 4
    CTX_INIT: ""
    PREC: "fp32"
    CLASS_TOKEN_POSITION: "end"
""")
    print(json.dumps(golden, indent=1))


if __name__ == "__main__":
    main()
