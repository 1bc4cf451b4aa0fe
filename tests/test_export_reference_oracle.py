"""Live-oracle export interop: train HERE, infer in the REFERENCE.

The export round-trip tests load exported checkpoints back through our
own loader; this gate goes further and feeds them to the reference's
actual trainer modules (importlib-loaded from /root/reference with
dassl/torchvision/ftfy stubs — PUBLIC UNTRUSTED CONTENT, used only as a
numeric oracle): build our trainer, save + export, `load_state_dict`
the exported file into the reference's own ``CustomCLIP`` (Dassl
``load_pretrained_weights`` semantics: drop token_prefix/token_suffix,
strict=False — reference ``coop.py:334-343``), and assert the two
stacks produce the same logits on the same images in fp32.

CoCoOp is the chosen family because its export is the riskiest inverse:
meta_net Linear weights must transpose back to torch [out, in] layout
(reference ``cocoop.py:104-108``).

Slow-marked (torch reference forward on CPU).
"""

import importlib.util
import os.path as osp
import sys
import types

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"

pytestmark = [
    pytest.mark.skipif(not osp.isdir(REF),
                       reason="reference checkout not available"),
    pytest.mark.slow,
]


def _load_standalone(name, rel):
    if "ftfy" not in sys.modules:  # reference tokenizer import stub
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda s: s
        sys.modules["ftfy"] = stub
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, osp.join(REF, rel))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _load_ref_trainer_module(rel, name):
    """importlib-load a reference trainer file. The reference imports
    `clip` (its own package), dassl, and its base_learner chain (netcal,
    statsmodels — absent here); everything the PromptLearner/CustomCLIP
    classes do NOT touch is stubbed."""
    import torch
    if "clip" not in sys.modules:
        st = _load_standalone("clip.simple_tokenizer",
                              "clip/simple_tokenizer.py")
        tok = st.SimpleTokenizer()

        def _tokenize(texts, context_length=77, truncate=False):
            # reference clip/clip.py:188-224
            if isinstance(texts, str):
                texts = [texts]
            sot = tok.encoder["<|startoftext|>"]
            eot = tok.encoder["<|endoftext|>"]
            out = torch.zeros(len(texts), context_length,
                              dtype=torch.long)
            for i, t in enumerate(texts):
                ids = [sot] + tok.encode(t) + [eot]
                if len(ids) > context_length:
                    raise RuntimeError(f"too long for context: {t}")
                out[i, :len(ids)] = torch.tensor(ids)
            return out

        def _no_load(*a, **k):  # import-time only (proda.py:17)
            raise RuntimeError("clip.load is stubbed in the oracle")

        clip_sub = types.ModuleType("clip.clip")
        clip_sub.tokenize = _tokenize
        clip_sub.load = _no_load
        clip_pkg = types.ModuleType("clip")
        clip_pkg.__path__ = []  # package marker for submodule imports
        clip_pkg.clip = clip_sub
        clip_pkg.tokenize = _tokenize
        sys.modules["clip"] = clip_pkg
        sys.modules["clip.clip"] = clip_sub

    if "dassl" not in sys.modules:
        class _Registry:
            def register(self, obj=None):
                def deco(cls):
                    return cls
                return deco if obj is None else deco(obj)

        dassl = types.ModuleType("dassl")
        engine = types.ModuleType("dassl.engine")
        engine.TRAINER_REGISTRY = _Registry()
        engine.TrainerX = object
        metrics = types.ModuleType("dassl.metrics")
        metrics.compute_accuracy = lambda *a, **k: None
        utils = types.ModuleType("dassl.utils")
        utils.load_pretrained_weights = lambda *a, **k: None
        utils.load_checkpoint = lambda *a, **k: None
        optim = types.ModuleType("dassl.optim")
        optim.build_optimizer = lambda *a, **k: None
        optim.build_lr_scheduler = lambda *a, **k: None
        for m in (dassl, engine, metrics, utils, optim):
            sys.modules[m.__name__] = m

    if "trainers.classification.base_learner" not in sys.modules:
        t_pkg = types.ModuleType("trainers")
        t_pkg.__path__ = []
        tc = types.ModuleType("trainers.classification")
        tc.__path__ = []
        bl = types.ModuleType("trainers.classification.base_learner")
        bl.VLBaseLearner = object
        for m in (t_pkg, tc, bl):
            sys.modules[m.__name__] = m

    return _load_standalone(name, rel)


def _cfg_ns(**kw):
    return types.SimpleNamespace(**kw)


def test_cocoop_export_runs_in_reference_stack(tmp_path, monkeypatch):
    import torch

    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.models.weights import (convert_torch_clip,
                                                     save_params)

    # -- one shared backbone: reference torch CLIP at ViT-Test dims ----
    ref_model_mod = _load_standalone("ref_clip_model", "clip/model.py")
    torch.manual_seed(0)
    design = {"trainer": "CoCoOp", "vision_depth": 0,
              "language_depth": 0, "vision_ctx": 0, "language_ctx": 0}
    ref_clip = ref_model_mod.CLIP(32, 32, 2, 64, 8, 77, 49408, 64, 4, 2,
                                  design_details=design).float().eval()
    sd = {k: v.detach().numpy() for k, v in ref_clip.state_dict().items()}
    params, _ = convert_torch_clip(sd, "float32",
                                   cfg=M.PRESETS["ViT-Test"])
    wdir = tmp_path / "weights"
    wdir.mkdir()
    save_params(str(wdir / "ViT-Test.npz"), params)
    monkeypatch.setenv("CLIP_CHECKPOINT_DIR", str(wdir))

    # -- our trainer on those weights; save + export -------------------
    from helpers import build_synthetic_trainer
    t = build_synthetic_trainer(
        "CoCoOp", tmp_path / "data",
        output_dir=tmp_path / "out",
        overrides={"MODEL.PRECISION": "fp32"},
        trainer_cfg=dict(N_CTX=4, PREC="fp32"))
    native = str(tmp_path / "native")
    t.save_model(0, native)
    exported = str(tmp_path / "exported")
    paths = t.export_reference_checkpoint(native, exported, epoch=1)
    state = torch.load(paths[0], map_location="cpu",
                       weights_only=False)["state_dict"]

    # -- the reference's own CustomCLIP consumes the export ------------
    ref_cocoop = _load_ref_trainer_module(
        "trainers/classification/cocoop.py", "ref_cocoop")
    classnames = list(t.dm.dataset.classnames)
    cfg = _cfg_ns(
        TRAINER=_cfg_ns(COCOOP=_cfg_ns(N_CTX=4, CTX_INIT="",
                                       PREC="fp32")),
        INPUT=_cfg_ns(SIZE=(32, 32)))
    ref_cc = ref_cocoop.CustomCLIP(cfg, classnames, ref_clip).eval()

    # Dassl load_pretrained_weights semantics (reference coop.py:334-343)
    for k in ("token_prefix", "token_suffix"):
        state.pop(k, None)
    result = ref_cc.prompt_learner.load_state_dict(state, strict=False)
    assert result.unexpected_keys == []          # naming is exact
    assert set(result.missing_keys) == {"token_prefix", "token_suffix"}

    # -- same images, both stacks, fp32 --------------------------------
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8)
    ours = np.asarray(t.model_inference(images)[0], np.float32)

    mean = np.asarray(t.cfg.INPUT.PIXEL_MEAN, np.float32)
    std = np.asarray(t.cfg.INPUT.PIXEL_STD, np.float32)
    x = (images.astype(np.float32) / 255.0 - mean) / std
    with torch.no_grad():
        theirs = ref_cc(torch.from_numpy(
            x.transpose(0, 3, 1, 2)))[0].numpy()

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_maple_export_runs_in_reference_stack(tmp_path, monkeypatch):
    """MaPLe through the reference's own modules: deep compound prompts
    spliced in BOTH towers, plus the proj / compound_prompt_projections
    Linear transposes (reference ``maple.py:111,126-127``).

    The reference hardcodes the proj target to 768 (vision width) and
    the compound text prompts to 512 (text width) — so the oracle runs
    at those widths with shallow 2-layer towers (32px, patch 16) to
    stay fast. The reference CustomCLIP is ``.float()``-ed because its
    ``proj.half()`` (``maple.py:112``) otherwise leaves a lone fp16
    Linear inside an fp32 model.
    """
    import torch

    from clip_calibration_tpu.models.clip import PRESETS

    ref_model_mod = _load_standalone("ref_clip_model", "clip/model.py")
    torch.manual_seed(1)
    design = {"trainer": "MaPLe", "vision_depth": 0,
              "language_depth": 0, "vision_ctx": 0, "language_ctx": 0,
              "maple_length": 2}
    ref_clip = ref_model_mod.CLIP(64, 32, 2, 768, 16, 77, 49408,
                                  512, 8, 2,
                                  design_details=design).float().eval()

    # ship the torch state dict through the .pt conversion path (the
    # oracle dims are not a registered preset, so the npz route —
    # which trusts PRESETS — cannot carry them; the .pt route infers
    # the config from the tensors, models/backbone.py:60-64)
    assert "ViT-Test" in PRESETS
    wdir = tmp_path / "weights"
    wdir.mkdir()
    torch.save(ref_clip.state_dict(), str(wdir / "ViT-Test.pt"))
    monkeypatch.setenv("CLIP_CHECKPOINT_DIR", str(wdir))

    from helpers import build_synthetic_trainer
    t = build_synthetic_trainer(
        "MaPLe", tmp_path / "data",
        output_dir=tmp_path / "out",
        overrides={"MODEL.PRECISION": "fp32"},
        trainer_cfg=dict(N_CTX=2, PROMPT_DEPTH=2, PREC="fp32",
                         CTX_INIT="a photo of a"))
    native = str(tmp_path / "native")
    t.save_model(0, native)
    exported = str(tmp_path / "exported")
    paths = t.export_reference_checkpoint(native, exported, epoch=1)
    state = torch.load(paths[0], map_location="cpu",
                       weights_only=False)["state_dict"]

    # maple.py does `from .coop import load_clip_to_cpu` — load it
    # under its real dotted name with the reference coop pre-loaded so
    # the relative import resolves
    _load_ref_trainer_module("trainers/classification/coop.py",
                             "trainers.classification.coop")
    ref_maple = _load_ref_trainer_module(
        "trainers/classification/maple.py",
        "trainers.classification.maple")
    classnames = list(t.dm.dataset.classnames)
    cfg = _cfg_ns(
        TRAINER=_cfg_ns(MAPLE=_cfg_ns(N_CTX=2, CTX_INIT="a photo of a",
                                      PROMPT_DEPTH=2)),
        INPUT=_cfg_ns(SIZE=(32, 32)))
    ref_cc = ref_maple.CustomCLIP(cfg, classnames,
                                  ref_clip).float().eval()

    # reference MaPLe registers the WHOLE model; Dassl
    # load_pretrained_weights drops token_prefix/token_suffix
    for k in ("prompt_learner.token_prefix",
              "prompt_learner.token_suffix"):
        state.pop(k, None)
    assert {"prompt_learner.ctx", "prompt_learner.proj.weight",
            "prompt_learner.proj.bias",
            "prompt_learner.compound_prompts_text.0",
            "prompt_learner.compound_prompt_projections.0.weight",
            "prompt_learner.compound_prompt_projections.0.bias"
            } <= set(state)
    result = ref_cc.load_state_dict(state, strict=False)
    assert result.unexpected_keys == []          # naming is exact

    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    ours = np.asarray(t.model_inference(images)[0], np.float32)

    mean = np.asarray(t.cfg.INPUT.PIXEL_MEAN, np.float32)
    std = np.asarray(t.cfg.INPUT.PIXEL_STD, np.float32)
    x = (images.astype(np.float32) / 255.0 - mean) / std
    with torch.no_grad():
        theirs = ref_cc(torch.from_numpy(
            x.transpose(0, 3, 1, 2)))[0].numpy()

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_promptsrc_export_runs_in_reference_stack(tmp_path, monkeypatch):
    """PromptSRC through the reference's own modules: the IVLP design —
    independent learnable prompts INSIDE both towers (``clip/model.py:
    191-256`` VPT / per-layer VPT_shallow) plus the text ctx — loaded
    from our exported whole-model state dict (reference registers the
    full CustomCLIP under "prompt_learner", ``promptsrc.py:262``).

    The reference module is CUDA-hardcoded in ``VLPromptLearner.
    __init__`` (``.cuda()`` on the frozen teacher, ``promptsrc.py:
    116-128``) — neutralized for the CPU oracle; ``load_clip_to_cpu``
    is patched to hand back the same vanilla backbone our trainer
    loaded, exactly what its zero-shot branch builds.
    """
    import copy

    import torch

    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.models.weights import (convert_torch_clip,
                                                     save_params)

    ref_model_mod = _load_standalone("ref_clip_model", "clip/model.py")
    torch.manual_seed(2)
    vanilla = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
               "vision_ctx": 0, "language_ctx": 0}
    ref_vanilla = ref_model_mod.CLIP(32, 32, 2, 64, 8, 77, 49408,
                                     64, 4, 2,
                                     design_details=vanilla).float().eval()
    # ship weights over the npz route so the PRESET's 4 heads are kept:
    # the .pt route infers heads = width // 64 (the reference's own
    # build_model rule, ``clip/model.py:668``) = 1 at this toy width,
    # which is a DIFFERENT attention function than the 4-head oracle
    sd = {k: v.detach().numpy() for k, v in
          ref_vanilla.state_dict().items()}
    params0, _ = convert_torch_clip(sd, "float32",
                                    cfg=M.PRESETS["ViT-Test"])
    wdir = tmp_path / "weights"
    wdir.mkdir()
    save_params(str(wdir / "ViT-Test.npz"), params0)
    monkeypatch.setenv("CLIP_CHECKPOINT_DIR", str(wdir))

    from helpers import build_synthetic_trainer
    t = build_synthetic_trainer(
        "PromptSRC", tmp_path / "data",
        output_dir=tmp_path / "out",
        overrides={"MODEL.PRECISION": "fp32"},
        trainer_cfg=dict(N_CTX_TEXT=2, N_CTX_VISION=2,
                         PROMPT_DEPTH_TEXT=2, PROMPT_DEPTH_VISION=2,
                         PREC="fp32"))
    native = str(tmp_path / "native")
    t.save_model(0, native)
    exported = str(tmp_path / "exported")
    paths = t.export_reference_checkpoint(native, exported, epoch=1)
    state = torch.load(paths[0], map_location="cpu",
                       weights_only=False)["state_dict"]

    # the reference IVLP CLIP: vanilla backbone weights + learnable
    # in-tower prompts (random here; the export overrides every one)
    ivlp = {"trainer": "IVLP", "vision_depth": 2, "language_depth": 2,
            "vision_ctx": 2, "language_ctx": 2}
    torch.manual_seed(3)
    ref_ivlp = ref_model_mod.CLIP(32, 32, 2, 64, 8, 77, 49408, 64, 4, 2,
                                  design_details=ivlp).float().eval()
    res = ref_ivlp.load_state_dict(ref_vanilla.state_dict(),
                                   strict=False)
    assert res.unexpected_keys == []  # vanilla ⊂ IVLP

    # CPU oracle: the reference module hardcodes .cuda()/.half()
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self)
    monkeypatch.setattr(torch.Tensor, "half", lambda self: self)

    _load_ref_trainer_module(
        "trainers/classification/imagenet_templates.py",
        "trainers.classification.imagenet_templates")
    ref_ps = _load_ref_trainer_module(
        "trainers/classification/promptsrc.py",
        "trainers.classification.promptsrc")
    monkeypatch.setattr(
        ref_ps, "load_clip_to_cpu",
        lambda cfg, zero_shot_model=False: copy.deepcopy(ref_vanilla))

    classnames = list(t.dm.dataset.classnames)
    cfg = _cfg_ns(
        TRAINER=_cfg_ns(PROMPTSRC=_cfg_ns(
            N_CTX_TEXT=2, N_CTX_VISION=2, CTX_INIT="a photo of a",
            PROMPT_DEPTH_TEXT=2, PROMPT_DEPTH_VISION=2)),
        INPUT=_cfg_ns(SIZE=(32, 32)),
        OPTIM=_cfg_ns(MAX_EPOCH=1))
    ref_cc = ref_ps.CustomCLIP(cfg, classnames, ref_ivlp).float().eval()

    for k in ("prompt_learner.token_prefix",
              "prompt_learner.token_suffix"):
        state.pop(k, None)
    assert {"prompt_learner.ctx", "image_encoder.VPT",
            "image_encoder.transformer.resblocks.1.VPT_shallow",
            "text_encoder.transformer.resblocks.1.VPT_shallow",
            } <= set(state)
    result = ref_cc.load_state_dict(state, strict=False)
    assert result.unexpected_keys == []          # naming is exact

    rng = np.random.default_rng(2)
    images = rng.integers(0, 256, (5, 32, 32, 3), dtype=np.uint8)
    ours = np.asarray(t.model_inference(images)[0], np.float32)

    mean = np.asarray(t.cfg.INPUT.PIXEL_MEAN, np.float32)
    std = np.asarray(t.cfg.INPUT.PIXEL_STD, np.float32)
    x = (images.astype(np.float32) / 255.0 - mean) / std
    with torch.no_grad():
        theirs = ref_cc(torch.from_numpy(
            x.transpose(0, 3, 1, 2)))[0].numpy()

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_proda_export_runs_in_reference_stack(tmp_path, monkeypatch):
    """ProDA through the reference's own modules: the 32-prompt (here
    4-prompt) distribution with MIXED class-token positions — the pos
    vector assigns 1/4 of prompts front, 1/4 middle, 1/2 end
    (``proda.py:111-115``) — and eval-time ``set_classifier`` mean
    features (``proda.py:316-331``). The round-trip tests check the
    ctx tensor layout; this gate checks the position-mix SEMANTICS by
    comparing eval logits end to end.

    The reference module hardcodes CUDA (``device='cuda'`` tensors,
    ``clip_model.cuda()``); neutralized for the CPU oracle.
    """
    import copy

    import torch

    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.models.weights import (convert_torch_clip,
                                                     save_params)

    ref_model_mod = _load_standalone("ref_clip_model", "clip/model.py")
    torch.manual_seed(4)
    vanilla = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
               "vision_ctx": 0, "language_ctx": 0}
    ref_clip = ref_model_mod.CLIP(32, 32, 2, 64, 8, 77, 49408, 64, 4, 2,
                                  design_details=vanilla).float().eval()
    sd = {k: v.detach().numpy() for k, v in ref_clip.state_dict().items()}
    params0, _ = convert_torch_clip(sd, "float32",
                                    cfg=M.PRESETS["ViT-Test"])
    wdir = tmp_path / "weights"
    wdir.mkdir()
    save_params(str(wdir / "ViT-Test.npz"), params0)
    monkeypatch.setenv("CLIP_CHECKPOINT_DIR", str(wdir))

    from helpers import build_synthetic_trainer
    t = build_synthetic_trainer(
        "ProDA", tmp_path / "data",
        output_dir=tmp_path / "out",
        overrides={"MODEL.PRECISION": "fp32"},
        trainer_cfg=dict(N_CTX=2, N_PROMPT=4, PROMPT_BS=2, PREC="fp32"))
    native = str(tmp_path / "native")
    t.save_model(0, native)
    exported = str(tmp_path / "exported")
    paths = t.export_reference_checkpoint(native, exported, epoch=1)
    state = torch.load(paths[0], map_location="cpu",
                       weights_only=False)["state_dict"]
    assert tuple(state["ctx"].shape) == (4, 2, 64)

    # CPU oracle: the reference module hardcodes CUDA
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self)
    _orig_tensor = torch.tensor

    def _cpu_tensor(*a, **k):
        k.pop("device", None)
        return _orig_tensor(*a, **k)

    monkeypatch.setattr(torch, "tensor", _cpu_tensor)

    ref_proda = _load_ref_trainer_module(
        "trainers/classification/proda.py",
        "trainers.classification.proda")
    classnames = list(t.dm.dataset.classnames)
    cfg = _cfg_ns(
        TRAINER=_cfg_ns(PRODA=_cfg_ns(N_CTX=2, N_PROMPT=4, PROMPT_BS=2,
                                      ALPHA=0.1)),
        INPUT=_cfg_ns(SIZE=(32, 32)))
    ref_cc = ref_proda.CustomCLIP(cfg, classnames,
                                  copy.deepcopy(ref_clip)).eval()

    for k in ("token_prefix", "token_suffix",
              "nc_token_prefix", "nc_token_suffix"):
        state.pop(k, None)
    result = ref_cc.prompt_learner.load_state_dict(state, strict=False)
    assert result.unexpected_keys == []          # naming is exact
    assert "ctx" not in result.missing_keys

    ref_cc.set_classifier()
    t.set_classifier()

    rng = np.random.default_rng(4)
    images = rng.integers(0, 256, (5, 32, 32, 3), dtype=np.uint8)
    ours = np.asarray(t.model_inference(images)[0], np.float32)

    mean = np.asarray(t.cfg.INPUT.PIXEL_MEAN, np.float32)
    std = np.asarray(t.cfg.INPUT.PIXEL_STD, np.float32)
    x = (images.astype(np.float32) / 255.0 - mean) / std
    with torch.no_grad():
        theirs = ref_cc(torch.from_numpy(
            x.transpose(0, 3, 1, 2)))[0].numpy()

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Round-4 additions: the remaining trainable families + TempScaling's
# calibrated checkpoint, completing the 11/11 export-oracle matrix.
# ---------------------------------------------------------------------------

def _backbone_pair(tmp_path, monkeypatch, seed):
    """Reference torch CLIP at ViT-Test dims whose weights are shipped to
    our loader over the npz route (keeps the preset's 4 heads — the .pt
    route would infer width//64 = 1 head, reference ``clip/model.py:668``).
    Returns the reference model; CLIP_CHECKPOINT_DIR points at the npz."""
    import torch

    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.models.weights import (convert_torch_clip,
                                                     save_params)

    ref_model_mod = _load_standalone("ref_clip_model", "clip/model.py")
    torch.manual_seed(seed)
    vanilla = {"trainer": "CoOp", "vision_depth": 0, "language_depth": 0,
               "vision_ctx": 0, "language_ctx": 0}
    ref_clip = ref_model_mod.CLIP(32, 32, 2, 64, 8, 77, 49408, 64, 4, 2,
                                  design_details=vanilla).float().eval()
    sd = {k: v.detach().numpy() for k, v in ref_clip.state_dict().items()}
    params, _ = convert_torch_clip(sd, "float32",
                                   cfg=M.PRESETS["ViT-Test"])
    wdir = tmp_path / "weights"
    wdir.mkdir()
    save_params(str(wdir / "ViT-Test.npz"), params)
    monkeypatch.setenv("CLIP_CHECKPOINT_DIR", str(wdir))
    return ref_model_mod, ref_clip


def _export_state(t, tmp_path):
    """save_model -> export_reference_checkpoint -> torch state dict."""
    import torch
    native = str(tmp_path / "native")
    t.save_model(0, native)
    exported = str(tmp_path / "exported")
    paths = t.export_reference_checkpoint(native, exported, epoch=1)
    state = torch.load(paths[0], map_location="cpu",
                       weights_only=False)["state_dict"]
    return state, paths


def _assert_logits_match(t, ref_forward, seed, n=5):
    """Same uint8 images through both stacks at fp32."""
    import torch
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
    ours = np.asarray(t.model_inference(images)[0], np.float32)
    mean = np.asarray(t.cfg.INPUT.PIXEL_MEAN, np.float32)
    std = np.asarray(t.cfg.INPUT.PIXEL_STD, np.float32)
    x = (images.astype(np.float32) / 255.0 - mean) / std
    with torch.no_grad():
        theirs = ref_forward(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    if isinstance(theirs, tuple):
        theirs = theirs[0]
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=2e-4, atol=2e-4)


def _neutralize_cuda(monkeypatch):
    import torch
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self)


def test_coop_export_runs_in_reference_stack(tmp_path, monkeypatch):
    """CoOp (the whole CoOp-family checkpoint layout: a bare ``ctx``
    under ``prompt_learner/``, reference ``coop.py:262``) consumed by the
    reference's own CustomCLIP."""
    _, ref_clip = _backbone_pair(tmp_path, monkeypatch, seed=5)

    from helpers import build_synthetic_trainer
    t = build_synthetic_trainer(
        "CoOp", tmp_path / "data", output_dir=tmp_path / "out",
        overrides={"MODEL.PRECISION": "fp32"},
        trainer_cfg=dict(N_CTX=4, CTX_INIT="", PREC="fp32"))
    state, _ = _export_state(t, tmp_path)

    ref_coop = _load_ref_trainer_module(
        "trainers/classification/coop.py", "trainers.classification.coop")
    cfg = _cfg_ns(
        TRAINER=_cfg_ns(COOP=_cfg_ns(N_CTX=4, CTX_INIT="", CSC=False,
                                     CLASS_TOKEN_POSITION="end")),
        INPUT=_cfg_ns(SIZE=(32, 32)))
    ref_cc = ref_coop.CustomCLIP(cfg, list(t.dm.dataset.classnames),
                                 ref_clip).eval()
    for k in ("token_prefix", "token_suffix"):
        state.pop(k, None)
    result = ref_cc.prompt_learner.load_state_dict(state, strict=False)
    assert result.unexpected_keys == []
    assert "ctx" not in result.missing_keys
    _assert_logits_match(t, ref_cc, seed=5)


def test_kgcoop_export_runs_in_reference_stack(tmp_path, monkeypatch):
    """KgCoOp: shares CoOp's checkpoint layout but with the CTX_INIT=True
    -> "a photo of a" embedding init (reference ``kgcoop.py:102-107``).
    The reference PromptLearner builds a frozen zero-shot teacher in its
    constructor (``kgcoop.py:151-165``) — load_clip_to_cpu is patched to
    the shared backbone and CUDA neutralized for the CPU oracle."""
    import copy
    _, ref_clip = _backbone_pair(tmp_path, monkeypatch, seed=6)

    from helpers import build_synthetic_trainer
    t = build_synthetic_trainer(
        "KgCoOp", tmp_path / "data", output_dir=tmp_path / "out",
        overrides={"MODEL.PRECISION": "fp32"},
        trainer_cfg=dict(N_CTX=4, CTX_INIT=True, PREC="fp32", W=8.0))
    state, _ = _export_state(t, tmp_path)

    _neutralize_cuda(monkeypatch)
    ref_kg = _load_ref_trainer_module(
        "trainers/classification/kgcoop.py",
        "trainers.classification.kgcoop")
    monkeypatch.setattr(ref_kg, "load_clip_to_cpu",
                        lambda cfg: copy.deepcopy(ref_clip))
    monkeypatch.setitem(ref_kg.CUSTOM_TEMPLATES, "Synthetic",
                        "a photo of a {} pattern.")
    cfg = _cfg_ns(
        TRAINER=_cfg_ns(KGCOOP=_cfg_ns(N_CTX=4, CTX_INIT=True, CSC=False,
                                       CLASS_TOKEN_POSITION="end", W=8.0)),
        INPUT=_cfg_ns(SIZE=(32, 32)),
        DATASET=_cfg_ns(NAME="Synthetic"),
        MODEL=_cfg_ns(BACKBONE=_cfg_ns(NAME="ViT-Test")))
    ref_cc = ref_kg.CustomCLIP(cfg, list(t.dm.dataset.classnames),
                               ref_clip).eval()
    for k in ("token_prefix", "token_suffix"):
        state.pop(k, None)
    result = ref_cc.prompt_learner.load_state_dict(state, strict=False)
    assert result.unexpected_keys == []
    assert "ctx" not in result.missing_keys
    _assert_logits_match(t, ref_cc, seed=6)


def test_prograd_export_runs_in_reference_stack(tmp_path, monkeypatch):
    """ProGrad: CoOp layout with its own PromptLearner (reference
    ``prograd.py:76-160``); random-init branch on both sides (the
    template-tail CTX_INIT branch mangles templates that don't end in
    " {}." — reference ``prograd.py:89-90`` — so the oracle pins the
    CSC=False/end-position random path its fewshot configs use)."""
    _, ref_clip = _backbone_pair(tmp_path, monkeypatch, seed=7)

    from helpers import build_synthetic_trainer
    t = build_synthetic_trainer(
        "ProGrad", tmp_path / "data", output_dir=tmp_path / "out",
        overrides={"MODEL.PRECISION": "fp32"},
        trainer_cfg=dict(N_CTX=4, CTX_INIT=False, PREC="fp32"))
    state, _ = _export_state(t, tmp_path)

    _neutralize_cuda(monkeypatch)
    ref_pg = _load_ref_trainer_module(
        "trainers/classification/prograd.py",
        "trainers.classification.prograd")
    cfg = _cfg_ns(
        TRAINER=_cfg_ns(PROGRAD=_cfg_ns(N_CTX=4, CTX_INIT="", CSC=False,
                                        CLASS_TOKEN_POSITION="end")),
        INPUT=_cfg_ns(SIZE=(32, 32)),
        DATASET=_cfg_ns(NAME="Synthetic"))
    ref_cc = ref_pg.CustomCLIP(cfg, list(t.dm.dataset.classnames),
                               ref_clip).eval()
    for k in ("token_prefix", "token_suffix"):
        state.pop(k, None)
    result = ref_cc.prompt_learner.load_state_dict(state, strict=False)
    assert result.unexpected_keys == []
    assert "ctx" not in result.missing_keys
    _assert_logits_match(t, ref_cc, seed=7)


def test_vpt_export_runs_in_reference_stack(tmp_path, monkeypatch):
    """VPT: the trainables live INSIDE the reference vision tower
    (``image_encoder.VPT`` + per-layer ``resblocks.N.VPT_shallow``,
    design ``vpt.py:34-41``); the reference registers the whole
    CustomCLIP under "prompt_learner" (``vpt.py:162``), so the export is
    a whole-model state dict. Fixed text embeddings are recomputed from
    classnames on both sides."""
    import torch
    ref_model_mod, ref_vanilla = _backbone_pair(tmp_path, monkeypatch,
                                                seed=8)

    from helpers import build_synthetic_trainer
    t = build_synthetic_trainer(
        "VPT", tmp_path / "data", output_dir=tmp_path / "out",
        overrides={"MODEL.PRECISION": "fp32"},
        trainer_cfg=dict(N_CTX_VISION=2, PROMPT_DEPTH_VISION=2,
                         PREC="fp32"))
    state, _ = _export_state(t, tmp_path)

    # vanilla backbone weights into a VPT-design reference CLIP (the
    # in-tower prompt params are extra; the export overrides every one)
    vpt_design = {"trainer": "VPT", "vision_depth": 2, "vision_ctx": 2,
                  "language_depth": 0, "language_ctx": 0}
    torch.manual_seed(80)
    ref_vpt_clip = ref_model_mod.CLIP(
        32, 32, 2, 64, 8, 77, 49408, 64, 4, 2,
        design_details=vpt_design).float().eval()
    res = ref_vpt_clip.load_state_dict(ref_vanilla.state_dict(),
                                       strict=False)
    assert res.unexpected_keys == []  # vanilla ⊂ VPT design

    _neutralize_cuda(monkeypatch)
    ref_vpt = _load_ref_trainer_module(
        "trainers/classification/vpt.py", "trainers.classification.vpt")
    cfg = _cfg_ns(
        TRAINER=_cfg_ns(VPT=_cfg_ns(N_CTX_VISION=2,
                                    PROMPT_DEPTH_VISION=2)),
        INPUT=_cfg_ns(SIZE=(32, 32)))
    ref_cc = ref_vpt.CustomCLIP(cfg, list(t.dm.dataset.classnames),
                                ref_vpt_clip).float().eval()

    assert {"image_encoder.VPT",
            "image_encoder.transformer.resblocks.1.VPT_shallow"
            } <= set(state)
    result = ref_cc.load_state_dict(state, strict=False)
    assert result.unexpected_keys == []
    _assert_logits_match(t, ref_cc, seed=8)


def test_taskres_export_runs_in_reference_stack(tmp_path, monkeypatch):
    """TaskRes: ``text_feature_residuals`` consumed by the reference's
    TaskResLearner (``taskres.py:96-106``); base text features are
    recomputed from the dataset template on both sides, and the residual
    is perturbed from its zero init so the gate is not vacuous."""
    import jax
    import jax.numpy as jnp
    _, ref_clip = _backbone_pair(tmp_path, monkeypatch, seed=9)

    from helpers import build_synthetic_trainer
    t = build_synthetic_trainer(
        "TaskRes", tmp_path / "data", output_dir=tmp_path / "out",
        # the config node is cfg.TRAINER.TaskRes (mixed case, matching
        # the reference), so dotted overrides instead of trainer_cfg
        overrides={"MODEL.PRECISION": "fp32",
                   "TRAINER.TaskRes.PREC": "fp32",
                   "TRAINER.TaskRes.RESIDUAL_SCALE": 0.5,
                   "TRAINER.TaskRes.ENHANCED_BASE": "none"})
    slot = t._models["taskres_learner"]
    slot["params"]["residual"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), slot["params"]["residual"].shape,
        jnp.float32)
    state, _ = _export_state(t, tmp_path)

    _neutralize_cuda(monkeypatch)
    _load_ref_trainer_module(
        "trainers/classification/imagenet_templates.py",
        "trainers.classification.imagenet_templates")
    ref_tr = _load_ref_trainer_module(
        "trainers/classification/taskres.py",
        "trainers.classification.taskres")
    monkeypatch.setitem(ref_tr.CUSTOM_TEMPLATES, "Synthetic",
                        "a photo of a {} pattern.")
    cfg = _cfg_ns(
        TRAINER=_cfg_ns(TaskRes=_cfg_ns(RESIDUAL_SCALE=0.5,
                                        ENHANCED_BASE="none")),
        INPUT=_cfg_ns(SIZE=(32, 32)),
        DATASET=_cfg_ns(NAME="Synthetic"))
    ref_cc = ref_tr.CustomCLIP(cfg, list(t.dm.dataset.classnames),
                               ref_clip).eval()
    assert set(state) == {"text_feature_residuals"}
    result = ref_cc.prompt_learner.load_state_dict(state, strict=False)
    assert result.unexpected_keys == []
    assert result.missing_keys == ["base_text_features"]
    _assert_logits_match(t, ref_cc, seed=9)


def test_clip_adapter_export_runs_in_reference_stack(tmp_path,
                                                     monkeypatch):
    """CLIP-Adapter: bias-free fc.0/fc.2 Linears under ``adapter/``
    (reference ``clip_adapter.py:141-151,230``). The reference hardcodes
    Adapter(512) for ViT-B/16 (``clip_adapter.py:163``); the oracle
    instantiates the reference's own Adapter class at the ViT-Test embed
    dim instead."""
    _, ref_clip = _backbone_pair(tmp_path, monkeypatch, seed=10)

    from helpers import build_synthetic_trainer
    t = build_synthetic_trainer(
        "CLIP_Adapter", tmp_path / "data", output_dir=tmp_path / "out",
        overrides={"MODEL.PRECISION": "fp32",
                   "TRAINER.COOP.PREC": "fp32"},
        trainer_cfg=dict(CTX_INIT="a photo of a", RATIO=0.2))
    state, _ = _export_state(t, tmp_path)

    _neutralize_cuda(monkeypatch)
    ref_ca = _load_ref_trainer_module(
        "trainers/classification/clip_adapter.py",
        "trainers.classification.clip_adapter")
    cfg = _cfg_ns(
        TRAINER=_cfg_ns(
            CLIP_ADAPTER=_cfg_ns(CTX_INIT="a photo of a", RATIO=0.2),
            COOP=_cfg_ns(N_CTX=4, CLASS_TOKEN_POSITION="end")),
        INPUT=_cfg_ns(SIZE=(32, 32)))
    ref_cc = ref_ca.CustomCLIP(cfg, list(t.dm.dataset.classnames),
                               ref_clip).eval()
    ref_cc.adapter = ref_ca.Adapter(32, 4).float().eval()

    assert set(state) == {"fc.0.weight", "fc.2.weight"}
    ref_cc.adapter.load_state_dict(state, strict=True)
    _assert_logits_match(t, ref_cc, seed=10)


def test_tempscaling_calibrated_export_loads_in_reference_loader(
        tmp_path, monkeypatch):
    """TempScaling's ``model-calibrated.pth.tar-N`` export driven through
    the reference's OWN ``TempScaling.load_model`` key surgery
    (``tempscaling.py:260-301``: ``<dir>/tempscaling/model-calibrated.
    pth.tar-<N>``, strict=True into its ScaleLearner whose parameter is
    ``logit_scale``), then the loaded learner's temperature math checked
    against our serving logits."""
    import torch

    from helpers import build_synthetic_trainer
    t = build_synthetic_trainer(
        "TempScaling", tmp_path / "data", output_dir=tmp_path / "out",
        overrides={"CALIBRATION.SCALING.BASE_LEARNER": "CoOp",
                   "MODEL.PRECISION": "fp32",
                   "TRAINER.COOP.PREC": "fp32",
                   "TRAINER.COOP.N_CTX": 4})
    import jax.numpy as jnp
    t._models["scale_learner"]["params"]["scale"] = jnp.asarray(
        np.log(2.5), jnp.float32)
    state, paths = _export_state(t, tmp_path)
    assert set(state) == {"logit_scale"}
    assert paths[0].endswith(
        osp.join("tempscaling", "model-calibrated.pth.tar-1"))

    # reference module: extend the dassl/trainers stubs with the names
    # its calibration-side import list pulls in
    _load_ref_trainer_module(
        "trainers/classification/imagenet_templates.py",
        "trainers.classification.imagenet_templates")  # base stubs
    utils = sys.modules["dassl.utils"]
    for n in ("MetricMeter", "AverageMeter", "tolist_if_not",
              "count_num_param", "save_checkpoint", "mkdir_if_missing",
              "resume_from_checkpoint"):
        if not hasattr(utils, n):
            setattr(utils, n, lambda *a, **k: None)
    if "dassl.data" not in sys.modules:
        data = types.ModuleType("dassl.data")
        data.DataManager = object
        sys.modules["dassl.data"] = data
    if "trainers.calibration" not in sys.modules:
        tc = types.ModuleType("trainers.calibration")
        tc.__path__ = []
        sys.modules["trainers.calibration"] = tc
    if "trainers.calibration.basemodel_loader" not in sys.modules:
        bm = types.ModuleType("trainers.calibration.basemodel_loader")
        bm.get_base_model = lambda *a, **k: None
        sys.modules["trainers.calibration.basemodel_loader"] = bm
    ref_ts = _load_standalone("ref_tempscaling",
                              "trainers/calibration/tempscaling.py")
    # the reference's load_checkpoint comes from dassl; give it the real
    # torch deserialization it wraps
    monkeypatch.setattr(
        ref_ts, "load_checkpoint",
        lambda p: torch.load(p, map_location="cpu", weights_only=False))

    learner = ref_ts.ScaleLearner(None, torch.float32)
    stub = types.SimpleNamespace(
        _models={"tempscaling": learner},
        get_model_names=lambda: ["tempscaling"])
    exported_dir = osp.dirname(osp.dirname(paths[0]))
    ref_ts.TempScaling.load_model(stub, exported_dir, epoch=1)

    # the loaded ScaleLearner reproduces our fitted temperature...
    with torch.no_grad():
        assert abs(float(learner()) - 2.5) < 1e-6
    # ...and composes to the same tempered logits the reference's
    # CustomCLIPCalibration would produce (scale * unit-cosine,
    # tempscaling.py:44-59) == our TempScaling.model_inference
    rng = np.random.default_rng(11)
    images = rng.integers(0, 256, (5, 32, 32, 3), dtype=np.uint8)
    ours = np.asarray(t.model_inference(images)[0], np.float32)
    cos, _, _ = t._unit_logits(images)
    with torch.no_grad():
        theirs = (learner() * torch.from_numpy(cos)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
