"""Standalone batch-inference API — no dataset directory required.

The training/eval stack (reference ``train.py`` flow) builds trainers
through a DataManager, so even pure inference needs an on-disk dataset.
For deployment that is the wrong shape: serving wants (weights,
classnames) -> calibrated probabilities. ``Predictor`` provides exactly
that on top of the same pure-function model stack:

- zero-shot CLIP from a backbone name + classnames + template
  (reference ``trainers/classification/zsclip.py:74-102`` semantics), or
- a prompt-tuned model from a CoOp-family checkpoint
  (``from_prompt_checkpoint``; reads the reference's torch
  ``model.pth.tar-N`` files or this framework's npz checkpoints).

Batches are padded to a fixed size so the jit-compiled encode never
retraces; optional DAC class confidences run through the fused scoring
kernel (``ops/scoring.py``). Images enter as uint8 NHWC at the model
resolution — use ``data/transforms.build_transform`` (or any resize) for
host-side geometry.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .models import clip as M
from .models.backbone import load_clip_backbone
from .models.tokenizer import tokenize
from .ops.preprocess import (CLIP_PIXEL_MEAN, CLIP_PIXEL_STD,
                             device_preprocess, normalize_images)
from .ops.scoring import fused_dac_scores

# Max in-flight chunks per predict() call: enough to overlap transfers
# with compute, small enough that the enqueued uint8 input buffers never
# pressure HBM on very large image sets (each pending chunk pins its
# input batch on device until fetched).
_MAX_IN_FLIGHT = 4


def _drain_batched(images: np.ndarray, batch_size: int, dispatch,
                   fetch, bucket: bool = False) -> np.ndarray:
    """Shared serving drive loop: pad each chunk to ``batch_size``
    (static shapes — jit never retraces), dispatch asynchronously with a
    bounded in-flight window (queued input buffers never accumulate on
    device), fetch fp32 rows, trim the pad.

    ``bucket``: pad a SHORT chunk to the next power of two instead of
    the full ``batch_size`` — a lone request then costs a 1-image
    encode, not a ``batch_size``-image one (the latency case the HTTP
    server's micro-batching feeds). Each bucket is one extra compile
    (cached); full chunks are untouched. Off for sharded predictors:
    every batch must stay divisible by the data-axis size."""
    n = images.shape[0]
    pending, done = [], []
    for i in range(0, n, batch_size):
        batch = images[i:i + batch_size]
        short = batch.shape[0]
        if short < batch_size:
            target = batch_size
            if bucket:
                target = 1
                while target < short:
                    target *= 2
            if short < target:
                pad = np.repeat(batch[-1:], target - short, axis=0)
                batch = np.concatenate([batch, pad])
        pending.append(dispatch(batch))
        if len(pending) >= _MAX_IN_FLIGHT:
            done.append(fetch(pending.pop(0)))
    done.extend(fetch(p) for p in pending)
    return np.concatenate(done)[:n]


class Predictor:
    """Batched calibrated image classification over fixed classnames.

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``data`` axis — the
    encode then runs SPMD with the image batch sharded over the axis and
    the weights replicated (XLA inserts the collectives). ``batch_size``
    is rounded up to a multiple of the axis size so every shard gets
    identical shapes. A mesh with a ``model`` axis > 1 additionally runs
    the ViT tower TENSOR-parallel (attention heads / MLP hidden sharded
    over ``model``, two psums per layer — ``parallel/tp.py``): the
    latency lever the reference's ``nn.DataParallel`` batch split
    (``coop.py:268-272``) cannot provide. ResNet backbones are
    data-parallel only (a model axis > 1 raises).

    ``quantize="int8"``: weight-only int8 on the vision tower (per-
    output-channel scales, dequant fused into each matmul — see
    ``ops/quant.py``); halves the serving weight footprint/bandwidth.
    ``quantize="w8a8"`` additionally runs the tower matmuls int8 x int8
    on the MXU's double-rate int8 path. Pass ``calibration_images`` (a
    representative uint8 batch, any HxW — it goes through the same
    preprocessing as requests) to use STATIC calibrated activation
    scales — the configuration that actually beats bf16 at large batch
    (docs/PERFORMANCE.md "Quantized serving"); without them activations
    quantize dynamically per row, which is calibration-free but whose
    extra per-GEMM abs-max pass costs the int8 win back. With static
    scales attached, compiled buckets below 8 rows automatically trace
    the dynamic epilogue instead (same int8 weights, zero extra
    memory): the measured ordering inverts at tiny batches (b1 static
    0.89x vs dynamic 1.10x bf16), so each bucket gets the epilogue
    that wins at its shape.
    ``act_scales``: previously captured stats (an npz path written by
    ``ops/quant.save_act_stats`` from ``self.act_stats``, or the stats
    pytree) — the static-scale configuration without calibration
    images on this host, bitwise-identical to calibrating live.
    Text features and calibration math stay full precision. ViT only.
    """

    def __init__(self, backbone: str, classnames: Sequence[str],
                 template: str = "a photo of a {}.",
                 precision: str = "bf16", batch_size: int = 64,
                 class_confidence: Optional[np.ndarray] = None,
                 temperature: Optional[float] = None,
                 mesh=None,
                 pixel_stats=(CLIP_PIXEL_MEAN, CLIP_PIXEL_STD),
                 preprocess_on_device: bool = False,
                 quantize: Optional[str] = None,
                 calibration_images: Optional[np.ndarray] = None,
                 act_scales=None,
                 _text_features: Optional[jnp.ndarray] = None):
        self.classnames = list(classnames)
        self.batch_size = int(batch_size)
        self.preprocess_on_device = bool(preprocess_on_device)
        self.mesh = mesh
        if mesh is not None:
            n_data = mesh.shape["data"]
            self.batch_size = -(-self.batch_size // n_data) * n_data
        self.params, self.cfg = load_clip_backbone(
            backbone, "float32" if precision == "fp32" else "bfloat16")
        self.dtype = (jnp.float32 if precision == "fp32"
                      else jnp.bfloat16)
        if quantize == "w8a8_kernel":
            # removed from the serving surface in round 5: the Mosaic
            # kernel measured below XLA's int8 dot at every serving
            # shape (docs/ROOFLINE.md); it survives as a benchmarks-
            # only contender via ops/quant.qdot(qmode="w8a8_kernel")
            raise ValueError(
                "quantize='w8a8_kernel' is no longer a serving mode "
                "(strictly slower than 'w8a8' on every measured shape "
                "— docs/ROOFLINE.md); use 'w8a8', or drive the Mosaic "
                "kernel directly through ops/quant.qdot for benchmarks")
        if quantize not in (None, "int8", "w8a8"):
            raise ValueError(f"quantize={quantize!r}: expected None, "
                             f"'int8' or 'w8a8'")
        if (calibration_images is not None or act_scales is not None) \
                and quantize != "w8a8":
            raise ValueError(
                "calibration_images/act_scales only apply to "
                "quantize='w8a8' (static activation scales — "
                "ops/quant.py)")
        if calibration_images is not None and act_scales is not None:
            raise ValueError(
                "pass calibration_images (calibrate now) OR act_scales "
                "(previously saved stats), not both")
        if quantize is not None:
            # int8 on the VISION tower (the per-request hot path):
            # "int8" = weight-only — halves its HBM weight footprint/
            # bandwidth, dequant fused into each layer's matmul;
            # "w8a8" additionally runs int8 x int8 matmuls, with
            # static calibrated activation scales when
            # calibration_images is given (attached below, after the
            # preprocessing constants are in scope). The text tower
            # stays full precision — it encodes once, right below, so
            # the class features are exact.
            from .ops.quant import quantize_clip_params
            self.params = quantize_clip_params(self.params)
        self.quantize = quantize
        qmode = quantize if quantize == "w8a8" else "dequant"

        if _text_features is None:
            prompts = [template.format(c.replace("_", " "))
                       for c in self.classnames]
            toks = tokenize(prompts)
            seq = M.eot_seq_len(toks)
            _text_features = jax.jit(
                lambda p, t: M.normalize(
                    M.encode_text(p, self.cfg, t, dtype=self.dtype,
                                  seq_len=seq)))(
                self.params, toks)
        self.text_features = _text_features

        # DAC per-class confidence (reference
        # distanse_aware_calibration.py) and/or a fitted temperature
        # (reference tempscaling.py): both post-hoc, both optional.
        if class_confidence is not None and \
                len(class_confidence) != len(self.classnames):
            # jit gathers CLAMP out-of-bounds preds, so a wrong-length
            # vector would silently mis-calibrate instead of raising
            raise ValueError(
                f"class_confidence has {len(class_confidence)} entries "
                f"for {len(self.classnames)} classnames")
        self.class_confidence = (
            None if class_confidence is None
            else jnp.asarray(class_confidence, jnp.float32))
        self.temperature = temperature

        dtype = self.dtype
        cfg = self.cfg
        # checkpoints carry no pixel stats, so serving cannot recover
        # how a model was trained — the default is the CLIP constants
        # every reference yaml uses; pass pixel_stats=(None, None) for
        # a model trained ToTensor-only, or the custom (mean, std)
        mean, std = pixel_stats

        self.act_stats = None
        if calibration_images is not None:
            # static w8a8: capture per-site activation absmax over the
            # calibration batch THROUGH the same preprocessing requests
            # get, then attach the scales (ops/quant.py). The dynamic
            # per-row abs-max pass disappears from the serving program.
            # The captured stats stay on ``self.act_stats`` so a
            # deployment can persist them (ops/quant.save_act_stats)
            # and later rebuild with ``act_scales=`` instead of
            # shipping calibration images to every serving host.
            from .ops.quant import (attach_act_scales,
                                    calibrate_image_act_scales)
            cal = jnp.asarray(np.asarray(calibration_images))
            res = cfg.image_resolution
            if cal.shape[1:3] != (res, res):
                cal = device_preprocess(cal, res, mean, std, dtype=dtype)
            else:
                cal = normalize_images(cal, mean, std, dtype=dtype)
            self.act_stats = jax.device_get(
                calibrate_image_act_scales(self.params, cfg, cal))
            self.params = attach_act_scales(self.params, self.act_stats)
        elif act_scales is not None:
            # previously captured stats: an npz path (save_act_stats)
            # or the stats pytree itself
            from .ops.quant import attach_act_scales, load_act_stats
            if isinstance(act_scales, (str, os.PathLike)):
                act_scales = load_act_stats(os.fspath(act_scales))
            self.act_stats = act_scales
            self.params = attach_act_scales(self.params, act_scales)

        from .parallel.tp import tower_tp

        tp = tower_tp(mesh)
        if tp is not None and not self.cfg.is_vit:
            # fail at construction, not at the first request's jit trace
            raise ValueError(
                "Tensor-parallel serving covers the ViT towers only; "
                "serve ResNet backbones on a data-only mesh "
                "(parallel/tp.py)")

        has_static_scales = self.act_stats is not None

        def encode(params, images):
            if images.shape[1:3] != (cfg.image_resolution,
                                     cfg.image_resolution):
                # resize + center-crop + normalize as jax ops, fused
                # into the encode program (BASELINE.json north star);
                # reached only with preprocess_on_device
                x = device_preprocess(images, cfg.image_resolution,
                                      mean, std, dtype=dtype)
            else:
                x = normalize_images(images, mean, std, dtype=dtype)
            # batch size is static under jit, so the int8 epilogue is
            # picked per compiled bucket: at batch 1 the static
            # epilogue has too few rows to amortize and the measured
            # ordering inverts (b1 static 0.89x vs dynamic 1.10x bf16;
            # static already wins at b2 1.08x and every larger batch —
            # docs/PERFORMANCE.md crossover sweep), so the 1-row
            # bucket traces the dynamic per-row path over the SAME
            # int8 weights; everything else keeps the calibrated
            # static scales.
            q = qmode
            if has_static_scales and images.shape[0] < 2:
                q = "w8a8_dynamic"
            return M.normalize(M.encode_image(params, cfg, x,
                                              dtype=dtype, tp=tp,
                                              qmode=q))

        def predict_step(params, text_features, images, scale, conf):
            # encode + calibrated scoring in ONE program: the image
            # features never leave the device (a D2H/H2D round-trip
            # between two separate dispatches costs more than the
            # encode itself on remote-attached chips)
            img_f = encode(params, images)
            probs, _ = fused_dac_scores(img_f, text_features, scale,
                                        conf, normalized=True)
            return probs

        if mesh is None:
            self._predict_step = jax.jit(predict_step)
        else:
            from .parallel.mesh import data_sharding, replicated

            repl = replicated(mesh)
            self.params = jax.device_put(self.params, repl)
            self._batch_sharding = data_sharding(mesh)
            self._predict_step = jax.jit(
                predict_step,
                in_shardings=(repl, repl, self._batch_sharding, repl,
                              repl),
                out_shardings=repl)

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_prompt_checkpoint(cls, backbone: str,
                               classnames: Sequence[str],
                               checkpoint_dir: str,
                               n_ctx: int = 16, ctx_init: str = "",
                               class_token_position: str = "end",
                               epoch: Optional[int] = None,
                               **kwargs) -> "Predictor":
        """CoOp-family prompt-tuned predictor from a checkpoint dir laid
        out like training output (``<dir>/prompt_learner/model.pth.tar-N``
        torch or .npz)."""
        from .engine.checkpoint import load_checkpoint, resolve_model_file
        from .trainers.coop import assemble_prompts, build_prompt_assembly
        import os.path as osp

        self = cls(backbone, classnames,
                   _text_features=jnp.zeros((0,)), **kwargs)
        path = resolve_model_file(
            osp.join(checkpoint_dir, "prompt_learner"), epoch)
        state = load_checkpoint(path)["state_dict"]
        state.pop("token_prefix", None)
        state.pop("token_suffix", None)
        ctx = jnp.asarray(np.asarray(state["ctx"], np.float32))
        if ctx.shape[-2] != n_ctx and ctx.ndim >= 2:
            n_ctx = ctx.shape[-2]

        asm = build_prompt_assembly(self.classnames, n_ctx,
                                    class_token_position, ctx_init,
                                    self.params, self.dtype)
        # jit gathers CLAMP out-of-bounds indices, so a layout mismatch
        # would silently duplicate context rows — validate instead
        want = ((len(self.classnames), asm["n_ctx"])
                if ctx.ndim == 3 else (asm["n_ctx"],))
        if tuple(ctx.shape[:-1]) != want:
            raise ValueError(
                f"checkpoint ctx shape {tuple(ctx.shape)} does not fit "
                f"the assembled prompt layout (expected leading dims "
                f"{want}); check n_ctx/ctx_init/classnames")
        prompts = assemble_prompts(ctx, asm)
        txt = jax.jit(lambda p, pr, eot: M.normalize(
            M.encode_text_embedded(p, self.cfg, pr, eot,
                                   seq_len=asm["seq_len"])))(
            self.params, prompts, asm["eot_pos"])
        self.text_features = txt
        return self

    # -- inference ------------------------------------------------------------
    def predict(self, images: np.ndarray) -> dict:
        """images: uint8 [N, H, W, 3] at the model resolution — or, with
        ``preprocess_on_device``, at any uniform source size (resize +
        center-crop run on device; one compile per distinct source
        resolution).

        Returns dict(probs [N, C] fp32, preds [N], confidences [N]).
        """
        images = np.asarray(images)
        if images.size == 0:  # upstream filters can drop every image
            n_cls = len(self.classnames)
            return {"probs": np.zeros((0, n_cls), np.float32),
                    "preds": np.zeros((0,), np.int64),
                    "confidences": np.zeros((0,), np.float32)}
        if images.dtype != np.uint8:
            raise ValueError("Predictor.predict expects uint8 images; "
                             "apply host-side geometry first")
        res = self.cfg.image_resolution
        if images.ndim != 4 or images.shape[-1] != 3 or (
                not self.preprocess_on_device
                and images.shape[1:3] != (res, res)):
            raise ValueError(
                f"expected [N, {res}, {res}, 3] images; got "
                f"{images.shape} — resize host-side "
                f"(data/transforms.build_transform) or construct with "
                f"preprocess_on_device=True")
        n = images.shape[0]
        scale = self.params["logit_scale"]
        if self.temperature is not None:
            # tempered logits: temperature REPLACES exp(logit_scale)
            # (reference tempscaling.py ScaleLearner semantics)
            scale = jnp.log(jnp.asarray(self.temperature, jnp.float32))
        conf = self.class_confidence
        if conf is None:
            conf = jnp.ones((len(self.classnames),), jnp.float32)

        probs = _drain_batched(
            images, self.batch_size,
            lambda b: self._predict_step(self.params, self.text_features,
                                         jnp.asarray(b), scale, conf),
            lambda p: np.asarray(p, np.float32),
            bucket=self.mesh is None)
        preds = probs.argmax(axis=1)
        return {"probs": probs, "preds": preds,
                "confidences": probs.max(axis=1)}


class _ServingLoaderStub:
    """Stands in for the train loader in serving builds: trainers size
    their LR schedules by ``len(train_loader_x)`` at build time, nothing
    else is touched (serving never trains)."""

    def __len__(self):
        return 1

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        return iter(())


class _ServingDataManager:
    """Classnames-only DataManager stand-in: everything the trainers
    read from ``self.dm`` at build/inference time (``dataset.classnames``,
    ``num_classes``, ``lab2cname``), with no dataset directory behind it."""

    def __init__(self, classnames: Sequence[str]):
        import types

        cns = list(classnames)
        self.dataset = types.SimpleNamespace(classnames=cns,
                                             num_classes=len(cns))
        self.num_classes = len(cns)
        self.lab2cname = {i: c for i, c in enumerate(cns)}
        self.train_loader_x = _ServingLoaderStub()
        self.val_loader = None
        self.test_loader = None


def build_serving_trainer(classnames: Sequence[str],
                          trainer_name: Optional[str] = None,
                          backbone: Optional[str] = None,
                          config_file: Optional[str] = None,
                          opts: Optional[Sequence] = None,
                          cfg=None):
    """Build a registered trainer WITHOUT a dataset directory.

    The reference serves its 9 learners through ``base_model/`` mirror
    classes (``trainers/calibration/basemodel_loader.py:19-40``), each of
    which still needs the training DataManager. Here any registered
    trainer builds from (classnames, config) alone: the DataManager is
    replaced by a classnames-only stub, everything else — prompt
    assembly, jit steps, checkpoint loading — is the product code path.

    Pass ``config_file``/``opts`` to reproduce the training
    hyperparameters (N_CTX, PROMPT_DEPTH, ...) of the checkpoint you are
    about to load via ``trainer.load_model``.
    """
    from .config import get_cfg_default
    from .engine.registry import TRAINER_REGISTRY
    from . import trainers as _register_trainers  # noqa: F401
    from .evaluators import vl_evaluator as _register_eval  # noqa: F401

    if cfg is not None:
        overrides = {"trainer_name": trainer_name, "backbone": backbone,
                     "config_file": config_file, "opts": opts}
        clash = [k for k, v in overrides.items() if v]
        if clash:
            # silently ignoring these would build a prompt layout that
            # does not match the checkpoint the caller loads next
            raise ValueError(
                f"build_serving_trainer: {clash} are ignored when an "
                f"explicit cfg is passed — bake them into the cfg, or "
                f"drop the cfg argument")
    if cfg is None:
        cfg = get_cfg_default()
        if config_file:
            # the given config reproduces the training run verbatim —
            # including whether it normalized at all
            cfg.merge_from_file(config_file)
        else:
            # serving default = the reference trainer yamls' normalize
            # block (CLIP pixel stats; every shipped config sets
            # exactly this) — the bare Dassl default of ToTensor-only
            # would make a checkpoint served without its config_file
            # normalize differently than it trained; Predictor uses
            # the same constants
            cfg.INPUT.PIXEL_MEAN = list(CLIP_PIXEL_MEAN)
            cfg.INPUT.PIXEL_STD = list(CLIP_PIXEL_STD)
            cfg.INPUT.TRANSFORMS = ("random_resized_crop",
                                    "random_flip", "normalize")
        if trainer_name:
            cfg.TRAINER.NAME = trainer_name
        if backbone:
            cfg.MODEL.BACKBONE.NAME = backbone
        cfg.TEST.EVALUATOR = "VLClassification"
        if opts:
            cfg.merge_from_list(list(opts))

    def serving_class(base_cls):
        class ServingTrainer(base_cls):
            def build_data_loader(self):
                self.dm = _ServingDataManager(classnames)
                self.train_loader_x = self.dm.train_loader_x
                self.val_loader = None
                self.test_loader = None
                self.num_classes = self.dm.num_classes
                self.lab2cname = self.dm.lab2cname

        ServingTrainer.__name__ = f"Serving{base_cls.__name__}"
        ServingTrainer.__qualname__ = ServingTrainer.__name__
        return ServingTrainer

    # Calibration wrappers (TempScaling, PTS) build their base
    # learner through TRAINER_REGISTRY.get inside build_model — route
    # those nested builds through the same dataset-free subclass for the
    # duration of this construction. The override is thread-local
    # (Registry.wrapped), so a concurrent build_trainer on another
    # thread sees the registry unchanged.
    with TRAINER_REGISTRY.wrapped(serving_class):
        trainer = TRAINER_REGISTRY.get(cfg.TRAINER.NAME)(cfg)
    return trainer


class TrainerPredictor:
    """Serve ANY built trainer through its own inference step.

    ``Predictor`` covers zero-shot and CoOp-family checkpoints;
    this wraps a trainer object (MaPLe, PromptSRC, VPT, TempScaling,
    ...) — whatever ``model_inference`` computes is what gets served,
    with serving-side static-shape batching and optional DAC class
    confidences applied exactly as the eval pipeline does (reference
    ``vl_calibrator.py``: DAC scales logits first, softmax after), as a
    jit program on device — the logits never reach the host, only the
    calibrated probabilities are fetched. For a fitted temperature,
    build a TempScaling trainer around the base learner and wrap THAT —
    its ``model_inference`` already returns tempered logits.

    ``from_checkpoint`` builds the trainer dataset-free (classnames +
    config + checkpoint dir), covering the prompt families ``Predictor``
    cannot reconstruct from a ctx tensor alone (MaPLe's coupled deep
    prompts, PromptSRC's dual prompts, VPT's visual prompts).
    """

    def __init__(self, trainer, class_confidence=None,
                 batch_size: Optional[int] = None):
        self.trainer = trainer
        self.batch_size = int(batch_size
                              or trainer.cfg.DATALOADER.TEST.BATCH_SIZE)
        if trainer.mesh is not None:
            # round up to the data axis so every padded chunk divides
            # evenly and put_batch never falls back single-device
            n_data = trainer.mesh.shape["data"]
            self.batch_size = -(-self.batch_size // n_data) * n_data
        n_cls = trainer.dm.num_classes
        if class_confidence is not None and \
                len(class_confidence) != n_cls:
            # the device gather clamps out-of-bounds preds — validate
            # here so a base-fit vector served against base+new classes
            # fails loudly (the old numpy path raised IndexError)
            raise ValueError(
                f"class_confidence has {len(class_confidence)} entries "
                f"for {n_cls} classes")
        # device array once — predict() reuses it (on the remote tunnel
        # a per-call H2D upload would add avoidable latency)
        self.class_confidence = jnp.asarray(
            np.ones((n_cls,), np.float32) if class_confidence is None
            else np.asarray(class_confidence, np.float32))

        def score(logits, conf):
            # device-side DAC + softmax, fused with nothing to fetch
            # but the probabilities (reference vl_calibrator.py order:
            # row-scale the logits by the argmax class confidence,
            # THEN softmax)
            lg = logits.astype(jnp.float32)
            preds = jnp.argmax(lg, axis=1)
            lg = lg * conf.astype(jnp.float32)[preds][:, None]
            return jax.nn.softmax(lg, axis=-1)

        self._score_step = jax.jit(score)

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str,
                        classnames: Sequence[str],
                        trainer_name: Optional[str] = None,
                        backbone: Optional[str] = None,
                        config_file: Optional[str] = None,
                        opts: Optional[Sequence] = None,
                        epoch: Optional[int] = None,
                        class_confidence=None,
                        batch_size: Optional[int] = None
                        ) -> "TrainerPredictor":
        """Dataset-free serving for any trainer family: build the
        trainer from (classnames, config), load its checkpoint dir
        (reference torch ``model.pth.tar-N`` or native npz), serve."""
        trainer = build_serving_trainer(
            classnames, trainer_name=trainer_name, backbone=backbone,
            config_file=config_file, opts=opts)
        trainer.load_model(checkpoint_dir, epoch)
        return cls(trainer, class_confidence=class_confidence,
                   batch_size=batch_size)

    def predict(self, images: np.ndarray) -> dict:
        """images: uint8 [N, H, W, 3] at the model resolution."""
        images = np.asarray(images)
        n_cls = self.trainer.dm.num_classes
        if images.size == 0:
            return {"probs": np.zeros((0, n_cls), np.float32),
                    "preds": np.zeros((0,), np.int64),
                    "confidences": np.zeros((0,), np.float32)}
        if images.dtype != np.uint8 or images.ndim != 4 or \
                images.shape[-1] != 3:
            # trainers normalize uint8 on device — float input would be
            # silently re-scaled into garbage, not an error; channels-
            # first [N,3,H,W] would mix channels into spatial positions
            raise ValueError(
                f"TrainerPredictor.predict expects uint8 [N, H, W, 3] "
                f"images; got {images.dtype} {images.shape} — apply "
                f"host-side geometry first "
                f"(data/transforms.build_transform)")
        n = images.shape[0]
        from .parallel.mesh import to_host_global
        conf = self.class_confidence

        def dispatch(batch):
            logits, _, _ = self.trainer.model_inference(batch)
            return self._score_step(logits, conf)  # probs on device

        probs = _drain_batched(
            images, self.batch_size, dispatch,
            lambda p: to_host_global(p).astype(np.float32))
        preds = probs.argmax(axis=1)
        return {"probs": probs, "preds": preds,
                "confidences": probs.max(axis=1)}
