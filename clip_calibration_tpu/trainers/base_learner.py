"""VLBaseLearner: the calibrated-evaluation pipeline.

Parity target: ``/root/reference/trainers/classification/base_learner.py``.
``test()`` runs the inference loop, persists/loads the cross-run feature
caches (``./temp/base_features/...`` and ``./temp/knndist/...`` — the
filesystem handshake that coordinates the ZeroshotCLIP-base -> trainer-base
-> new-class-eval pipeline), assembles the 4-way text-feature dict, fits
VLCalibration, computes test-set proximity, and evaluates calibrated
probabilities.

TPU notes: the eval loop feeds padded static-shape uint8 batches into one
jit-compiled inference step; text features are computed once per class set
(the reference re-encodes the text tower every batch). Feature caches are
npz payloads kept under the reference's exact paths/filenames (a torch
reader covers caches produced by the reference).
"""

from __future__ import annotations

import functools
import os
import os.path as osp

import numpy as np

from ..engine.registry import TRAINER_REGISTRY
from ..engine.trainer import TrainerX
from ..models import clip as M
from ..models.backbone import load_clip_backbone
from ..models.tokenizer import tokenize
from ..parallel.mesh import to_host_global
from .calibration.proximity import (get_knn_dists, get_val_image_knn_dists,
                                    proximity_from_dists)
from .calibration.vl_calibrator import VLCalibration
from .templates import build_clip_templates

TEMP_ROOT = "./temp"


def _save_feature_dict(path: str, d: dict) -> None:
    os.makedirs(osp.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, **{k: np.asarray(v) for k, v in d.items()})


def _load_feature_dict(path: str) -> dict:
    import io
    try:
        with open(path, "rb") as f:
            data = np.load(io.BytesIO(f.read()), allow_pickle=False)
            out = {k: data[k] for k in data.files}
            # torch zip archives also open as npz but yield raw bytes
            if not out or not all(isinstance(v, np.ndarray)
                                  for v in out.values()):
                raise ValueError("not an npz feature cache")
            return out
    except (ValueError, OSError):
        import torch  # cache written by the torch reference
        d = torch.load(path, map_location="cpu", weights_only=False)
        return {k: np.asarray(v) for k, v in d.items()}


@functools.lru_cache(maxsize=2)
def _zs_clip_cached(backbone_name: str, ckpt_dir: str | None,
                    dtype_str: str = "bfloat16"):
    return load_clip_backbone(backbone_name, dtype_str)


def _zs_clip(backbone_name: str, precision: str = "bf16"):
    """Frozen zero-shot CLIP for calibration text features (reference
    ``tools/zsclip_encoder.py:29-48``), cached per backbone. The cache
    key includes CLIP_CHECKPOINT_DIR so switching weight dirs within one
    process (tests, notebooks) never serves stale params."""
    return _zs_clip_cached(
        backbone_name, os.environ.get("CLIP_CHECKPOINT_DIR"),
        "float32" if precision == "fp32" else "bfloat16")


def encode_classnames_zs(backbone_name: str, dataset_name: str,
                         classnames, template: str | None = None,
                         precision: str = "bf16") -> np.ndarray:
    """Zero-shot text features for the given class names, normalized."""
    import jax
    import jax.numpy as jnp
    params, ccfg = _zs_clip(backbone_name, precision)
    dtype = jnp.float32 if precision == "fp32" else jnp.bfloat16
    temp = template or build_clip_templates(dataset_name)
    prompts = [temp.format(c.replace("_", " ")) for c in classnames]
    toks = tokenize(prompts)
    seq = M.eot_seq_len(toks)
    feats = jax.jit(lambda p, t: M.normalize(
        M.encode_text(p, ccfg, t, dtype=dtype, seq_len=seq)))(
        params, toks)
    return np.asarray(feats, np.float32)


@TRAINER_REGISTRY.register()
class VLBaseLearner(TrainerX):
    """Base trainer for vision-language tuning and calibration."""

    #: True on trainers whose ``model_inference`` logits are exactly
    #: ``exp(logit_scale) * norm(img_f) @ norm(txt_f).T`` of the features
    #: it returns — the contract the fused DAC scoring kernel
    #: (ops/scoring.py) recomputes on device. False where the form
    #: differs: CoCoOp (per-image text features), ProDA (prompt-mean text
    #: features are not unit-norm), TempScaling/PTS (tempered scale).
    fused_dac_scoring = False

    def fused_dac_logit_scale(self):
        """Log logit-scale for the fused DAC scoring path, or None when
        this trainer's logits are not plain cosine scores."""
        if not self.fused_dac_scoring:
            return None
        return self.clip_params["logit_scale"]

    # -- quantized frozen vision tower (beyond-reference, opt-in) -----------
    #: True on trainers whose image tower consumes TRAINABLE prompt
    #: inputs (MaPLe/VPT/PromptSRC) — there the tower is on the gradient
    #: path and cannot run quantized.
    vision_tower_trainable = False
    #: encode_image qmode for the frozen tower ("dequant" = full
    #: precision on plain weights; set by setup_frozen_vision).
    vision_qmode = "dequant"

    @property
    def step_clip_params(self):
        """The frozen CLIP pytree the jitted steps consume: the plain
        ``clip_params`` unless ``TRAINER.QUANT_FROZEN_VISION`` swapped in
        a vision-tower-quantized copy (text leaves always shared, so the
        text path is bit-identical either way)."""
        p = getattr(self, "_step_clip_params", None)
        return self.clip_params if p is None else p

    def vision_qmode_for(self, batch_rows: int) -> str:
        """Per-batch-shape qmode: mirrors serving's per-bucket epilogue
        selection (docs/PERFORMANCE.md crossover sweep) — a single row
        cannot amortize the static int8 epilogue, so the b1-shaped
        compile traces the dynamic per-row path over the same int8
        weights (measured 1.10x vs 0.89x bf16 at b1)."""
        if self.vision_qmode == "w8a8" and batch_rows == 1:
            return "w8a8_dynamic"
        return self.vision_qmode

    def _calibration_images(self):
        """One raw uint8 image batch for static activation-scale
        calibration, preferring the train distribution."""
        for loader in (getattr(self, "train_loader_x", None),
                       getattr(self, "val_loader", None),
                       getattr(self, "test_loader", None)):
            if loader is None:
                continue
            # next(..., None) — serving builds carry loader stubs that
            # report len>0 but yield nothing (serving._ServingLoaderStub)
            batch = next(iter(loader), None)
            if batch is not None and "img" in batch:
                return batch["img"]
        raise ValueError(
            "TRAINER.QUANT_FROZEN_VISION=w8a8 needs a data loader to "
            "draw a calibration batch from; dataset-free serving builds "
            "have none — serve this checkpoint with the flag overridden "
            "(opts: TRAINER.QUANT_FROZEN_VISION '' for full precision, "
            "or 'int8' for calibration-free weight-only quantization)")

    def setup_frozen_vision(self):
        """Opt-in quantized frozen vision tower for training/eval
        (``TRAINER.QUANT_FROZEN_VISION`` — see config/defaults.py).

        Gradients in the accepting trainers flow only to prompt/adapter
        /residual pytrees, never through the image tower (its features
        enter every loss as constants w.r.t. the trainables), so running
        it int8 changes step numerics only by quantization noise while
        keeping the text tower, logits math and checkpoints exact.
        Measured step speedups in docs/PERFORMANCE.md ("Quantized
        frozen-tower training"). Call after ``clip_params``/
        ``compute_dtype`` exist and before building the jitted steps.
        """
        self.setup_eval_text_quant()  # universal flag validation
        mode = self.cfg.TRAINER.QUANT_FROZEN_VISION
        if not mode:
            return
        if mode not in ("int8", "w8a8"):
            raise ValueError(
                f"TRAINER.QUANT_FROZEN_VISION={mode!r}: expected '', "
                "'int8' or 'w8a8'")
        if self.vision_tower_trainable:
            raise ValueError(
                f"{type(self).__name__} trains vision-side prompts — the "
                "image tower is on the gradient path and cannot run "
                "quantized (TRAINER.QUANT_FROZEN_VISION applies to "
                "frozen-vision trainers only)")
        from ..ops import quant as Q
        from ..ops.preprocess import normalize_images
        qp = Q.quantize_clip_params(self.clip_params)
        if mode == "w8a8":
            import jax
            import jax.numpy as jnp
            images = np.ascontiguousarray(self._calibration_images())
            x = normalize_images(
                jnp.asarray(images), *self.pixel_stats,
                dtype=getattr(self, "compute_dtype", None) or jnp.bfloat16)
            stats = Q.calibrate_image_act_scales(qp, self.clip_cfg, x)
            if jax.process_count() > 1:
                # each host calibrated on ITS slice of the data — the
                # act_scale leaves must be identical on every process or
                # the "replicated" frozen pytree silently diverges
                # across the pod; absmax stats reduce with max
                from jax.experimental import multihost_utils
                stats = jax.tree.map(
                    lambda a: np.max(np.asarray(
                        multihost_utils.process_allgather(
                            np.asarray(a))), axis=0), stats)
            qp = Q.attach_act_scales(qp, stats)
        self._step_clip_params = qp
        self.vision_qmode = "w8a8" if mode == "w8a8" else "dequant"
        print(f"Frozen vision tower quantized: mode={mode} "
              f"(TRAINER.QUANT_FROZEN_VISION)")

    # -- quantized eval-time text fan-out (beyond-reference, opt-in) --------
    #: True on trainers whose EVAL re-runs the text tower per request
    #: (CoCoOp's per-image class encodes, ProDA's set_classifier sweep)
    #: — the only places a quantized text tower pays. One-shot class
    #: features (CoOp family) stay full precision by design.
    text_eval_quant_supported = False
    #: "", "int8" (weight-only) or "w8a8" (static calibrated scales);
    #: set by setup_eval_text_quant from TRAINER.QUANT_EVAL_TEXT.
    text_eval_quant = ""

    def setup_eval_text_quant(self):
        """Opt-in quantized text tower for the EVAL fan-out paths
        (``TRAINER.QUANT_EVAL_TEXT`` — see config/defaults.py). Eval
        runs no gradients, so unlike training (where prompt gradients
        flow THROUGH the text tower, pinning it to full precision —
        docs/ROOFLINE.md "text-tower bound") the per-request text
        encodes can take the int8 MXU path. Called from
        ``setup_frozen_vision`` so every trainer validates the flag."""
        mode = self.cfg.TRAINER.QUANT_EVAL_TEXT
        if not mode:
            return
        if mode not in ("int8", "w8a8"):
            raise ValueError(
                f"TRAINER.QUANT_EVAL_TEXT={mode!r}: expected '', "
                "'int8' or 'w8a8'")
        if not self.text_eval_quant_supported:
            raise ValueError(
                f"{type(self).__name__} encodes its class features once "
                "per eval — TRAINER.QUANT_EVAL_TEXT applies to the "
                "per-request text fan-out trainers (CoCoOp, ProDA) only")
        self.text_eval_quant = mode
        self._eval_text_params = None
        print(f"Eval text fan-out quantized: mode={mode} "
              f"(TRAINER.QUANT_EVAL_TEXT)")

    def text_eval_qmode(self) -> str:
        """encode_text qmode matching ``text_eval_quant`` ("dequant"
        runs weight-only int8 pairs at full-precision math)."""
        return "w8a8" if self.text_eval_quant == "w8a8" else "dequant"

    def invalidate_eval_text_quant(self):
        """Drop the cached quantized text pytree — call after any train
        step (the w8a8 activation scales derive from the LEARNED prompt
        pytree, so they go stale when it moves)."""
        self._eval_text_params = None

    def eval_text_clip_params(self):
        """The frozen pytree for eval-time text encodes: the step
        pytree with the TEXT tower's matmul weights as int8 pairs,
        plus calibrated static activation scales under "w8a8" (lazy;
        rebuilt after ``invalidate_eval_text_quant``). Calibration
        prompts come from the trainer's ``_text_calibration_prompts``
        (its own learned prompt rows) — deterministic given the
        checkpoint, identical on every host, so no pod reduce is
        needed (contrast ``setup_frozen_vision``, whose image stats
        come from per-host data slices)."""
        p = getattr(self, "_eval_text_params", None)
        if p is not None:
            return p
        from ..ops import quant as Q
        qp = Q.quantize_clip_params(self.step_clip_params,
                                    towers=("text",))
        if self.text_eval_quant == "w8a8":
            prompts, eots, seq_len = self._text_calibration_prompts()
            stats = Q.calibrate_text_act_scales(
                qp, self.clip_cfg, prompts, eots, seq_len=seq_len)
            qp = Q.attach_text_act_scales(qp, stats)
        self._eval_text_params = qp
        return qp

    def _text_calibration_prompts(self):
        """(embedded prompts [N, 77, D], eot_pos [N], seq_len) for text
        activation-scale calibration — supporting trainers override."""
        raise NotImplementedError(
            f"{type(self).__name__} supports TRAINER.QUANT_EVAL_TEXT "
            "but provides no calibration prompts")

    # -- cache paths (reference base_learner.py:106-108,123-134) ------------
    def _base_feature_dir(self, subsample: str) -> str:
        cfg = self.cfg
        return osp.join(TEMP_ROOT, "base_features", cfg.DATASET.NAME,
                        cfg.TRAINER.NAME,
                        "shots" + str(cfg.DATASET.NUM_SHOTS),
                        cfg.MODEL.BACKBONE.NAME, subsample,
                        "seed" + str(cfg.SEED))

    def _knndist_dir(self) -> str:
        cfg = self.cfg
        return osp.join(TEMP_ROOT, "knndist", cfg.DATASET.NAME,
                        cfg.TRAINER.NAME,
                        "shots" + str(cfg.DATASET.NUM_SHOTS),
                        cfg.MODEL.BACKBONE.NAME,
                        cfg.DATASET.SUBSAMPLE_CLASSES,
                        "seed" + str(cfg.SEED),
                        "nn" + str(cfg.CALIBRATION.PROCAL.IMAGE_K))

    # -- inference loop -------------------------------------------------------
    def _run_inference(self, data_loader):
        """Returns (logits, labels, image_features, text_features).

        Pipelined one deep: batch N+1's inference is dispatched (with
        its input transfer staged by ``_device_staged``) before batch
        N's outputs are fetched, so the per-batch D2H sync overlaps the
        next batch's compute instead of stalling the device."""
        logits_all, labels_all, img_f_all = [], [], []
        text_features = None
        pending = None

        def collect(p):
            # to_host_global materializes pod-global (data-sharded)
            # arrays on every host in mesh data-axis order; host/
            # replicated arrays convert as-is. n is the GLOBAL real-row
            # count (data/loader.py), matching the global row layout.
            (output, img_f, txt_f), n, labels = p
            logits_all.append(
                to_host_global(output).astype(np.float32)[:n])
            img_f_all.append(to_host_global(img_f).astype(np.float32)[:n])
            labels_all.append(to_host_global(labels)[:n])
            return txt_f

        for batch in self._device_staged(data_loader):
            images, labels = self.parse_batch_test(batch)
            out = self.model_inference(images)  # async dispatch
            if pending is not None:
                text_features = collect(pending)
            pending = (out, batch["n_real"], labels)
        if pending is not None:
            text_features = collect(pending)
        return (np.concatenate(logits_all), np.concatenate(labels_all),
                np.concatenate(img_f_all),
                to_host_global(text_features).astype(np.float32))

    # -- the generic testing pipeline (reference base_learner.py:59-152) ----
    def test(self, split=None):
        self.set_model_mode("eval")
        self.evaluator.reset()
        cfg = self.cfg

        if not cfg.CALIBRATION.SCALING.IF_SCALING and \
                cfg.TRAINER.NAME == "ProDA":
            self.set_classifier()

        if split is None:
            split = cfg.TEST.SPLIT
        if split == "val" and self.val_loader is not None:
            data_loader = self.val_loader
        else:
            split = "test"
            data_loader = self.test_loader
        print(f"Evaluate on the *{split}* set")

        logits, labels, image_features_test, text_features_test = \
            self._run_inference(data_loader)

        # cache base-class val features (trains the calibrator downstream)
        if cfg.DATASET.SUBSAMPLE_CLASSES == "base":
            self.save_base_val_features()

        val_feature_path = osp.join(self._base_feature_dir("base"),
                                    "base_features.pt")
        val_dict = _load_feature_dict(val_feature_path)

        calibrator = VLCalibration(
            cfg,
            cfg.CALIBRATION.BASE_CALIBRATION_MODE,
            cfg.CALIBRATION.BIN.BIN_CALIBRATOR_NAME,
            cfg.CALIBRATION.DAC.IF_DAC,
            cfg.CALIBRATION.PROCAL.IF_PROCAL,
            val_dict,
            self.get_text_features(text_features_test,
                                   val_dict=val_dict))
        calibrator.fit()

        # test-set proximity (cached only for the test split: the cache
        # path has no split component, so a best_val-driven val eval must
        # not overwrite the test run's distances)
        base_val_image_features = val_dict["val_image_features"]
        k = cfg.CALIBRATION.PROCAL.IMAGE_K
        if split == "test":
            dist_dir = self._knndist_dir()
            dist_path = osp.join(dist_dir, "knndist.npy")
            if osp.exists(dist_path):
                print(f"load the knn distance from: {dist_path}")
                knndists = np.load(dist_path)
            else:
                knndists = get_knn_dists(base_val_image_features,
                                         image_features_test, k)
                os.makedirs(dist_dir, exist_ok=True)
                np.save(dist_path, knndists)
        else:
            knndists = get_knn_dists(base_val_image_features,
                                     image_features_test, k)
        test_img_proximity = proximity_from_dists(knndists)

        probs = self._calibrated_probs(calibrator, logits,
                                       image_features_test,
                                       text_features_test,
                                       test_img_proximity)
        results = self.evaluator.evaluate(probs, labels,
                                          test_img_proximity)

        for name, value in results.items():
            self.write_scalar(f"{split}/{name}", value, self.epoch)
        return list(results.values())[0]

    def _calibrated_probs(self, calibrator, logits, image_features_test,
                          text_features_test, test_img_proximity):
        """Calibrated probabilities for the eval loop's outputs.

        DAC-only configuration (the paper's headline): runs the fused
        device-side scoring kernel — normalize, MXU matmul, argmax row
        scaling and softmax in one jit program (ops/scoring.py) — instead
        of the host numpy DAC + scipy softmax (the reference's host loop +
        GPU hop, ``distanse_aware_calibration.py:49-58``). Falls back to
        the numpy path whenever a base calibrator is composed or this
        trainer's logits are not plain cosine scores.

        Numerics: the fused path recomputes logits from the returned
        (bf16-rounded) features, while the trainer's in-jit logits come
        from pre-rounding activations (XLA elides the convert round
        trip) — so the two paths may disagree within bf16 rounding,
        including argmax on near-tie samples. That is the same
        equivalence class as the reference's fp16 GPU logits vs an fp32
        rerun; exact parity holds in fp32 (MODEL.PRECISION="fp32",
        asserted end-to-end by tests/test_golden_e2e.py).
        """
        if calibrator.dac_calibrator is not None and \
                calibrator.base_calibrator is None:
            fused_scale = self.fused_dac_logit_scale()
            if fused_scale is not None:
                import jax.numpy as jnp

                from ..ops.scoring import fused_dac_scores
                return np.asarray(fused_dac_scores(
                    jnp.asarray(image_features_test),
                    jnp.asarray(text_features_test),
                    jnp.asarray(fused_scale),
                    jnp.asarray(
                        calibrator.dac_calibrator.class_confidence,
                        jnp.float32),
                    normalized=True)[0], np.float64)
        return calibrator.predict(logits, test_img_proximity)

    # -- base-class val feature cache (reference base_learner.py:176-239) ---
    def save_base_val_features(self):
        save_dir = osp.join(
            self._base_feature_dir(self.cfg.DATASET.SUBSAMPLE_CLASSES),
            "base_features.pt")
        if osp.exists(save_dir):
            print(f"File {save_dir} already exists. "
                  "Skipping save operation.")
            return
        print("Saving base features from val dataset")
        if not self.cfg.CALIBRATION.SCALING.IF_SCALING and \
                self.cfg.TRAINER.NAME == "ProDA":
            self.set_classifier()
        logits, labels, img_f, txt_f = self._run_inference(self.val_loader)
        knn = get_val_image_knn_dists(img_f,
                                      self.cfg.CALIBRATION.PROCAL.IMAGE_K)
        _save_feature_dict(save_dir, {
            "val_logits": logits,
            "val_image_features": img_f,
            "val_text_features": txt_f,
            "val_labels": labels,
            "val_image_knn_dists": knn,
        })

    # -- 4-way text features (reference base_learner.py:242-293) -----------
    def get_text_features(self, current_text_features_tuned=None,
                          val_dict=None):
        cfg = self.cfg
        if val_dict is None:
            val_dict = _load_feature_dict(
                osp.join(self._base_feature_dir("base"),
                         "base_features.pt"))

        # 1. base text features from the cached ZeroshotCLIP base run
        # (hardcoded seed 1, reference base_learner.py:253-255)
        zs_dir = osp.join(TEMP_ROOT, "base_features", cfg.DATASET.NAME,
                          "ZeroshotCLIP",
                          "shots" + str(cfg.DATASET.NUM_SHOTS),
                          cfg.MODEL.BACKBONE.NAME, "base", "seed1",
                          "base_features.pt")
        zs_base_dict = _load_feature_dict(zs_dir)
        base_text_features_zs = zs_base_dict["val_text_features"]

        # 2. current classes through frozen zero-shot CLIP
        current_text_features_zs = encode_classnames_zs(
            cfg.MODEL.BACKBONE.NAME, cfg.DATASET.NAME,
            self.dm.dataset.classnames, precision=cfg.MODEL.PRECISION)

        # 3. base text features from this trainer's own base run
        base_text_features_tuned = val_dict["val_text_features"]

        # 4. current classes through the tuned model (one inference)
        if current_text_features_tuned is None:
            batch = next(iter(self.test_loader))
            images, _ = self.parse_batch_test(batch)
            _, _, txt_f = self.model_inference(images)
            current_text_features_tuned = np.asarray(txt_f, np.float32)

        return {
            "base_text_features_zs": np.asarray(base_text_features_zs),
            "current_text_features_zs": current_text_features_zs,
            "base_text_features_tuned":
                np.asarray(base_text_features_tuned),
            "current_text_features_tuned":
                np.asarray(current_text_features_tuned),
        }

    def parse_batch_train(self, batch):
        return batch["img"], batch["label"]
