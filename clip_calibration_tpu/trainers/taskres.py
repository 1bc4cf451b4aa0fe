"""TaskRes: task residual tuning on the text classifier.

Parity target: ``/root/reference/trainers/classification/taskres.py``.
The classifier is ``t + alpha * x`` where ``t`` are frozen
template-averaged text features (CUSTOM_TEMPLATES, plus
IMAGENET_TEMPLATES_SELECT for ImageNet — ``taskres.py:109-135``) and ``x``
is a zero-initialized learnable residual. Only ``x`` trains; both towers
stay frozen, so image features are the only per-batch compute.

The reference's "enhanced base" swaps in a pretrained text projection
(``taskres.py:137-171``); supported here via
``TRAINER.TaskRes.ENHANCED_BASE`` pointing at an npz with a
``text_projection`` array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..engine.optim import build_optimizer
from ..engine.registry import TRAINER_REGISTRY
from ..models import clip as M
from ..models.backbone import load_clip_backbone
from ..models.tokenizer import tokenize
from ..ops.preprocess import normalize_images
from .base_learner import VLBaseLearner
from .templates import CUSTOM_TEMPLATES, IMAGENET_TEMPLATES_SELECT


@TRAINER_REGISTRY.register()
class TaskRes(VLBaseLearner):
    fused_dac_scoring = True

    def check_cfg(self, cfg):
        assert cfg.TRAINER.TaskRes.PREC in ("fp16", "fp32", "amp")

    def build_model(self):
        cfg = self.cfg
        classnames = self.dm.dataset.classnames
        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.clip_params, self.clip_cfg = load_clip_backbone(
            cfg.MODEL.BACKBONE.NAME,
            "float32" if cfg.TRAINER.TaskRes.PREC == "fp32" else "bfloat16")
        self.compute_dtype = (jnp.float32
                              if cfg.TRAINER.TaskRes.PREC == "fp32"
                              else jnp.bfloat16)
        self.alpha = cfg.TRAINER.TaskRes.RESIDUAL_SCALE
        print(">> DCT scale factor: ", self.alpha)

        params = self.clip_params
        if cfg.TRAINER.TaskRes.ENHANCED_BASE != "none":
            print(">> Use enhanced base!")
            from ..models.weights import load_params
            loaded = load_params(cfg.TRAINER.TaskRes.ENHANCED_BASE)
            params = dict(params)
            params["text"] = dict(params["text"])
            params["text"]["text_projection"] = jnp.asarray(
                np.asarray(loaded["text_projection"]))
        else:
            print(">> Use regular base!")

        templates = ([*IMAGENET_TEMPLATES_SELECT]
                     if cfg.DATASET.NAME == "ImageNet" else [])
        templates += [CUSTOM_TEMPLATES[cfg.DATASET.NAME]]

        ccfg = self.clip_cfg
        all_toks = [tokenize([t.format(name) for t in templates])
                    for name in classnames]
        # shared static truncation across classes -> one compiled shape
        seq = max(M.eot_seq_len(t) for t in all_toks)
        # the reference TaskRes model is UNCONDITIONALLY fp32
        # (self.model.float(), taskres.py:248); the frozen base text
        # features are one-time build cost, so match that exactly
        encode = jax.jit(
            lambda p, t: M.encode_text(p, ccfg, t, dtype=jnp.float32,
                                       seq_len=seq))
        feats = [np.asarray(encode(params, jnp.asarray(t)),
                            np.float32).mean(axis=0) for t in all_toks]
        self.base_text_features = jnp.asarray(np.stack(feats))

        trainable = {"residual": jnp.zeros_like(self.base_text_features)}
        steps = max(len(self.train_loader_x), 1)
        opt, _ = build_optimizer(cfg, steps)
        self.opt = opt
        self.register_model("taskres_learner", trainable, opt,
                            opt.init(trainable))
        self.setup_frozen_vision()
        self._build_steps()

    def _classifier(self, trainable):
        return self.base_text_features + self.alpha * trainable["residual"]

    def _build_steps(self):
        def loss_fn(trainable, frozen, images, labels):
            txt_f = self._classifier(trainable)
            x = normalize_images(images, *self.pixel_stats,
                                 dtype=self.compute_dtype)
            img_f = M.encode_image(frozen, self.clip_cfg, x,
                                   dtype=self.compute_dtype,
                                   qmode=self.vision_qmode_for(
                                       images.shape[0]))
            logits = M.cosine_logits(img_f, txt_f, frozen["logit_scale"])
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(trainable, opt_state, frozen, images, labels):
            loss, grads = jax.value_and_grad(loss_fn)(
                trainable, frozen, images, labels)
            updates, opt_state = self.opt.update(grads, opt_state,
                                                 trainable)
            return optax.apply_updates(trainable, updates), opt_state, loss

        @jax.jit
        def infer_step(trainable, frozen, images):
            txt_n = M.normalize(self._classifier(trainable))
            x = normalize_images(images, *self.pixel_stats,
                                 dtype=self.compute_dtype)
            img_n = M.normalize(M.encode_image(
                frozen, self.clip_cfg, x, dtype=self.compute_dtype,
                qmode=self.vision_qmode_for(images.shape[0])))
            scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
            logits = scale * jnp.dot(img_n.astype(jnp.float32),
                                     txt_n.astype(jnp.float32).T)
            return logits, img_n, txt_n

        self._train_step = train_step
        self._infer_step = infer_step

    def forward_backward(self, batch):
        images, labels = self.parse_batch_train(batch)
        slot = self._models["taskres_learner"]
        slot["params"], slot["opt_state"], loss = self._train_step(
            slot["params"], slot["opt_state"], self.step_clip_params,
            self.put_batch(images), self.put_batch(labels))
        return {"loss": loss}

    def checkpoint_dir_aliases(self, name):
        # the reference registers TaskResLearner under "prompt_learner"
        return [name, "prompt_learner"]

    def convert_to_reference_state(self, name, state):
        """Inverse: ours -> reference text_feature_residuals (the
        reference also stores base_text_features, which its strict=False
        load tolerates missing)."""
        return {"text_feature_residuals": np.asarray(state["residual"])}

    def convert_reference_state(self, name, state):
        """Reference TaskRes checkpoints hold base_text_features +
        text_feature_residuals; only the residual is ours to load."""
        if "text_feature_residuals" in state:
            return {"residual": np.asarray(state["text_feature_residuals"])}
        return state

    def _set_params(self, name, loaded):
        """On ImageNet-A/R cross-dataset eval, subset 1000-class residuals
        from an ImageNet-trained checkpoint down to the 200 present
        classes via the precomputed index maps (reference
        ``taskres.py:318-327`` + ``imagenet_a_r_indexes_v2.py``; index
        arrays stored as a data asset)."""
        ds = self.cfg.DATASET.NAME
        res = loaded.get("residual")
        if ds in ("ImageNetA", "ImageNetR") and res is not None \
                and np.asarray(res).shape[0] == 1000:
            import json
            import os.path as osp
            asset = osp.join(osp.dirname(osp.dirname(
                osp.abspath(__file__))), "assets",
                "imagenet_a_r_indexes.json")
            with open(asset) as f:
                key = "imagenet_a" if ds == "ImageNetA" else "imagenet_r"
                idx = np.asarray(json.load(f)[key])
            loaded = dict(loaded)
            loaded["residual"] = np.asarray(res)[idx]
        super()._set_params(name, loaded)

    def model_inference(self, images):
        return self._infer_step(self._models["taskres_learner"]["params"],
                                self.step_clip_params,
                                self.put_batch(images))
