"""Zero-shot CLIP trainer (no training).

Parity target: ``/root/reference/trainers/classification/zsclip.py:74-102``.
Class text features are encoded once at build time from the per-dataset
hand-crafted template; inference is one jit-compiled
normalize->encode->cosine-logits step per batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.registry import TRAINER_REGISTRY
from ..models import clip as M
from ..models.backbone import load_clip_backbone
from ..models.tokenizer import tokenize
from ..ops.preprocess import normalize_images
from .base_learner import VLBaseLearner
from .templates import CUSTOM_TEMPLATES


@TRAINER_REGISTRY.register()
class ZeroshotCLIP(VLBaseLearner):
    fused_dac_scoring = True

    def build_model(self):
        cfg = self.cfg
        classnames = self.dm.dataset.classnames

        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.clip_params, self.clip_cfg = load_clip_backbone(
            cfg.MODEL.BACKBONE.NAME,
            "float32" if cfg.MODEL.PRECISION == "fp32" else "bfloat16")

        temp = CUSTOM_TEMPLATES[cfg.DATASET.NAME]
        prompts = [temp.format(c.replace("_", " ")) for c in classnames]
        print(f"Prompts: {prompts}")
        toks = tokenize(prompts)

        dtype = (jnp.float32 if cfg.MODEL.PRECISION == "fp32"
                 else jnp.bfloat16)
        ccfg = self.clip_cfg
        seq = M.eot_seq_len(toks)
        text_features = jax.jit(
            lambda p, t: M.normalize(M.encode_text(p, ccfg, t,
                                                   dtype=dtype,
                                                   seq_len=seq)))(
                self.clip_params, toks)
        self.text_features = text_features
        self.compute_dtype = dtype
        self.setup_frozen_vision()

        pixel_stats = self.pixel_stats

        @functools.partial(jax.jit)
        def infer(params, txt_f, images):
            x = normalize_images(images, *pixel_stats, dtype=dtype)
            img_f = M.normalize(M.encode_image(
                params, ccfg, x, dtype=dtype,
                qmode=self.vision_qmode_for(images.shape[0])))
            scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
            logits = scale * jnp.dot(
                img_f.astype(jnp.float32), txt_f.astype(jnp.float32).T,
                preferred_element_type=jnp.float32)
            return logits, img_f, txt_f

        self._infer = infer

    def model_inference(self, images):
        if not isinstance(images, jax.Array):  # staged eval inputs pass
            images = np.ascontiguousarray(images)
        return self._infer(self.step_clip_params, self.text_features,
                           self.put_batch(images))

    def train(self):
        """Zero-shot: nothing to train; run the test pipeline."""
        import os
        os.makedirs(self.output_dir, exist_ok=True)
        self.test()
