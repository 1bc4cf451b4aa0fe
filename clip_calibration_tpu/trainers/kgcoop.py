"""KgCoOp: Knowledge-guided Context Optimization.

Parity target: ``/root/reference/trainers/classification/kgcoop.py``.
CoOp plus a regularizer pulling tuned text features toward frozen
zero-shot text features of the hand-crafted per-dataset template:
loss = CE + w * (1 - mean cos(text_tuned, text_zs))
(``kgcoop.py:262-269``). CTX_INIT: True in its configs means init from
"a photo of a" (``kgcoop.py:102-105``).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from ..engine.registry import TRAINER_REGISTRY
from ..models import clip as M
from .base_learner import encode_classnames_zs
from .coop import CoOp


@TRAINER_REGISTRY.register()
class KgCoOp(CoOp):

    trainer_cfg_key = "KGCOOP"

    def post_build(self):
        # frozen zero-shot text features (already normalized); the trainer
        # uses the CUSTOM_TEMPLATES variant (kgcoop.py:155-165)
        from .templates import CUSTOM_TEMPLATES
        zs = encode_classnames_zs(self.cfg.MODEL.BACKBONE.NAME,
                                  self.cfg.DATASET.NAME,
                                  self.dm.dataset.classnames,
                                  CUSTOM_TEMPLATES[self.cfg.DATASET.NAME],
                                  precision=self.cfg.MODEL.PRECISION)
        self._zs_text = jnp.asarray(zs, jnp.float32)
        self.w = self.trainer_cfg().W

    def _loss(self, trainable, frozen, images, labels):
        txt_f = self._text_features(frozen, trainable)
        img_f = self._image_features(frozen, images)
        logits = M.cosine_logits(img_f, txt_f, frozen["logit_scale"])
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        txt_n = M.normalize(txt_f).astype(jnp.float32)
        score = 1.0 - jnp.mean(jnp.sum(txt_n * self._zs_text, axis=-1))
        return ce + self.w * score
