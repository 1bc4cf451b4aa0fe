"""ProGrad: prompt tuning with projected gradients.

Parity target: ``/root/reference/trainers/classification/prograd.py``.
Two losses — student CE and a temperature-T distillation term against
frozen zero-shot CLIP logits (``ProGradLoss``, ``prograd.py:291-304``) —
with gradient surgery (``prograd_backward_and_update``,
``prograd.py:371-409``): per parameter tensor, if the CE gradient
conflicts with the normalized KL gradient direction (negative cosine),
project the conflicting component out: g = g_ce - lambda * (g_ce . b_hat) b_hat.

The reference runs two sequential ``backward()`` passes with in-place
grad mutation; here it is two ``jax.grad`` calls and a pure tree-map
projection inside one jit-compiled step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..engine.registry import TRAINER_REGISTRY
from ..models import clip as M
from .base_learner import encode_classnames_zs
from .coop import CoOp
from .templates import CUSTOM_TEMPLATES


def prograd_project(grads_ce, grads_kl, lambda_: float):
    """Per-tensor projection of the CE grad off the conflicting KL
    direction."""
    def proj(g_a, g_b):
        b_hat = g_b / (jnp.linalg.norm(g_b) + 1e-12)
        a_hat = g_a / (jnp.linalg.norm(g_a) + 1e-12)
        cos = jnp.vdot(a_hat, b_hat)
        proj_coeff = jnp.vdot(g_a, b_hat)
        projected = g_a - lambda_ * proj_coeff * b_hat
        return jnp.where(cos < 0, projected, g_a)

    return jax.tree.map(proj, grads_ce, grads_kl)


@TRAINER_REGISTRY.register()
class ProGrad(CoOp):

    trainer_cfg_key = "PROGRAD"

    def _resolve_ctx_init(self, tcfg) -> str:
        """Reference ProGrad (``prograd.py:88-105``): CTX_INIT truthy
        means the DATASET's template phrase, embedded in the LAST slots
        of a full-width zero-initialized N_CTX context (ctx_init_tail
        below) — not KgCoOp's 4-token "a photo of a" collapse."""
        if tcfg.CTX_INIT:
            return (CUSTOM_TEMPLATES[self.cfg.DATASET.NAME]
                    .replace(" {}.", "").replace("_", " "))
        return ""

    def _assembly_extra(self) -> dict:
        return {"ctx_init_tail": True}

    def post_build(self):
        tcfg = self.trainer_cfg()
        self.T = tcfg.T
        self.lambda_ = tcfg.LAMBDA
        assert tcfg.LOSS_NAME == "prograd"
        # the reference teacher is UNCONDITIONALLY fp32 — its zs CLIP is
        # `.float()`-ed regardless of PREC (prograd.py:235); one-time
        # build cost, so match it exactly
        zs = encode_classnames_zs(self.cfg.MODEL.BACKBONE.NAME,
                                  self.cfg.DATASET.NAME,
                                  self.dm.dataset.classnames,
                                  CUSTOM_TEMPLATES[self.cfg.DATASET.NAME],
                                  precision="fp32")
        self._zs_text = jnp.asarray(zs, jnp.float32)

    def _losses(self, trainable, frozen, images, labels):
        txt_f = self._text_features(frozen, trainable)
        img_f = self._image_features(frozen, images)
        img_n = M.normalize(img_f).astype(jnp.float32)
        logits = M.cosine_logits(img_f, txt_f, frozen["logit_scale"])
        scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
        tea_logits = scale * jnp.dot(img_n, self._zs_text.T)

        xe = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        tea_prob = jax.nn.softmax(tea_logits / self.T, axis=-1)
        kl = (-tea_prob * jax.nn.log_softmax(logits / self.T, axis=-1)
              * self.T * self.T).sum(axis=1).mean()
        return xe, kl

    def _build_steps(self):
        super()._build_steps()  # text/infer steps from CoOp

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(trainable, opt_state, frozen, images, labels):
            # one forward, two backward pulls (reference runs backward
            # twice with retain_graph; jax.vjp is the functional twin)
            (xe, kl), vjp_fn = jax.vjp(
                lambda tr: self._losses(tr, frozen, images, labels),
                trainable)
            one = jnp.ones(())
            zero = jnp.zeros(())
            g_ce, = vjp_fn((one, zero))
            g_kl, = vjp_fn((zero, one))
            grads = prograd_project(g_ce, g_kl, self.lambda_)
            updates, opt_state = self.opt.update(grads, opt_state,
                                                 trainable)
            return optax.apply_updates(trainable, updates), opt_state, xe

        self._train_step = train_step
