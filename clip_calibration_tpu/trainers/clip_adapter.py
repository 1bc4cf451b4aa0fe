"""CLIP-Adapter: residual feature adapter on the image branch.

Parity target: ``/root/reference/trainers/classification/clip_adapter.py``.
Prompts are FIXED ("a photo of a" + class name), so text features are
constant — computed once at build (the reference re-runs the text tower
every forward). The only trainable module is a bias-free 2-layer
bottleneck MLP (D -> D/4 -> D, ReLU after both layers) on image features,
blended residually with ratio 0.2 (``clip_adapter.py:138-172``).
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


def adapter_forward(params, x):
    h = jnp.maximum(jnp.dot(x, params["w1"].astype(x.dtype)), 0)
    return jnp.maximum(jnp.dot(h, params["w2"].astype(x.dtype)), 0)


@TRAINER_REGISTRY.register()
class CLIP_Adapter(VLBaseLearner):
    fused_dac_scoring = True

    def check_cfg(self, cfg):
        assert cfg.TRAINER.COOP.PREC in ("fp16", "fp32", "amp")

    def build_model(self):
        cfg = self.cfg
        classnames = self.dm.dataset.classnames
        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.clip_params, self.clip_cfg = load_clip_backbone(
            cfg.MODEL.BACKBONE.NAME,
            "float32" if cfg.TRAINER.COOP.PREC == "fp32" else "bfloat16")
        # the reference's check_cfg reads TRAINER.COOP.PREC here (its
        # own quirk) — honor the same knob
        self.compute_dtype = (jnp.float32
                              if cfg.TRAINER.COOP.PREC == "fp32"
                              else jnp.bfloat16)
        self.ratio = cfg.TRAINER.CLIP_ADAPTER.RATIO

        # fixed prompts -> constant text features
        ctx_init = cfg.TRAINER.CLIP_ADAPTER.CTX_INIT.replace("_", " ")
        prompts = [ctx_init + " " + name.replace("_", " ") + "."
                   for name in classnames]
        toks = tokenize(prompts)
        ccfg = self.clip_cfg
        seq = M.eot_seq_len(toks)
        # reference dtype: fp16 normally, fp32 under PREC fp32
        # (clip_adapter.py:202-206) — follow the compute dtype instead
        # of the bare bf16 default
        self.text_features = jax.jit(
            lambda p, t: M.encode_text(p, ccfg, t,
                                       dtype=self.compute_dtype,
                                       seq_len=seq))(
                self.clip_params, jnp.asarray(toks))

        dim = ccfg.embed_dim
        k1, k2 = jax.random.split(jax.random.PRNGKey(max(cfg.SEED, 0)))
        # torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) =
        # U(+-1/sqrt(fan_in)); bias=False in the reference Adapter
        lim1 = (1.0 / dim) ** 0.5
        lim2 = (1.0 / (dim // 4)) ** 0.5
        trainable = {
            "w1": jax.random.uniform(k1, (dim, dim // 4), jnp.float32,
                                     -lim1, lim1),
            "w2": jax.random.uniform(k2, (dim // 4, dim), jnp.float32,
                                     -lim2, lim2),
        }
        steps = max(len(self.train_loader_x), 1)
        opt, _ = build_optimizer(cfg, steps)
        self.opt = opt
        self.register_model("adapter", trainable, opt, opt.init(trainable))
        self.setup_frozen_vision()
        self._build_steps()

    def _features(self, adapter, frozen, txt_f, images):
        x = normalize_images(images, *self.pixel_stats,
                             dtype=self.compute_dtype)
        img_f = M.encode_image(frozen, self.clip_cfg, x,
                               dtype=self.compute_dtype,
                               qmode=self.vision_qmode_for(images.shape[0]))
        ax = adapter_forward(adapter, img_f)
        img_f = self.ratio * ax + (1 - self.ratio) * img_f
        return M.normalize(img_f), M.normalize(txt_f)

    def _build_steps(self):
        def loss_fn(adapter, frozen, txt_f, images, labels):
            img_n, txt_n = self._features(adapter, frozen, txt_f, images)
            scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
            logits = scale * jnp.dot(img_n.astype(jnp.float32),
                                     txt_n.astype(jnp.float32).T)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(adapter, opt_state, frozen, txt_f, images, labels):
            loss, grads = jax.value_and_grad(loss_fn)(
                adapter, frozen, txt_f, images, labels)
            updates, opt_state = self.opt.update(grads, opt_state, adapter)
            return optax.apply_updates(adapter, updates), opt_state, loss

        @jax.jit
        def infer_step(adapter, frozen, txt_f, images):
            img_n, txt_n = self._features(adapter, frozen, txt_f, images)
            scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
            logits = scale * jnp.dot(img_n.astype(jnp.float32),
                                     txt_n.astype(jnp.float32).T)
            return logits, img_n, txt_n

        self._train_step = train_step
        self._infer_step = infer_step

    def forward_backward(self, batch):
        images, labels = self.parse_batch_train(batch)
        slot = self._models["adapter"]
        slot["params"], slot["opt_state"], loss = self._train_step(
            slot["params"], slot["opt_state"], self.step_clip_params,
            self.text_features, self.put_batch(images),
            self.put_batch(labels))
        return {"loss": loss}

    def model_inference(self, images):
        return self._infer_step(self._models["adapter"]["params"],
                                self.step_clip_params, self.text_features,
                                self.put_batch(images))

    def convert_to_reference_state(self, name, state):
        """Inverse: ours -> reference fc.{0,2}.weight ([out,in])."""
        return {"fc": {"0": {"weight": np.asarray(state["w1"]).T},
                       "2": {"weight": np.asarray(state["w2"]).T}}}

    def convert_reference_state(self, name, state):
        """Reference Adapter checkpoints hold fc.0.weight / fc.2.weight
        (torch [out,in] bias-free Linears)."""
        fc = state.get("fc")
        if isinstance(fc, dict):
            return {"w1": np.asarray(fc["0"]["weight"]).T,
                    "w2": np.asarray(fc["2"]["weight"]).T}
        return state
