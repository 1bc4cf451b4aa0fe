"""MaPLe: multi-modal prompt learning.

Parity target: ``/root/reference/trainers/classification/maple.py``.
A single text context (init "a photo of a") is shared across towers: a
learnable 512->768 projection produces the shallow vision prompt, and
per-layer compound text prompts (layers 1..depth-1) each have their own
512->768 projection producing the corresponding vision prompt
(``maple.py:108-188``). The reference deep-copies one Linear for all
per-layer projections, so they start identical — replicated here by
tiling one initialization.

The reference threads prompts through custom transformer blocks with a
counter (``clip/model.py:259-331``); here both towers consume the stacked
prompt arrays through the uniform splice interface.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..engine.optim import build_optimizer
from ..engine.registry import TRAINER_REGISTRY
from ..models import clip as M
from ..models.backbone import load_clip_backbone
from ..ops.preprocess import normalize_images
from .base_learner import VLBaseLearner
from .coop import build_prompt_assembly, assemble_prompts


@TRAINER_REGISTRY.register()
class MaPLe(VLBaseLearner):
    #: vision-side prompts are TRAINABLE here: the image tower is on
    #: the gradient path, so TRAINER.QUANT_FROZEN_VISION must refuse
    #: (base_learner.setup_frozen_vision raises).
    vision_tower_trainable = True

    fused_dac_scoring = True

    def check_cfg(self, cfg):
        assert cfg.TRAINER.MAPLE.PREC in ("fp16", "fp32", "amp")
        assert cfg.TRAINER.MAPLE.PROMPT_DEPTH >= 1, \
            "For MaPLe, PROMPT_DEPTH should be >= 1"

    def build_model(self):
        cfg = self.cfg
        tcfg = cfg.TRAINER.MAPLE
        classnames = self.dm.dataset.classnames
        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.clip_params, self.clip_cfg = load_clip_backbone(
            cfg.MODEL.BACKBONE.NAME,
            "float32" if tcfg.PREC == "fp32" else "bfloat16")
        self.compute_dtype = (jnp.float32 if tcfg.PREC == "fp32"
                              else jnp.bfloat16)
        self.depth = tcfg.PROMPT_DEPTH
        n_ctx = tcfg.N_CTX
        ctx_dim = self.clip_cfg.transformer_width
        vis_dim = self.clip_cfg.vision_width

        ctx_init = tcfg.CTX_INIT if (tcfg.CTX_INIT and n_ctx <= 4) else ""
        # N_CTX learnable slots; remaining init-phrase tokens stay frozen
        asm = build_prompt_assembly(classnames, n_ctx, "end", ctx_init,
                                    self.clip_params, self.compute_dtype,
                                    ctx_slots=n_ctx)
        self.asm = asm
        print("MaPLe design: Multi-modal Prompt Learning")
        print(f'Initial context: "{asm["prompt_prefix"]}"')
        print(f"Number of MaPLe context words (tokens): {n_ctx}")

        rng = jax.random.PRNGKey(max(cfg.SEED, 0))
        ks = jax.random.split(rng, 4)
        if asm["ctx_vectors"] is not None:
            ctx = jnp.asarray(asm["ctx_vectors"][:n_ctx], jnp.float32)
        else:
            ctx = jax.random.normal(ks[0], (n_ctx, ctx_dim)) * 0.02

        lim = (1.0 / ctx_dim) ** 0.5
        # torch nn.Linear default init: weights AND biases from
        # U(+-1/sqrt(fan_in)) (reference self.proj / compound projections)
        proj_w = jax.random.uniform(ks[1], (ctx_dim, vis_dim), jnp.float32,
                                    -lim, lim)
        proj_b = jax.random.uniform(jax.random.fold_in(ks[1], 1),
                                    (vis_dim,), jnp.float32, -lim, lim)
        trainable = {"ctx": ctx, "proj_w": proj_w, "proj_b": proj_b}
        if self.depth > 1:
            trainable["compound_text"] = jax.random.normal(
                ks[2], (self.depth - 1, n_ctx, ctx_dim)) * 0.02
            # one shared init tiled across layers (reference _get_clones)
            one_w = jax.random.uniform(ks[3], (ctx_dim, vis_dim),
                                       jnp.float32, -lim, lim)
            one_b = jax.random.uniform(jax.random.fold_in(ks[3], 1),
                                       (vis_dim,), jnp.float32, -lim, lim)
            trainable["compound_proj_w"] = jnp.tile(
                one_w[None], (self.depth - 1, 1, 1))
            trainable["compound_proj_b"] = jnp.tile(
                one_b[None], (self.depth - 1, 1))

        steps = max(len(self.train_loader_x), 1)
        opt, _ = build_optimizer(cfg, steps)
        self.opt = opt
        self.register_model("prompt_learner", trainable, opt,
                            opt.init(trainable))
        self._build_steps()

    # -- forward pieces ------------------------------------------------------
    def _prompt_pack(self, trainable):
        ctx = trainable["ctx"]
        shallow_vis = (jnp.dot(ctx, trainable["proj_w"])
                       + trainable["proj_b"])  # [n_ctx, vis_dim]
        deep_text = trainable.get("compound_text")
        deep_vis = None
        if deep_text is not None:
            deep_vis = (jnp.einsum("lnd,ldv->lnv", deep_text,
                                   trainable["compound_proj_w"])
                        + trainable["compound_proj_b"][:, None, :])
        return ctx, shallow_vis, deep_text, deep_vis

    def _features(self, trainable, frozen, images):
        ctx, shallow_vis, deep_text, deep_vis = self._prompt_pack(trainable)
        prompts = assemble_prompts(ctx, self.asm)
        depth = self.depth if deep_text is not None else 0
        txt_f = M.encode_text_embedded(
            frozen, self.clip_cfg, prompts, self.asm["eot_pos"],
            deep_prompts=deep_text, deep_prompt_depth=depth,
            seq_len=self.asm["seq_len"])
        x = normalize_images(images, *self.pixel_stats,
                             dtype=self.compute_dtype)
        img_f = M.encode_image(
            frozen, self.clip_cfg, x, shallow_prompts=shallow_vis,
            deep_prompts=deep_vis, deep_prompt_depth=depth,
            dtype=self.compute_dtype)
        return img_f, txt_f

    def _build_steps(self):
        def loss_fn(trainable, frozen, images, labels):
            img_f, txt_f = self._features(trainable, frozen, images)
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
            img_f, txt_f = self._features(trainable, frozen, images)
            img_n, txt_n = M.normalize(img_f), M.normalize(txt_f)
            scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
            logits = scale * jnp.dot(img_n.astype(jnp.float32),
                                     txt_n.astype(jnp.float32).T)
            return logits, img_n, txt_n

        self._train_step = train_step
        self._infer_step = infer_step

    def forward_backward(self, batch):
        images, labels = self.parse_batch_train(batch)
        slot = self._models["prompt_learner"]
        slot["params"], slot["opt_state"], loss = self._train_step(
            slot["params"], slot["opt_state"], self.clip_params,
            self.put_batch(images), self.put_batch(labels))
        return {"loss": loss}

    def model_inference(self, images):
        return self._infer_step(self._models["prompt_learner"]["params"],
                                self.clip_params, self.put_batch(images))

    def checkpoint_dir_aliases(self, name):
        # the reference registers the whole model as MultiModalPromptLearner
        return [name, "MultiModalPromptLearner"]

    def convert_to_reference_state(self, name, state):
        """Inverse of convert_reference_state: ours -> the reference's
        prompt_learner.{ctx, proj.*, compound_prompts_text.N,
        compound_prompt_projections.N.*} layout."""
        import numpy as np
        out = {"ctx": np.asarray(state["ctx"]),
               "proj": {"weight": np.asarray(state["proj_w"]).T,
                        "bias": np.asarray(state["proj_b"])}}
        ct = state.get("compound_text")
        if ct is not None:
            ct = np.asarray(ct)
            out["compound_prompts_text"] = {
                str(i): ct[i] for i in range(ct.shape[0])}
            out["compound_prompt_projections"] = {
                str(i): {
                    "weight":
                        np.asarray(state["compound_proj_w"][i]).T,
                    "bias": np.asarray(state["compound_proj_b"][i]),
                } for i in range(ct.shape[0])}
        return {"prompt_learner": out}

    def convert_reference_state(self, name, state):
        """Reference MaPLe checkpoints are whole-model state dicts with
        prompt_learner.{ctx, proj.*, compound_prompts_text.N,
        compound_prompt_projections.N.*} (torch [out,in] weights)."""
        pl = state.get("prompt_learner")
        if not isinstance(pl, dict) or "proj" not in pl:
            return state
        import numpy as np
        out = {"ctx": np.asarray(pl["ctx"]),
               "proj_w": np.asarray(pl["proj"]["weight"]).T,
               "proj_b": np.asarray(pl["proj"]["bias"])}
        cpt = pl.get("compound_prompts_text")
        if cpt:
            n = len(cpt)
            out["compound_text"] = np.stack(
                [np.asarray(cpt[str(i)]) for i in range(n)])
            proj = pl["compound_prompt_projections"]
            out["compound_proj_w"] = np.stack(
                [np.asarray(proj[str(i)]["weight"]).T for i in range(n)])
            out["compound_proj_b"] = np.stack(
                [np.asarray(proj[str(i)]["bias"]) for i in range(n)])
        if "token_prefix" in pl:
            out["token_prefix"] = pl["token_prefix"]
            out["token_suffix"] = pl["token_suffix"]
        return out
