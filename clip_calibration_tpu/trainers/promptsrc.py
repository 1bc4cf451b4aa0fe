"""PromptSRC: prompting with self-regulating constraints.

Parity target: ``/root/reference/trainers/classification/promptsrc.py``.
IVLP deep prompting on BOTH towers (independent per-layer prompts,
text depth/ctx + vision depth/ctx); a frozen-CLIP teacher supplies
per-class mean text embeddings over the 80 IMAGENET_TEMPLATES and frozen
image features. Loss (``promptsrc.py:298-314``):

  CE + 25 * L1(txt_norm, zs_txt_norm) + 10 * L1(img_norm, zs_img_norm)
     + KLdiv(log_softmax(logits), log_softmax(zs_logits), log_target,
             sum) / logits.size

Gaussian Prompt Aggregation (GPA, ``promptsrc.py:264-336``): per-epoch
gaussian-weighted (mean GPA_MEAN, std GPA_STD over epochs 1..N) running
average of the trainable pytree, loaded as the final model after the last
epoch.
"""

from __future__ import annotations

import functools
import math

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
from .coop import build_prompt_assembly, assemble_prompts
from .templates import IMAGENET_TEMPLATES


def gpa_schedule(n_epochs: int, mean: float, std: float) -> np.ndarray:
    """Normalized per-epoch Gaussian aggregation weights over epochs 1..N
    (reference ``promptsrc.py:268-274``)."""
    gauss = np.array([math.exp(-((e - mean) ** 2) / (2 * std ** 2))
                      / (std * math.sqrt(2 * math.pi))
                      for e in range(1, n_epochs + 1)])
    return gauss / gauss.sum()


@TRAINER_REGISTRY.register()
class PromptSRC(VLBaseLearner):
    #: vision-side prompts are TRAINABLE here: the image tower is on
    #: the gradient path, so TRAINER.QUANT_FROZEN_VISION must refuse
    #: (base_learner.setup_frozen_vision raises).
    vision_tower_trainable = True

    fused_dac_scoring = True

    def check_cfg(self, cfg):
        assert cfg.TRAINER.PROMPTSRC.PREC in ("fp16", "fp32", "amp")
        assert cfg.TRAINER.PROMPTSRC.PROMPT_DEPTH_TEXT >= 1

    def build_model(self):
        cfg = self.cfg
        tcfg = cfg.TRAINER.PROMPTSRC
        classnames = self.dm.dataset.classnames
        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.clip_params, self.clip_cfg = load_clip_backbone(
            cfg.MODEL.BACKBONE.NAME,
            "float32" if tcfg.PREC == "fp32" else "bfloat16")
        self.compute_dtype = (jnp.float32 if tcfg.PREC == "fp32"
                              else jnp.bfloat16)
        self.depth_text = tcfg.PROMPT_DEPTH_TEXT
        self.depth_vis = tcfg.PROMPT_DEPTH_VISION
        n_ctx_t = tcfg.N_CTX_TEXT
        n_ctx_v = tcfg.N_CTX_VISION
        ctx_dim = self.clip_cfg.transformer_width
        vis_dim = self.clip_cfg.vision_width

        ctx_init = tcfg.CTX_INIT if (tcfg.CTX_INIT and n_ctx_t <= 4) \
            else ""
        asm = build_prompt_assembly(classnames, n_ctx_t, "end", ctx_init,
                                    self.clip_params, self.compute_dtype,
                                    ctx_slots=n_ctx_t)
        self.asm = asm
        print("Independent V-L design")
        print(f'Initial text context: "{asm["prompt_prefix"]}"')
        print(f"Number of context words (tokens) for Language prompting: "
              f"{n_ctx_t}")
        print(f"Number of context words (tokens) for Vision prompting: "
              f"{n_ctx_v}")

        # frozen teacher: per-class mean zs text features over the
        # template ensemble + frozen image encode (promptsrc.py:117-129)
        ccfg = self.clip_cfg
        all_toks = [tokenize([template.replace("{}", n.replace("_", " "))
                              for n in classnames])
                    for template in IMAGENET_TEMPLATES]
        # one static truncation length across templates: a single
        # compiled shape, ~2.5x less text-tower work (models/clip.py)
        seq = max(M.eot_seq_len(t) for t in all_toks)
        # the reference text teacher is UNCONDITIONALLY fp32 — a fresh
        # `.float()`-ed CLIP copy regardless of PREC (promptsrc.py:115);
        # computed once at build, so fp32 costs nothing per step (the
        # bf16 default here was caught by the trajectory oracle)
        encode = jax.jit(
            lambda p, t: M.encode_text(p, ccfg, t, dtype=jnp.float32,
                                       seq_len=seq))
        feats = [np.asarray(encode(self.clip_params, jnp.asarray(t)),
                            np.float32) for t in all_toks]
        self.fixed_embeddings = jnp.asarray(
            np.mean(np.stack(feats, axis=1), axis=1))

        rng = jax.random.PRNGKey(max(cfg.SEED, 0))
        ks = jax.random.split(rng, 4)
        if asm["ctx_vectors"] is not None:
            ctx = jnp.asarray(asm["ctx_vectors"][:n_ctx_t], jnp.float32)
        else:
            ctx = jax.random.normal(ks[0], (n_ctx_t, ctx_dim)) * 0.02
        trainable = {
            "ctx": ctx,
            "vpt_shallow": jax.random.normal(ks[1],
                                             (n_ctx_v, vis_dim)) * 0.02,
        }
        if self.depth_text > 1:
            trainable["deep_text"] = jax.random.normal(
                ks[2], (self.depth_text - 1, n_ctx_t, ctx_dim)) * 0.02
        if self.depth_vis > 1:
            trainable["deep_vis"] = jax.random.normal(
                ks[3], (self.depth_vis - 1, n_ctx_v, vis_dim)) * 0.02

        steps = max(len(self.train_loader_x), 1)
        opt, _ = build_optimizer(cfg, steps)
        self.opt = opt
        self.register_model("prompt_learner", trainable, opt,
                            opt.init(trainable))

        # GPA schedule over epochs 1..N
        self.gauss = gpa_schedule(cfg.OPTIM.MAX_EPOCH, tcfg.GPA_MEAN,
                                  tcfg.GPA_STD)
        self._gpa_accum = None

        self._build_steps()

    # -- forward ----------------------------------------------------------
    def _features(self, trainable, frozen, images):
        prompts = assemble_prompts(trainable["ctx"], self.asm)
        txt_f = M.encode_text_embedded(
            frozen, self.clip_cfg, prompts, self.asm["eot_pos"],
            deep_prompts=trainable.get("deep_text"),
            deep_prompt_depth=self.depth_text,
            seq_len=self.asm["seq_len"])
        x = normalize_images(images, *self.pixel_stats,
                             dtype=self.compute_dtype)
        img_f = M.encode_image(
            frozen, self.clip_cfg, x,
            shallow_prompts=trainable["vpt_shallow"],
            deep_prompts=trainable.get("deep_vis"),
            deep_prompt_depth=self.depth_vis,
            dtype=self.compute_dtype)
        return img_f, txt_f

    def _build_steps(self):
        tcfg = self.cfg.TRAINER.PROMPTSRC
        w_text = tcfg.TEXT_LOSS_WEIGHT
        w_image = tcfg.IMAGE_LOSS_WEIGHT

        def loss_fn(trainable, frozen, images, labels):
            img_f, txt_f = self._features(trainable, frozen, images)
            img_n = M.normalize(img_f).astype(jnp.float32)
            txt_n = M.normalize(txt_f).astype(jnp.float32)
            scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
            logits = scale * jnp.dot(img_n, txt_n.T)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

            # frozen teacher (no grads flow into it)
            fixed_n = M.normalize(self.fixed_embeddings)
            x = normalize_images(images, *self.pixel_stats,
                                 dtype=self.compute_dtype)
            zs_img = jax.lax.stop_gradient(M.normalize(M.encode_image(
                frozen, self.clip_cfg, x, dtype=self.compute_dtype))
            ).astype(jnp.float32)
            zs_logits = scale * jnp.dot(zs_img, fixed_n.T)

            loss_scl_text = jnp.abs(txt_n - fixed_n).mean() * w_text
            loss_scl_image = jnp.abs(img_n - zs_img).mean() * w_image
            # KLdiv with log_target + sum reduction / numel
            log_p = jax.nn.log_softmax(logits, axis=1)
            log_q = jax.nn.log_softmax(zs_logits, axis=1)
            l_kl = (jnp.exp(log_q) * (log_q - log_p)).sum() / logits.size
            return ce + loss_scl_text + loss_scl_image + l_kl

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

    def after_epoch(self):
        # Gaussian prompt aggregation across epochs
        w = float(self.gauss[self.epoch])
        params = self._models["prompt_learner"]["params"]
        weighted = jax.tree.map(lambda a: a * w, params)
        if self._gpa_accum is None:
            self._gpa_accum = weighted
        else:
            self._gpa_accum = jax.tree.map(jnp.add, self._gpa_accum,
                                           weighted)
        if (self.epoch + 1) == self.max_epoch:
            print("Using GPA model for final inference...")
            self._models["prompt_learner"]["params"] = self._gpa_accum
        super().after_epoch()

    def model_inference(self, images):
        return self._infer_step(self._models["prompt_learner"]["params"],
                                self.clip_params, self.put_batch(images))

    def convert_to_reference_state(self, name, state):
        """Inverse: ours -> the reference's whole-model prompt keys
        (prompt_learner.ctx, image_encoder.VPT, per-layer
        VPT_shallow rows in both towers)."""
        def tower(deep):
            blocks = {}
            if deep is not None:
                deep = np.asarray(deep)
                blocks = {str(i + 1): {"VPT_shallow": deep[i]}
                          for i in range(deep.shape[0])}
            return {"transformer": {"resblocks": blocks}}

        out = {"prompt_learner": {"ctx": np.asarray(state["ctx"])},
               "image_encoder": {
                   "VPT": np.asarray(state["vpt_shallow"]),
                   **tower(state.get("deep_vis"))},
               "text_encoder": tower(state.get("deep_text"))}
        return out

    def convert_reference_state(self, name, state):
        """Reference PromptSRC checkpoints are whole-model state dicts:
        prompt_learner.ctx, image_encoder.VPT, and per-layer
        {image,text}_encoder.transformer.resblocks.N.VPT_shallow."""
        if "image_encoder" not in state:
            return state
        out = {"ctx": np.asarray(state["prompt_learner"]["ctx"]),
               "vpt_shallow": np.asarray(state["image_encoder"]["VPT"])}

        def deep_stack(tower, depth):
            # tolerate depth mismatches like the reference's strict=False
            # load: take only the layers present in the checkpoint
            blocks = tower["transformer"]["resblocks"]
            rows = [np.asarray(blocks[str(i)]["VPT_shallow"])
                    for i in range(1, depth)
                    if str(i) in blocks and "VPT_shallow" in blocks[str(i)]]
            return np.stack(rows) if rows else None

        dv = deep_stack(state["image_encoder"], self.depth_vis)
        if dv is not None:
            out["deep_vis"] = dv
        dt = deep_stack(state["text_encoder"], self.depth_text)
        if dt is not None:
            out["deep_text"] = dt
        pl = state["prompt_learner"]
        if "token_prefix" in pl:
            out["token_prefix"] = pl["token_prefix"]
            out["token_suffix"] = pl["token_suffix"]
        return out
