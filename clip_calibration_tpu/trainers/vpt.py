"""VPT: vision-only deep prompt tuning.

Parity target: ``/root/reference/trainers/classification/vpt.py``.
Text side is FIXED ("a photo of a {}" features, encoded once —
``vpt.py:68-90``); trainable parameters are the shallow vision prompt
appended after the positional embedding plus per-layer prompts for layers
1..depth-1 (the reference scatters these across ViT blocks as
``VPT_shallow`` params, ``clip/model.py:191-256``; here they are one
stacked [depth-1, n_ctx, width] array fed to the uniform splice
interface).
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


@TRAINER_REGISTRY.register()
class VPT(VLBaseLearner):
    #: vision-side prompts are TRAINABLE here: the image tower is on
    #: the gradient path, so TRAINER.QUANT_FROZEN_VISION must refuse
    #: (base_learner.setup_frozen_vision raises).
    vision_tower_trainable = True

    fused_dac_scoring = True

    def check_cfg(self, cfg):
        assert cfg.TRAINER.VPT.PREC in ("fp16", "fp32", "amp")
        assert cfg.TRAINER.VPT.PROMPT_DEPTH_VISION >= 1, \
            "For Vision Prompting, PROMPT_DEPTH_VISION should be >= 1"

    def build_model(self):
        cfg = self.cfg
        tcfg = cfg.TRAINER.VPT
        classnames = self.dm.dataset.classnames
        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.clip_params, self.clip_cfg = load_clip_backbone(
            cfg.MODEL.BACKBONE.NAME,
            "float32" if tcfg.PREC == "fp32" else "bfloat16")
        self.compute_dtype = (jnp.float32 if tcfg.PREC == "fp32"
                              else jnp.bfloat16)
        self.n_ctx = tcfg.N_CTX_VISION
        self.depth = tcfg.PROMPT_DEPTH_VISION

        print("Vision Prompting Design")
        print('Initial context: "a photo of a"')
        print(f"Number of context words (tokens) for Vision prompting: "
              f"{self.n_ctx}")
        print("Using fixed hand crated prompts")

        # fixed text features
        prompts = ["a photo of a " + n.replace("_", " ") + "."
                   for n in classnames]
        ccfg = self.clip_cfg
        toks = tokenize(prompts)
        seq = M.eot_seq_len(toks)
        # the reference VPT model is UNCONDITIONALLY fp32 (its
        # load_clip_to_cpu returns model.float(), vpt.py:42); the fixed
        # text features are one-time build cost, so match that exactly
        # (the bf16 tower per-step compute stays — documented deviation)
        self.text_features = jax.jit(
            lambda p, t: M.encode_text(p, ccfg, t, dtype=jnp.float32,
                                       seq_len=seq))(
                self.clip_params, jnp.asarray(toks))

        vw = ccfg.vision_width
        k1, k2 = jax.random.split(jax.random.PRNGKey(max(cfg.SEED, 0)))
        trainable = {"shallow": jax.random.normal(
            k1, (self.n_ctx, vw)) * 0.02}
        if self.depth > 1:
            trainable["deep"] = jax.random.normal(
                k2, (self.depth - 1, self.n_ctx, vw)) * 0.02
        steps = max(len(self.train_loader_x), 1)
        opt, _ = build_optimizer(cfg, steps)
        self.opt = opt
        self.register_model("vpt_prompts", trainable, opt,
                            opt.init(trainable))
        self._build_steps()

    def _image_features(self, trainable, frozen, images):
        x = normalize_images(images, *self.pixel_stats,
                             dtype=self.compute_dtype)
        deep = trainable.get("deep")
        return M.encode_image(
            frozen, self.clip_cfg, x,
            shallow_prompts=trainable["shallow"],
            deep_prompts=deep,
            deep_prompt_depth=self.depth if deep is not None else 0,
            dtype=self.compute_dtype)

    def _build_steps(self):
        def loss_fn(trainable, frozen, txt_f, images, labels):
            img_f = self._image_features(trainable, frozen, images)
            logits = M.cosine_logits(img_f, txt_f, frozen["logit_scale"])
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(trainable, opt_state, frozen, txt_f, images,
                       labels):
            loss, grads = jax.value_and_grad(loss_fn)(
                trainable, frozen, txt_f, images, labels)
            updates, opt_state = self.opt.update(grads, opt_state,
                                                 trainable)
            return optax.apply_updates(trainable, updates), opt_state, loss

        @jax.jit
        def infer_step(trainable, frozen, txt_f, images):
            img_n = M.normalize(self._image_features(trainable, frozen,
                                                     images))
            txt_n = M.normalize(txt_f)
            scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
            logits = scale * jnp.dot(img_n.astype(jnp.float32),
                                     txt_n.astype(jnp.float32).T)
            return logits, img_n, txt_n

        self._train_step = train_step
        self._infer_step = infer_step

    def forward_backward(self, batch):
        images, labels = self.parse_batch_train(batch)
        slot = self._models["vpt_prompts"]
        slot["params"], slot["opt_state"], loss = self._train_step(
            slot["params"], slot["opt_state"], self.clip_params,
            self.text_features, self.put_batch(images), self.put_batch(labels))
        return {"loss": loss}

    def model_inference(self, images):
        return self._infer_step(self._models["vpt_prompts"]["params"],
                                self.clip_params, self.text_features,
                                self.put_batch(images))

    def checkpoint_dir_aliases(self, name):
        # the reference registers the whole model under "prompt_learner"
        return [name, "prompt_learner"]

    def convert_to_reference_state(self, name, state):
        """Inverse: ours -> reference image_encoder.VPT +
        resblocks.N.VPT_shallow layout."""
        enc = {"VPT": np.asarray(state["shallow"]),
               "transformer": {"resblocks": {}}}
        deep = state.get("deep")
        if deep is not None:
            deep = np.asarray(deep)
            enc["transformer"]["resblocks"] = {
                str(i + 1): {"VPT_shallow": deep[i]}
                for i in range(deep.shape[0])}
        return {"image_encoder": enc}

    def convert_reference_state(self, name, state):
        """Reference VPT checkpoints are whole-model state dicts with
        image_encoder.VPT and per-layer resblocks.N.VPT_shallow."""
        enc = state.get("image_encoder")
        if not isinstance(enc, dict):
            return state
        import numpy as np
        out = {"shallow": np.asarray(enc["VPT"])}
        if self.depth > 1:
            # tolerate checkpoints trained at a smaller depth
            blocks = enc["transformer"]["resblocks"]
            rows = [np.asarray(blocks[str(i)]["VPT_shallow"])
                    for i in range(1, self.depth)
                    if str(i) in blocks and "VPT_shallow" in blocks[str(i)]]
            if rows:
                out["deep"] = np.stack(rows)
        return out
