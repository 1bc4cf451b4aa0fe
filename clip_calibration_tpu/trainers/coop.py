"""CoOp: Context Optimization prompt tuning.

Parity target: ``/root/reference/trainers/classification/coop.py``.
Learnable context vectors (unified or class-specific ``CSC``) are spliced
into pre-embedded class prompts at position end/middle/front; only the
context is trained, the CLIP backbone stays frozen.

TPU-first structure (the template all prompt trainers follow here):
- prompt assembly is a single gather+select over precomputed index maps
  (host-built once from tokenized prompts), so end/middle/front all run as
  one fused device op — no per-class Python loops as in the reference's
  forward (``coop.py:136-190``);
- ONE jit-compiled train step: ``grad`` w.r.t. the ctx pytree only, frozen
  backbone passed as a non-donated argument, ctx+optimizer state donated;
- eval encodes text once per class set, then only images per batch.
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
from ..models.tokenizer import CLIPTokenizer, tokenize
from ..ops.preprocess import normalize_images
from .base_learner import VLBaseLearner

_tokenizer = CLIPTokenizer()


def build_prompt_assembly(classnames, n_ctx: int, class_token_position:
                          str, ctx_init: str, clip_params, compute_dtype,
                          ctx_slots: int | None = None,
                          ctx_init_tail: bool = False):
    """Precompute everything needed to splice [SOS | ctx | class EOS] rows.

    ctx_slots: number of LEARNABLE positions when it differs from the init
    phrase length (MaPLe: N_CTX=2 with CTX_INIT="a photo of a" trains 2
    vectors while "of a" stay frozen in the prompt — reference
    ``maple.py:93-101`` keeps them in token_suffix). Only meaningful with
    ctx_init and position "end".

    ctx_init_tail: ProGrad's scheme (reference ``prograd.py:88-105``):
    keep ALL n_ctx positions learnable, zero-initialized, with the init
    phrase's token embeddings in the LAST len(phrase) slots and leading
    "X" placeholders in the prompt text. (The reference copies
    word-count-many TOKEN embeddings, a quirk mirrored here.)

    Returns dict with:
      embedding: [n_cls, 77, D] fp32 frozen token embeddings of the
        tokenized prompts (ctx positions hold the placeholder embedding),
      tokenized: [n_cls, 77] int32 (for EOT argmax pooling),
      ctx_idx / const_mask: [n_cls, 77] gather maps — final row p is
        ctx[ctx_idx[c, p]] where const_mask is False, else embedding[c, p],
      ctx_vectors: init value [n_ctx, D] (or None if ctx_init given -> the
        embedded init words), prompt_prefix: printable prefix.
    """
    if ctx_init and ctx_init_tail:
        ctx_init = ctx_init.replace("_", " ")
        n_words = len(ctx_init.split(" "))
        assert n_ctx >= n_words, (
            f"#tokens ({n_ctx}) should larger equal than #initial "
            f"prompt tokens ({n_words}, {ctx_init})")
        init_toks = tokenize(ctx_init)
        emb = np.asarray(clip_params["text"]["token_embedding"],
                         np.float32)
        ctx_vectors = np.zeros((n_ctx, emb.shape[1]), np.float32)
        ctx_vectors[n_ctx - n_words:] = emb[init_toks[0, 1:1 + n_words]]
        prompt_prefix = " ".join(
            ["X"] * (n_ctx - n_words) + [ctx_init]).strip()
    elif ctx_init:
        ctx_init = ctx_init.replace("_", " ")
        n_words = len(ctx_init.split(" "))
        n_ctx = n_words if ctx_slots is None else min(ctx_slots, n_words)
        if ctx_slots is not None and n_ctx < n_words:
            assert class_token_position == "end", \
                "ctx_slots < init length only supported at position end"
        init_toks = tokenize(ctx_init)
        emb = np.asarray(clip_params["text"]["token_embedding"],
                         np.float32)
        ctx_vectors = emb[init_toks[0, 1:1 + n_ctx]]
        prompt_prefix = ctx_init
    else:
        if ctx_slots is not None:
            n_ctx = ctx_slots
        ctx_vectors = None
        prompt_prefix = " ".join(["X"] * n_ctx)

    classnames = [name.replace("_", " ") for name in classnames]
    name_lens = [len(_tokenizer.encode(name)) for name in classnames]
    prompts = [prompt_prefix + " " + name + "." for name in classnames]
    tokenized = tokenize(prompts)  # [n_cls, 77]

    emb_table = np.asarray(clip_params["text"]["token_embedding"],
                           np.float32)
    embedding = emb_table[tokenized]  # [n_cls, 77, D]

    n_cls, L = tokenized.shape
    ctx_idx = np.zeros((n_cls, L), np.int32)
    const_mask = np.ones((n_cls, L), bool)

    for c in range(n_cls):
        nl = name_lens[c]
        if class_token_position == "end":
            # [SOS][ctx x n_ctx][name][.][EOS]...
            order = ([("const", 0)] + [("ctx", j) for j in range(n_ctx)]
                     + [("const", p) for p in range(1 + n_ctx, L)])
        elif class_token_position == "middle":
            half = n_ctx // 2
            name_slice = [("const", p) for p in
                          range(1 + n_ctx, 1 + n_ctx + nl)]
            tail = [("const", p) for p in range(1 + n_ctx + nl, L)]
            order = ([("const", 0)] + [("ctx", j) for j in range(half)]
                     + name_slice + [("ctx", j) for j in range(half, n_ctx)]
                     + tail)
        elif class_token_position == "front":
            name_slice = [("const", p) for p in
                          range(1 + n_ctx, 1 + n_ctx + nl)]
            tail = [("const", p) for p in range(1 + n_ctx + nl, L)]
            order = ([("const", 0)] + name_slice
                     + [("ctx", j) for j in range(n_ctx)] + tail)
        else:
            raise ValueError(class_token_position)
        order = order[:L]
        for p, (kind, j) in enumerate(order):
            if kind == "ctx":
                ctx_idx[c, p] = j
                const_mask[c, p] = False
            elif j != p:
                # move the constant token's embedding to its new position
                # (reads are always from j >= p, not yet overwritten)
                embedding[c, p] = embedding[c, j]

    return {
        "embedding": jnp.asarray(embedding, compute_dtype),
        "tokenized": jnp.asarray(tokenized),
        "eot_pos": jnp.asarray(tokenized.argmax(-1)),
        # static truncation: causal mask => positions past the furthest
        # EOT never reach the pooled feature (models/clip.py::eot_seq_len)
        "seq_len": int(tokenized.argmax(-1).max()) + 1,
        "ctx_idx": jnp.asarray(ctx_idx),
        "const_mask": jnp.asarray(const_mask),
        "ctx_vectors": ctx_vectors,
        "n_ctx": n_ctx,
        "prompt_prefix": prompt_prefix,
        "name_lens": name_lens,
    }


def assemble_prompts(ctx: jnp.ndarray, asm) -> jnp.ndarray:
    """ctx [n_ctx, D] or [n_cls, n_ctx, D] -> [n_cls, 77, D] prompt rows."""
    emb = asm["embedding"]
    n_cls = emb.shape[0]
    ctx = ctx.astype(emb.dtype)
    if ctx.ndim == 2:
        gathered = ctx[asm["ctx_idx"]]  # [n_cls, 77, D]
    else:  # class-specific context [n_cls, n_ctx, D]
        gathered = ctx[jnp.arange(n_cls)[:, None], asm["ctx_idx"]]
    return jnp.where(asm["const_mask"][:, :, None], emb, gathered)


@TRAINER_REGISTRY.register()
class CoOp(VLBaseLearner):
    """Context Optimization (https://arxiv.org/abs/2109.01134)."""

    fused_dac_scoring = True

    trainer_cfg_key = "COOP"

    def check_cfg(self, cfg):
        assert cfg.TRAINER[self.trainer_cfg_key].PREC in (
            "fp16", "fp32", "amp")

    # -- model ----------------------------------------------------------------
    def trainer_cfg(self):
        return self.cfg.TRAINER[self.trainer_cfg_key]

    def build_model(self):
        cfg = self.cfg
        tcfg = self.trainer_cfg()
        classnames = self.dm.dataset.classnames

        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.clip_params, self.clip_cfg = load_clip_backbone(
            cfg.MODEL.BACKBONE.NAME,
            "float32" if tcfg.PREC == "fp32" else "bfloat16")
        self.compute_dtype = (jnp.float32 if tcfg.PREC == "fp32"
                              else jnp.bfloat16)

        if cfg.INPUT.SIZE[0] != self.clip_cfg.image_resolution:
            raise ValueError(
                f"cfg_imsize ({cfg.INPUT.SIZE[0]}) must equal clip_imsize "
                f"({self.clip_cfg.image_resolution})")

        ctx_init = self._resolve_ctx_init(tcfg)
        position = tcfg.get("CLASS_TOKEN_POSITION", "end")
        asm = build_prompt_assembly(
            classnames, tcfg.N_CTX, position, ctx_init,
            self.clip_params, self.compute_dtype,
            **self._assembly_extra())
        self.asm = asm
        n_ctx = asm["n_ctx"]
        ctx_dim = self.clip_cfg.transformer_width
        print(f'Initial context: "{asm["prompt_prefix"]}"')
        print(f"Number of context words (tokens): {n_ctx}")

        rng = jax.random.PRNGKey(max(cfg.SEED, 0))
        if asm["ctx_vectors"] is not None:
            ctx = jnp.asarray(asm["ctx_vectors"], jnp.float32)
        elif tcfg.get("CSC", False):
            print("Initializing class-specific contexts")
            ctx = jax.random.normal(
                rng, (len(classnames), n_ctx, ctx_dim)) * 0.02
        else:
            print("Initializing a generic context")
            ctx = jax.random.normal(rng, (n_ctx, ctx_dim)) * 0.02

        trainable = {"ctx": ctx}
        steps = max(len(self.train_loader_x), 1)
        opt, self.lr_sched = build_optimizer(cfg, steps)
        self.opt = opt
        self.register_model("prompt_learner", trainable, opt,
                            opt.init(trainable))

        self.post_build()  # subclass hook (e.g. zero-shot teacher feats)
        self.setup_frozen_vision()
        self._build_steps()

    def post_build(self):
        pass

    def _resolve_ctx_init(self, tcfg) -> str:
        """KgCoOp configs use CTX_INIT: True meaning "a photo of a"
        (reference kgcoop.py:102-107); ProGrad overrides with its
        dataset-template scheme."""
        ctx_init = tcfg.CTX_INIT
        if ctx_init is True:
            return "a photo of a"
        if ctx_init is False:
            return ""
        return ctx_init

    def _assembly_extra(self) -> dict:
        """Subclass hook: extra build_prompt_assembly kwargs."""
        return {}

    def _text_features(self, frozen, trainable):
        prompts = assemble_prompts(trainable["ctx"], self.asm)
        return M.encode_text_embedded(frozen, self.clip_cfg, prompts,
                                      self.asm["eot_pos"],
                                      seq_len=self.asm["seq_len"])

    def _image_features(self, frozen, images):
        x = normalize_images(images, *self.pixel_stats,
                             dtype=self.compute_dtype)
        return M.encode_image(frozen, self.clip_cfg, x,
                              dtype=self.compute_dtype,
                              qmode=self.vision_qmode_for(images.shape[0]))

    def _loss(self, trainable, frozen, images, labels):
        """Subclass hook: returns scalar loss (default CE)."""
        txt_f = self._text_features(frozen, trainable)
        img_f = self._image_features(frozen, images)
        logits = M.cosine_logits(img_f, txt_f, frozen["logit_scale"])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    def _build_steps(self):
        def loss_fn(trainable, frozen, images, labels):
            return self._loss(trainable, frozen, images, labels)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(trainable, opt_state, frozen, images, labels):
            loss, grads = jax.value_and_grad(loss_fn)(
                trainable, frozen, images, labels)
            updates, opt_state = self.opt.update(grads, opt_state,
                                                 trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss

        @jax.jit
        def text_step(trainable, frozen):
            return M.normalize(self._text_features(frozen, trainable))

        @jax.jit
        def infer_step(frozen, txt_f, images):
            img_f = M.normalize(self._image_features(frozen, images))
            scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
            logits = scale * jnp.dot(img_f.astype(jnp.float32),
                                     txt_f.astype(jnp.float32).T,
                                     preferred_element_type=jnp.float32)
            return logits, img_f

        self._train_step = train_step
        self._text_step = text_step
        self._infer_step = infer_step
        self._cached_text_features = None

    # -- train ------------------------------------------------------------
    def forward_backward(self, batch):
        images, labels = self.parse_batch_train(batch)
        slot = self._models["prompt_learner"]
        slot["params"], slot["opt_state"], loss = self._train_step(
            slot["params"], slot["opt_state"], self.step_clip_params,
            self.put_batch(images), self.put_batch(labels))
        self._cached_text_features = None  # ctx changed
        return {"loss": loss}

    # -- eval ---------------------------------------------------------------
    def model_inference(self, images):
        if self._cached_text_features is None:
            self._cached_text_features = self._text_step(
                self._models["prompt_learner"]["params"],
                self.clip_params)
        txt_f = self._cached_text_features
        logits, img_f = self._infer_step(self.step_clip_params, txt_f,
                                         self.put_batch(images))
        return logits, img_f, txt_f

    def load_model(self, directory, epoch=None):
        super().load_model(directory, epoch)
        self._cached_text_features = None
