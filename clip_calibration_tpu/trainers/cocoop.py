"""CoCoOp: conditional (instance-conditioned) context optimization.

Parity target: ``/root/reference/trainers/classification/cocoop.py``.
A meta-net MLP (vis_dim -> vis_dim/16 -> ctx_dim) maps each image's
features to a bias added to the shared context; every image then gets its
own n_cls text encodes (``cocoop.py:156-199``).

TPU-first: the reference loops per image in Python; here the per-image
n_cls x 77-token text encodes run under ``jax.lax.map`` over CHUNKS of
images — each step feeds one (chunk * n_cls)-row batch to the text tower
(~512 prompt rows: a single image's prompts underfill the MXU, all
B * n_cls at once is an HBM spike at ImageNet scale). For multi-chip
meshes with a model axis > 1 (``TPU.MESH_SHAPE`` e.g. (4, 2)), each
chunk's fan-out is sharding-constrained in ``_forward``: images over
"data", classes over "model" (``parallel/mesh.fanout_shardings``), so
the whole mesh works on every text-tower call; sharded == unsharded is
asserted by tests/test_parallel.py.
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
from ..ops.preprocess import normalize_images
from .base_learner import VLBaseLearner
from .coop import build_prompt_assembly

# prompt rows per text-tower step in the chunked per-image encode
_CHUNK_TARGET_ROWS = 512


def meta_net_forward(p, x):
    h = jnp.maximum(jnp.dot(x, p["w1"].astype(x.dtype))
                    + p["b1"].astype(x.dtype), 0)
    return jnp.dot(h, p["w2"].astype(x.dtype)) + p["b2"].astype(x.dtype)


@TRAINER_REGISTRY.register()
class CoCoOp(VLBaseLearner):

    #: eval re-runs the text tower for every image's class set — the
    #: canonical quantized-text-fan-out workload (TRAINER.QUANT_EVAL_TEXT)
    text_eval_quant_supported = True

    def check_cfg(self, cfg):
        assert cfg.TRAINER.COCOOP.PREC in ("fp16", "fp32", "amp")

    def build_model(self):
        cfg = self.cfg
        tcfg = cfg.TRAINER.COCOOP
        classnames = self.dm.dataset.classnames
        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.clip_params, self.clip_cfg = load_clip_backbone(
            cfg.MODEL.BACKBONE.NAME,
            "float32" if tcfg.PREC == "fp32" else "bfloat16")
        self.compute_dtype = (jnp.float32 if tcfg.PREC == "fp32"
                              else jnp.bfloat16)

        asm = build_prompt_assembly(classnames, tcfg.N_CTX, "end",
                                    tcfg.CTX_INIT, self.clip_params,
                                    self.compute_dtype)
        self.asm = asm
        n_ctx = asm["n_ctx"]
        ctx_dim = self.clip_cfg.transformer_width
        vis_dim = self.clip_cfg.embed_dim
        print(f'Initial context: "{asm["prompt_prefix"]}"')
        print(f"Number of context words (tokens): {n_ctx}")

        rng = jax.random.PRNGKey(max(cfg.SEED, 0))
        k_ctx, k1, k2 = jax.random.split(rng, 3)
        if asm["ctx_vectors"] is not None:
            ctx = jnp.asarray(asm["ctx_vectors"], jnp.float32)
        else:
            ctx = jax.random.normal(k_ctx, (n_ctx, ctx_dim)) * 0.02
        hid = vis_dim // 16
        lim1 = (1.0 / vis_dim) ** 0.5
        lim2 = (1.0 / hid) ** 0.5
        kb1, kb2 = jax.random.split(jax.random.fold_in(k1, 1))
        trainable = {
            "ctx": ctx,
            # torch nn.Linear default init: weights AND biases from
            # U(+-1/sqrt(fan_in)) (reference meta_net)
            "meta": {
                "w1": jax.random.uniform(k1, (vis_dim, hid), jnp.float32,
                                         -lim1, lim1),
                "b1": jax.random.uniform(kb1, (hid,), jnp.float32,
                                         -lim1, lim1),
                "w2": jax.random.uniform(k2, (hid, ctx_dim), jnp.float32,
                                         -lim2, lim2),
                "b2": jax.random.uniform(kb2, (ctx_dim,), jnp.float32,
                                         -lim2, lim2),
            },
        }
        steps = max(len(self.train_loader_x), 1)
        opt, _ = build_optimizer(cfg, steps)
        self.opt = opt
        self.register_model("prompt_learner", trainable, opt,
                            opt.init(trainable))
        self.setup_frozen_vision()
        self._build_steps()

    # -- forward ----------------------------------------------------------
    def _forward(self, trainable, frozen, images, text_qmode="dequant"):
        """Returns (logits [B, n_cls], img_f, last image's txt_f).

        text_qmode: qdot mode for the per-chunk text encodes — "w8a8"
        only on the EVAL step over a text-quantized ``frozen``
        (TRAINER.QUANT_EVAL_TEXT; the train step must stay "dequant":
        ctx gradients flow through the text tower)."""
        asm = self.asm
        emb = asm["embedding"]
        n_ctx = asm["n_ctx"]
        ccfg = self.clip_cfg

        x = normalize_images(images, *self.pixel_stats,
                             dtype=self.compute_dtype)
        img_f = M.normalize(M.encode_image(
            frozen, ccfg, x, dtype=self.compute_dtype,
            qmode=self.vision_qmode_for(images.shape[0])))

        bias = meta_net_forward(trainable["meta"],
                                img_f.astype(jnp.float32))  # [B, D]
        ctx = trainable["ctx"][None] + bias[:, None]  # [B, n_ctx, D]

        scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))

        # Per-image text encodes (the CoCoOp blowup, reference
        # cocoop.py:193-199 loops images on host). lax.map over CHUNKS of
        # images, each chunk one (chunk * n_cls)-row text-tower batch:
        # a single image's n_cls prompts underfill the MXU, while all
        # B * n_cls at once is an HBM spike at ImageNet scale (n_cls
        # 1000). ~512 prompt rows per step keeps both bounded; peak
        # activation memory stays ~rows x 77 x width regardless of B.
        B = ctx.shape[0]
        n_cls = emb.shape[0]
        chunk = max(1, min(B, _CHUNK_TARGET_ROWS // max(n_cls, 1)))
        n_chunks = -(-B // chunk)
        pad = n_chunks * chunk - B
        ctx_p = jnp.concatenate(
            [ctx, jnp.broadcast_to(ctx[-1:], (pad,) + ctx.shape[1:])]
        ) if pad else ctx
        imf_p = jnp.concatenate(
            [img_f, jnp.broadcast_to(img_f[-1:],
                                     (pad,) + img_f.shape[1:])]
        ) if pad else img_f

        fanout = self._fanout  # class-axis sharding (model axis > 1)

        def per_chunk(args):
            ctx_c, imf_c = args                     # [chunk, n_ctx, D]
            tiled = jnp.broadcast_to(
                ctx_c.astype(emb.dtype)[:, None],
                (chunk, n_cls, n_ctx, emb.shape[-1]))
            prompts = jnp.concatenate(
                [jnp.broadcast_to(emb[None, :, :1],
                                  (chunk,) + emb[:, :1].shape),
                 tiled,
                 jnp.broadcast_to(emb[None, :, 1 + n_ctx:],
                                  (chunk,) + emb[:, 1 + n_ctx:].shape)],
                axis=2)                     # [chunk, n_cls, 77, D]
            if fanout is not None:
                # images over "data", classes over "model": the full
                # mesh splits this chunk's text-tower rows (SURVEY §5.8)
                prompts = jax.lax.with_sharding_constraint(
                    prompts, fanout["chunk_class"])
            prompts = prompts.reshape(chunk * n_cls, emb.shape[1], -1)
            eot = jnp.tile(asm["eot_pos"], chunk)
            txt_f = M.encode_text_embedded(frozen, ccfg, prompts, eot,
                                           seq_len=asm["seq_len"],
                                           qmode=text_qmode)
            txt_n = M.normalize(txt_f).reshape(chunk, n_cls, -1)
            if fanout is not None:
                txt_n = jax.lax.with_sharding_constraint(
                    txt_n, fanout["chunk_class"])
            l_c = scale * jnp.einsum(
                "cd,cnd->cn", imf_c.astype(jnp.float32),
                txt_n.astype(jnp.float32))
            return l_c, txt_n

        # at scale, checkpoint each chunk: the outer map's backward would
        # otherwise stash every chunk's text-tower intermediates —
        # B * n_cls rows' worth, the very spike the chunking bounds in
        # the forward. With remat only the per-chunk inputs survive.
        chunk_fn = (jax.checkpoint(per_chunk)
                    if B * n_cls >= _CHUNK_TARGET_ROWS else per_chunk)
        logits, txt_all = jax.lax.map(
            chunk_fn,
            (ctx_p.reshape(n_chunks, chunk, *ctx.shape[1:]),
             imf_p.reshape(n_chunks, chunk, *img_f.shape[1:])))
        logits = logits.reshape(n_chunks * chunk, n_cls)[:B]
        txt_last = txt_all.reshape(n_chunks * chunk, n_cls, -1)[B - 1]
        return logits, img_f, txt_last

    def _build_steps(self):
        from ..parallel.mesh import fanout_shardings
        self._fanout = fanout_shardings(self.mesh)

        def loss_fn(trainable, frozen, images, labels):
            logits, _, _ = self._forward(trainable, frozen, images)
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
            return self._forward(trainable, frozen, images)

        self._train_step = train_step
        self._infer_step = infer_step

        if self.text_eval_quant:
            tq = self.text_eval_qmode()

            @jax.jit
            def infer_step_qtext(trainable, frozen, images):
                return self._forward(trainable, frozen, images,
                                     text_qmode=tq)

            self._infer_step_qtext = infer_step_qtext

    def forward_backward(self, batch):
        images, labels = self.parse_batch_train(batch)
        slot = self._models["prompt_learner"]
        slot["params"], slot["opt_state"], loss = self._train_step(
            slot["params"], slot["opt_state"], self.step_clip_params,
            self.put_batch(images), self.put_batch(labels))
        if self.text_eval_quant:
            self.invalidate_eval_text_quant()  # ctx moved: scales stale
        return {"loss": loss}

    def model_inference(self, images):
        if self.text_eval_quant:
            return self._infer_step_qtext(
                self._models["prompt_learner"]["params"],
                self.eval_text_clip_params(), self.put_batch(images))
        return self._infer_step(self._models["prompt_learner"]["params"],
                                self.step_clip_params,
                                self.put_batch(images))

    def _text_calibration_prompts(self):
        """The UNSHIFTED ctx prompts over all classes (bias = 0). Eval
        prompts add a small per-image meta-net bias to the ctx tokens,
        but every calibrated site sits after a LayerNorm (row ranges
        set by the LN gain, insensitive to an input shift) — agreement
        with the full-precision fan-out is gated by
        tests/test_quant_eval_text.py."""
        asm = self.asm
        emb = asm["embedding"]
        n_ctx = asm["n_ctx"]
        ctx = self._models["prompt_learner"]["params"]["ctx"]
        prompts = jnp.concatenate(
            [emb[:, :1],
             jnp.broadcast_to(ctx.astype(emb.dtype)[None],
                              (emb.shape[0], n_ctx, emb.shape[-1])),
             emb[:, 1 + n_ctx:]], axis=1)
        return prompts, asm["eot_pos"], asm["seq_len"]

    def load_model(self, directory, epoch=None):
        super().load_model(directory, epoch)
        self.invalidate_eval_text_quant()  # new ctx: scales stale

    def convert_to_reference_state(self, name, state):
        """Inverse of convert_reference_state: ours -> torch meta_net
        layout ([out,in] Linear weights)."""
        state = dict(state)
        meta = state.pop("meta", None)
        if meta is not None:
            state["meta_net"] = {
                "linear1": {"weight": np.asarray(meta["w1"]).T,
                            "bias": np.asarray(meta["b1"])},
                "linear2": {"weight": np.asarray(meta["w2"]).T,
                            "bias": np.asarray(meta["b2"])},
            }
        return state

    def convert_reference_state(self, name, state):
        """Reference prompt_learner checkpoints hold
        meta_net.linear{1,2}.{weight,bias} (torch [out,in] weights)."""
        meta = state.pop("meta_net", None)
        if meta is not None:
            state = dict(state)
            state["meta"] = {
                "w1": np.asarray(meta["linear1"]["weight"]).T,
                "b1": np.asarray(meta["linear1"]["bias"]),
                "w2": np.asarray(meta["linear2"]["weight"]).T,
                "b2": np.asarray(meta["linear2"]["bias"]),
            }
        return state
