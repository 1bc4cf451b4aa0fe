"""ProDA: prompt distribution learning.

Parity target: ``/root/reference/trainers/classification/proda.py``.
A collection of N_PROMPT (32) contexts with mixed class-token positions
(first quarter front, next quarter middle, rest end — ``proda.py:111-115``);
each train step samples a PROMPT_BS minibatch of prompts via a per-cycle
permutation (``proda.py:146-157``, kept as host state here). Training
logits are the prompt-mean text features plus a covariance correction
0.5 * scale^2 * sigma (``proda.py:283-292``), and a diversity penalty on
class-free prompt features (mean |off-diagonal gram|, ``proda.py:296-302``).
Eval uses an explicit ``set_classifier`` that averages text features over
all prompts (``proda.py:315-331``), invoked by the test pipeline.

TPU-first: the reference assembles prompts with per-class Python loops
per step; here the three position variants are precomputed gather maps
(stacked [3, n_cls, 77]) and each step is one fused gather+select, with
the (prompt x class) text encode batched onto the MXU. On meshes with a
model axis > 1 (``TPU.MESH_SHAPE`` e.g. (4, 2)) the n_cls x P fan-out
is sharding-constrained class-axis-over-"model" inside
``_text_features_all`` (``parallel/mesh.fanout_shardings``), for both
the train step and the eval ``set_classifier`` sweep; sharded ==
unsharded is asserted by tests/test_parallel.py.
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
from .coop import build_prompt_assembly

# text-tower rows above which the prompt fan-out encodes with per-layer
# rematerialization (backward memory ~ layer inputs, +1 forward of cost);
# below it the reference-protocol shapes fit comfortably without remat
_REMAT_MIN_TEXT_ROWS = 512


@TRAINER_REGISTRY.register()
class ProDA(VLBaseLearner):

    #: the eval set_classifier sweep re-runs the text tower over
    #: n_cls x n_prompt rows (TRAINER.QUANT_EVAL_TEXT quantizes it)
    text_eval_quant_supported = True

    def check_cfg(self, cfg):
        assert cfg.TRAINER.PRODA.PREC in ("fp16", "fp32", "amp")

    def build_model(self):
        cfg = self.cfg
        tcfg = cfg.TRAINER.PRODA
        classnames = self.dm.dataset.classnames
        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.clip_params, self.clip_cfg = load_clip_backbone(
            cfg.MODEL.BACKBONE.NAME,
            "float32" if tcfg.PREC == "fp32" else "bfloat16")
        self.compute_dtype = (jnp.float32 if tcfg.PREC == "fp32"
                              else jnp.bfloat16)

        n_ctx = tcfg.N_CTX
        self.n_prompt = tcfg.N_PROMPT
        self.prompt_bs = tcfg.PROMPT_BS
        self.alpha = tcfg.ALPHA
        assert self.n_prompt % self.prompt_bs == 0
        self.n_iter = self.n_prompt // self.prompt_bs
        ctx_dim = self.clip_cfg.transformer_width

        # assembly maps for the three class-token positions
        asms = [build_prompt_assembly(classnames, n_ctx, pos, "",
                                      self.clip_params, self.compute_dtype)
                for pos in ("front", "middle", "end")]
        self.embedding = jnp.stack([a["embedding"] for a in asms])
        self.ctx_idx = jnp.stack([a["ctx_idx"] for a in asms])
        self.const_mask = jnp.stack([a["const_mask"] for a in asms])
        self.eot_pos = asms[0]["eot_pos"]
        self.seq_len = max(a["seq_len"] for a in asms)
        self.n_ctx = n_ctx
        print("Initializing a generic context")
        print(f"Number of prompts : {self.n_prompt}")
        print(f"Number of context words (tokens): {n_ctx}")

        # per-prompt positions: quarter front(0), quarter middle(1),
        # half end(2) (reference proda.py:111-115)
        if self.n_prompt > 1:
            q = self.n_prompt // 4
            pos = [0] * q + [1] * q + [2] * (self.n_prompt - 2 * q)
        else:
            pos = [2] * self.n_prompt
        self.pos = jnp.asarray(pos, jnp.int32)

        # class-free prompts "X X ... X ." for the diversity penalty
        nc_toks = tokenize(" ".join(["X"] * n_ctx) + " .")
        emb_table = np.asarray(
            self.clip_params["text"]["token_embedding"], np.float32)
        self.nc_embedding = jnp.asarray(emb_table[nc_toks[0]],
                                        self.compute_dtype)
        self.nc_eot = int(nc_toks[0].argmax())

        rng = jax.random.PRNGKey(max(cfg.SEED, 0))
        trainable = {"ctx": jax.random.normal(
            rng, (self.n_prompt, n_ctx, ctx_dim)) * 0.02}
        steps = max(len(self.train_loader_x), 1)
        opt, _ = build_optimizer(cfg, steps)
        self.opt = opt
        self.register_model("prompt_learner", trainable, opt,
                            opt.init(trainable))

        # host-side prompt-minibatch permutation state
        self._perm_rng = np.random.default_rng(max(cfg.SEED, 0))
        self._perm = None
        self._iter_idx = 0
        self.text_features = None  # set by set_classifier

        self.setup_frozen_vision()
        self._build_steps()

    # -- prompt assembly ------------------------------------------------------
    def _assemble(self, ctx_batch, pos_batch):
        """ctx_batch [P, n_ctx, D], pos_batch [P] -> prompts
        [n_cls, P, 77, D] (position variant per prompt)."""
        emb = self.embedding[pos_batch]        # [P, n_cls, 77, D]
        idx = self.ctx_idx[pos_batch]          # [P, n_cls, 77]
        maskc = self.const_mask[pos_batch]     # [P, n_cls, 77]
        gathered = ctx_batch.astype(emb.dtype)[
            jnp.arange(ctx_batch.shape[0])[:, None, None], idx]
        prompts = jnp.where(maskc[..., None], emb, gathered)
        return prompts.transpose(1, 0, 2, 3)  # [n_cls, P, 77, D]

    def _text_features_all(self, ctx_batch, pos_batch, frozen,
                           extra_rows=None, extra_eots=None,
                           qmode="dequant"):
        """[n_cls, P, E] normalized text features (and, when
        ``extra_rows`` [R, 77, D] is given, their normalized features
        [R, E] from the SAME tower call — the train step appends its
        class-free diversity rows so the step makes one dispatch).

        The n_cls*P fan-out is the HBM hot spot of ProDA training
        (ImageNet base: 500*4 = 2000 77-token rows through the text
        tower, backward included); above the threshold the tower
        rematerializes per layer so backward memory stays bounded by the
        layer inputs instead of every layer's intermediates."""
        prompts = self._assemble(ctx_batch, pos_batch)
        n_cls, P, L, D = prompts.shape
        if self._fanout is not None:
            # class axis over the "model" mesh axis (SURVEY §5.8): the
            # tower rows are independent, so this is pure row
            # parallelism over classes
            prompts = jax.lax.with_sharding_constraint(
                prompts, self._fanout["class"])
        flat = prompts.reshape(n_cls * P, L, D)
        eot = jnp.repeat(self.eot_pos, P)
        seq_len = self.seq_len
        if extra_rows is not None:
            # extra_eots is a HOST array: the shared seq_len is a static
            # jit parameter, so it must be known at trace time
            flat = jnp.concatenate([flat, extra_rows.astype(flat.dtype)],
                                   axis=0)
            eot = jnp.concatenate([eot, jnp.asarray(extra_eots)])
            seq_len = max(seq_len, int(np.max(extra_eots)) + 1)
        total = flat.shape[0]
        txt = M.normalize(M.encode_text_embedded(
            frozen, self.clip_cfg, flat, eot,
            remat=total >= _REMAT_MIN_TEXT_ROWS,
            seq_len=seq_len, qmode=qmode))
        out = txt[:n_cls * P].reshape(n_cls, P, -1)
        if self._fanout is not None:
            out = jax.lax.with_sharding_constraint(
                out, self._fanout["class"])
        if extra_rows is None:
            return out
        return out, txt[n_cls * P:]

    # -- steps ------------------------------------------------------------------
    def _build_steps(self):
        from ..parallel.mesh import fanout_shardings
        self._fanout = fanout_shardings(self.mesh)
        alpha = self.alpha
        n_prompt = self.n_prompt

        def loss_fn(trainable, frozen, images, labels, batch_idx):
            ctx = trainable["ctx"]
            ctx_b = ctx[batch_idx]
            pos_b = self.pos[batch_idx]

            x = normalize_images(images, *self.pixel_stats,
                                 dtype=self.compute_dtype)
            img_f = jax.lax.stop_gradient(M.normalize(M.encode_image(
                frozen, self.clip_cfg, x, dtype=self.compute_dtype,
                qmode=self.vision_qmode_for(images.shape[0])))
            ).astype(jnp.float32)

            # ONE tower call for the n_cls*P fan-out AND the n_prompt
            # class-free diversity rows: the 32-row diversity batch
            # alone underfills the MXU (probe_proda.py: ~2 ms for 4% of
            # the FLOPs); appended it rides the fan-out's packed
            # attention cells for its marginal cost. Bit-identical to
            # separate encodes: rows are independent and the causal
            # mask makes positions past each row's EOT irrelevant, so
            # the longer shared seq_len changes nothing.
            nc = jnp.broadcast_to(
                self.nc_embedding[None],
                (n_prompt,) + self.nc_embedding.shape)
            nc = jnp.concatenate(
                [nc[:, :1], ctx.astype(nc.dtype),
                 nc[:, 1 + self.n_ctx:]], axis=1)
            nc_eots = np.full((n_prompt,), self.nc_eot, np.int32)

            tf, nc_f = self._text_features_all(
                ctx_b, pos_b, frozen, extra_rows=nc,
                extra_eots=nc_eots)
            tf = tf.astype(jnp.float32)           # [n_cls, P, E]
            nc_f = nc_f.astype(jnp.float32)
            text_mean = tf.mean(axis=1)           # [n_cls, E]
            scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
            logits = scale * jnp.dot(img_f, text_mean.T)

            # covariance correction (proda.py:283-292). Only the diagonal
            # refined[b,i,i] and the label row refined[b,y_b,:] of
            # refined = einsum("bd,ipd,kpd->bik", img^2, c, c)/(P+1) are
            # used, so compute those directly — the naive association
            # materializes a [D, n_cls, n_cls] covariance (2 GB fp32 at
            # ImageNet's n_cls=1000) plus a [B, n_cls, n_cls] product.
            P = tf.shape[1]
            centered = tf - text_mean[:, None]     # [n_cls, P, E]
            img2 = img_f ** 2                      # [B, E]
            diag = jnp.dot(img2, jnp.sum(centered ** 2, axis=1).T) \
                / (P + 1)                          # [B, n_cls]
            cl = centered[labels]                  # [B, P, E]
            row = jnp.einsum("bpd,kpd->bk", img2[:, None] * cl,
                             centered) / (P + 1)   # refined[b, y_b, :]
            row_ll = jnp.take_along_axis(row, labels[:, None], axis=1)
            sigma = row_ll + diag - 2 * row
            logits = logits + 0.5 * (scale ** 2) * sigma
            loss_upper = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

            # diversity penalty over ALL prompts (proda.py:296-302);
            # nc_f was encoded in the merged tower call above
            gram = jnp.dot(nc_f, nc_f.T)
            off = 1.0 - jnp.eye(n_prompt)
            loss_m = (jnp.abs(gram) * off).sum() / off.sum()

            return loss_upper + alpha * loss_m

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(trainable, opt_state, frozen, images, labels,
                       batch_idx):
            loss, grads = jax.value_and_grad(loss_fn)(
                trainable, frozen, images, labels, batch_idx)
            updates, opt_state = self.opt.update(grads, opt_state,
                                                 trainable)
            return optax.apply_updates(trainable, updates), opt_state, loss

        def make_classifier_step(qmode):
            # mean text features over ALL prompts; lax.map over the prompt
            # axis bounds peak activations to one [n_cls, 77, D] encode at
            # a time (the reference chunks by 1000 rows on OOM,
            # proda.py:318-326). qmode="w8a8" is the eval-only quantized
            # sweep over a text-quantized frozen pytree
            # (TRAINER.QUANT_EVAL_TEXT).
            @jax.jit
            def classifier_step(trainable, frozen):
                def one_prompt(args):
                    ctx_p, pos_p = args
                    tf = self._text_features_all(ctx_p[None], pos_p[None],
                                                 frozen, qmode=qmode)
                    return tf[:, 0, :]  # [n_cls, E]

                per_prompt = jax.lax.map(one_prompt,
                                         (trainable["ctx"], self.pos))
                return per_prompt.mean(axis=0)  # [n_cls, E]
            return classifier_step

        classifier_step = make_classifier_step("dequant")
        if self.text_eval_quant:
            self._classifier_step_qtext = make_classifier_step(
                self.text_eval_qmode())

        @jax.jit
        def infer_step(frozen, txt_f, images):
            x = normalize_images(images, *self.pixel_stats,
                                 dtype=self.compute_dtype)
            img_n = M.normalize(M.encode_image(
                frozen, self.clip_cfg, x, dtype=self.compute_dtype,
                qmode=self.vision_qmode_for(images.shape[0])))
            scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
            logits = scale * jnp.dot(img_n.astype(jnp.float32),
                                     jnp.asarray(txt_f,
                                                 jnp.float32).T)
            return logits, img_n

        self._train_step = train_step
        self._classifier_step = classifier_step
        self._infer_step = infer_step

    # -- train ------------------------------------------------------------
    def _next_prompt_batch(self):
        if self.n_iter <= 1:
            return np.arange(self.n_prompt)
        if self._iter_idx == 0:
            self._perm = self._perm_rng.permutation(self.n_prompt)
        sel = self._perm[self._iter_idx * self.prompt_bs:
                         (self._iter_idx + 1) * self.prompt_bs]
        self._iter_idx = (self._iter_idx + 1) % self.n_iter
        return sel

    def forward_backward(self, batch):
        images, labels = self.parse_batch_train(batch)
        batch_idx = jnp.asarray(self._next_prompt_batch())
        slot = self._models["prompt_learner"]
        slot["params"], slot["opt_state"], loss = self._train_step(
            slot["params"], slot["opt_state"], self.step_clip_params,
            self.put_batch(images), self.put_batch(labels), batch_idx)
        self.text_features = None  # classifier stale
        if self.text_eval_quant:
            self.invalidate_eval_text_quant()  # ctx moved: scales stale
        return {"loss": loss}

    # -- eval ---------------------------------------------------------------
    def set_classifier(self):
        if self.text_eval_quant:
            self.text_features = self._classifier_step_qtext(
                self._models["prompt_learner"]["params"],
                self.eval_text_clip_params())
            return
        self.text_features = self._classifier_step(
            self._models["prompt_learner"]["params"], self.clip_params)

    def model_inference(self, images):
        if self.text_features is None:
            self.set_classifier()
        logits, img_n = self._infer_step(self.step_clip_params,
                                         self.text_features,
                                         self.put_batch(images))
        return logits, img_n, self.text_features

    def load_model(self, directory, epoch=None):
        super().load_model(directory, epoch)
        self.text_features = None
        self.invalidate_eval_text_quant()

    def _text_calibration_prompts(self):
        """Prompt 0's assembled rows over all classes — one
        representative [n_cls, 77, D] slice of the sweep (every prompt
        shares the embedding table and LN-bounded ranges; agreement
        gated by tests/test_quant_eval_text.py)."""
        ctx = self._models["prompt_learner"]["params"]["ctx"]
        prompts = self._assemble(ctx[:1], self.pos[:1])  # [n_cls, 1, L, D]
        n_cls, _, L, D = prompts.shape
        return (prompts.reshape(n_cls, L, D), self.eot_pos,
                self.seq_len)
