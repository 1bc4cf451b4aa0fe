"""ProDA train-step decomposition on the attached TPU chip.

VERDICT r2 item 3: ProDA is the slowest trainer (39.0 ms at the
reference protocol b4 / 100 cls / prompt_bs 4 / n_ctx 16). This probe
times each component of the step with the chained-scan methodology
(docs/ROOFLINE.md: data-dependent iterations, one scalar fetched) to
locate the sink before optimizing.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  CC_SYNTH_CLASSES=100 CC_SYNTH_TRAIN=20 CC_SYNTH_VAL=2 CC_SYNTH_TEST=4 \
  python benchmarks/probe_proda.py
"""

from __future__ import annotations

import functools
import os
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

N_ITERS = 20
N_TRIALS = 5


def time_scalar(label, make_body, *args):
    """make_body(eps, *args) -> scalar; eps is a data-dependent ~0 f32
    scalar so XLA cannot hoist the body out of the scan or let the
    tunnel elide repeated dispatches."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(args, n):
        def body(carry, _):
            out = make_body(carry, *args)
            nxt = (out.astype(jnp.float32) > 1e30).astype(jnp.float32)
            return carry + nxt * 1e-6, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    float(run(args, N_ITERS))  # compile + warm
    trials = []
    for _ in range(N_TRIALS):
        t0 = time.perf_counter()
        float(run(args, N_ITERS))
        trials.append((time.perf_counter() - t0) / N_ITERS * 1e3)
    ms = sorted(trials)[len(trials) // 2]
    print(f"{label:<44} {ms:8.2f} ms")
    return ms


def main():
    from train import build_parser, setup_cfg
    from clip_calibration_tpu.engine.registry import build_trainer
    import clip_calibration_tpu.trainers  # noqa: F401
    import clip_calibration_tpu.data.datasets  # noqa: F401
    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.ops.preprocess import normalize_images

    root = os.environ.get("BENCH_ROOT", "/tmp/bench_trainers_data")
    args = build_parser().parse_args(
        ["--root", root, "--trainer", "ProDA", "--seed", "1",
         "--dataset-config-file", "configs/datasets/synthetic.yaml",
         "--config-file",
         "configs/trainers/ProDA/vit_b16_c16_ep100_batch4.yaml",
         "--output-dir", "/tmp/probe_proda",
         "TEST.NO_TEST", "True", "DATASET.NUM_SHOTS", "16"])
    cfg = setup_cfg(args)
    t = build_trainer(cfg)
    t.train_loader_x.set_epoch(0)
    batch = next(iter(t.train_loader_x))
    images = t.put_batch(batch["img"])
    labels = t.put_batch(batch["label"])
    frozen = t.clip_params
    ctx = t._models["prompt_learner"]["params"]["ctx"]
    batch_idx = jnp.arange(t.prompt_bs)
    ctx_b0 = ctx[batch_idx]
    pos_b = t.pos[batch_idx]
    n_cls = t.num_classes
    print(f"protocol: b{images.shape[0]} n_cls={n_cls} "
          f"prompt_bs={t.prompt_bs} n_ctx={t.n_ctx} "
          f"seq_len={t.seq_len} n_prompt={t.n_prompt}")

    # 1. the full step's loss fwd+bwd (no optimizer) — reconstructed
    # exactly as trainers/proda.py builds it (same module functions,
    # same shapes), with an eps hook for the scan data dependence
    trainable0 = {"ctx": ctx}
    import optax

    def loss_fn(trainable, frozen, images, labels, bidx, eps):
        ctx_all = trainable["ctx"] + eps
        ctx_b = ctx_all[bidx]
        pos_bb = t.pos[bidx]
        x = normalize_images(images, dtype=t.compute_dtype)
        img_f = jax.lax.stop_gradient(M.normalize(M.encode_image(
            frozen, t.clip_cfg, x, dtype=t.compute_dtype))
        ).astype(jnp.float32)
        tf = t._text_features_all(ctx_b, pos_bb, frozen).astype(
            jnp.float32)
        text_mean = tf.mean(axis=1)
        scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
        logits = scale * jnp.dot(img_f, text_mean.T)
        P = tf.shape[1]
        centered = tf - text_mean[:, None]
        img2 = img_f ** 2
        diag = jnp.dot(img2, jnp.sum(centered ** 2, axis=1).T) / (P + 1)
        cl = centered[labels]
        row = jnp.einsum("bpd,kpd->bk", img2[:, None] * cl,
                         centered) / (P + 1)
        row_ll = jnp.take_along_axis(row, labels[:, None], axis=1)
        sigma = row_ll + diag - 2 * row
        logits = logits + 0.5 * (scale ** 2) * sigma
        loss_upper = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        nc = jnp.broadcast_to(
            t.nc_embedding[None],
            (t.n_prompt,) + t.nc_embedding.shape)
        nc = jnp.concatenate(
            [nc[:, :1], ctx_all.astype(nc.dtype),
             nc[:, 1 + t.n_ctx:]], axis=1)
        nc_eots = jnp.full((t.n_prompt,), t.nc_eot, jnp.int32)
        nc_f = M.normalize(M.encode_text_embedded(
            frozen, t.clip_cfg, nc, nc_eots,
            seq_len=t.nc_eot + 1)).astype(jnp.float32)
        gram = jnp.dot(nc_f, nc_f.T)
        off = 1.0 - jnp.eye(t.n_prompt)
        loss_m = (jnp.abs(gram) * off).sum() / off.sum()
        return loss_upper + t.alpha * loss_m

    def _vg(eps, f, *args):
        """value_and_grad with the grads FED INTO the fetched scalar via
        eps — otherwise XLA dead-code-eliminates the entire backward and
        'fwd+bwd' silently measures forward only."""
        val, g = jax.value_and_grad(f)(*args)
        gsum = sum(x.astype(jnp.float32).sum()
                   for x in jax.tree_util.tree_leaves(g))
        return val + eps * gsum

    time_scalar(
        "full loss fwd+bwd",
        lambda eps, tr, fz, im, lb, bi: _vg(
            eps, lambda tr: loss_fn(tr, fz, im, lb, bi, eps), tr),
        trainable0, frozen, images, labels, batch_idx)

    # 2. text fan-out fwd+bwd alone (400 rows)
    time_scalar(
        "text fan-out fwd+bwd (n_cls*P rows)",
        lambda eps, cb, fz: _vg(
            eps, lambda c: t._text_features_all(c + eps, pos_b, fz)
            .astype(jnp.float32).sum(), cb),
        ctx_b0, frozen)

    # 3. text fan-out FORWARD only
    time_scalar(
        "text fan-out fwd only",
        lambda eps, cb, fz: t._text_features_all(cb + eps, pos_b, fz)
        .astype(jnp.float32).sum(),
        ctx_b0, frozen)

    # 4. assembly (gather+where) fwd+bwd alone
    time_scalar(
        "prompt assembly fwd+bwd (77 tok)",
        lambda eps, cb: _vg(
            eps, lambda c: t._assemble(c + eps, pos_b)
            .astype(jnp.float32).sum(), cb),
        ctx_b0)

    # 5. diversity term fwd+bwd (n_prompt class-free rows)
    def div_loss(ctx_all, frozen, eps):
        ctx_all = ctx_all + eps
        nc = jnp.broadcast_to(
            t.nc_embedding[None], (t.n_prompt,) + t.nc_embedding.shape)
        nc = jnp.concatenate(
            [nc[:, :1], ctx_all.astype(nc.dtype),
             nc[:, 1 + t.n_ctx:]], axis=1)
        nc_eots = jnp.full((t.n_prompt,), t.nc_eot, jnp.int32)
        nc_f = M.normalize(M.encode_text_embedded(
            frozen, t.clip_cfg, nc, nc_eots,
            seq_len=t.nc_eot + 1)).astype(jnp.float32)
        gram = jnp.dot(nc_f, nc_f.T)
        off = 1.0 - jnp.eye(t.n_prompt)
        return (jnp.abs(gram) * off).sum() / off.sum()

    time_scalar(
        "diversity (n_prompt rows) fwd+bwd",
        lambda eps, c, fz: _vg(eps, lambda c: div_loss(c, fz, eps), c),
        ctx, frozen)

    # 6. image encode fwd (b4, stop-grad in the step)
    time_scalar(
        "image encode fwd (b4)",
        lambda eps, im, fz: M.normalize(M.encode_image(
            fz, t.clip_cfg,
            normalize_images(im, dtype=t.compute_dtype)
            + eps.astype(t.compute_dtype))).astype(jnp.float32).sum(),
        images, frozen)

    # 7. covariance + CE given features, fwd+bwd wrt tf
    tf0 = jnp.zeros((n_cls, t.prompt_bs, t.clip_cfg.embed_dim),
                    jnp.float32) + 0.1
    img_f0 = jnp.ones((images.shape[0], t.clip_cfg.embed_dim),
                      jnp.float32)

    def cov_loss(tf, eps):
        tf = tf + eps
        img_f = img_f0
        text_mean = tf.mean(axis=1)
        scale = jnp.exp(frozen["logit_scale"].astype(jnp.float32))
        logits = scale * jnp.dot(img_f, text_mean.T)
        P = tf.shape[1]
        centered = tf - text_mean[:, None]
        img2 = img_f ** 2
        diag = jnp.dot(img2, jnp.sum(centered ** 2, axis=1).T) / (P + 1)
        cl = centered[labels]
        row = jnp.einsum("bpd,kpd->bk", img2[:, None] * cl,
                         centered) / (P + 1)
        row_ll = jnp.take_along_axis(row, labels[:, None], axis=1)
        sigma = row_ll + diag - 2 * row
        logits = logits + 0.5 * (scale ** 2) * sigma
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    time_scalar(
        "covariance logits + CE fwd+bwd",
        lambda eps, tf: _vg(eps, lambda tf: cov_loss(tf, eps), tf),
        tf0)


if __name__ == "__main__":
    main()
