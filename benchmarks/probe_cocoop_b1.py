"""CoCoOp batch-1 step: bound decomposition.

The protocol budget (``configs/trainers/CoCoOp/vit_b16_c4_ep10_batch1.
yaml``, reference ``run/calibration/fewshot_scaling.sh``) trains
CoCoOp at BATCH 1 — the per-image prompt fan-out makes larger batches
an HBM spike at ImageNet scale, so the reference caps it. bench.py's
``trainer_steps`` pins the step at ~4.9 ms/b1; this probe decomposes
that figure into its parts so the ROOFLINE table has a bound argument
for the last unbounded trainer row:

  full        the product CoCoOp step (bench_trainers machinery)
  image_b1    ViT-B/16 fwd+bwd at batch 1 (frozen tower, prompt grads)
  text_100    the n_cls=100-row prompt fan-out fwd+bwd at the
              protocol's truncated seq (n_ctx 4 + classname + SOT/EOT)
  floor       a trivial jitted update timed with the SAME pipelined
              step loop — the irreducible per-step dispatch cost that
              survives pipelining on this tunnel

Methodology matches bench_trainers.py: N distinct staged inputs cycled
(tunnel elision), N_STEPS dispatches per trial with ONE final scalar
fetch (pipelined dispatch), median of trials. Backward DCE trap
handled as in probe_text_tower.py (grads feed the fetched scalar).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_cocoop_b1.py
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "benchmarks"))

import jax
import jax.numpy as jnp

N_STEPS = 50
N_TRIALS = 5
N_STAGED = 4


def _loop_ms(step, staged):
    """Median ms/dispatch of the pipelined step loop (one fetch/trial)."""
    out = None
    for i in range(8):  # compile + warm every staged variant
        out = step(staged[i % len(staged)])
    float(jax.tree.leaves(out)[0].sum()
          if hasattr(jax.tree.leaves(out)[0], "sum")
          else jax.tree.leaves(out)[0])
    trials = []
    for _ in range(N_TRIALS):
        t0 = time.perf_counter()
        for i in range(N_STEPS):
            out = step(staged[i % len(staged)])
        leaf = jax.tree.leaves(out)[0]
        float(leaf.sum() if hasattr(leaf, "sum") else leaf)  # drain
        trials.append((time.perf_counter() - t0) / N_STEPS * 1e3)
    return sorted(trials)[len(trials) // 2]


def main():
    from clip_calibration_tpu.tools.platform import (
        enable_compilation_cache)
    enable_compilation_cache()

    from bench_trainers import bench_one

    from clip_calibration_tpu.models import clip as M

    root = os.environ.get("BENCH_ROOT", "/tmp/bench_trainers_data")
    rows = []

    # full product step
    ms, ips, bs = bench_one("CoCoOp", root)
    rows.append({"component": "full", "ms": round(ms, 2), "batch": bs})

    cfg = M.PRESETS["ViT-B/16"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg)
    res = cfg.image_resolution

    # image tower fwd+bwd at b1: grads w.r.t. a prompt-sized leaf so the
    # backward is the frozen-tower VJP the trainer actually runs
    shallow = jnp.zeros((4, cfg.vision_width), jnp.float32)

    @jax.jit
    def image_step(args):
        x, eps = args
        def loss(s):
            f = M.encode_image(params, cfg, x + eps,
                               shallow_prompts=s)
            return f.astype(jnp.float32).sum()
        v, g = jax.value_and_grad(loss)(shallow)
        return v + g.sum() * 1e-12

    staged_img = [(jax.random.normal(jax.random.PRNGKey(i),
                                     (1, res, res, 3), jnp.bfloat16),
                   jnp.float32(i) * 1e-9) for i in range(N_STAGED)]
    rows.append({"component": "image_b1",
                 "ms": round(_loop_ms(image_step, staged_img), 2)})

    # text fan-out fwd+bwd: 100 rows at the protocol's truncated seq
    # (n_ctx 4 + 1-2 name tokens + SOT/EOT ~ 8; pad to the same rounding
    # the assembly uses)
    seq = 8
    D = cfg.transformer_width
    ctx = jnp.zeros((4, D), jnp.float32)

    @jax.jit
    def text_step(args):
        x, eps = args
        eot = jnp.full((100,), seq - 1, jnp.int32)
        def loss(c):
            xx = x.at[:, 1:5].add(c.astype(x.dtype))
            f = M.encode_text_embedded(params, cfg, xx + eps, eot,
                                       seq_len=seq)
            return f.astype(jnp.float32).sum()
        v, g = jax.value_and_grad(loss)(ctx)
        return v + g.sum() * 1e-12

    staged_txt = [(jax.random.normal(jax.random.PRNGKey(10 + i),
                                     (100, seq, D), jnp.bfloat16) * 0.02,
                   jnp.float32(i) * 1e-9) for i in range(N_STAGED)]
    rows.append({"component": "text_100",
                 "ms": round(_loop_ms(text_step, staged_txt), 2)})

    # irreducible per-step dispatch floor under the same pipelined loop
    @jax.jit
    def floor_step(c):
        return c * 1.000001 + 1e-7

    staged_floor = [jnp.float32(i) for i in range(N_STAGED)]
    rows.append({"component": "floor",
                 "ms": round(_loop_ms(floor_step, staged_floor), 2)})

    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    sys.exit(main())
