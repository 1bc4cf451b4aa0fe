"""Text-tower MFU probe: where do the prompt fan-outs lose 3x?

ProDA's step is text-bound (probe_proda.py: 400-row fan-out forward =
11.85 ms = 34% MFU while the image tower runs at 65%). This probe times
``encode_text_embedded`` forward and fwd+bwd across fan-out widths and
attention backends to locate the loss: Pallas kernel cell overhead at
tiny [L,3D] blocks vs XLA attention vs the dense matmuls' shape bound.

Backward DCE trap: gradients must feed the fetched scalar (multiplied
by the data-dependent ~0 eps), otherwise XLA deletes the whole backward
pass and "fwd+bwd" silently measures forward only — probe_proda.py r3
fell into exactly that.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_text_tower.py
"""

from __future__ import annotations

import functools
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from clip_calibration_tpu.models import clip as M
from clip_calibration_tpu.ops import attention as A

N_ITERS = 20
N_TRIALS = 5
SEQ = 26  # ProDA protocol seq_len (16 ctx + name + SOT/EOT)


def time_scalar(label, make_body, *args):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(args, n):
        def body(carry, _):
            out = make_body(carry, *args)
            nxt = (out.astype(jnp.float32) > 1e30).astype(jnp.float32)
            return carry + nxt * 1e-6, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c

    float(run(args, N_ITERS))
    trials = []
    for _ in range(N_TRIALS):
        t0 = time.perf_counter()
        float(run(args, N_ITERS))
        trials.append((time.perf_counter() - t0) / N_ITERS * 1e3)
    return sorted(trials)[len(trials) // 2]


def text_fwd_flops(cfg, rows, seq):
    D = cfg.transformer_width
    per_tok = (2 * D * 3 * D + 2 * D * D + 2 * 2 * D * 4 * D)
    attn = 2 * 2 * seq * seq * D
    return rows * (seq * per_tok + attn) * cfg.transformer_layers


def main():
    cfg = M.PRESETS["ViT-B/16"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg)
    D = cfg.transformer_width

    for rows in (100, 400, 2000):
        k = jax.random.PRNGKey(rows)
        x = jax.random.normal(k, (rows, SEQ, D), jnp.float32) * 0.02
        x = x.astype(jnp.bfloat16)
        eot = jnp.full((rows,), SEQ - 1, jnp.int32)
        gflop_fwd = text_fwd_flops(cfg, rows, SEQ) / 1e9

        for impl in ("pallas", "xla"):
            A.set_attention_impl(impl)

            remat = rows >= 512  # product threshold (proda.py)

            def fwd(eps, params, x):
                xx = x + eps.astype(x.dtype)
                return M.encode_text_embedded(
                    params, cfg, xx, eot, seq_len=SEQ) \
                    .astype(jnp.float32).sum()

            def fwdbwd(eps, params, x):
                # grads FEED the output via eps so backward survives DCE
                val, g = jax.value_and_grad(
                    lambda xx: M.encode_text_embedded(
                        params, cfg, xx + eps.astype(xx.dtype), eot,
                        remat=remat,
                        seq_len=SEQ).astype(jnp.float32).sum())(x)
                return val + eps * g.astype(jnp.float32).sum()

            ms_f = time_scalar("fwd", fwd, params, x)
            ms_fb = time_scalar("fwdbwd", fwdbwd, params, x)
            print(f"rows={rows:<5} {impl:<7} fwd {ms_f:7.2f} ms "
                  f"({gflop_fwd / ms_f:6.1f} TFLOP/s)  "
                  f"fwd+bwd {ms_fb:7.2f} ms "
                  f"({3 * gflop_fwd / ms_fb:6.1f} TFLOP/s)",
                  flush=True)
        A.set_attention_impl("auto")


if __name__ == "__main__":
    main()
