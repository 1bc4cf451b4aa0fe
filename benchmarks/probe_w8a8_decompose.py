"""Where does the w8a8 end-to-end gap go? Per-weight-group decomposition.

The fixed ``probe_int8_mxu.py`` (round 4) measures XLA's int8 dot at
1.7-2.2x bf16 at the EXACT batch-256 ViT-B/16 serving GEMM shapes —
yet round 4's ``bench.py quant_serving`` measured the full dynamic
w8a8 tower at 0.924x bf16. The difference is per-matmul overhead: the
DYNAMIC activation quantize is an abs-max reduce + scale/round pass
over the activations before every GEMM — a read-reduce-rewrite that
XLA cannot fuse into the producer (the reduce must finish before the
rewrite starts). At batch 256 those passes move ~as many HBM bytes as
the double-rate MXU path saves. STATIC calibrated scales
(``ops/quant.attach_act_scales``) delete the reduce; the quantize
becomes elementwise and fuses into the producing LN/GELU, which is
the difference this probe exists to measure.

Variants, per batch size (int8 applied to nested weight-group subsets,
bf16 everywhere else):

  bf16               plain tower (baseline)
  w8a8_<g>           dynamic per-row activation scales
  w8a8_<g>_static    calibrated static per-(layer,)tensor scales
  int8_dequant_full  weight-only (weights cross HBM int8, MXU runs bf16)

with <g> in {mlp (2/3 of GEMM FLOPs), mlp_qkv (11/12), full}.

Methodology (the three tunnel rules from probe_int8_mxu._rate_tops):
the scan varies its input per iteration from a per-TRIAL seed argument
(no two dispatches are byte-identical), the fetched scalar folds a
full-output sum (no slice strength-reduction), and the reported rate
comes from the DIFFERENCE between a short and a long chain (the ~30 ms
per-dispatch tunnel RTT cancels).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_w8a8_decompose.py [batch ...]

Defaults to batches 256 (compute-bound regime) and 8 (weight-bandwidth-
bound regime — weight-only decomposition). One JSON line per variant;
speedup is vs that batch's bf16 row.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

from clip_calibration_tpu.models import clip as M
from clip_calibration_tpu.ops.preprocess import normalize_images
from clip_calibration_tpu.ops.quant import (attach_act_scales,
                                            calibrate_image_act_scales,
                                            quantize_clip_params,
                                            quantize_int8)

N_TRIALS = 5

MLP = (("mlp", "w_fc"), ("mlp", "w_proj"))
QKV = (("attn", "wqkv"),)
REST = (("attn", "wo"), ("stem", "patch_kernel"), ("stem", "proj"))


def _quantize_groups(params, groups, stats=None):
    """Copy of ``params`` with only ``groups`` quantized (subset of
    ops/quant.quantize_clip_params, which always takes all of them);
    ``stats`` (a calibrate_image_act_scales capture) additionally
    attaches static act scales to exactly the quantized groups."""
    def act_scale(outer, key):
        amax = (stats[key] if outer == "stem"
                else stats["blocks"][outer][key])
        amax = jnp.asarray(amax, jnp.float32)
        return jnp.where(amax > 0, amax / 127.0, 1.0)

    v = dict(params["visual"])
    blocks = {k: dict(bv) for k, bv in v["blocks"].items()}
    for outer, key in groups:
        tree = v if outer == "stem" else blocks[outer]
        tree[key] = quantize_int8(tree[key])
        if stats is not None:
            tree[key] = dict(tree[key], act_scale=act_scale(outer, key))
    v["blocks"] = blocks
    out = dict(params)
    out["visual"] = v
    return out


def _rate(chained, p, images, qmode, batch):
    """Median img/s from the (long - short) chain-length delta."""
    n_short, n_long = (5, 20) if batch >= 64 else (40, 160)

    def run(t, n):
        return float(chained(p, images, t, n, qmode))

    t0v = jnp.uint8(1)
    run(t0v, n_short)  # compile both chain lengths before timing
    run(t0v, n_long)
    trials = []
    for i in range(N_TRIALS):
        t = jnp.uint8(2 + i)  # new traced operand seed per trial
        t0 = time.perf_counter()
        run(t, n_short)
        t1 = time.perf_counter()
        run(t, n_long)
        t2 = time.perf_counter()
        delta = (t2 - t1) - (t1 - t0)
        if delta > 0:
            trials.append(batch * (n_long - n_short) / delta)
    if not trials:
        raise RuntimeError("all trials RTT-noise-dominated")
    trials.sort()
    return trials[len(trials) // 2]


def main(argv):
    from clip_calibration_tpu.tools.platform import (
        enable_compilation_cache)
    enable_compilation_cache()
    cfg = M.PRESETS["ViT-B/16"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg)

    @functools.partial(jax.jit, static_argnames=("n", "qmode"))
    def chained(params, images, t, n, qmode):
        def body(carry, _):
            x = normalize_images(images ^ carry)
            f = M.normalize(M.encode_image(params, cfg, x, qmode=qmode))
            s = jnp.sum(f.astype(jnp.float32))
            nxt = (s > 1e9).astype(jnp.uint8)
            return carry + nxt + jnp.uint8(1), s
        _, ss = jax.lax.scan(body, t, None, length=n)
        return ss[-1]

    res = cfg.image_resolution
    batches = [int(a) for a in argv[1:]] or [256, 8]
    # one calibration capture (full-quantized weights, weight-only
    # mode, the probe's own input batch) shared by the static variants
    cal_images = (jax.random.uniform(
        jax.random.PRNGKey(7), (32, res, res, 3)) * 255
    ).astype(jnp.uint8)
    stats = jax.tree.map(
        lambda a: jnp.asarray(a),
        calibrate_image_act_scales(quantize_clip_params(params), cfg,
                                   normalize_images(cal_images)))

    for batch in batches:
        images = (jax.random.uniform(
            jax.random.PRNGKey(5), (batch, res, res, 3)) * 255
        ).astype(jnp.uint8)
        variants = [("bf16", params, "dequant")]
        if batch >= 64:
            for name, groups in (("mlp", MLP), ("mlp_qkv", MLP + QKV),
                                 ("full", MLP + QKV + REST)):
                variants.append((f"w8a8_{name}",
                                 _quantize_groups(params, groups),
                                 "w8a8"))
                variants.append((f"w8a8_{name}_static",
                                 _quantize_groups(params, groups,
                                                  stats), "w8a8"))
            variants.append(("int8_dequant_full",
                             _quantize_groups(params, MLP + QKV + REST),
                             "dequant"))
        else:
            # weight-bandwidth regime: weight-only decomposition
            for name, groups in (("mlp", MLP), ("mlp_qkv", MLP + QKV),
                                 ("full", MLP + QKV + REST)):
                variants.append((f"int8_dequant_{name}",
                                 _quantize_groups(params, groups),
                                 "dequant"))
            variants.append(("w8a8_full_static",
                             _quantize_groups(params, MLP + QKV + REST,
                                              stats), "w8a8"))

        base = None
        for name, p, qmode in variants:
            ips = _rate(chained, p, images, qmode, batch)
            if base is None:
                base = ips
            print(json.dumps({
                "batch": batch, "variant": name,
                "images_per_s": round(ips, 1),
                "speedup_vs_bf16": round(ips / base, 3)}), flush=True)


if __name__ == "__main__":
    sys.exit(main(sys.argv))
