"""Benchmark: ViT-B/16 image-encode throughput on one TPU chip.

The north-star metric from BASELINE.json: images/sec/chip for the CLIP
ViT-B/16 image encoder (bf16, on-device uint8 normalization fused into the
encode), the dominant FLOPs of every training/eval loop in the reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Contract (stable across rounds, see BASELINE.md):
- ``value``        median images/sec/chip over >=5 timed trials
- ``vs_baseline``  model FLOPs utilization (achieved / 197 TFLOP/s nominal
                   v5e bf16 roofline). The reference publishes no
                   throughput numbers, so MFU is the hardware-normalized
                   stand-in comparable across rounds. Round 1: 0.33.
- ``spread``       [min, max] images/sec across trials (the tunneled dev
                   chip shows +-30% run-to-run variance; only deltas
                   beyond the spread are real).
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

from clip_calibration_tpu.models import clip as M
from clip_calibration_tpu.ops.preprocess import normalize_images

PEAK_BF16_FLOPS = 197e12  # TPU v5e nominal peak bf16
N_TRIALS = 7
N_ITERS = 20


def vit_encode_flops(cfg: M.CLIPConfig) -> float:
    """Analytic FLOPs (2x MACs) per image for the ViT encode."""
    L = cfg.vision_seq_len
    D = cfg.vision_width
    patch = cfg.vision_patch_size
    per_layer = (2 * L * D * 3 * D        # qkv
                 + 2 * 2 * L * L * D      # scores + values
                 + 2 * L * D * D          # out proj
                 + 2 * 2 * L * D * 4 * D)  # mlp
    stem = 2 * (L - 1) * (patch * patch * 3) * D
    head = 2 * D * cfg.embed_dim
    return float(cfg.vision_layers * per_layer + stem + head)


def main(trainers=None, quant_eval_text=None):
    from clip_calibration_tpu.tools.platform import (
        enable_compilation_cache)
    enable_compilation_cache()  # compiles dominate bench wall time
    dev = jax.devices()[0]
    cfg = M.PRESETS["ViT-B/16"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg)

    def encode(params, images, qmode="dequant"):
        x = normalize_images(images)
        return M.normalize(M.encode_image(params, cfg, x, qmode=qmode))

    # Chain N encodes inside one jit with a data dependence between
    # iterations and fetch a single scalar at the end — the remote-device
    # tunnel elides repeated identical dispatches and returns from
    # block_until_ready early, so naive dispatch loops mis-measure.
    @functools.partial(jax.jit, static_argnames=("n", "qmode"))
    def chained(params, images, n, qmode="dequant"):
        def body(carry, _):
            f = encode(params, images ^ carry, qmode)  # depends on prior
            nxt = (f[0, 0].astype(jnp.float32) > 1e9).astype(jnp.uint8)
            return carry + nxt, None
        c, _ = jax.lax.scan(body, jnp.uint8(0), None, length=n)
        return c

    res = cfg.image_resolution
    best = None
    for batch in (128, 256):
        images = (jax.random.uniform(
            jax.random.PRNGKey(1), (batch, res, res, 3)) * 255
        ).astype(jnp.uint8)
        images = jax.device_put(images, dev)
        # warm up the SAME n=N_ITERS program that gets timed (n is a
        # static argname, so a different n is a different executable and
        # trial 1 would otherwise pay the 20-40s compile — inflating the
        # published spread minimum)
        int(chained(params, images, N_ITERS))
        trials = []
        for _ in range(N_TRIALS):
            t0 = time.perf_counter()
            int(chained(params, images, N_ITERS))
            trials.append(batch * N_ITERS / (time.perf_counter() - t0))
        trials.sort()
        med = trials[len(trials) // 2]
        if best is None or med > best[1]:
            best = (batch, med, trials[0], trials[-1])

    batch, ips, ips_min, ips_max = best
    achieved_tflops = ips * vit_encode_flops(cfg) / 1e12
    mfu = achieved_tflops * 1e12 / PEAK_BF16_FLOPS

    # secondary: quantized serving (weight-only int8 at the bandwidth-
    # bound small batch, w8a8 at the compute-bound large batch) — reuses
    # this function's params/chained-timing machinery
    quant = _quant_serving(params, cfg, chained)
    # secondary: the HTTP serving layer's device-bound path under
    # concurrency (DynamicBatcher coalescing win at ViT-B/16)
    serving = _serving_concurrency()
    # secondary: full CoOp-style train step (fwd+bwd through both towers
    # + optax update) at the reference's CoOp batch size, plus the same
    # step with the frozen image tower static-w8a8 quantized
    # (TRAINER.QUANT_FROZEN_VISION — failure-isolated)
    train_ips = _train_step_throughput()
    try:
        train_q_ips = round(_train_step_throughput(qmode="w8a8"), 1)
    except Exception as e:  # noqa: BLE001 — contract line must print
        import sys
        print(f"w8a8 train step bench failed: {e!r}",
              file=sys.stderr, flush=True)
        train_q_ips = None
    # secondary: the calibrated eval pipeline — the paper's actual
    # workload ("calibration without sacrificing the inference speed",
    # reference README.md:7) — plus the same pipeline over the
    # production static-w8a8 quantized backbone (failure-isolated)
    eval_ips = _eval_pipeline_throughput()
    try:
        eval_q_ips = round(_eval_pipeline_throughput(qmode="w8a8"), 1)
    except Exception as e:  # noqa: BLE001 — contract line must print
        import sys
        print(f"w8a8 eval pipeline bench failed: {e!r}",
              file=sys.stderr, flush=True)
        eval_q_ips = None
    if trainers is None:
        trainers = {"skipped": True}

    print(json.dumps({
        "metric": "vit_b16_image_encode_throughput",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(mfu, 4),
        "mfu": round(mfu, 4),
        "spread": [round(ips_min, 1), round(ips_max, 1)],
        "trials": N_TRIALS,
        "batch": batch,
        "device": str(dev),
        "achieved_tflops": round(achieved_tflops, 1),
        "coop_train_step_images_per_s": round(train_ips, 1),
        "coop_train_step_w8a8_images_per_s": train_q_ips,
        "eval_pipeline_images_per_s": round(eval_ips, 1),
        "eval_pipeline_w8a8_images_per_s": eval_q_ips,
        "quant_serving": quant,
        "quant_eval_text": quant_eval_text or {"skipped": True},
        "serving_concurrency": serving,
        "trainer_steps": trainers,
        "notes": "vs_baseline = MFU = achieved / 197 TFLOP/s nominal v5e "
                 "bf16 roofline (reference publishes no throughput "
                 "numbers; see BASELINE.md and docs/ROOFLINE.md). "
                 "trainer_steps: ms/step at the reference fewshot-sweep "
                 "budgets (fewshot_scaling.sh:32-59), ViT-B/16, 100-class "
                 "synthetic few-shot set.",
    }))


def _quant_serving(params, cfg, chained, n_iters=N_ITERS) -> dict:
    """int8 serving rates vs the bf16 path, same backbone and timing
    methodology as the headline (``benchmarks/bench_quant.py`` has the
    full crossover sweep + per-checkpoint agreement report; this is the
    round-over-round contract subset): weight-only int8 at batch 8
    (weight-bandwidth-bound regime — the dequant-fused read halves HBM
    weight bytes) and w8a8 at batch 256 (compute-bound regime — the
    MXU's double-rate int8 path). Failure-isolated: a quant-path error
    degrades to an ``error`` entry, never the headline metrics.
    Skippable with BENCH_SKIP_QUANT=1."""
    import os
    import sys
    if os.environ.get("BENCH_SKIP_QUANT"):
        return {"skipped": True}
    try:
        from clip_calibration_tpu.ops.preprocess import normalize_images
        from clip_calibration_tpu.ops.quant import (
            attach_act_scales, calibrate_image_act_scales,
            quantize_clip_params)
        qparams = quantize_clip_params(params)
        res = cfg.image_resolution
        cal = (jax.random.uniform(
            jax.random.PRNGKey(7), (32, res, res, 3)) * 255
        ).astype(jnp.uint8)
        sparams = attach_act_scales(
            qparams,
            calibrate_image_act_scales(qparams, cfg,
                                       normalize_images(cal)))
        out = {}
        # batch 8: weight-bandwidth regime, weight-only int8;
        # batch 256: compute-bound regime, w8a8 with STATIC calibrated
        # activation scales (the production configuration — dynamic
        # per-row quantize measured 0.92x in round 4, the static
        # variant is what rides the MXU double-rate path for a net
        # win; docs/ROOFLINE.md "w8a8 decomposition"). The dynamic
        # rate is recorded alongside for the regression story.
        for batch, mode in ((8, "int8"), (256, "w8a8_static")):
            images = (jax.random.uniform(
                jax.random.PRNGKey(5), (batch, res, res, 3)) * 255
            ).astype(jnp.uint8)

            def rate(p, qmode):
                int(chained(p, images, n_iters, qmode))  # compile+warm
                trials = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    int(chained(p, images, n_iters, qmode))
                    trials.append(
                        batch * n_iters / (time.perf_counter() - t0))
                return sorted(trials)[1]

            bf16 = rate(params, "dequant")
            if mode == "int8":
                q = rate(qparams, "dequant")
                entry = {
                    "bf16_images_per_s": round(bf16, 1),
                    "int8_images_per_s": round(q, 1),
                    "speedup": round(q / bf16, 3),
                }
            else:
                q = rate(sparams, "w8a8")
                dyn = rate(qparams, "w8a8")
                entry = {
                    "bf16_images_per_s": round(bf16, 1),
                    "w8a8_static_images_per_s": round(q, 1),
                    "w8a8_dynamic_images_per_s": round(dyn, 1),
                    "speedup": round(q / bf16, 3),
                    "dynamic_speedup": round(dyn / bf16, 3),
                }
            out[f"batch{batch}_{mode}"] = entry
        return out
    except Exception as e:  # noqa: BLE001 — contract line must print
        print(f"quant serving bench failed: {e!r}", file=sys.stderr,
              flush=True)
        return {"error": repr(e)}


def _serving_concurrency() -> dict:
    """The HTTP layer's device-bound serving path at ViT-B/16: N client
    threads submitting single images through ``DynamicBatcher`` into
    ``Predictor.predict`` (the direct measurement —
    ``benchmarks/bench_http.py``; the end-to-end HTTP rows are
    host-bound on this 1-vCPU box and live there, labeled as such).
    Reports req/s, mean coalesced batch and p50/p95 latency for the
    8 ms coalescing budget vs the 0 ms (unbatched) baseline.
    Failure-isolated; skippable with BENCH_SKIP_SERVING=1."""
    import os
    import sys
    if os.environ.get("BENCH_SKIP_SERVING"):
        return {"skipped": True}
    try:
        import os.path as osp
        sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)),
                                    "benchmarks"))
        from bench_http import PROBE_CLASSES, _run_direct

        from clip_calibration_tpu.serving import Predictor

        n_clients, per_client = 32, 8
        pred = Predictor("ViT-B/16", PROBE_CLASSES, batch_size=64)
        # pre-warm EVERY power-of-two bucket exactly as bench_http.main
        # does: the batcher's straggler drain pads to 32/16/8/4/2/1-row
        # buckets and a cold compile inside the timed loop lands in p95
        # (measured: p95 5.5 s vs 452 ms warmed) — a benchmark must not
        # time any compile
        import numpy as onp
        res = pred.cfg.image_resolution
        b = 1
        while b <= 64:
            pred.predict(onp.zeros((b, res, res, 3), onp.uint8))
            b *= 2
        out = {"n_clients": n_clients,
               "requests_per_client": per_client, "batch_cap": 64}
        for max_wait_ms, label in ((8.0, "batched"), (0.0, "unbatched")):
            rate, mean_batch, p50, p95 = _run_direct(
                pred, pred.cfg.image_resolution, n_clients, per_client,
                max_wait_ms)
            out[label] = {"requests_per_s": round(rate, 1),
                          "mean_batch": mean_batch,
                          "p50_ms": p50, "p95_ms": p95}
        out["coalescing_speedup"] = round(
            out["batched"]["requests_per_s"]
            / out["unbatched"]["requests_per_s"], 2)
        return out
    except Exception as e:  # noqa: BLE001 — contract line must print
        print(f"serving concurrency bench failed: {e!r}",
              file=sys.stderr, flush=True)
        return {"error": repr(e)}


def _per_trainer_steps() -> dict:
    """ms/step + img/s for the 7 fewshot-sweep trainers at the
    reference's protocol budgets (``run/calibration/fewshot_scaling.sh:
    32-59``), through the real registry/config/train-step path
    (``benchmarks/bench_trainers.py --json``).

    Runs in ONE SUBPROCESS with a hard wall-clock budget, BEFORE this
    process initializes the TPU backend: a tunnel stall mid-sweep then
    costs only the sweep (partial per-trainer lines are kept from the
    killed child), never the headline metrics — and the tunnel's
    one-client constraint is respected because ownership is strictly
    sequential (child exits/killed before the parent's first device
    query). Skippable with BENCH_SKIP_TRAINERS=1."""
    import os
    import os.path as osp
    import subprocess
    import sys
    if os.environ.get("BENCH_SKIP_TRAINERS"):
        return {"skipped": True}
    env = dict(os.environ)
    env.setdefault("CC_SYNTH_CLASSES", "100")
    env.setdefault("CC_SYNTH_TRAIN", "20")
    env.setdefault("CC_SYNTH_VAL", "2")
    env.setdefault("CC_SYNTH_TEST", "4")
    budget_s = float(os.environ.get("BENCH_TRAINER_BUDGET_S", "1500"))
    script = osp.join(osp.dirname(osp.abspath(__file__)), "benchmarks",
                      "bench_trainers.py")
    sweep = ["CoOp", "CoCoOp", "KgCoOp", "MaPLe", "ProDA", "ProGrad",
             "PromptSRC"]
    try:
        r = subprocess.run(
            [sys.executable, script, "--json"] + sweep, env=env,
            timeout=budget_s, capture_output=True, text=True)
        stdout, timed_out = r.stdout or "", False
    except subprocess.TimeoutExpired as e:
        stdout = (e.stdout.decode() if isinstance(e.stdout, bytes)
                  else e.stdout) or ""
        timed_out = True
    out = {}
    for line in stdout.splitlines():
        try:
            row = json.loads(line)
        except ValueError:
            continue
        name = row.pop("trainer", None)
        if name:
            out[name] = row
    for name in sweep:
        out.setdefault(name, {"skipped": "trainer-sweep budget "
                              "exhausted" if timed_out else "no result"})
    return out


def _quant_eval_text() -> dict:
    """CoCoOp eval throughput with the quantized text fan-out
    (TRAINER.QUANT_EVAL_TEXT; docs/PERFORMANCE.md "Quantized eval-time
    text fan-out") — bf16 vs static-w8a8 text vs fully-quantized
    (text + vision) eval, via ``bench_eval_text_quant.py --cocoop-only``
    in ONE SUBPROCESS before this process initializes the TPU backend
    (same ownership/budget rationale as ``_per_trainer_steps``).
    Skippable with BENCH_SKIP_EVAL_TEXT=1."""
    import os
    import os.path as osp
    import subprocess
    import sys
    if os.environ.get("BENCH_SKIP_EVAL_TEXT"):
        return {"skipped": True}
    env = dict(os.environ)
    env.setdefault("CC_SYNTH_CLASSES", "100")
    env.setdefault("CC_SYNTH_TRAIN", "20")
    env.setdefault("CC_SYNTH_VAL", "2")
    env.setdefault("CC_SYNTH_TEST", "8")
    budget_s = float(os.environ.get("BENCH_EVAL_TEXT_BUDGET_S", "1500"))
    script = osp.join(osp.dirname(osp.abspath(__file__)), "benchmarks",
                      "bench_eval_text_quant.py")
    try:
        r = subprocess.run(
            [sys.executable, script, "--json", "--cocoop-only"], env=env,
            timeout=budget_s, capture_output=True, text=True)
        stdout, timed_out = r.stdout or "", False
    except subprocess.TimeoutExpired as e:
        stdout = (e.stdout.decode() if isinstance(e.stdout, bytes)
                  else e.stdout) or ""
        timed_out = True
    key_by_mode = {"bf16": "bf16", "w8a8_text": "w8a8_text",
                   "w8a8_text+vision": "w8a8_text_vision"}
    out = {}
    for line in stdout.splitlines():
        try:
            row = json.loads(line)
        except ValueError:
            continue
        key = key_by_mode.get(row.get("mode"))
        if key and "images_per_s" in row:
            out[key] = {"images_per_s": row["images_per_s"],
                        "ms_per_batch": row["ms_per_batch"],
                        "batch": row["batch"]}
    if "bf16" in out and "w8a8_text" in out:
        out["speedup"] = round(out["w8a8_text"]["images_per_s"]
                               / out["bf16"]["images_per_s"], 3)
    for key in key_by_mode.values():
        out.setdefault(key, {"skipped": "eval-text budget exhausted"
                             if timed_out else "no result"})
    return out


def _train_step_throughput(batch: int = 32, n_cls: int = 100,
                           n_iters: int = 20,
                           qmode: str = "dequant") -> float:
    """CoOp train-step throughput: grad w.r.t. prompt ctx through both
    towers + sgd update, reference batch size. Steps are chained inside
    one jit (state threaded through lax.scan, inputs varied per step) so
    the tunnel's per-dispatch round-trip latency doesn't dominate —
    this measures the device's step rate, matching how a real training
    loop with queued-ahead dispatch behaves.

    ``qmode="w8a8"`` runs the FROZEN image tower static-calibrated int8
    (the TRAINER.QUANT_FROZEN_VISION=w8a8 training mode — the tower is
    off the gradient path in CoOp, so only its forward quantizes)."""
    import optax
    import __graft_entry__ as g

    ccfg, params, ctx, embedding, eot_pos, images, labels = g._setup(
        "ViT-B/16", n_cls=n_cls, batch=batch, n_ctx=16)
    if qmode == "w8a8":
        from clip_calibration_tpu.ops.quant import (
            attach_act_scales, calibrate_image_act_scales,
            quantize_clip_params)
        qp = quantize_clip_params(params)
        params = attach_act_scales(
            qp, calibrate_image_act_scales(
                qp, ccfg, normalize_images(images)))
    opt = optax.sgd(2e-3, momentum=0.9)
    opt_state = opt.init(ctx)

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames=("n",))
    def run(ctx, opt_state, frozen, embedding, eot_pos, images, labels,
            n):
        def body(carry, i):
            ctx, opt_state = carry
            loss, grads = jax.value_and_grad(g._loss_fn)(
                ctx, frozen, embedding, eot_pos,
                images ^ i.astype(jnp.uint8), labels, ccfg, 16,
                qmode)
            updates, opt_state = opt.update(grads, opt_state, ctx)
            return (optax.apply_updates(ctx, updates), opt_state), loss
        (ctx, opt_state), losses = jax.lax.scan(
            body, (ctx, opt_state), jnp.arange(n))
        return ctx, opt_state, losses[-1]

    # warm up the SAME n_iters program that gets timed (n is static)
    ctx, opt_state, loss = run(ctx, opt_state, params, embedding,
                               eot_pos, images, labels, n_iters)
    float(loss)  # compile + warmup
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        ctx, opt_state, loss = run(ctx, opt_state, params, embedding,
                                   eot_pos, images, labels, n_iters)
        float(loss)
        trials.append(batch * n_iters / (time.perf_counter() - t0))
    return sorted(trials)[1]


def _eval_pipeline_throughput(batch: int = 256, n_cls: int = 100,
                              n_iters: int = 20,
                              qmode: str = "dequant") -> float:
    """Calibrated-eval throughput: per batch, everything ``test()``
    computes on device (reference ``base_learner.py:59-152`` workload) —
    uint8 normalize + ViT-B/16 encode + fused DAC scoring
    (``ops/scoring.fused_dac_scores``: cosine logits, argmax-class
    confidence row scaling, softmax) + the running correct/confidence
    accumulation the evaluator consumes. Batches chained inside one jit
    with varied inputs (tunnel methodology, see ``chained``); the hosts
    loop's padded batches + pipelined fetch ride on top and are covered
    by tests (base_learner pipelined eval, loader benchmark).

    ``qmode="w8a8"`` runs the same pipeline over static-calibrated int8
    weights (the production quantized serving mode, ``ops/quant``) —
    the reference's headline is "calibration without sacrificing the
    inference speed" (README.md:7); this measures calibration at
    FASTER-than-bf16 inference speed."""
    cfg = M.PRESETS["ViT-B/16"]
    params = M.init_clip(jax.random.PRNGKey(0), cfg)
    if qmode == "w8a8":
        from clip_calibration_tpu.ops.quant import (
            attach_act_scales, calibrate_image_act_scales,
            quantize_clip_params)
        qp = quantize_clip_params(params)
        res_ = cfg.image_resolution
        cal = (jax.random.uniform(
            jax.random.PRNGKey(7), (32, res_, res_, 3)) * 255
        ).astype(jnp.uint8)
        params = attach_act_scales(
            qp, calibrate_image_act_scales(qp, cfg,
                                           normalize_images(cal)))
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(2), 4)
    txt = M.normalize(jax.random.normal(
        k1, (n_cls, cfg.embed_dim), jnp.float32)).astype(jnp.bfloat16)
    conf = jax.random.uniform(k2, (n_cls,), jnp.float32, 0.5, 1.5)
    res = cfg.image_resolution
    images = (jax.random.uniform(k3, (batch, res, res, 3)) * 255
              ).astype(jnp.uint8)
    labels = jax.random.randint(k4, (batch,), 0, n_cls)

    from clip_calibration_tpu.ops.scoring import fused_dac_scores

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(params, txt, conf, images, labels, n):
        def body(carry, i):
            correct, confsum = carry
            x = normalize_images(images ^ i.astype(jnp.uint8))
            img_f = M.normalize(M.encode_image(params, cfg, x,
                                               qmode=qmode))
            probs, _ = fused_dac_scores(img_f, txt,
                                        params["logit_scale"], conf,
                                        normalized=True)
            pred = jnp.argmax(probs, axis=1)
            correct += jnp.sum(pred == labels)
            confsum += jnp.sum(jnp.max(probs, axis=1))
            return (correct, confsum), None
        (c, s), _ = jax.lax.scan(body, (jnp.int32(0), jnp.float32(0)),
                                 jnp.arange(n))
        return c, s

    c, s = run(params, txt, conf, images, labels, n_iters)
    float(s)  # compile + warmup
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        c, s = run(params, txt, conf, images, labels, n_iters)
        float(s)
        trials.append(batch * n_iters / (time.perf_counter() - t0))
    return sorted(trials)[1]


def _wait_for_device(attempts: int = 4, probe_timeout: int = 240,
                     retry_sleep: int = 90) -> bool:
    """Bounded wait for the (remote-attached) TPU backend.

    ``jax.devices()`` HANGS in-process while the tunnel is down, and the
    first backend query poisons later retries (xla_bridge caches the
    init), so the probe runs in a SUBPROCESS with a timeout; the parent
    only initializes its own backend after a probe succeeds. Returns
    False after ~(attempts x (timeout + sleep)) without a device, so an
    outage yields a diagnosable JSON line instead of a silent hang."""
    import os
    import subprocess
    import sys
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, env=dict(os.environ),
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        # diagnostics on STDERR — stdout is reserved for the one
        # contract JSON line
        print(f"TPU backend unavailable (probe {i + 1}/{attempts})",
              file=sys.stderr, flush=True)
        if i + 1 < attempts:
            print(f"retrying in {retry_sleep}s", file=sys.stderr,
                  flush=True)
            time.sleep(retry_sleep)
    return False


if __name__ == "__main__":
    if _wait_for_device():
        # trainer sweep + eval-text sweep first (own subprocesses, own
        # TPU ownership windows, hard budgets) so a mid-sweep tunnel
        # stall cannot take the headline metrics down with it
        main(trainers=_per_trainer_steps(),
             quant_eval_text=_quant_eval_text())
    else:
        print(json.dumps({
            "metric": "vit_b16_image_encode_throughput",
            "value": None,
            "unit": "images/sec/chip",
            "vs_baseline": None,
            "error": "TPU backend unavailable (device init timed out "
                     "after bounded retries; tunnel down?)",
        }))
        raise SystemExit(1)
