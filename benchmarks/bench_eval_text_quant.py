"""Eval-time text fan-out throughput: full precision vs quantized text
tower (TRAINER.QUANT_EVAL_TEXT) on the attached TPU chip.

Two workloads, both built through the real registry + config stack at
the reference protocol (ViT-B/16, 100-class synthetic):

  1. CoCoOp ``model_inference`` — every image re-encodes all n_cls
     prompts through the text tower (the reference loops this on host,
     ``/root/reference/trainers/classification/cocoop.py:193-199``);
     the dominant eval cost of the base-to-new protocol.
  2. ProDA ``set_classifier`` — the n_cls x n_prompt sweep
     (``proda.py:316-331``).

Timing follows the repo's tunnel rules (CLAUDE.md): distinct staged
device batches per dispatch (no identical-dispatch elision), scalar
drain at trial end, medians. w8a8 calibration (one text-tower pass) is
excluded from the steady-state timing and reported separately — it
runs once per checkpoint.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  CC_SYNTH_CLASSES=100 CC_SYNTH_TRAIN=20 CC_SYNTH_VAL=2 CC_SYNTH_TEST=8 \
  python benchmarks/bench_eval_text_quant.py [--json]
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import time

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

N_WARM = 3
N_BATCHES = 12
N_TRIALS = 3
N_STAGED = 4

# (label, QUANT_EVAL_TEXT, QUANT_FROZEN_VISION)
MODES = [("bf16", "", ""),
         ("int8_text", "int8", ""),
         ("w8a8_text", "w8a8", ""),
         ("w8a8_text+vision", "w8a8", "w8a8")]


def _build(name, config_file, root, text_mode, vision_mode, extra=()):
    from train import build_parser, setup_cfg
    from clip_calibration_tpu.engine.registry import build_trainer
    import clip_calibration_tpu.trainers  # noqa: F401 register
    import clip_calibration_tpu.data.datasets  # noqa: F401 register

    opts = ["TEST.NO_TEST", "True", "DATASET.NUM_SHOTS", "16",
            "DATALOADER.TEST.BATCH_SIZE", "64"] + list(extra)
    if text_mode:
        opts += ["TRAINER.QUANT_EVAL_TEXT", text_mode]
    if vision_mode:
        opts += ["TRAINER.QUANT_FROZEN_VISION", vision_mode]
    args = build_parser().parse_args(
        ["--root", root, "--trainer", name, "--seed", "1",
         "--dataset-config-file",
         osp.join(REPO, "configs/datasets/synthetic.yaml"),
         "--config-file", osp.join(REPO, config_file),
         "--output-dir", f"/tmp/bench_eval_text/{name}_{text_mode}"]
        + opts)
    return build_trainer(setup_cfg(args))


def bench_cocoop(root, text_mode, vision_mode):
    trainer = _build(
        "CoCoOp", "configs/trainers/CoCoOp/vit_b16_c4_ep10_batch1.yaml",
        root, text_mode, vision_mode)
    staged = []
    for batch in trainer.test_loader:
        staged.append(trainer.put_batch(batch["img"]))
        if len(staged) >= N_STAGED:
            break
    B = int(staged[0].shape[0])

    t0 = time.perf_counter()
    for i in range(N_WARM):  # compile (+ lazy w8a8 calibration)
        out = trainer.model_inference(staged[i % len(staged)])
    float(np.asarray(out[0])[0, 0])
    warm_s = time.perf_counter() - t0

    trials = []
    for _ in range(N_TRIALS):
        t0 = time.perf_counter()
        for i in range(N_BATCHES):
            out = trainer.model_inference(staged[i % len(staged)])
        float(np.asarray(out[0])[0, 0])  # drain
        trials.append((time.perf_counter() - t0) / N_BATCHES)
    ms = sorted(trials)[len(trials) // 2] * 1e3
    return {"workload": "cocoop_eval", "batch": B,
            "ms_per_batch": round(ms, 2),
            "images_per_s": round(B / ms * 1e3, 1),
            "warmup_s": round(warm_s, 1)}


def bench_proda(root, text_mode, vision_mode):
    trainer = _build(
        "ProDA", "configs/trainers/ProDA/vit_b16_c16_ep100_batch4.yaml",
        root, text_mode, vision_mode)
    slot = trainer._models["prompt_learner"]
    base_ctx = np.asarray(slot["params"]["ctx"], np.float32)

    calib_ms = 0.0
    if text_mode == "w8a8":
        t0 = time.perf_counter()
        trainer.eval_text_clip_params()  # one calibration pass
        calib_ms = (time.perf_counter() - t0) * 1e3

    def sweep(i):
        # perturb ctx per dispatch (tunnel elision); keep the
        # calibrated scales (they are per-checkpoint in production)
        import jax.numpy as jnp
        slot["params"] = dict(slot["params"],
                              ctx=jnp.asarray(base_ctx + i * 1e-6))
        trainer.text_features = None
        trainer.set_classifier()
        return float(np.asarray(trainer.text_features)[0, 0])

    sweep(0)  # compile
    trials = []
    for t in range(N_TRIALS * 3):
        t0 = time.perf_counter()
        sweep(t + 1)
        trials.append(time.perf_counter() - t0)
    trials.sort()
    ms = trials[len(trials) // 2] * 1e3
    return {"workload": "proda_set_classifier",
            "ms": round(ms, 2), "calibration_ms": round(calib_ms, 1)}


def main():
    from clip_calibration_tpu.tools.platform import (
        enable_compilation_cache)
    enable_compilation_cache()
    argv = sys.argv[1:]
    as_json = "--json" in argv
    # --cocoop-only: the bench.py contract subset (skips the ProDA
    # one-shot sweep, measured noise-level, and the neutral weight-only
    # mode — docs/ROOFLINE.md "Quantized text fan-out")
    cocoop_only = "--cocoop-only" in argv
    modes = [m for m in MODES if m[0] != "int8_text"] \
        if cocoop_only else MODES
    workloads = (bench_cocoop,) if cocoop_only \
        else (bench_cocoop, bench_proda)
    root = os.environ.get("BENCH_ROOT", "/tmp/bench_eval_text_data")
    for label, tmode, vmode in modes:
        for fn in workloads:
            try:
                row = {"mode": label, **fn(root, tmode, vmode)}
            except Exception as e:  # keep the sweep going
                row = {"mode": label, "workload": fn.__name__,
                       "error": f"{type(e).__name__}: {e}"}
            print(json.dumps(row) if as_json else row, flush=True)


if __name__ == "__main__":
    main()
