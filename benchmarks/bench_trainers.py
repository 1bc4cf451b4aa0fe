"""Per-trainer train-step throughput on the attached TPU chip.

Builds every trainer through the real registry + config stack (the same
path ``train.py`` takes) at its reference protocol budget
(``/root/reference/run/calibration/fewshot_scaling.sh:32-59`` epoch/
batch/n_ctx table, ViT-B/16) on a 100-class synthetic dataset, then
times the jitted train step in a dispatch loop over PRE-PLACED device
batches. Pre-placing isolates the device step rate from this
environment's tunnel transfer serialization (see docs/ROOFLINE.md
"training loop" section); inputs are varied across 4 staged batches so
the tunnel cannot elide repeated identical dispatches.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site \
  CC_SYNTH_CLASSES=100 CC_SYNTH_TRAIN=20 CC_SYNTH_VAL=2 CC_SYNTH_TEST=4 \
  python benchmarks/bench_trainers.py [TrainerName ...]

Prints one line per trainer: ms/step and img/s, median of N_TRIALS.
"""

from __future__ import annotations

import os
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

# reference protocol budgets (trainer -> (config yaml, extra opts))
PROTOCOL = {
    "CoOp": ("configs/trainers/CoOp/vit_b16_c16_ep200_batch32.yaml", []),
    "KgCoOp": ("configs/trainers/KgCoOp/vit_b16_c16_ep200_batch32.yaml",
               []),
    "ProGrad": ("configs/trainers/ProGrad/vit_b16_c16_ep100_batch32.yaml",
                []),
    "CoCoOp": ("configs/trainers/CoCoOp/vit_b16_c4_ep10_batch1.yaml", []),
    "MaPLe": ("configs/trainers/MaPLe/vit_b16_c2_ep5_batch4.yaml", []),
    "ProDA": ("configs/trainers/ProDA/vit_b16_c16_ep100_batch4.yaml", []),
    "PromptSRC": ("configs/trainers/PromptSRC/vit_b16_c4_ep50_batch4.yaml",
                  []),
    "VPT": ("configs/trainers/VPT/vit_b16_c2_ep5_batch4_4.yaml", []),
    "TaskRes": ("configs/trainers/TaskRes/vit_b16_c16_ep200_batch256.yaml",
                []),
    "CLIP_Adapter":
        ("configs/trainers/CLIP_Adapter/vit_b16_c4_ep200_batch32.yaml",
         []),
}

N_WARM = 3
N_STEPS = 30
N_TRIALS = 3
N_STAGED = 4  # distinct device batches cycled to defeat tunnel elision


def bench_one(name: str, root: str, quant: str = ""):
    import jax
    from clip_calibration_tpu.tools.platform import (
        enable_compilation_cache)
    enable_compilation_cache()
    from train import build_parser, setup_cfg
    from clip_calibration_tpu.engine.registry import build_trainer
    import clip_calibration_tpu.trainers  # noqa: F401 register
    import clip_calibration_tpu.data.datasets  # noqa: F401 register

    config_file, extra = PROTOCOL[name]
    args = build_parser().parse_args(
        ["--root", root, "--trainer", name, "--seed", "1",
         "--dataset-config-file",
         osp.join(REPO, "configs/datasets/synthetic.yaml"),
         "--config-file", osp.join(REPO, config_file),
         "--output-dir", f"/tmp/bench_trainers/{name}",
         "TEST.NO_TEST", "True", "DATASET.NUM_SHOTS", "16"] + extra
        + (["TRAINER.QUANT_FROZEN_VISION", quant] if quant else []))
    cfg = setup_cfg(args)
    trainer = build_trainer(cfg)
    trainer.train_loader_x.set_epoch(0)

    # pre-stage N distinct device batches (varied inputs, zero per-step
    # transfers)
    staged = []
    for batch in trainer.train_loader_x:
        d = dict(batch)
        d["img"] = trainer.put_batch(batch["img"])
        d["label"] = trainer.put_batch(batch["label"])
        staged.append(d)
        if len(staged) >= N_STAGED:
            break
    batch_size = int(staged[0]["img"].shape[0])

    for i in range(N_WARM):  # compile + warm
        out = trainer.forward_backward(staged[i % len(staged)])
    float(out["loss"])

    trials = []
    for _ in range(N_TRIALS):
        t0 = time.perf_counter()
        for i in range(N_STEPS):
            out = trainer.forward_backward(staged[i % len(staged)])
        float(out["loss"])  # drain
        trials.append((time.perf_counter() - t0) / N_STEPS)
    ms = sorted(trials)[len(trials) // 2] * 1e3
    return ms, batch_size / ms * 1e3, batch_size


def main():
    import json
    args = sys.argv[1:]
    as_json = "--json" in args
    quant = ""
    if "--quant" in args:  # e.g. --quant w8a8: quantized frozen tower
        i = args.index("--quant")
        if i + 1 >= len(args):
            raise SystemExit("--quant needs a mode (int8 | w8a8)")
        quant = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = [a for a in args if a != "--json"] or list(PROTOCOL)
    if quant:  # vision-prompt trainers refuse the quantized tower
        names = [n for n in names
                 if n not in ("MaPLe", "VPT", "PromptSRC")]
    root = os.environ.get("BENCH_ROOT", "/tmp/bench_trainers_data")
    if not as_json:
        print(f"{'trainer':<14} {'batch':>5} {'ms/step':>9} {'img/s':>8}")
    for name in names:
        try:
            ms, ips, bs = bench_one(name, root, quant)
            if as_json:
                # one flushed line per trainer: a killed-on-budget run
                # still hands its completed trainers to bench.py
                print(json.dumps({"trainer": name,
                                  "ms_per_step": round(ms, 2),
                                  "images_per_s": round(ips, 1),
                                  "batch": bs}), flush=True)
            else:
                print(f"{name:<14} {bs:>5} {ms:>9.1f} {ips:>8.0f}",
                      flush=True)
        except Exception as e:  # keep the sweep going
            if as_json:
                print(json.dumps({
                    "trainer": name,
                    "error": f"{type(e).__name__}: {e}"}), flush=True)
            else:
                print(f"{name:<14} FAILED: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
