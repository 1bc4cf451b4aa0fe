"""CLI driver — same argument surface as the reference ``train.py`` so the
``run/`` and ``scripts/`` experiment shells work unchanged.

Flow (reference ``train.py:278-356``): defaults -> dataset yaml -> trainer
yaml -> CLI resets -> calibration JSON -> opts -> freeze; calibrator-combo
log-file naming; TempScaling trainer swap when IF_SCALING; build trainer
from the registry; train or eval-only.
"""

from __future__ import annotations

import argparse
import json
import os

# Honor JAX_PLATFORMS=cpu BEFORE any jax device use: the axon TPU plugin
# ignores the env var alone. Without this, CPU-targeted subprocess runs
# (the e2e test suite) silently grab the TPU tunnel.
from clip_calibration_tpu.tools.platform import (cpu_platform_requested,
                                                 force_cpu_platform)

if cpu_platform_requested():
    force_cpu_platform()

from clip_calibration_tpu.config import get_cfg_default
from clip_calibration_tpu.data.base import set_random_seed
from clip_calibration_tpu.engine.registry import build_trainer
from clip_calibration_tpu.tools.logger import setup_logger

# side-effect registration (reference train.py:14-49)
import clip_calibration_tpu.data.datasets  # noqa: F401
import clip_calibration_tpu.trainers  # noqa: F401
import clip_calibration_tpu.evaluators.vl_evaluator  # noqa: F401


def print_args(args, cfg):
    print("***************")
    print("** Arguments **")
    print("***************")
    for key in sorted(vars(args)):
        print(f"{key}: {getattr(args, key)}")
    print("************")
    print("** Config **")
    print("************")
    print(cfg)


def reset_cfg(cfg, args):
    if args.root:
        cfg.DATASET.ROOT = args.root
    if args.output_dir:
        cfg.OUTPUT_DIR = args.output_dir
    if args.resume:
        cfg.RESUME = args.resume
    if args.seed:
        cfg.SEED = args.seed
    if args.source_domains:
        cfg.DATASET.SOURCE_DOMAINS = args.source_domains
    if args.target_domains:
        cfg.DATASET.TARGET_DOMAINS = args.target_domains
    if args.transforms:
        cfg.INPUT.TRANSFORMS = args.transforms
    if args.trainer:
        cfg.TRAINER.NAME = args.trainer
    if args.backbone:
        cfg.MODEL.BACKBONE.NAME = args.backbone
    if args.head:
        cfg.MODEL.HEAD.NAME = args.head

    # always use the V-L evaluator (reference train.py:98)
    cfg.TEST.EVALUATOR = "VLClassification"

    if args.calibration_config:
        cal = json.loads(args.calibration_config)
        print(cal, "calibration_cfgs")
        if cal.get("BASE_CALIBRATION_MODE"):
            cfg.CALIBRATION.BASE_CALIBRATION_MODE = \
                cal["BASE_CALIBRATION_MODE"]
            if cal.get("SCALING_CONFIG"):
                cfg.merge_from_file(cal["SCALING_CONFIG"])
                fix_cfg_from_calibration(cfg)
                cfg.CALIBRATION.SCALING.IF_SCALING = True
            if cal.get("BIN_CALIBRATOR_NAME"):
                cfg.CALIBRATION.BIN.BIN_CALIBRATOR_NAME = \
                    cal["BIN_CALIBRATOR_NAME"]
        if args.base_dir:
            cfg.CALIBRATION.SCALING.BASE_DIR = args.base_dir
        if args.base_learner:
            cfg.CALIBRATION.SCALING.BASE_LEARNER = args.base_learner
        if cal.get("IF_DAC"):
            cfg.CALIBRATION.DAC.IF_DAC = cal["IF_DAC"]
        if cal.get("IF_PROCAL"):
            cfg.CALIBRATION.PROCAL.IF_PROCAL = cal["IF_PROCAL"]


def fix_cfg_from_calibration(cfg):
    """Swap OPTIM lr/epochs for the scaling phase
    (reference ``fix_cfg_from_calibraion``, train.py:271-274)."""
    cfg.OPTIM.LR = cfg.CALIBRATION.SCALING.LR
    cfg.CALIBRATION.SCALING.BASE_EPOCH = cfg.OPTIM.MAX_EPOCH
    cfg.OPTIM.MAX_EPOCH = cfg.CALIBRATION.SCALING.EPOCH


def setup_cfg(args):
    cfg = get_cfg_default()
    if args.dataset_config_file:
        cfg.merge_from_file(args.dataset_config_file)
    if args.config_file:
        print(args.config_file, "args.config_file")
        cfg.merge_from_file(args.config_file)
    reset_cfg(cfg, args)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    return cfg


def main(args):
    cfg = setup_cfg(args)
    if cfg.TPU.DISTRIBUTED:
        # pod runs: every host executes this same script; after init the
        # mesh spans all hosts and train steps are pod-SPMD
        from clip_calibration_tpu.parallel.mesh import (
            initialize_distributed)
        nproc = initialize_distributed()
        print(f"Distributed: {nproc} processes")
    if cfg.SEED >= 0:
        print(f"Setting fixed seed: {cfg.SEED}")
        set_random_seed(cfg.SEED)

    # attention backend selection (TPU.USE_PALLAS: auto | always | never)
    from clip_calibration_tpu.ops.attention import set_attention_impl
    set_attention_impl({"auto": "auto", "always": "pallas",
                        "never": "xla"}[cfg.TPU.USE_PALLAS])

    from clip_calibration_tpu.tools.platform import (
        enable_compilation_cache)
    enable_compilation_cache()

    # calibrator-combo log file naming (reference train.py:306-325)
    base_name = "log"
    if cfg.CALIBRATION.SCALING.IF_SCALING:
        base_name += "_" + str(cfg.CALIBRATION.SCALING.MODE)
    if cfg.CALIBRATION.BIN.BIN_CALIBRATOR_NAME:
        base_name += "_" + str(cfg.CALIBRATION.BIN.BIN_CALIBRATOR_NAME)
    if cfg.CALIBRATION.DAC.IF_DAC:
        base_name += "_dac"
    if cfg.CALIBRATION.PROCAL.IF_PROCAL:
        base_name += "_procal"
    setup_logger(os.path.join(cfg.OUTPUT_DIR, base_name + ".txt"))

    # system-info dump (reference train.py:344-345 collect_env_info)
    import platform

    import jax as _jax
    print("** System info **")
    print(f"python: {platform.python_version()}  "
          f"jax: {_jax.__version__}  "
          f"backend: {_jax.default_backend()}  "
          f"devices: {[str(d) for d in _jax.devices()]}")

    # trainer swap for temperature scaling (reference train.py:331-339)
    if cfg.CALIBRATION.SCALING.IF_SCALING:
        cfg = cfg.clone()
        cfg.defrost()
        cfg.CALIBRATION.SCALING.BASE_LEARNER = cfg.TRAINER.NAME
        cfg.TRAINER.NAME = cfg.CALIBRATION.SCALING.MODE
        trainer = build_trainer(cfg)
        cfg.TRAINER.NAME = args.trainer or \
            cfg.CALIBRATION.SCALING.BASE_LEARNER
    else:
        trainer = build_trainer(cfg)

    print_args(args, cfg)

    if args.eval_only:
        # the reference hardcodes MAX_EPOCH here (reference train.py:350),
        # ignoring --load-epoch; we honor --load-epoch when given so the
        # evaluated snapshot and any exported checkpoint are the same one
        eval_epoch = (args.load_epoch if args.load_epoch is not None
                      else cfg.OPTIM.MAX_EPOCH)
        trainer.load_model(args.model_dir, epoch=eval_epoch)
        trainer.test()
        if args.export_reference_checkpoints:
            # eval-only: the checkpoints live in --model-dir, not the
            # (fresh) output dir
            import os.path as osp
            src = args.model_dir or cfg.OUTPUT_DIR
            trainer.export_reference_checkpoint(
                src, osp.join(cfg.OUTPUT_DIR, "reference_export"),
                epoch=eval_epoch)
        return

    if not args.no_train:
        trainer.train()

    if args.export_reference_checkpoints:
        # write reference-consumable torch .pth.tar copies of the run's
        # checkpoints (engine/trainer.py::export_reference_checkpoint) —
        # a reference-stack user can load them with Dassl's
        # load_checkpoint + strict=False (reference coop.py:330-343)
        import os.path as osp
        trainer.export_reference_checkpoint(
            cfg.OUTPUT_DIR, osp.join(cfg.OUTPUT_DIR, "reference_export"),
            epoch=args.load_epoch)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", type=str, default="",
                        help="path to dataset")
    parser.add_argument("--output-dir", type=str, default="",
                        help="output directory")
    parser.add_argument("--resume", type=str, default="",
                        help="checkpoint directory to resume from")
    parser.add_argument("--seed", type=int, default=-1,
                        help="positive value enables a fixed seed")
    parser.add_argument("--source-domains", type=str, nargs="+")
    parser.add_argument("--target-domains", type=str, nargs="+")
    parser.add_argument("--transforms", type=str, nargs="+")
    parser.add_argument("--config-file", type=str, default="")
    parser.add_argument("--dataset-config-file", type=str, default="")
    parser.add_argument("--calibration-config-file", type=str, default="")
    parser.add_argument("--trainer", type=str, default="")
    parser.add_argument("--backbone", type=str, default="")
    parser.add_argument("--head", type=str, default="")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--model-dir", type=str, default="")
    parser.add_argument("--base-dir", type=str, default="")
    parser.add_argument("--base-learner", type=str, default="")
    parser.add_argument("--load-epoch", type=int)
    parser.add_argument("--no-train", action="store_true")
    parser.add_argument("--export-reference-checkpoints",
                        action="store_true",
                        help="after training, export this run's "
                             "checkpoints as reference-format torch "
                             ".pth.tar files under "
                             "<output>/reference_export/")
    parser.add_argument("--calibration-config", type=str)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
