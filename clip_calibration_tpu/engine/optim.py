"""Optimizer and LR-schedule builders on optax.

Equivalent of Dassl's ``build_optimizer`` / ``build_lr_scheduler`` as the
reference configs exercise them (sgd + momentum 0.9 + weight decay 5e-4,
cosine annealing stepped per epoch, constant-lr warmup for the first
WARMUP_EPOCH epochs — e.g. ``configs/trainers/CoOp/vit_b16_c16_ep200_batch32.yaml``).

The schedule is a function of the global step; epoch boundaries are baked
in via steps_per_epoch so the whole update is one jit-compiled optax
transform (no host-side ``update_lr`` calls as in Dassl).
"""

from __future__ import annotations

import math
from typing import Callable

import optax


def build_lr_schedule(cfg, steps_per_epoch: int) -> Callable:
    """step -> lr, matching torch-per-epoch stepping semantics."""
    base_lr = cfg.OPTIM.LR
    max_epoch = cfg.OPTIM.MAX_EPOCH
    name = cfg.OPTIM.LR_SCHEDULER
    warmup_epoch = cfg.OPTIM.WARMUP_EPOCH
    warmup_type = cfg.OPTIM.WARMUP_TYPE
    warmup_cons_lr = cfg.OPTIM.WARMUP_CONS_LR
    warmup_min_lr = cfg.OPTIM.WARMUP_MIN_LR
    gamma = cfg.OPTIM.GAMMA
    stepsize = cfg.OPTIM.STEPSIZE

    def main_lr(epoch):
        if name == "cosine":
            return base_lr * 0.5 * (1.0 + math.cos(
                math.pi * epoch / max_epoch))
        if name == "single_step":
            # Dassl single_step takes the LAST list element
            ss = stepsize[-1] if isinstance(stepsize, (tuple, list)) \
                else stepsize
            if ss <= 0:
                return base_lr
            return base_lr * gamma ** (epoch // ss)
        if name == "multi_step":
            passed = sum(1 for s in stepsize if epoch >= s)
            return base_lr * gamma ** passed
        if name == "constant":
            return base_lr
        raise ValueError(f"Unknown LR scheduler: {name}")

    def schedule(step):
        import jax.numpy as jnp
        epoch = step // max(steps_per_epoch, 1)
        # per-epoch table precomputed host-side, gathered on device
        table = [0.0] * (max_epoch + 1)
        for e in range(max_epoch + 1):
            if warmup_epoch > 0 and e < warmup_epoch:
                if warmup_type == "constant":
                    table[e] = warmup_cons_lr
                else:
                    # Dassl LinearWarmupScheduler: min_lr at epoch 0,
                    # then base_lr * e / warmup (no min_lr offset)
                    table[e] = (warmup_min_lr if e == 0
                                else base_lr * e / warmup_epoch)
            else:
                # Dassl's warmup wrapper steps the inner scheduler
                # lazily: the first post-warmup epoch uses index 1, so
                # the decay curve is shifted by warmup_epoch - 1
                # (identity for the shipped WARMUP_EPOCH=1 configs)
                shift = warmup_epoch - 1 if warmup_epoch > 0 else 0
                table[e] = main_lr(e - shift)
        table_arr = jnp.asarray(table)
        return table_arr[jnp.clip(epoch, 0, max_epoch)]

    return schedule


def build_optimizer(cfg, steps_per_epoch: int,
                    schedule: Callable | None = None):
    """Returns (optax.GradientTransformation, schedule)."""
    if schedule is None:
        schedule = build_lr_schedule(cfg, steps_per_epoch)
    name = cfg.OPTIM.NAME
    wd = cfg.OPTIM.WEIGHT_DECAY

    if name == "sgd":
        chain = []
        if wd:
            # torch SGD semantics: grad += wd * param before momentum
            chain.append(optax.add_decayed_weights(wd))
        if cfg.OPTIM.MOMENTUM:
            chain.append(optax.trace(decay=cfg.OPTIM.MOMENTUM,
                                     nesterov=cfg.OPTIM.SGD_NESTEROV))
        chain.append(optax.scale_by_learning_rate(schedule))
        return optax.chain(*chain), schedule
    if name == "adam":
        return optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_adam(b1=cfg.OPTIM.ADAM_BETA1,
                                b2=cfg.OPTIM.ADAM_BETA2),
            optax.scale_by_learning_rate(schedule)), schedule
    if name == "adamw":
        return optax.chain(
            optax.scale_by_adam(b1=cfg.OPTIM.ADAM_BETA1,
                                b2=cfg.OPTIM.ADAM_BETA2),
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.scale_by_learning_rate(schedule)), schedule
    raise ValueError(f"Unknown optimizer: {name}")
