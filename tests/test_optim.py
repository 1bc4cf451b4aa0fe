import numpy as np
import pytest

from clip_calibration_tpu.config import get_cfg_default
from clip_calibration_tpu.engine.optim import (build_lr_schedule,
                                               build_optimizer)


def _torch_reference_lrs(base_lr, max_epoch, warmup_epoch, cons_lr):
    """Expected per-epoch LRs: torch CosineAnnealingLR(T_max=max_epoch)
    with Dassl's constant warmup replacing the first epochs."""
    import torch
    m = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(m.parameters(), lr=base_lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, max_epoch)
    lrs = []
    for epoch in range(max_epoch):
        lr = cons_lr if epoch < warmup_epoch else sched.get_last_lr()[0]
        lrs.append(lr)
        sched.step()
    return lrs


def test_cosine_warmup_matches_torch():
    cfg = get_cfg_default()
    cfg.OPTIM.LR = 0.002
    cfg.OPTIM.MAX_EPOCH = 20
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = 1e-5
    steps_per_epoch = 7
    sched = build_lr_schedule(cfg, steps_per_epoch)

    want = _torch_reference_lrs(0.002, 20, 1, 1e-5)
    for epoch in range(20):
        step = epoch * steps_per_epoch  # lr constant within the epoch
        got = float(sched(step))
        assert got == pytest.approx(want[epoch], rel=1e-6), epoch
        got_end = float(sched(step + steps_per_epoch - 1))
        assert got_end == pytest.approx(want[epoch], rel=1e-6)


def test_sgd_momentum_weight_decay_matches_torch():
    """One optimizer trajectory vs torch SGD(momentum, weight_decay)."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    cfg = get_cfg_default()
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = 0.1
    cfg.OPTIM.MOMENTUM = 0.9
    cfg.OPTIM.WEIGHT_DECAY = 0.01
    cfg.OPTIM.LR_SCHEDULER = "constant"
    cfg.OPTIM.WARMUP_EPOCH = -1
    cfg.OPTIM.MAX_EPOCH = 1

    opt, _ = build_optimizer(cfg, steps_per_epoch=100)
    w0 = np.array([1.0, -2.0, 0.5], np.float32)
    grads = [np.array([0.1, 0.2, -0.3], np.float32),
             np.array([-0.05, 0.1, 0.2], np.float32),
             np.array([0.2, -0.1, 0.0], np.float32)]

    p = jnp.asarray(w0)
    state = opt.init(p)
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state, p)
        p = optax.apply_updates(p, updates)

    tp = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.SGD([tp], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()

    np.testing.assert_allclose(np.asarray(p), tp.detach().numpy(),
                               rtol=1e-6, atol=1e-7)
