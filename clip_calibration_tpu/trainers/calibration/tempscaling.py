"""Temperature-scaling calibration trainer.

Parity target: ``/root/reference/trainers/calibration/tempscaling.py``.
Wraps a frozen, already-tuned base learner; the single trainable parameter
is a log-temperature (init 4.6052 = ln 100, the CLIP convention). The
reference re-implements every base model as an inference-only mirror with
``logit_scale`` forced to 1.0 (``base_model/*.py``); here the base
trainer's own inference step is reused and its logit scale divided out —
one code path for all 9 base learners, no mirrors.

Training re-points ``train_loader_x`` at the *val* loader (reference
``tempscaling.py:123-143``) and optimizes CE of ``exp(s) * cos`` with SGD.
Checkpoints are saved as ``model-calibrated.pth.tar-<N>`` (reference
``tempscaling.py:305-327``).
"""

from __future__ import annotations

import functools
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...engine.optim import build_optimizer
from ...engine.registry import TRAINER_REGISTRY

from ...parallel.mesh import host_rows_allgather, to_host_global
from ..base_learner import VLBaseLearner


class _CachedCosReplay:
    """Scaling-epoch replay shim around the sequential val loader.

    Epoch 1 iterates the real loader (filling the trainer's per-batch
    cosine-logit cache); once the cache holds a full epoch, later
    epochs replay the cached batch KEYS directly — no JPEG decode, no
    transform, no host->device image transfer. The val loader is
    sequential and deterministic, so the cache's insertion order IS the
    epoch order and the training trajectory is unchanged (the scale
    step consumes only the cached cosine logits either way — the same
    values the non-replay epochs would recompute)."""

    def __init__(self, trainer, base):
        self.trainer = trainer
        self.base = base

    def __len__(self):
        return len(self.base)

    def set_epoch(self, epoch):
        self.base.set_epoch(epoch)

    @property
    def replaying(self) -> bool:
        cache = getattr(self.trainer, "_cos_cache", None)
        return cache is not None and len(cache) >= len(self.base)

    def __iter__(self):
        if self.replaying:
            for key in list(self.trainer._cos_cache.keys()):
                yield {"impath": key, "n_real": len(key)}
            return
        yield from self.base


@TRAINER_REGISTRY.register()
class TempScaling(VLBaseLearner):

    def build_data_loader(self):
        super().build_data_loader()
        # calibrate on the validation split: the reference re-points
        # train_loader_x at the val loader itself (sequential, TEST batch
        # size) — deterministic batches also make the per-batch logit
        # cache below effective across the scaling epochs; the replay
        # shim drops the host image pipeline entirely from epoch 2 on
        if self.val_loader is not None:
            self.train_loader_x = _CachedCosReplay(self, self.val_loader)

    def _device_staged(self, loader):
        # cached-cos replay batches carry no images — nothing to stage
        if getattr(loader, "replaying", False):
            yield from loader
            return
        yield from super()._device_staged(loader)

    def build_model(self):
        cfg = self.cfg
        base_name = cfg.CALIBRATION.SCALING.BASE_LEARNER
        print(f"Building base learner for scaling: {base_name}")

        bcfg = cfg.clone()
        bcfg.defrost()
        bcfg.TRAINER.NAME = base_name
        bcfg.freeze()
        self.base = TRAINER_REGISTRY.get(base_name)(bcfg)

        base_dir = cfg.CALIBRATION.SCALING.BASE_DIR
        if base_dir:
            self.base.load_model(base_dir,
                                 epoch=cfg.CALIBRATION.SCALING.BASE_EPOCH)
        if base_name == "ProDA":
            self.base.set_classifier()

        # the frozen model's own temperature, divided out of its logits
        self._base_log_scale = float(
            np.asarray(self.base.clip_params["logit_scale"], np.float32))

        trainable = {"scale": jnp.asarray(
            cfg.CALIBRATION.SCALING.INIT_TEMP, jnp.float32)}
        steps = max(len(self.train_loader_x), 1)
        opt, _ = build_optimizer(cfg, steps)
        self.opt = opt
        self.register_model("scale_learner", trainable, opt,
                            opt.init(trainable))

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def scale_step(trainable, opt_state, cos_logits, labels):
            def loss_fn(tr):
                logits = jnp.exp(tr["scale"]) * cos_logits
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()
            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, opt_state = self.opt.update(grads, opt_state,
                                                 trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss

        self._scale_step = scale_step
        self._cos_cache = {}  # impath tuple -> (cos_logits, labels)
        # cache-validity contract: the base model must stay frozen while
        # scaling trains (its trainables are tiny, so the fingerprint
        # check per cache hit is cheap)
        self._base_fingerprint = self._fingerprint_base()
        self._fingerprint_checked = False

    # the CLIP backbone lives on the wrapped base learner; delegating
    # keeps scaling trainers interchangeable with product trainers for
    # consumers that introspect the backbone (serve.py resolution lookup,
    # export tooling)
    @property
    def clip_cfg(self):
        return self.base.clip_cfg

    @property
    def clip_params(self):
        return self.base.clip_params

    @property
    def _step_clip_params(self):
        # TRAINER.QUANT_FROZEN_VISION is handled by the wrapped base
        # learner (its build_model installed the quantized tower or
        # raised); delegating satisfies the engine's never-silently-
        # ignored check and keeps eval inference on the base's path.
        return getattr(self.base, "_step_clip_params", None)

    def _fingerprint_base(self) -> float:
        total = 0.0
        for name, slot in self.base._models.items():
            for leaf in jax.tree.leaves(slot["params"]):
                total += float(jnp.sum(jnp.abs(
                    jnp.asarray(leaf, jnp.float32))))
        return total

    # -- helpers --------------------------------------------------------------
    def _unit_logits(self, images):
        """Base model cosine logits with its temperature divided out.

        Multi-host: the base model's logits are a global data-sharded
        jax.Array; materialize the full array on every host before the
        numpy conversion (fetching a non-addressable array raises)."""
        logits, img_f, txt_f = self.base.model_inference(images)
        cos = (to_host_global(logits).astype(np.float32)
               / np.exp(self._base_log_scale))
        return cos, img_f, txt_f

    # -- train -------------------------------------------------------------
    def _cached_cos(self, batch):
        """Frozen-model cosine logits for the batch (cached per batch —
        the base model never changes during scaling); padded rows from
        the sequential loader's final batch are sliced off.

        Caching applies only when scaling trains on the sequential val
        loader (the normal reference path, identical batches each epoch).
        A dataset without a val split falls back to the SHUFFLED train
        loader, whose batch keys change per epoch — there the cache would
        grow unboundedly and never hit, so it is bypassed.
        """
        n = batch["n_real"]
        base = getattr(self.train_loader_x, "base", self.train_loader_x)
        if base is not self.val_loader:
            images, labels = self.parse_batch_train(batch)
            cos, _, _ = self._unit_logits(images)
            return cos[:n], host_rows_allgather(labels)[:n]
        key = tuple(batch["impath"])
        if key not in self._cos_cache:
            # bounded by construction: the seeded eval-order val loader
            # replays identical batches each epoch, so the cache holds at
            # most one epoch of batches — a real exception (not assert:
            # the contract must survive python -O)
            if len(self._cos_cache) >= len(self.train_loader_x):
                raise RuntimeError(
                    "TempScaling logit cache grew past one epoch — the "
                    "val loader order is expected to be deterministic")
            images, labels = self.parse_batch_train(batch)
            cos, _, _ = self._unit_logits(images)
            self._cos_cache[key] = (cos[:n],
                                    host_rows_allgather(labels)[:n])
        elif not self._fingerprint_checked:
            # first cache hit of the run: the base model must not have
            # trained since build (cached logits would silently go stale)
            if self._fingerprint_base() != self._base_fingerprint:
                raise RuntimeError(
                    "base model parameters changed after TempScaling "
                    "build; cached cosine logits are stale")
            self._fingerprint_checked = True
        return self._cos_cache[key]

    def forward_backward(self, batch):
        cos, labels = self._cached_cos(batch)
        slot = self._models["scale_learner"]
        slot["params"], slot["opt_state"], loss = self._scale_step(
            slot["params"], slot["opt_state"], jnp.asarray(cos),
            jnp.asarray(labels))
        # device scalars — MetricMeter fetches lazily at print time
        return {"loss": loss,
                "temperature": jnp.exp(
                    jnp.squeeze(slot["params"]["scale"]))}

    # -- eval ---------------------------------------------------------------
    def model_inference(self, images):
        cos, img_f, txt_f = self._unit_logits(images)
        s = float(np.asarray(self._models["scale_learner"]["params"]
                             ["scale"]))
        return cos * np.exp(s), img_f, txt_f

    # -- checkpointing: model-calibrated.pth.tar-N --------------------------
    # the engine's save_model/resume use this stem, so an interrupted
    # scaling run auto-resumes (epoch + optimizer state) like any other
    checkpoint_model_name = "model-calibrated"

    def convert_to_reference_state(self, name, state):
        """Inverse interop: the reference ScaleLearner's parameter is
        named ``logit_scale`` (tempscaling.py:34-41)."""
        return {"logit_scale": np.asarray(state["scale"])}

    def checkpoint_dir_aliases(self, name):
        """The reference registers its scaler under ``tempscaling``
        (reference ``tempscaling.py:111``), so its runs save — and its
        ``load_model`` expects — ``<dir>/tempscaling/``. Native layout
        first; last entry names the export directory."""
        return ["scale_learner", "tempscaling"]

    def load_model(self, directory, epoch=None):
        """Load the scale learner from model-calibrated checkpoints
        (reference ``tempscaling.py:258-301``), laid out under either
        our ``scale_learner/`` or the reference's ``tempscaling/``. Base
        prompts were already loaded from CALIBRATION.SCALING.BASE_DIR at
        build time."""
        if not directory:
            print("Note that load_model() is skipped as no pretrained "
                  "model is given")
            return
        from ...engine.checkpoint import load_checkpoint
        fname = ("model-calibrated-best.pth.tar" if epoch is None
                 else f"model-calibrated.pth.tar-{epoch}")
        aliases = self.checkpoint_dir_aliases("scale_learner")
        for alias in aliases:
            path = osp.join(directory, alias, fname)
            if osp.exists(path):
                break
        else:
            raise FileNotFoundError(
                f'No "{fname}" under {directory!r} (tried '
                f'subdirectories {aliases})')
        ckpt = load_checkpoint(path)
        state = dict(ckpt["state_dict"])
        if "logit_scale" in state and "scale" not in state:
            # reference ScaleLearner naming (tempscaling.py:34-41)
            state["scale"] = state.pop("logit_scale")
        print(f'Loading weights to scale_learner from "{path}" '
              f'(epoch = {ckpt["epoch"]})')
        self._set_params("scale_learner", state)
