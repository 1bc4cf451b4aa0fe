"""Trainer lifecycle engine.

Clean-room equivalent of the Dassl ``TrainerX`` surface the reference
trainers use (``/root/reference/trainers/classification/coop.py:226-343``):
``build_data_loader`` -> ``build_model`` -> ``train()`` epoch loop calling
``forward_backward`` per batch, per-epoch checkpointing, ``load_model``
with buffer-dropping, model registry, metric logging.

TPU-first differences:
- each trainer compiles ONE jit train step (frozen backbone passed as a
  non-donated argument, trainable prompt pytree + optimizer state donated);
  the LR schedule is inside the optax transform, so the epoch loop is pure
  data feeding;
- eval precomputes text features once per class set instead of re-encoding
  text every batch (the reference re-runs the text tower per eval batch).
"""

from __future__ import annotations

import datetime
import json
import os
import os.path as osp
import time
from collections import defaultdict, deque
from typing import Any, Dict, Optional

import numpy as np

from ..data.loader import DataManager
from ..engine.checkpoint import (load_checkpoint, resolve_model_file,
                                 save_checkpoint)
from ..engine.registry import build_evaluator


class MetricMeter:
    """Running averages for loss printing (Dassl MetricMeter look).

    Accepts device scalars and keeps them UNFETCHED until printed: a
    per-step ``float(loss)`` would block the host on every train step
    (one tunnel round-trip each), serializing dispatch with execution.
    Trainers return the raw jax scalar; at print time the pending values
    are stacked on device and fetched in one transfer per metric, so the
    dispatch queue stays several steps ahead of the device between
    prints (``TRAIN.PRINT_FREQ``)."""

    def __init__(self, delimiter: str = " "):
        self.meters = defaultdict(lambda: deque(maxlen=100))
        self.delimiter = delimiter

    def update(self, metrics: Dict[str, Any]):
        for k, v in metrics.items():
            self.meters[k].append(v)

    def _materialize(self):
        import jax.numpy as jnp
        for name, vals in self.meters.items():
            # convert only the unfetched suffix — re-stacking already-
            # materialized floats would re-upload them every print
            idx = [i for i, v in enumerate(vals)
                   if type(v) is not float]
            if not idx:
                continue
            stacked = jnp.stack(
                [jnp.squeeze(jnp.asarray(vals[i])) for i in idx])
            fetched = np.asarray(stacked, np.float64)
            for i, x in zip(idx, fetched):
                vals[i] = float(x)

    def __str__(self):
        self._materialize()
        parts = []
        for name, vals in self.meters.items():
            avg = sum(vals) / len(vals)
            parts.append(f"{name} {vals[-1]:.4f} ({avg:.4f})")
        return self.delimiter.join(parts)


class TrainerX:
    """Base trainer: data, model registry, train/test lifecycle."""

    def __init__(self, cfg):
        self.cfg = cfg
        if cfg.MODEL.PRECISION not in ("bf16", "fp32"):
            # every consumer uses 'fp32 if x == "fp32" else bf16', so a
            # typo ('fp16', 'FP32', 'float32') would silently mean bf16
            # and the fp32 golden-parity guarantee would never engage
            raise ValueError(
                f"MODEL.PRECISION must be 'bf16' or 'fp32', got "
                f"{cfg.MODEL.PRECISION!r}")
        self.check_cfg(cfg)
        self.start_epoch = self.epoch = 0
        self.max_epoch = cfg.OPTIM.MAX_EPOCH
        self.output_dir = cfg.OUTPUT_DIR
        self.best_result = -np.inf

        # name -> {"params", "opt", "opt_state", "step"}
        self._models: Dict[str, Dict[str, Any]] = {}
        self._scalar_log = None

        self.build_data_loader()
        self.evaluator = build_evaluator(cfg, lab2cname=self.dm.lab2cname)
        self.build_model()
        # TRAINER.QUANT_FROZEN_VISION must never be silently ignored: a
        # trainer that supports it calls setup_frozen_vision() in its
        # build_model (which installs the quantized pytree or raises for
        # vision-prompt trainers); anything else lands here.
        if getattr(cfg.TRAINER, "QUANT_FROZEN_VISION", "") and \
                getattr(self, "_step_clip_params", None) is None:
            raise ValueError(
                f"{type(self).__name__} does not support "
                "TRAINER.QUANT_FROZEN_VISION (its build_model never "
                "installed a quantized frozen tower)")

    # -- hooks ------------------------------------------------------------
    def check_cfg(self, cfg):
        pass

    def build_data_loader(self):
        self.dm = DataManager(self.cfg)
        self.train_loader_x = self.dm.train_loader_x
        self.val_loader = self.dm.val_loader
        self.test_loader = self.dm.test_loader
        self.num_classes = self.dm.num_classes
        self.lab2cname = self.dm.lab2cname

    def build_model(self):
        raise NotImplementedError

    def forward_backward(self, batch) -> Dict[str, Any]:
        """Returns loss metrics; values may be device scalars — keep
        them unfetched (MetricMeter materializes lazily) so the step
        dispatch never blocks on a host round-trip."""
        raise NotImplementedError

    def model_inference(self, images):
        """images: uint8 [B,H,W,3] -> (logits, image_features,
        text_features) device arrays."""
        raise NotImplementedError

    @property
    def pixel_stats(self):
        """(mean, std) for the device-side normalize — honors
        ``cfg.INPUT.PIXEL_MEAN/STD`` and the Dassl "normalize"
        transform flag (ops/preprocess.pixel_stats_from_cfg);
        (None, None) means /255 only."""
        from ..ops.preprocess import pixel_stats_from_cfg
        return pixel_stats_from_cfg(self.cfg)

    def set_model_mode(self, mode: str):
        pass  # functional models carry no train/eval flags

    # -- model registry ----------------------------------------------------
    def register_model(self, name: str, params, opt=None, opt_state=None):
        if name in self._models:
            raise KeyError(f"Model {name!r} already registered")
        self._models[name] = {"params": params, "opt": opt,
                              "opt_state": opt_state, "step": 0}

    def get_model_names(self):
        return list(self._models)

    def model_params(self, name: str):
        return self._models[name]["params"]

    # -- train loop ----------------------------------------------------------
    def train(self):
        self.before_train()
        for self.epoch in range(self.start_epoch, self.max_epoch):
            self.before_epoch()
            self.run_epoch()
            self.after_epoch()
        self.after_train()

    def before_train(self):
        # Dassl parity: resume from RESUME when given, else from the
        # output dir itself — re-running a finished/interrupted wrapper
        # invocation picks up its checkpoints instead of restarting (the
        # reference sweeps' de-facto resilience mechanism,
        # dassl SimpleTrainer.before_train / scripts/*: dir-exists branch).
        directory = self.cfg.RESUME or self.output_dir
        if self._models:
            self.resume_model_if_exist(directory)
        os.makedirs(self.output_dir, exist_ok=True)
        self.time_start = time.time()

    def before_epoch(self):
        self.train_loader_x.set_epoch(self.epoch)

    def _device_staged(self, loader):
        """One-batch-ahead host->device staging (the prefetch_to_device
        pattern): batch N+1's transfer is issued before step N's results
        are consumed, so the copy engine overlaps the device compute
        instead of stalling the execution stream between steps. Trainers'
        ``put_batch`` then sees an already-placed jax.Array and passes it
        through. Depth 1 is enough — the host loader already prefetches
        decode/transform one batch ahead (data/loader.py)."""
        staged_prev = None
        for batch in loader:
            staged = dict(batch)
            staged["img"] = self.put_batch(batch["img"])
            staged["label"] = self.put_batch(batch["label"])
            if staged_prev is not None:
                yield staged_prev
            staged_prev = staged
        if staged_prev is not None:
            yield staged_prev

    def run_epoch(self):
        meter = MetricMeter()
        epoch_start = time.time()
        self.num_batches = len(self.train_loader_x)
        profile_dir = self.cfg.TPU.PROFILE_DIR
        profiling = bool(profile_dir) and self.epoch == 0
        if profiling:
            import jax
            print(f"Tracing first {self.cfg.TPU.PROFILE_STEPS} steps "
                  f"to {profile_dir}")
            jax.profiler.start_trace(profile_dir)
        # forward_backward only ENQUEUES work (losses are fetched
        # lazily), so a per-step clock would time the dispatch, not the
        # step. Honest numbers come from the print window: stringifying
        # the meter drains the queue, so wall time across the window /
        # steps = true average step time.
        end = window_start = time.time()
        window_steps = 0
        window_data = 0.0
        loss_summary = None  # stays None if the loader yields no batch
        for self.batch_idx, batch in enumerate(
                self._device_staged(self.train_loader_x)):
            window_data += time.time() - end  # decode/prefetch wait
            loss_summary = self.forward_backward(batch)
            window_steps += 1
            if profiling and self.batch_idx + 1 >= \
                    self.cfg.TPU.PROFILE_STEPS:
                import jax
                # losses are fetched lazily, so the profiled steps may
                # still be queued — drain before closing the trace or
                # the device timeline comes out empty
                jax.block_until_ready(loss_summary)
                jax.profiler.stop_trace()
                profiling = False
            meter.update(loss_summary)
            if ((self.batch_idx + 1) % self.cfg.TRAIN.PRINT_FREQ == 0
                    or self.num_batches < self.cfg.TRAIN.PRINT_FREQ):
                msg = str(meter)  # materializes pending losses (sync)
                now = time.time()
                batch_time = (now - window_start) / window_steps
                data_time = window_data / window_steps
                nb_left = self.num_batches - self.batch_idx - 1
                ep_left = self.max_epoch - self.epoch - 1
                eta = batch_time * (nb_left + ep_left * self.num_batches)
                eta = str(datetime.timedelta(seconds=int(eta)))
                print(
                    f"epoch [{self.epoch + 1}/{self.max_epoch}]"
                    f"[{self.batch_idx + 1}/{self.num_batches}] "
                    f"time {batch_time:.3f} data {data_time:.3f} "
                    f"eta {eta} {msg}")
                window_start = time.time()
                window_steps = 0
                window_data = 0.0
            end = time.time()
        if profiling:  # epoch shorter than PROFILE_STEPS
            import jax
            if loss_summary is not None:
                jax.block_until_ready(loss_summary)
            jax.profiler.stop_trace()
        # honest throughput: per-step prints exclude the lazy loss-fetch
        # drain, so wall/steps is the number to trust (first epoch also
        # carries the jit compile)
        dt = time.time() - epoch_start
        n = max(self.num_batches, 1)
        print(f"epoch [{self.epoch + 1}/{self.max_epoch}] done in "
              f"{dt:.1f}s ({dt / n * 1e3:.1f} ms/step, "
              f"{n * self.cfg.DATALOADER.TRAIN_X.BATCH_SIZE / dt:.0f} "
              f"img/s)")

    def after_epoch(self):
        last_epoch = (self.epoch + 1) == self.max_epoch
        do_test = not self.cfg.TEST.NO_TEST
        meet_freq = (self.cfg.TRAIN.CHECKPOINT_FREQ > 0 and
                     (self.epoch + 1) % self.cfg.TRAIN.CHECKPOINT_FREQ == 0)
        if do_test and self.cfg.TEST.FINAL_MODEL == "best_val":
            result = self.test(split="val")
            if result > self.best_result:
                self.best_result = result
                self.save_model(self.epoch, self.output_dir,
                                is_best=True)
        if last_epoch or meet_freq:
            self.save_model(self.epoch, self.output_dir)

    def after_train(self):
        print("Finish training")
        if not self.cfg.TEST.NO_TEST:
            if self.cfg.TEST.FINAL_MODEL == "best_val":
                print("Deploy the model with the best val performance")
                self.load_model(self.output_dir)
            else:
                print("Deploy the last-epoch model")
            self.test()
        elapsed = round(time.time() - self.time_start)
        print(f"Elapsed: {datetime.timedelta(seconds=elapsed)}")
        self.close_writer()

    # -- checkpointing ---------------------------------------------------------
    #: checkpoint filename stem; calibration trainers override with
    #: "model-calibrated" (reference tempscaling.py:305-327 naming)
    checkpoint_model_name = "model"

    def save_model(self, epoch: int, directory: str,
                   is_best: bool = False, model_name: str = None):
        model_name = model_name or self.checkpoint_model_name
        for name, slot in self._models.items():
            save_checkpoint(
                {"state_dict": slot["params"], "epoch": epoch + 1,
                 "opt_state": slot.get("opt_state")},
                osp.join(directory, name), epoch + 1, is_best=is_best,
                model_name=model_name)

    def checkpoint_dir_aliases(self, name: str):
        """Subdirectory names to try when loading (reference trainers use
        different registered names, e.g. MaPLe's MultiModalPromptLearner)."""
        return [name]

    def _resolve_aliased(self, directory: str, name: str,
                         epoch: Optional[int],
                         model_name: str = "model"):
        """Resolve model ``name``'s checkpoint file under ``directory``,
        trying each ``checkpoint_dir_aliases`` subdirectory in order —
        the one resolution policy shared by ``load_model`` and
        ``export_reference_checkpoint``."""
        for alias in self.checkpoint_dir_aliases(name):
            try:
                return resolve_model_file(osp.join(directory, alias),
                                          epoch, model_name=model_name)
            except FileNotFoundError:
                continue
        raise FileNotFoundError(
            f"No checkpoint for {name!r} under {directory!r} "
            f"(tried {self.checkpoint_dir_aliases(name)})")

    def convert_reference_state(self, name: str, state: Dict[str, Any]):
        """Hook: map a reference torch state dict (dots -> nesting, torch
        [out,in] Linear weights) onto this trainer's param pytree. Default
        is identity (native checkpoints)."""
        return state

    def convert_to_reference_state(self, name: str,
                                   state: Dict[str, Any]):
        """Inverse hook of ``convert_reference_state``: map this
        trainer's param pytree to the reference's state-dict layout
        (nested dicts become dotted keys on export, [in,out] matmul
        weights transpose back to torch [out,in]). Default identity —
        raw parameter tensors share names with the reference's
        learnables (e.g. CoOp-family ``ctx``)."""
        return state

    def export_reference_checkpoint(self, directory: str, dst_dir: str,
                                    epoch: Optional[int] = None):
        """Export this trainer's checkpoints to the reference's torch
        format so reference users can consume models trained here: for
        each registered model, resolve our npz file, apply
        ``convert_to_reference_state``, and write a torch ``.pth.tar``
        under the reference's registered model name (the last
        ``checkpoint_dir_aliases`` entry, e.g. MaPLe ->
        MultiModalPromptLearner). Returns the written paths."""
        from .checkpoint import export_torch_checkpoint
        written = []
        for name in self.get_model_names():
            # same alias search as load_model: the source dir may be
            # laid out under the reference's registered names
            path = self._resolve_aliased(
                directory, name, epoch,
                model_name=self.checkpoint_model_name)
            ckpt = load_checkpoint(path)
            state = ckpt["state_dict"]
            if ckpt["native"]:
                state = self.convert_to_reference_state(name, state)
            # else: a torch file here IS a reference-layout checkpoint
            # (load_model's supported input) — pass its state through
            # unchanged instead of crashing in the inverse hook
            ref_name = self.checkpoint_dir_aliases(name)[-1]
            dst = osp.join(dst_dir, ref_name, osp.basename(path))
            written.append(export_torch_checkpoint(
                state, ckpt["epoch"], dst))
            print(f'Exported {name} -> "{dst}" (reference torch format)')
        return written

    def load_model(self, directory: str, epoch: Optional[int] = None):
        if not directory:
            print("Note that load_model() is skipped as no pretrained "
                  "model is given")
            return
        for name in self.get_model_names():
            path = self._resolve_aliased(directory, name, epoch)
            ckpt = load_checkpoint(path)
            state = self.convert_reference_state(name, ckpt["state_dict"])
            # Ignore fixed token vectors: class sets change between
            # train (base) and test (new) (reference coop.py:334-343)
            state.pop("token_prefix", None)
            state.pop("token_suffix", None)
            print(f'Loading weights to {name} from "{path}" '
                  f'(epoch = {ckpt["epoch"]})')
            self._set_params(name, state)

    def _set_params(self, name: str, loaded: Dict[str, Any]):
        """Non-strict merge of loaded arrays into the registered pytree."""
        import jax.numpy as jnp
        params = self._models[name]["params"]

        def merge(dst, src, prefix=""):
            out = {}
            for k, v in dst.items():
                if k in src:
                    if isinstance(v, dict):
                        out[k] = merge(v, src[k], prefix + k + "/")
                    else:
                        arr = jnp.asarray(np.asarray(src[k]),
                                          dtype=v.dtype)
                        if arr.shape != v.shape:
                            print(f"skip {prefix + k}: shape "
                                  f"{arr.shape} != {v.shape}")
                            out[k] = v
                        else:
                            out[k] = arr
                else:
                    print(f"missing key in checkpoint: {prefix + k}")
                    out[k] = v
            return out

        self._models[name]["params"] = merge(params, loaded)

    def resume_model_if_exist(self, directory: str):
        """All-or-nothing resume: every registered model's checkpoint is
        loaded and validated BEFORE any is applied, so a missing or
        truncated file (e.g. a run killed mid save_checkpoint — exactly
        what auto-resume exists for) starts fresh instead of crashing or
        silently resuming from a mixed state."""
        import jax
        loaded = []
        for name in self.get_model_names():
            try:
                path = resolve_model_file(
                    osp.join(directory, name), latest=True,
                    model_name=self.checkpoint_model_name)
                ckpt = load_checkpoint(path)
                state = ckpt["state_dict"]
                epoch = ckpt["epoch"]
            except FileNotFoundError:
                print(f"No checkpoint to resume at {directory}")
                return
            except Exception as e:  # truncated/corrupt/alien file
                print(f"Unusable checkpoint for {name!r} at {directory} "
                      f"({type(e).__name__}: {e}); starting fresh")
                return
            loaded.append((name, state, epoch, ckpt.get("opt_leaves")))

        resumed_epoch = 0
        for name, state, epoch, leaves in loaded:
            state.pop("token_prefix", None)
            state.pop("token_suffix", None)
            self._set_params(name, state)
            resumed_epoch = max(resumed_epoch, epoch)
            # restore optimizer state (momentum + schedule position)
            slot = self._models[name]
            if leaves is not None and slot.get("opt_state") is not None:
                cur_leaves, treedef = jax.tree.flatten(slot["opt_state"])
                if len(cur_leaves) == len(leaves):
                    restored = [
                        np.asarray(new).astype(np.asarray(old).dtype)
                        for old, new in zip(cur_leaves, leaves)]
                    slot["opt_state"] = jax.tree.unflatten(
                        treedef, restored)
                else:
                    print(f"optimizer state mismatch for {name}; "
                          "keeping fresh state")
        self.start_epoch = resumed_epoch
        print(f"Resumed from {directory} (epoch {resumed_epoch})")

    # -- misc ---------------------------------------------------------------
    def write_scalar(self, tag: str, value, step: int):
        if self._scalar_log is None:
            os.makedirs(self.output_dir, exist_ok=True)
            self._scalar_log = open(
                osp.join(self.output_dir, "scalars.jsonl"), "a")
        self._scalar_log.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._scalar_log.flush()

    def close_writer(self):
        if self._scalar_log is not None:
            self._scalar_log.close()
            self._scalar_log = None

    # -- SPMD -----------------------------------------------------------------
    @property
    def mesh(self):
        """Device mesh for data-parallel batches; built lazily from
        TPU.MESH_SHAPE/MESH_AXES when >1 device is visible, else None."""
        if not hasattr(self, "_mesh"):
            import jax
            self._mesh = None
            if len(jax.devices()) > 1:
                from ..parallel.mesh import mesh_from_cfg
                self._mesh = mesh_from_cfg(self.cfg)
        return self._mesh

    def put_batch(self, array):
        """Device-put a [B, ...] host array, sharded over the data axis
        when a mesh is active (jit then propagates the sharding — XLA
        runs the step SPMD with no further annotations). Arrays already
        placed by ``_device_staged`` pass through untouched."""
        import jax
        import jax.numpy as jnp
        if isinstance(array, jax.Array):
            return array
        mesh = self.mesh
        if mesh is None:
            return jnp.asarray(array)
        import numpy as np
        arr = np.asarray(array)
        n_data = mesh.shape["data"]
        nproc = jax.process_count()
        # multi-host: the loader delivers this host's slice of the
        # global batch (data/loader.py); global rows = local * nproc
        if (arr.shape[0] * nproc) % n_data != 0:
            if nproc > 1:
                # no single-device fallback exists on a pod: a host-
                # local array cannot feed a jit over the pod mesh
                raise ValueError(
                    f"global batch {arr.shape[0] * nproc} not divisible "
                    f"by the mesh data axis ({n_data} devices); pick a "
                    f"batch size divisible by the device count")
            return jnp.asarray(array)  # indivisible batch: single-device
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import put_global
        return put_global(arr, NamedSharding(mesh, P("data")))

    def parse_batch_test(self, batch):
        return batch["img"], batch["label"]

    def test(self, split=None):
        raise NotImplementedError
