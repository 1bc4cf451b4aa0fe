"""Checkpoint I/O.

Layout matches the reference scripts' expectations
(``/root/reference/trainers/classification/coop.py:318-343``):
``<output>/<model-name>/model.pth.tar-<epoch>`` plus ``model-best.pth.tar``
and the calibrated variant ``model-calibrated.pth.tar-<N>``. Content is a
torch-free npz payload (flat param keys + epoch metadata); a reader for
genuine torch ``.pth.tar`` prompt checkpoints is provided for interop with
artifacts produced by the reference.
"""

from __future__ import annotations

import io
import os
import os.path as osp
from typing import Any, Dict, Optional

import numpy as np

from ..models.weights import flatten_params, unflatten_params


def save_checkpoint(state: Dict[str, Any], save_dir: str,
                    epoch: int, is_best: bool = False,
                    model_name: str = "model") -> str:
    """state: {"state_dict": params pytree, "epoch": int,
    "opt_state": optional optax state pytree}."""
    os.makedirs(save_dir, exist_ok=True)
    flat = flatten_params(state["state_dict"])
    arrays = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if str(v.dtype) == "bfloat16":
            arrays["B::" + k] = v.view(np.uint16)
        else:
            arrays[k] = v
    arrays["__epoch__"] = np.asarray(state.get("epoch", epoch))
    if state.get("opt_state") is not None:
        import jax
        leaves = jax.tree.leaves(state["opt_state"])
        for i, leaf in enumerate(leaves):
            leaf = np.asarray(leaf)
            if str(leaf.dtype) == "bfloat16":
                arrays[f"__opt__::B::{i}"] = leaf.view(np.uint16)
            else:
                arrays[f"__opt__::{i}"] = leaf

    fpath = osp.join(save_dir, f"{model_name}.pth.tar-{epoch}")
    # np.savez appends .npz to string paths; write through a file object
    with open(fpath, "wb") as f:
        np.savez(f, **arrays)
    if is_best:
        best = osp.join(save_dir, f"{model_name}-best.pth.tar")
        with open(best, "wb") as f:
            np.savez(f, **arrays)
    return fpath


def export_torch_checkpoint(state_dict: Dict[str, Any], epoch: int,
                            dst_path: str) -> str:
    """Write a reference-consumable torch ``.pth.tar``: a nested numpy/
    jax pytree becomes a dotted-key fp32 tensor state dict inside
    ``{"state_dict", "epoch"}`` — exactly what Dassl's
    ``load_checkpoint`` + ``load_state_dict(strict=False)`` consume
    (reference ``coop.py:330-343``). The interop mirror of
    ``_load_torch``: train here, eval in the reference."""
    import torch
    os.makedirs(osp.dirname(dst_path) or ".", exist_ok=True)
    flat = flatten_params(state_dict)
    sd = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if str(v.dtype) == "bfloat16":
            import ml_dtypes  # noqa: F401  (registers the dtype)
            v = v.astype(np.float32)
        # float leaves export as fp32 (the reference checkpoints are
        # fp32/fp16 torch tensors); integer/bool leaves keep their dtype
        # rather than silently becoming float tensors
        if np.issubdtype(v.dtype, np.floating):
            v = v.astype(np.float32)
        elif not (np.issubdtype(v.dtype, np.integer)
                  or v.dtype == np.bool_):
            raise TypeError(
                f"export_torch_checkpoint: unexpected dtype {v.dtype} "
                f"for leaf {k!r}")
        # .copy() (not ascontiguousarray, which promotes 0-d scalars to
        # shape (1,)) keeps shapes exact and the buffer contiguous
        sd[k.replace("/", ".")] = torch.from_numpy(v.copy())
    torch.save({"state_dict": sd, "epoch": int(epoch)}, dst_path)
    return dst_path


def load_checkpoint(fpath: str) -> Dict[str, Any]:
    """Load either our npz checkpoints or reference torch .pth.tar files.

    The returned dict's ``"native"`` key says which format the bytes
    were (both formats share the reference's ``model.pth.tar-N`` file
    naming) — callers that care about provenance (e.g. reference
    export's pass-through) read it instead of re-sniffing the file."""
    if not osp.exists(fpath):
        raise FileNotFoundError(f'Checkpoint not found at "{fpath}"')
    try:
        return _load_npz(fpath)
    except (ValueError, OSError):
        return _load_torch(fpath)


def _load_npz(fpath: str) -> Dict[str, Any]:
    import ml_dtypes
    with open(fpath, "rb") as f:
        data = np.load(io.BytesIO(f.read()), allow_pickle=False)
        if "__epoch__" not in data.files:
            # torch zip archives also open as (empty) npz — not ours
            raise ValueError(f"{fpath} is not a native npz checkpoint")
        flat = {}
        epoch = 0
        opt_leaves = {}
        for k in data.files:
            if k == "__epoch__":
                epoch = int(data[k])
            elif k.startswith("__opt__::B::"):
                opt_leaves[int(k[12:])] = data[k].view(ml_dtypes.bfloat16)
            elif k.startswith("__opt__::"):
                opt_leaves[int(k[9:])] = data[k]
            elif k.startswith("B::"):
                flat[k[3:]] = data[k].view(ml_dtypes.bfloat16)
            else:
                flat[k] = data[k]
    out = {"state_dict": unflatten_params(flat), "epoch": epoch,
           "native": True}
    if opt_leaves:
        out["opt_leaves"] = [opt_leaves[i] for i in range(len(opt_leaves))]
    return out


def _load_torch(fpath: str) -> Dict[str, Any]:
    """Read a reference torch checkpoint ({'state_dict', 'epoch', ...})."""
    import torch
    ckpt = torch.load(fpath, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    flat = {k.replace(".", "/"): v.detach().float().numpy()
            for k, v in sd.items()}
    return {"state_dict": unflatten_params(flat),
            "epoch": int(ckpt.get("epoch", 0)), "native": False}


def resolve_model_file(directory: str, epoch: Optional[int] = None,
                       model_name: str = "model",
                       latest: bool = False) -> str:
    """Pick model-best or model.pth.tar-<epoch> (reference
    ``coop.py:312-343`` semantics).

    ``latest=True`` skips the model-best preference and returns the
    highest-epoch periodic checkpoint — the resume semantics (Dassl's
    ``resume_from_checkpoint`` picks the last epoch): resuming a
    best_val run from model-best would silently rewind past epochs
    trained after the best-val snapshot.
    """
    if epoch is not None:
        path = osp.join(directory, f"{model_name}.pth.tar-{epoch}")
        if not osp.exists(path):
            raise FileNotFoundError(f'Checkpoint not found at "{path}"')
        return path
    best = osp.join(directory, f"{model_name}-best.pth.tar")
    if not latest and osp.exists(best):
        return best
    # fall back to the highest-epoch file
    cands = [f for f in os.listdir(directory)
             if f.startswith(f"{model_name}.pth.tar-")]
    if not cands:
        if latest and osp.exists(best):
            # no periodic checkpoint yet (best_val run with
            # CHECKPOINT_FREQ=0 killed before the final epoch): resuming
            # from the best-val snapshot recovers partial progress
            return best
        raise FileNotFoundError(
            f"No checkpoint under {directory!r} for {model_name!r}")
    cands.sort(key=lambda f: int(f.rsplit("-", 1)[1]))
    return osp.join(directory, cands[-1])
