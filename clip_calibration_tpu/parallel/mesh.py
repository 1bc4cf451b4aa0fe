"""Device mesh and sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
over the text encoder (``trainers/classification/coop.py:268-272``); the
TPU-native equivalent is one ``jax.sharding.Mesh`` over ICI with named
axes:

- ``data``: batch axis of image encode and eval sweeps (DP),
- ``model``: class/prompt axis of the text-encode fan-outs (the n_cls
  blowups of CoCoOp/ProDA) — tensor-style parallelism over classes.

All communication is XLA-inserted collectives from NamedSharding
constraints; nothing manual.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data", "model"),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the data axis, model axis size 1. A 2-axis
    shape like (4, 2) gives DP x class-parallel.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if not mesh_shape or tuple(mesh_shape) == ():
        mesh_shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh shape {mesh_shape} != {n} devices")
    arr = np.asarray(devices).reshape(mesh_shape)
    return Mesh(arr, tuple(axis_names[:arr.ndim]))


def mesh_from_cfg(cfg) -> Mesh:
    """Mesh from TPU.MESH_SHAPE / TPU.MESH_AXES config keys."""
    return make_mesh(tuple(cfg.TPU.MESH_SHAPE),
                     tuple(cfg.TPU.MESH_AXES))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-sharded [B, ...] arrays."""
    return NamedSharding(mesh, P("data"))


def class_sharding(mesh: Mesh) -> NamedSharding:
    """Class-axis-sharded [n_cls, ...] arrays (text fan-outs)."""
    return NamedSharding(mesh, P("model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch_arrays, mesh: Mesh):
    """Device-put host batch arrays with batch-axis sharding."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch_arrays)
