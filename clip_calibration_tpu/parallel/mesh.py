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


def initialize_distributed() -> int:
    """Multi-host (pod) runtime init. Call ONCE, before any device
    query, on every host of the pod (``train.py`` does when
    ``TPU.DISTRIBUTED`` is set). On TPU pods ``jax.distributed
    .initialize`` auto-discovers the coordinator from the TPU metadata;
    after it, ``jax.devices()`` spans the whole pod and a single Mesh
    over it makes every ``pjit`` step pod-SPMD. Returns process count.
    """
    import os
    kwargs = {}
    if os.environ.get("CC_COORD_ADDR"):
        # explicit cluster spec (non-TPU platforms — e.g. the CPU
        # cluster the multi-host test spins up; TPU pods and
        # Slurm/MPI launchers are auto-detected with no args)
        kwargs = dict(
            coordinator_address=os.environ["CC_COORD_ADDR"],
            num_processes=int(os.environ["CC_NUM_PROCS"]),
            process_id=int(os.environ["CC_PROC_ID"]))
    # NOTE: must run before ANY backend query — even
    # jax.process_count() initializes the XLA client. Failures
    # propagate: a run that explicitly asked for TPU.DISTRIBUTED must
    # not silently degrade to N independent single-process runs racing
    # on the same output dirs.
    jax.distributed.initialize(**kwargs)
    return jax.process_count()


def make_mesh(mesh_shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data", "model"),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the data axis, model axis size 1. A 2-axis
    shape like (4, 2) gives DP x class-parallel.

    Single-host meshes use XLA's topology-aware device ordering
    (``mesh_utils.create_device_mesh``) so neighboring mesh coordinates
    are ICI neighbors. Multi-host meshes put the slow DCN hops on the
    FIRST (data) axis and keep ICI inside the remaining axes
    (``create_hybrid_device_mesh``) — data-parallel gradients cross DCN
    once per step while the class/model-axis collectives ride ICI.
    """
    explicit = devices is not None
    devices = devices if explicit else jax.devices()
    n = len(devices)
    if not mesh_shape or tuple(mesh_shape) == ():
        mesh_shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh shape {mesh_shape} != {n} devices")
    if not explicit:
        from jax.experimental import mesh_utils
        nproc = jax.process_count()
        if nproc > 1:
            # put_global assumes the data axis is process-major; build
            # that explicitly. Real TPU pods get ICI-aware ordering
            # inside each host via create_hybrid_device_mesh; platforms
            # without slice topology (e.g. the CPU-cluster tests) get a
            # deterministic (process, id) sort — equally correct, no
            # ICI to optimize.
            if mesh_shape[0] % nproc != 0:
                raise ValueError(
                    f"data axis {mesh_shape[0]} not divisible by "
                    f"{nproc} processes")
            try:
                per_host = (mesh_shape[0] // nproc,) + tuple(
                    mesh_shape[1:])
                arr = mesh_utils.create_hybrid_device_mesh(
                    per_host, (nproc,) + (1,) * (len(mesh_shape) - 1),
                    devices=devices)
            except ValueError:  # no slice topology on this platform
                devs = sorted(devices,
                              key=lambda d: (d.process_index, d.id))
                arr = np.asarray(devs).reshape(mesh_shape)
            return Mesh(arr, tuple(axis_names[:arr.ndim]))
        try:
            arr = mesh_utils.create_device_mesh(
                tuple(mesh_shape), devices=devices)
            return Mesh(arr, tuple(axis_names[:arr.ndim]))
        except Exception as e:
            print(f"topology-aware mesh unavailable ({e}); "
                  f"using row-major device order")
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


def fanout_shardings(mesh: Optional[Mesh]):
    """Sharding constraints for the big text-encode fan-outs (SURVEY
    §5.8: CoCoOp's per-image n_cls encodes, reference ``cocoop.py:
    193-199``; ProDA's n_cls x P prompt blowup, ``proda.py:163``), or
    None when the mesh has no model axis > 1 (DP-only — constraints
    would be no-ops, skip the tracing overhead).

    - ``class``: [n_cls, ...] fan-outs shard the class axis over the
      "model" mesh axis (ProDA; every row of the text tower is
      independent, so this is pure row parallelism — XLA inserts the
      collectives only where the sharded text features meet the
      data-sharded image features in the logits matmul).
    - ``chunk_class``: [chunk, n_cls, ...] per-image fan-outs shard
      images over "data" AND classes over "model" (CoCoOp) — the full
      mesh works on one chunk's text rows.
    """
    if mesh is None or mesh.shape.get("model", 1) <= 1:
        return None
    return {
        "class": class_sharding(mesh),
        "chunk_class": NamedSharding(mesh, P("data", "model")),
    }


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch_arrays, mesh: Mesh):
    """Device-put host batch arrays with batch-axis sharding."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch_arrays)


def host_rows_allgather(x) -> np.ndarray:
    """Global row concatenation of a HOST-side per-process array.

    The loader hands each process only its slice of the global batch
    (data/loader.py ``_make_batch``); code that pairs host values (e.g.
    labels) with pod-GLOBAL device outputs must first reassemble the
    global order — rank-0 rows, then rank-1, ... (the same order
    ``put_global`` lays shards out in). Single-process: identity. A
    pod-global jax.Array is ALREADY global — it converts via
    ``to_host_global`` instead of being gathered twice.
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return to_host_global(x)
    x = np.asarray(x)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        x = np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return x


def to_host_global(x) -> np.ndarray:
    """``np.asarray`` that also handles pod-global jax.Arrays.

    Data-sharded global arrays span non-addressable devices and cannot
    be fetched directly; materialize the full array on every host
    first. Host arrays, single-host device arrays, and fully-replicated
    global arrays convert as-is.
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable \
            and not x.is_fully_replicated:
        from jax.experimental import multihost_utils
        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def put_global(array, sharding: NamedSharding):
    """Place a batch on a (possibly multi-host) mesh.

    Single-process: a plain sharded ``device_put``. Multi-host: the
    caller holds only this host's slice of the global batch (the loader
    slices per host, data/loader.py) and the global jax.Array is
    assembled from per-process shards — each host's slice lands on its
    local devices, no cross-host data movement.
    """
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    return jax.make_array_from_process_local_data(sharding, array)
