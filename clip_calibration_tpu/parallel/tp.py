"""Tensor-parallel (head/hidden-sharded) tower execution.

The reference's only intra-model parallelism is ``nn.DataParallel``
over the text encoder (``trainers/classification/coop.py:268-272``) —
replicate the weights, split the batch. That helps throughput, never
latency: a batch-1 request still runs the whole tower on one device.
The TPU-native lever for serving latency is the orthogonal axis —
shard the *inside* of every transformer block over the ``model`` mesh
axis and let GSPMD insert the collectives:

- attention: heads are embarrassingly parallel — Q/K/V [B, H, L, d]
  shard the head axis; each device runs score/softmax/PV for its
  local heads. The out-projection contracts the head-concat dim, so
  XLA finishes it with ONE ``psum`` per layer.
- MLP: the hidden activation [B, L, 4D] shards its feature axis
  (Megatron split — ``w_fc`` columns / ``w_proj`` rows); the down-
  projection's contraction over the sharded dim is the second
  per-layer ``psum``.

Everything is expressed as ``with_sharding_constraint`` on activations
inside the jitted tower — no manual collectives, no weight-layout
surgery; XLA partitions the matmuls and places the two reductions on
ICI. Weights stay replicated (CLIP towers fit on one chip; the point
is splitting the *compute* for latency, and replicated weights keep
the constructor trivially compatible with the data-parallel path).

Composability: ``TowerTP.batch_axis`` keeps the image/row batch
sharded over ``data`` while heads/hidden shard over ``model`` — the
same (data, model) mesh the trainers use for class-axis fan-outs
(``parallel/mesh.fanout_shardings``) serves TP inference.

Scope: the ViT towers and the text tower (``models/clip.py``). The
ModifiedResNet tower is data-parallel only (conv channel TP would need
per-stage channel constraints; the ResNet zoo members are served DP —
``serving.Predictor`` raises if asked otherwise).

Engaged when a mesh's ``model`` axis is > 1: pass ``tp=tower_tp(mesh)``
to ``models/clip.py`` encoders (``serving.Predictor`` does this
automatically). The fused Pallas attention kernel is a single-device
program — under TP the attention runs the einsum path, which GSPMD can
partition; on one chip (tp=None) the Pallas kernel path is unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class TowerTP:
    """Sharding-constraint helpers threaded through the tower.

    batch_axis: mesh axis for the [B, ...] batch dim (None = replicated
      batch — the pure-TP latency configuration).
    model_axis: mesh axis for attention heads / MLP hidden features.
    """

    mesh: Mesh
    batch_axis: Optional[str]
    model_axis: str

    def _c(self, x, spec: P):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    def shard_heads(self, t):
        """[B, H, L, d]: heads over the model axis."""
        return self._c(t, P(self.batch_axis, self.model_axis))

    def shard_concat(self, t):
        """[B, L, D=H*d] head-concat activations: feature dim over the
        model axis (the out-projection then contracts a sharded dim —
        XLA finishes with a psum)."""
        return self._c(t, P(self.batch_axis, None, self.model_axis))

    # the MLP hidden [B, L, 4D] wants the identical layout
    shard_hidden = shard_concat


def tower_tp(mesh: Optional[Mesh], batch_axis: str = "data",
             model_axis: str = "model") -> Optional[TowerTP]:
    """TowerTP for ``mesh``, or None when the mesh has no model axis > 1
    (plain DP — constraints would be no-ops, skip them entirely)."""
    if mesh is None or mesh.shape.get(model_axis, 1) <= 1:
        return None
    b = batch_axis if mesh.shape.get(batch_axis, 1) > 1 else None
    return TowerTP(mesh, b, model_axis)
