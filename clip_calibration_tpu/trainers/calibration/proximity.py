"""KNN feature-space distances for proximity-based calibration.

Parity target: ``/root/reference/trainers/calibration/proximity.py``. The
reference loops per sample on GPU with torch.topk; here each call is one
jit-compiled distance-matrix + ``lax.top_k`` — a single MXU matmul plus a
top-k, batched over query chunks so huge test sets don't materialize an
[N_test, N_base] matrix in HBM at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_chunk(queries: jnp.ndarray, base: jnp.ndarray, k: int):
    """Smallest k L2 distances from each query row to base rows."""
    qf = queries.astype(jnp.float32)
    bf = base.astype(jnp.float32)
    d2 = (jnp.sum(qf ** 2, -1)[:, None] + jnp.sum(bf ** 2, -1)[None, :]
          - 2.0 * qf @ bf.T)
    d2 = jnp.maximum(d2, 0.0)
    neg_top, _ = jax.lax.top_k(-d2, k)
    return jnp.sqrt(-neg_top)


def get_knn_dists(val_base_class_features, image_features_cur,
                  k_nns: int, chunk: int = 8192) -> np.ndarray:
    """[N_test, k] distances of test features to base-val features
    (reference ``proximity.py:19-46``). k is clamped to the base-set
    size for tiny val sets (the reference's torch.topk would error
    there; never reached under its experimental protocol)."""
    base = jnp.asarray(np.asarray(val_base_class_features, np.float32))
    cur = np.asarray(image_features_cur, np.float32)
    k_nns = min(k_nns, base.shape[0])
    out = []
    for i in range(0, len(cur), chunk):
        out.append(np.asarray(_knn_chunk(jnp.asarray(cur[i:i + chunk]),
                                         base, k_nns)))
    return np.concatenate(out, axis=0)


def get_val_image_knn_dists(image_features_cur, k_nns: int,
                            chunk: int = 8192) -> np.ndarray:
    """Self-KNN over the val set, excluding each sample itself
    (reference ``proximity.py:49-70``: top k+1 smallest, drop the first)."""
    feats = np.asarray(image_features_cur, np.float32)
    base = jnp.asarray(feats)
    # k+1 neighbors include the sample itself; clamp for tiny val sets
    k_nns = min(k_nns, len(feats) - 1)
    if k_nns < 1:
        # a 1-sample val set has no neighbors at all; a silent clamp to
        # zero columns would propagate NaN proximities into the
        # calibrator fit downstream
        raise ValueError(
            "val set too small for image-KNN proximity: need >= 2 "
            f"samples, got {len(feats)}")
    out = []
    for i in range(0, len(feats), chunk):
        d = np.asarray(_knn_chunk(jnp.asarray(feats[i:i + chunk]), base,
                                  k_nns + 1))
        out.append(d[:, 1:])  # drop self (distance 0)
    return np.concatenate(out, axis=0)


def proximity_from_dists(knndists: np.ndarray) -> np.ndarray:
    """exp(-mean distance to K nearest neighbors)
    (reference ``base_learner.py:136-137``)."""
    return np.exp(-np.mean(np.asarray(knndists), axis=-1))
