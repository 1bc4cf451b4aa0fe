"""Pallas int8 matmul kernel (ops/pallas_int8_matmul.py).

Interpret-mode gates (the real-TPU rate measurement lives in
``benchmarks/probe_int8_mxu.py``): int8 x int8 -> int32 must be EXACT
(integer arithmetic — any deviation is a kernel indexing bug), and the
kernel-backed w8a8 wrapper must match ``ops/quant.qdot``'s w8a8 branch
bit-for-bit, since it is a candidate drop-in backend for it.
"""

import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.parametrize("shape", [
    (256, 768, 512),    # block-divisible
    (100, 768, 2304),   # M needs padding (serving row counts)
    (33, 70, 129),      # every dim ragged
    (8, 8, 8),          # smaller than one block
])
def test_int8_matmul_exact(shape):
    import jax.numpy as jnp

    from clip_calibration_tpu.ops.pallas_int8_matmul import int8_matmul

    M, K, N = shape
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, (M, K), dtype=np.int8)
    w = rng.integers(-127, 128, (K, N), dtype=np.int8)
    out = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w),
                                 interpret=True))
    ref = x.astype(np.int64) @ w.astype(np.int64)
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, ref)


def test_int8_matmul_rejects_non_int8():
    import jax.numpy as jnp

    from clip_calibration_tpu.ops.pallas_int8_matmul import int8_matmul

    with pytest.raises(TypeError, match="int8"):
        int8_matmul(jnp.zeros((8, 8), jnp.float32),
                    jnp.zeros((8, 8), jnp.int8), interpret=True)


@pytest.mark.parametrize("lead", [(64,), (4, 16)])
def test_w8a8_matmul_matches_qdot(lead):
    """Kernel-backed w8a8 == qdot w8a8 (same activation quantization,
    same rescale) including batched leading dims."""
    import jax.numpy as jnp

    from clip_calibration_tpu.ops.pallas_int8_matmul import w8a8_matmul
    from clip_calibration_tpu.ops.quant import qdot, quantize_int8

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(*lead, 96)).astype(np.float32))
    wq = quantize_int8(jnp.asarray(
        rng.normal(size=(96, 80)).astype(np.float32)))
    ours = w8a8_matmul(x, wq["int8"], wq["scale"], interpret=True)
    ref = qdot(x, wq, qmode="w8a8")
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))
