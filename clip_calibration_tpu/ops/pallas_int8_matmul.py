"""Pallas int8 x int8 -> int32 tiled matmul (MXU double-rate probe).

The v5e datasheet advertises 394 int8 TOPS vs 197 bf16 TFLOP/s.
Round 3 believed XLA's ``lax.dot_general(int8, int8, int32)`` missed
that rate and built this kernel to ask one level down; the round-4
probe fix (``benchmarks/probe_int8_mxu.py`` — the round-3 measurement
was strength-reduced away by XLA's dot+slice simplifier) shows XLA's
int8 dot DOES engage the double rate (1.6-2.2x bf16 at the serving
GEMM shapes, docs/ROOFLINE.md "int8 weights") while this kernel tops
out at ~272 TOP/s on square shapes and falls behind at skinny-K
serving shapes. So ``qdot``'s default w8a8 backend is XLA's own int8
dot; this kernel remains as the opt-in ``w8a8_kernel`` mode and the
probe's third contender — the measured Mosaic reference point for
future block-config work.

Standard K-innermost accumulation grid (guide: "Patterns: Quantization
Kernels" + matmul skeleton): grid (M/bm, N/bn, K/bk), int32
accumulator tile resident in VMEM across the K sweep, output written
on the last K step. int8 tiles are (32, 128)-aligned; the wrapper
zero-pads every dim to its block multiple (zeros contribute nothing to
the dot). The per-row / per-column fp32 rescale of the w8a8 scheme
stays OUTSIDE the kernel (XLA fuses the elementwise epilogue; output
traffic is negligible next to the operand reads at serving shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _matmul_kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(x_ref[...], w_ref[...],
                            preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...]


def _pad_to(a: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    rem = a.shape[axis] % mult
    if rem == 0:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, mult - rem)
    return jnp.pad(a, pad)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk",
                                             "interpret"))
def int8_matmul(x: jnp.ndarray, w: jnp.ndarray, bm: int = 256,
                bn: int = 256, bk: int = 256,
                interpret: bool = False) -> jnp.ndarray:
    """``x [M, K] int8 @ w [K, N] int8 -> [M, N] int32`` (exact).

    Block sizes default to 256 (int8 tile constraints are (32, 128);
    256 fills the MXU's 128-wide contraction twice per pass and keeps
    the three resident tiles at 64-256 KB of VMEM). Inputs are
    zero-padded to block multiples and the result sliced back.
    """
    if x.dtype != jnp.int8 or w.dtype != jnp.int8:
        raise TypeError(f"int8_matmul needs int8 operands, got "
                        f"{x.dtype} @ {w.dtype}")
    M, K = x.shape
    K2, N = w.shape
    if K != K2:
        raise ValueError(f"contraction mismatch: {x.shape} @ {w.shape}")
    # shrink blocks for small problems but NEVER below Mosaic tile
    # alignment (int8 sublane 32 / lane 128; bk is a lane dim of x and
    # a sublane dim of w -> 128) — a ragged block like (33, 70) would
    # fail to lower on the chip even though interpret mode accepts it
    bm = min(bm, -(-M // 32) * 32)
    bn = min(bn, -(-N // 128) * 128)
    bk = min(bk, -(-K // 128) * 128)
    xp = _pad_to(_pad_to(x, 0, bm), 1, bk)
    wp = _pad_to(_pad_to(w, 0, bk), 1, bn)
    Mp, Kp = xp.shape
    Np = wp.shape[1]
    n_k = Kp // bk
    out = pl.pallas_call(
        functools.partial(_matmul_kernel, n_k=n_k),
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.int32),
        scratch_shapes=[pltpu_vmem((bm, bn), jnp.int32)],
        interpret=interpret,
    )(xp, wp)
    return out[:M, :N]


def pltpu_vmem(shape, dtype):
    """VMEM scratch spec (factored so interpret mode works off-TPU)."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.VMEM(shape, dtype)


def w8a8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                bm: int = 256, bn: int = 256, bk: int = 256,
                interpret: bool = False) -> jnp.ndarray:
    """Kernel-backed w8a8 ``x @ dequant(w)``: dynamic per-row activation
    quantization (exactly ``ops/quant.quantize_activations_int8``) +
    the int8 kernel + the fused fp32 rescale epilogue. Drop-in for the
    2D-weight ``qdot`` w8a8 branch; returns ``x.dtype``.
    """
    from .quant import quantize_activations_int8

    xq, xs = quantize_activations_int8(x)
    lead = xq.shape[:-1]
    acc = int8_matmul(xq.reshape(-1, xq.shape[-1]), w_q,
                      bm=bm, bn=bn, bk=bk, interpret=interpret)
    acc = acc.reshape(*lead, w_q.shape[-1])
    return (acc.astype(jnp.float32) * xs
            * w_scale.reshape(w_scale.shape[-1])).astype(x.dtype)
