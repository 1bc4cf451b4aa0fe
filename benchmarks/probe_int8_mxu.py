"""Does ANY int8 matmul path reach the MXU's double rate on this chip?

Round 3 measured XLA's ``lax.dot_general(int8, int8, int32)`` at
140.5 TOP/s — *slower* than the 163.1 TFLOP/s bf16 path — and parked
the question "revisit if a Mosaic int8 primitive reaches the 2x rate"
(docs/ROOFLINE.md "int8 weights"). This probe answers it: same
chained-dispatch methodology, three contenders at the same shape —

  1. XLA bf16 dot           (the baseline the w8a8 mode must beat)
  2. XLA int8 dot           (the round-3 rejection, re-measured)
  3. Pallas int8 kernel     (ops/pallas_int8_matmul.py, explicit
                             Mosaic lowering, several block configs)

If (3) clears (1) by a real margin, ``ops/quant.qdot`` grows a
kernel-backed w8a8 branch; otherwise the rejection is pinned at the
Mosaic level and weight-only int8 stays the serving recommendation.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/probe_int8_mxu.py [size]

Prints one JSON line per contender.
"""

from __future__ import annotations

import functools
import json
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

N_ITERS = 10
N_TRIALS = 5


def _rate_tops(matmul, make_operands, size: int) -> float:
    """Median tera-ops/s for ``matmul(x, w)`` at [size]^3 (2*M*K*N ops
    per call), chained with a data dependence (tunnel methodology —
    see bench.py)."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(x, w, n):
        def body(carry, _):
            out = matmul(x + carry, w)  # dtype-safe data dependence
            nxt = (out[0, 0].astype(jnp.float32) > 1e30
                   ).astype(x.dtype)
            return carry + nxt, None
        c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None,
                            length=n)
        return c

    x, w = make_operands(size)
    float(jnp.asarray(chained(x, w, N_ITERS), jnp.float32))  # compile
    trials = []
    flops = 2.0 * size ** 3 * N_ITERS
    for _ in range(N_TRIALS):
        t0 = time.perf_counter()
        float(jnp.asarray(chained(x, w, N_ITERS), jnp.float32))
        trials.append(flops / (time.perf_counter() - t0) / 1e12)
    trials.sort()
    return trials[len(trials) // 2]


def main(argv):
    from clip_calibration_tpu.ops.pallas_int8_matmul import int8_matmul
    from clip_calibration_tpu.tools.platform import (
        enable_compilation_cache)

    enable_compilation_cache()
    size = int(argv[1]) if len(argv) > 1 else 4096
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    def int8_operands(s):
        return (jax.random.randint(k1, (s, s), -127, 128, jnp.int8),
                jax.random.randint(k2, (s, s), -127, 128, jnp.int8))

    def bf16_operands(s):
        return (jax.random.normal(k1, (s, s), jnp.bfloat16),
                jax.random.normal(k2, (s, s), jnp.bfloat16))

    rows = [("xla_bf16", lambda x, w: jnp.dot(
        x, w, preferred_element_type=jnp.float32), bf16_operands)]
    rows.append(("xla_int8", lambda x, w: jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32), int8_operands))
    for blocks in ((256, 256, 256), (512, 512, 512), (512, 512, 1024)):
        bm, bn, bk = blocks
        rows.append((f"pallas_int8_{bm}x{bn}x{bk}",
                     functools.partial(int8_matmul, bm=bm, bn=bn,
                                       bk=bk), int8_operands))

    for name, matmul, operands in rows:
        try:
            tops = _rate_tops(matmul, operands, size)
            print(json.dumps({"path": name, "size": size,
                              "tera_ops_per_s": round(tops, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — a Mosaic rejection IS
            # a result worth recording
            print(json.dumps({"path": name, "size": size,
                              "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main(sys.argv)
