"""Does ANY int8 matmul path reach the MXU's double rate on this chip?

Answer (round 4, after fixing this probe's methodology — see
``_rate_tops``): **yes, XLA's own int8 dot does** — 1.6-2.2x bf16 at
both 4096^3 and the exact batch-256 ViT-B/16 serving GEMM shapes.
Round 3's contrary measurement ("140.5 TOP/s int8 vs 163.1 bf16",
since retracted in docs/ROOFLINE.md "int8 weights") came from a probe
whose matmul was strength-reduced to a vector-dot and whose trials the
tunnel elided. Three contenders, square + serving shapes:

  1. XLA bf16 dot           (the baseline the w8a8 mode must beat)
  2. XLA int8 dot           (the w8a8 ``qdot`` backend)
  3. Pallas int8 kernel     (ops/pallas_int8_matmul.py, explicit
                             Mosaic lowering, several block configs —
                             measured below XLA int8 everywhere, kept
                             as the Mosaic reference point)

The remaining end-to-end question — why the full w8a8 tower measures
<1x despite double-rate GEMMs — is ``probe_w8a8_decompose.py``'s job.

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

N_SHORT = 10
N_LONG = 40
N_TRIALS = 5


def _rate_tops(matmul, make_operands, size: int) -> float:
    """Median tera-ops/s for ``matmul(x, w)`` at [size]^3 (2*M*K*N ops
    per call).

    Three methodology rules, each load-bearing on the tunneled chip
    (the first version of this probe broke all three and reported an
    impossible >2x-peak bf16 "rate"):

    1. Consume the FULL output (``sum(out)`` folded into the fetched
       scalar), never a slice: a ``dot`` whose only consumer is
       ``out[0, 0]`` is strength-reduced by XLA's algebraic simplifier
       into a sliced dot, so the timed program computes a vector-dot,
       not the matmul.
    2. Perturb the operands per trial (traced ``t`` argument): the
       remote-TPU tunnel elides repeated identical dispatches
       (CLAUDE.md trap), so re-timing the same args measures nothing.
    3. Time the DIFFERENCE between two chain lengths: at [4096]^3 the
       ~30 ms per-dispatch tunnel RTT is ~3x the compute of a 10-iter
       chain, so absolute chain timings are RTT-bound; the n_long -
       n_short delta cancels the constant per-dispatch cost.

    Two known biases, both conservative to the int8/bf16 RATIOS this
    probe exists for but visible in the ABSOLUTE rows: (a) rule 1's
    full-output sum is an M*N fp32 reduction per iteration counted as
    zero ops, deflating reported TOP/s (same tax on every contender at
    a given shape, so ratios cancel); (b) the delta>0 filter drops
    noise-dominated trials asymmetrically, so when RTT noise is
    comparable to the chain-length delta the surviving median can skew
    high. Treat absolute rows vs datasheet peaks as +-15%
    (docs/ROOFLINE.md does); trust the ratios.
    """

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(x, w, t, n):
        def body(carry, _):
            pert, acc = carry
            out = matmul(x + pert, w)  # dtype-safe data dependence
            s = jnp.sum(out.astype(jnp.float32))
            nxt = (s > 1e30).astype(x.dtype)
            return (pert + nxt, acc + s), None
        (_, acc), _ = jax.lax.scan(
            body, (t, jnp.zeros((), jnp.float32)), None, length=n)
        return acc

    M, K, N = size if isinstance(size, tuple) else (size,) * 3
    x, w = make_operands((M, K, N))

    def run(t, n):
        return float(jnp.asarray(chained(x, w, t, n), jnp.float32))

    t0v = jnp.ones((), x.dtype)
    run(t0v, N_SHORT)  # compile both chain lengths before timing
    run(t0v, N_LONG)
    trials = []
    flops = 2.0 * M * K * N * (N_LONG - N_SHORT)
    for i in range(N_TRIALS):
        t = jnp.asarray(2 + i, x.dtype)  # new operand value per trial
        t0 = time.perf_counter()
        run(t, N_SHORT)
        t1 = time.perf_counter()
        run(t, N_LONG)
        t2 = time.perf_counter()
        delta = (t2 - t1) - (t1 - t0)
        if delta > 0:
            trials.append(flops / delta / 1e12)
    if not trials:
        raise RuntimeError("all trials RTT-noise-dominated")
    trials.sort()
    return trials[len(trials) // 2]


def main(argv):
    from clip_calibration_tpu.ops.pallas_int8_matmul import int8_matmul
    from clip_calibration_tpu.tools.platform import (
        enable_compilation_cache)

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    def int8_operands(mkn):
        M, K, N = mkn
        return (jax.random.randint(k1, (M, K), -127, 128, jnp.int8),
                jax.random.randint(k2, (K, N), -127, 128, jnp.int8))

    def bf16_operands(mkn):
        M, K, N = mkn
        return (jax.random.normal(k1, (M, K), jnp.bfloat16),
                jax.random.normal(k2, (K, N), jnp.bfloat16))

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

    if len(argv) > 1 and argv[1] == "text":
        # the eval-time text fan-out GEMMs (TRAINER.QUANT_EVAL_TEXT):
        # M = packed token rows of a CoCoOp eval chunk (~2048 prompt
        # rows x ~8 truncated tokens), K/N from the ViT-B/16 text cfg
        # (width 512, qkv 1536, mlp 2048). NOTE: compute per iteration
        # is ~25x smaller than at the serving shapes, so the default
        # 10/40 chain lengths are RTT-noise-dominated here — bump them
        # (measured with 100/500: int8/bf16 = 1.56/1.35/1.58/1.86,
        # docs/ROOFLINE.md "Quantized text fan-out")
        global N_SHORT, N_LONG
        N_SHORT, N_LONG = 100, 500
        sizes = [(16384, 512, 1536), (16384, 512, 512),
                 (16384, 512, 2048), (16384, 2048, 512)]
    elif len(argv) > 1:
        sizes = [int(argv[1])]
    else:
        # the square headline shape + the exact per-layer GEMMs of the
        # batch-256 ViT-B/16 serving forward (M = 256 rows x 208 padded
        # tokens; K/N from models/clip.py qkv, out-proj, both MLP mats)
        # — where the w8a8 end-to-end number is actually earned
        sizes = [4096,
                 (53248, 768, 2304), (53248, 768, 768),
                 (53248, 768, 3072), (53248, 3072, 768)]
    for size in sizes:
        shape_rows = rows if isinstance(size, int) else [
            r for r in rows if "256x256x256" not in r[0]
            and "512x512x1024" not in r[0]]  # keep serving sweep short
        for name, matmul, operands in shape_rows:
            try:
                tops = _rate_tops(matmul, operands, size)
                print(json.dumps({"path": name, "size": size,
                                  "tera_ops_per_s": round(tops, 1)}),
                      flush=True)
            except Exception as e:  # noqa: BLE001 — a Mosaic rejection
                # IS a result worth recording
                print(json.dumps({"path": name, "size": size,
                                  "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main(sys.argv)
