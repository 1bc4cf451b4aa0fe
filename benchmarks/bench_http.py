"""Serving-under-concurrency: the dynamic micro-batching win.

Two measurements per mode (``batched`` = 8 ms coalescing budget,
``unbatched`` = 0 ms, i.e. batches are whatever is already queued —
usually 1):

1. **direct**: N concurrent threads submitting single images straight
   into ``DynamicBatcher`` -> ``Predictor.predict``. This times the
   device-bound serving path the batcher exists for — coalesced
   requests should approach the raw batch-encode rate instead of N
   single-image dispatches. The headline number.
2. **http**: the same load end-to-end over real HTTP on localhost
   (PIL decode + eval geometry + batcher + encode + JSON). On a
   many-core serving host this tracks (1); on a 1-vCPU dev box the
   GIL-shared HTTP handling dominates and the number is a sanity
   check, not a batching measurement.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_http.py \
      [backbone] [n_clients] [requests_per_client]

Prints one JSON line per (mode, measurement).
"""

from __future__ import annotations

import io
import json
import sys
import threading
import time
import urllib.request

import numpy as np

import os.path as osp

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

PROBE_CLASSES = [f"class {i}" for i in range(100)]


def _image_blobs(resolution: int, n: int = 16) -> list:
    from PIL import Image

    rng = np.random.default_rng(3)
    blobs = []
    for _ in range(n):
        arr = rng.integers(0, 256, (resolution, resolution, 3),
                           dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        blobs.append(buf.getvalue())
    return blobs


def _run_load(url: str, blobs, n_clients: int, per_client: int):
    errs = []

    def client(i):
        for r in range(per_client):
            req = urllib.request.Request(
                url + "/predict", data=blobs[(i + r) % len(blobs)],
                headers={"Content-Type": "image/png"}, method="POST")
            # one retry: the stdlib server's listen backlog drops
            # connections under a many-client burst on a 1-vCPU host
            # (the HTTP rows are host-bound sanity checks — see module
            # docstring — so a retried connect is load, not cheating)
            for attempt in (0, 1):
                try:
                    with urllib.request.urlopen(req, timeout=300) as resp:
                        resp.read()
                    break
                except Exception as e:  # noqa: BLE001 — reported below
                    if attempt:
                        errs.append(repr(e))
                        return
                    time.sleep(0.05 * (i % 8))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    if errs:
        raise RuntimeError(f"{len(errs)} client errors, first: {errs[0]}")
    return n_clients * per_client / dt


def _run_direct(pred, resolution: int, n_clients: int,
                per_client: int, max_wait_ms: float):
    """The batcher -> predictor path under concurrency, no HTTP.

    Returns (requests/s, mean coalesced batch, p50 ms, p95 ms) — the
    per-request latency is submit-to-result, i.e. it includes the
    coalescing wait, so ``batched`` trades ~max_wait_ms of p50 for the
    throughput win. Requests rotate over a 16-image pool so coalesced
    device batches are (virtually) never byte-identical — the remote
    tunnel elides repeated identical dispatches (CLAUDE.md)."""
    from clip_calibration_tpu.http_server import DynamicBatcher

    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, (resolution, resolution, 3),
                         dtype=np.uint8) for _ in range(16)]
    b = DynamicBatcher(pred.predict, pred.batch_size,
                       max_wait_ms=max_wait_ms)
    lat_lock = threading.Lock()
    lats = []
    try:
        def client(i, n, record=True):
            for r in range(n):
                t0 = time.perf_counter()
                b.submit(imgs[(i + r) % len(imgs)]).result(timeout=300)
                if record:
                    with lat_lock:
                        lats.append(time.perf_counter() - t0)

        client(0, 2, record=False)  # compile + warmup
        skip = len(b.snapshot_sizes())  # drop ALL warmup batches
        threads = [threading.Thread(target=client, args=(i, per_client))
                   for i in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        sizes = b.snapshot_sizes()[skip:]
        return (n_clients * per_client / dt,
                round(float(np.mean(sizes)), 2) if sizes else None,
                round(float(np.percentile(lats, 50)) * 1e3, 1),
                round(float(np.percentile(lats, 95)) * 1e3, 1))
    finally:
        b.close()


def main(argv):
    from clip_calibration_tpu.config import get_cfg_default
    from clip_calibration_tpu.data.transforms import build_transform
    from clip_calibration_tpu.http_server import serve_http
    from clip_calibration_tpu.serving import Predictor
    from clip_calibration_tpu.tools.platform import (
        enable_compilation_cache)

    enable_compilation_cache()
    backbone = argv[1] if len(argv) > 1 and not argv[1].isdigit() \
        else "ViT-B/16"
    nums = [int(a) for a in argv[1:] if a.isdigit()]
    n_clients = nums[0] if nums else 32
    per_client = nums[1] if len(nums) > 1 else 8
    batch_size = min(64, max(8, n_clients))

    pred = Predictor(backbone, PROBE_CLASSES, batch_size=batch_size)
    res = pred.cfg.image_resolution
    # pre-warm EVERY power-of-two bucket OUTSIDE the batcher: a cold
    # compile (~100 s for ViT-B/16 b1 over the tunnel) inside the
    # timed loop would dominate p95 and could trip the per-request
    # future timeout (serve.py --http warms the extremes; a benchmark
    # must not time any compile)
    b = 1
    while b <= batch_size:
        pred.predict(np.zeros((b, res, res, 3), np.uint8))
        b *= 2
    pred.predict(np.zeros((batch_size, res, res, 3), np.uint8))
    cfg = get_cfg_default()
    cfg.INPUT.INTERPOLATION = "bicubic"
    cfg.INPUT.SIZE = (res, res)
    transform = build_transform(cfg, is_train=False)
    blobs = _image_blobs(res)

    for max_wait_ms, label in ((8.0, "batched"), (0.0, "unbatched")):
        rate, mean_batch, p50, p95 = _run_direct(
            pred, res, n_clients, per_client, max_wait_ms)
        print(json.dumps({
            "backbone": backbone, "mode": label,
            "measurement": "direct",
            "n_clients": n_clients,
            "requests_per_client": per_client,
            "batch_size": batch_size, "max_wait_ms": max_wait_ms,
            "requests_per_s": round(rate, 1),
            "mean_batch": mean_batch,
            "p50_ms": p50, "p95_ms": p95,
        }), flush=True)

        srv = serve_http(":0", pred, PROBE_CLASSES, transform,
                         max_wait_ms=max_wait_ms, backbone=backbone)
        host, port = srv.server_address[:2]
        url = f"http://{host}:{port}"
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            _run_load(url, blobs, 4, 2)  # warmup: compile + cache
            skip = len(srv.batcher.snapshot_sizes())
            rate = _run_load(url, blobs, n_clients, per_client)
            sizes = srv.batcher.snapshot_sizes()[skip:]
            print(json.dumps({
                "backbone": backbone, "mode": label,
                "measurement": "http",
                "n_clients": n_clients,
                "requests_per_client": per_client,
                "batch_size": batch_size,
                "max_wait_ms": max_wait_ms,
                "requests_per_s": round(rate, 1),
                "mean_batch": round(float(np.mean(sizes)), 2)
                if len(sizes) else None,
            }), flush=True)
        finally:
            srv.shutdown()
            srv.server_close()
            t.join(timeout=10)


if __name__ == "__main__":
    main(sys.argv)
