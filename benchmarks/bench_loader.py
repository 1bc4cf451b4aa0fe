"""Host input-pipeline benchmark: real JPEG decode at eval geometry.

VERDICT r2 item 5: the prefetch-thread + ThreadPoolExecutor loader
(``data/loader.py``) had only ever fed synthetic fixtures; this measures
whether it can feed the chip at the encode roofline (~3.6k img/s on one
chip, BENCH_r02) from ON-DISK JPEGs through the real PIL decode +
eval/train transforms.

Writes a fixture of ``--n`` JPEGs at ``--src`` px (ImageNet-ish source
resolution), then drains a real ``DataLoader`` and reports images/s for
each (workers, transform, draft) combination as JSON lines:

    python benchmarks/bench_loader.py --n 512 --workers 1,2,4,8

Run on the machine that hosts the training job — throughput scales with
host cores (PIL releases the GIL in both the JPEG decoder and the
resample kernel, so threads scale until memory bandwidth). The
``draft`` rows measure DATALOADER.JPEG_DRAFT (libjpeg decode-time
downscaling — decodes at reduced DCT scale, both dims kept >= the
target, opt-in because pixel values differ slightly from a full
decode).
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import tempfile
import time

import numpy as np
from PIL import Image


def make_fixture(root: str, n: int, src: int, seed: int = 0):
    """n JPEGs at src x ~0.75*src px, photographic-ish content (smooth
    gradients + noise) so the JPEG entropy decode does real work."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    h = int(src * 0.75)
    yy, xx = np.mgrid[0:h, 0:src].astype(np.float32)
    for i in range(n):
        path = osp.join(root, f"img_{i:05d}.jpg")
        paths.append(path)
        if osp.exists(path):
            continue
        fx, fy = rng.uniform(0.5, 4, 2)
        base = (np.sin(xx / src * fx * np.pi * 2)[..., None]
                * np.cos(yy / h * fy * np.pi * 2)[..., None]
                * rng.uniform(40, 90) + 128)
        img = base + rng.normal(0, 18, (h, src, 3))
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            path, quality=85)
    return paths


def bench_loader(paths, res, workers, train, draft, batch_size=64,
                 min_seconds=4.0, cache_mb=0):
    from clip_calibration_tpu.config import get_cfg_default
    from clip_calibration_tpu.data.base import Datum
    from clip_calibration_tpu.data.loader import DataLoader
    from clip_calibration_tpu.data.transforms import build_transform

    cfg = get_cfg_default()
    cfg.INPUT.SIZE = (res, res)
    cfg.INPUT.INTERPOLATION = "bicubic"
    cfg.INPUT.TRANSFORMS = ("random_resized_crop", "random_flip",
                            "normalize")
    tfm = build_transform(cfg, is_train=train)
    data = [Datum(impath=p, label=0, classname="x") for p in paths]
    loader = DataLoader(data, batch_size, tfm, is_train=train,
                        num_workers=workers, pad_partial=False,
                        draft_size=res if draft else 0,
                        cache_mb=cache_mb)

    if cache_mb:
        # DECODE_CACHE_MB amortizes decode across EPOCHS — measure the
        # steady state the 200-epoch protocol actually runs in: one
        # full warm epoch (fills the cache), then time warm epochs
        for _ in loader:
            pass
        loader.set_epoch(loader.epoch + 1)
    else:
        # warm (page cache + pool spin-up)
        next(iter(loader))
    n_img, start = 0, time.perf_counter()
    while time.perf_counter() - start < min_seconds:
        for batch in loader:
            n_img += batch["img"].shape[0]
        loader.set_epoch(loader.epoch + 1)
    return n_img / (time.perf_counter() - start)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--src", type=int, default=500,
                    help="source JPEG width (ImageNet mean ~470px)")
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--workers", default="1,2,4,8")
    ap.add_argument("--fixture", default=None,
                    help="keep/reuse fixture dir (default: temp)")
    ap.add_argument("--target", type=float, default=3654.0,
                    help="encode roofline img/s to compare against")
    args = ap.parse_args()

    root = args.fixture or osp.join(tempfile.gettempdir(),
                                    f"ccl_loader_bench_{args.src}")
    paths = make_fixture(root, args.n, args.src)
    ncpu = os.cpu_count()
    results = []
    for workers in [int(w) for w in args.workers.split(",")]:
        # (train?, draft?, cache_mb) — the cache row is the train-loader
        # steady state of the 200-epoch few-shot protocol
        for train, draft, cache_mb in ((False, False, 0), (False, True, 0),
                                       (True, False, 0), (True, True, 0),
                                       (True, False, 2048)):
            rate = bench_loader(paths, args.res, workers, train, draft,
                                cache_mb=cache_mb)
            row = {
                "metric": "loader_images_per_s",
                "value": round(rate, 1),
                "unit": "img/s",
                "workers": workers,
                "host_cpus": ncpu,
                "transform": "train" if train else "eval",
                "jpeg_draft": draft,
                "decode_cache_mb": cache_mb,
                "src_px": args.src,
                "res": args.res,
                "vs_encode_roofline": round(rate / args.target, 3),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    best = max(r["value"] for r in results)
    print(json.dumps({
        "metric": "loader_best_images_per_s", "value": best,
        "unit": "img/s", "host_cpus": ncpu,
        "cores_needed_for_roofline": round(
            args.target / (best / max(1, ncpu)), 1),
    }))


if __name__ == "__main__":
    main()
