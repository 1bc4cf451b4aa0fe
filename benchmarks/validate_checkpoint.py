"""Real-checkpoint acceptance battery: scripted go/no-go for deploying
a CLIP checkpoint on this framework.

Every accuracy/agreement number in the committed docs is measured on
seeded-random or fixture weights (no real CLIP checkpoint exists in
the build environment). This script is the first-user runbook: point
``CLIP_CHECKPOINT_DIR`` at a directory of real weights (the torch
``.pt`` files the reference's ``clip/clip.py:42-71`` downloads, or
exported ``.npz`` — ``models/backbone.py`` resolves both) and run

  PYTHONPATH=/root/repo:/root/.axon_site \
      python benchmarks/validate_checkpoint.py "ViT-B/16"

It drives, in order (one PASS/FAIL line each, non-zero exit on any
FAIL):

1. **load + build**: weight resolution, shape inference, param count.
2. **encode parity**: bf16-vs-fp32 feature cosine on a probe batch
   (gate >= 0.995 — the bf16-with-fp32-islands policy must not
   distort real towers), unit feature norms, determinism across two
   dispatches.
3. **metric smoke**: a zero-shot predict over the 64-word probe set,
   confidence/ECE/MCE computed through ``tools/metrics.py`` (gates the
   metric path end-to-end on real-weight outputs; values are printed,
   not gated — noise images have no ground truth).
4. **quantization agreement**: ``bench_quant._agreement_report`` on
   the loaded weights — int8 / dynamic w8a8 / static-calibrated w8a8
   vs bf16 (gates: top-1 agreement >= 0.95, mean feature cosine >=
   0.99; real towers carry activation outliers fixtures don't, which
   is exactly why this must run per checkpoint before serving it
   quantized).
5. **serving smoke**: ``serving.Predictor`` single + ragged batch, and
   one HTTP round-trip through ``http_server`` on an ephemeral port.

Pass extra image files/dirs as ``--images <path>`` to run steps 3-4 on
real data instead of uniform noise (recommended when the agreement
gate is borderline).

No reference counterpart: the reference's only validation story is
rerunning ``train.py --eval-only`` against a dataset directory.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

_FAILURES = []


def _check(name: str, ok: bool, detail: str) -> None:
    print(f"[{'PASS' if ok else 'FAIL'}] {name}: {detail}", flush=True)
    if not ok:
        _FAILURES.append(name)


def _eval_geometry(resolution: int):
    """Shorter-side BICUBIC + center crop, the geometry of every
    shipped trainer yaml and of the reference CLIP eval pipeline
    (reference ``clip/clip.py:74-81``; mirrors serve._host_transform)."""
    from clip_calibration_tpu.config import get_cfg_default
    from clip_calibration_tpu.data.transforms import build_transform

    cfg = get_cfg_default()
    cfg.INPUT.INTERPOLATION = "bicubic"
    cfg.INPUT.SIZE = (resolution, resolution)
    return build_transform(cfg, is_train=False)


def _load_images(specs, resolution: int, n_default: int = 64):
    """Real images via PIL eval geometry, or uniform noise."""
    import jax

    if specs:
        from PIL import Image

        paths = []
        import os
        for spec in specs:
            if osp.isdir(spec):
                paths += [osp.join(spec, n) for n in sorted(os.listdir(spec))
                          if n.lower().endswith((".jpg", ".jpeg", ".png",
                                                 ".bmp", ".webp"))]
            else:
                paths.append(spec)
        geo = _eval_geometry(resolution)
        return np.stack([np.asarray(geo(Image.open(p).convert("RGB")),
                                    np.uint8) for p in paths])
    import jax.numpy as jnp  # noqa: F401 (device selected before use)
    key = jax.random.PRNGKey(7)
    return np.asarray(
        (jax.random.uniform(key, (n_default, resolution, resolution, 3))
         * 255)).astype(np.uint8)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("backbone", nargs="?", default="ViT-B/16")
    ap.add_argument("--images", action="append", default=None,
                    help="image file/dir for the probe batches "
                         "(repeatable); uniform noise otherwise")
    args = ap.parse_args(argv)

    from clip_calibration_tpu.tools.platform import (
        cpu_platform_requested, enable_compilation_cache,
        force_cpu_platform)
    enable_compilation_cache()
    if cpu_platform_requested():
        # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor a
        # CPU request via the shared workaround (tools/platform.py) so a
        # dev-box battery run cannot grab a TPU tunnel another process
        # owns
        force_cpu_platform()

    import jax
    import jax.numpy as jnp

    from clip_calibration_tpu.models import clip as M
    from clip_calibration_tpu.models.backbone import load_clip_backbone
    from clip_calibration_tpu.ops.preprocess import normalize_images

    # -- 1. load + build ----------------------------------------------------
    try:
        params, cfg = load_clip_backbone(args.backbone, "float32")
        n_params = sum(int(np.prod(x.shape))
                       for x in jax.tree.leaves(params))
        _check("load", True,
               f"{args.backbone}: {n_params / 1e6:.1f}M params, "
               f"res {cfg.image_resolution}, "
               f"{'ViT' if cfg.is_vit else 'ResNet'}")
    except Exception as e:  # noqa: BLE001 — runbook must report, not crash
        _check("load", False, repr(e))
        print("NO-GO (set CLIP_CHECKPOINT_DIR to the weights directory)")
        return 1

    images = _load_images(args.images, cfg.image_resolution)
    x = normalize_images(jnp.asarray(images[:16]))

    # -- 2. encode parity ---------------------------------------------------
    f32 = np.asarray(M.normalize(jax.jit(
        lambda p, x: M.encode_image(p, cfg, x, dtype=jnp.float32)
    )(params, x)))
    fbf = np.asarray(M.normalize(jax.jit(
        lambda p, x: M.encode_image(p, cfg, x, dtype=jnp.bfloat16)
    )(params, x)).astype(jnp.float32))
    cos = float((f32 * fbf).sum(-1).min())
    _check("encode_bf16_parity", cos >= 0.995,
           f"min bf16-vs-fp32 feature cosine {cos:.5f} (gate 0.995)")
    norms = np.linalg.norm(f32, axis=-1)
    _check("feature_norms", bool(np.allclose(norms, 1.0, atol=1e-4)),
           f"unit norms max|1-n|={float(abs(1 - norms).max()):.2e}")
    f32b = np.asarray(M.normalize(jax.jit(
        lambda p, x: M.encode_image(p, cfg, x, dtype=jnp.float32)
    )(params, x)))
    _check("determinism", bool((f32 == f32b).all()),
           "two dispatches bit-identical")

    # -- 3. metric smoke ----------------------------------------------------
    try:
        sys.path.insert(0, osp.join(REPO, "benchmarks"))
        from bench_quant import _PROBE_WORDS

        from clip_calibration_tpu.models.tokenizer import tokenize
        from clip_calibration_tpu.tools.metrics import ECE, MCE

        toks = jnp.asarray(tokenize(
            [f"a photo of a {w}." for w in _PROBE_WORDS],
            context_length=cfg.context_length))
        txt = M.normalize(M.encode_text(params, cfg, toks,
                                        dtype=jnp.float32))
        probs = np.asarray(jax.nn.softmax(
            100.0 * jnp.asarray(f32) @ txt.T, axis=-1))
        pred = probs.argmax(-1)
        conf = probs.max(-1)
        ece = ECE(conf, pred, pred, conf_bin_num=10)  # vs self: floor
        mce = MCE(conf, pred, pred, conf_bin_num=10)
        _check("metric_smoke", bool(np.isfinite([ece, mce]).all()),
               f"zero-shot probs ok (mean conf {conf.mean():.3f}, "
               f"self-ECE {ece:.4f}, self-MCE {mce:.4f})")
    except Exception as e:  # noqa: BLE001
        _check("metric_smoke", False, repr(e))

    # -- 4. quantization agreement ------------------------------------------
    try:
        from bench_quant import _agreement_report

        from clip_calibration_tpu.ops.quant import (
            attach_act_scales, calibrate_image_act_scales,
            quantize_clip_params)
        qparams = quantize_clip_params(params)
        cal = normalize_images(jnp.asarray(images[:32]))
        sparams = attach_act_scales(
            qparams, calibrate_image_act_scales(qparams, cfg, cal))
        rep = _agreement_report(params, qparams, sparams, cfg,
                                batch=min(64, len(images)))
        print(json.dumps({"agreement_vs_bf16": rep}), flush=True)
        for mode in ("int8", "w8a8", "w8a8_static"):
            r = rep[mode]
            ok = (r["top1_agreement"] >= 0.95
                  and r["mean_feature_cosine"] >= 0.99)
            _check(f"quant_agreement_{mode}", ok,
                   f"top1 {r['top1_agreement']:.3f} (gate 0.95), "
                   f"cosine {r['mean_feature_cosine']:.4f} (gate 0.99)")
    except Exception as e:  # noqa: BLE001
        _check("quant_agreement", False, repr(e))

    # -- 5. serving smoke ---------------------------------------------------
    try:
        from clip_calibration_tpu.serving import Predictor

        pred = Predictor(args.backbone, _PROBE_WORDS[:8], batch_size=8)
        one = pred.predict(images[:1])
        ragged = pred.predict(images[:11])
        ok = (one["probs"].shape == (1, 8)
              and ragged["probs"].shape == (11, 8)
              and np.isfinite(ragged["probs"]).all())
        _check("predictor_smoke", ok,
               f"single + ragged batch ok (top-1 '{_PROBE_WORDS[:8][int(one['preds'][0])]}')")

        import io
        import threading
        import urllib.request

        from PIL import Image

        from clip_calibration_tpu.http_server import serve_http

        server = serve_http("localhost:0", pred, _PROBE_WORDS[:8],
                            _eval_geometry(cfg.image_resolution))
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            host, port = server.server_address[:2]
            buf = io.BytesIO()
            Image.fromarray(images[0]).save(buf, format="PNG")
            req = urllib.request.Request(
                f"http://{host}:{port}/predict", data=buf.getvalue(),
                headers={"Content-Type": "image/png"})
            # raw-bytes POST returns the single row; JSON-batch POSTs
            # return {"predictions": [...]} (http_server.py)
            hit = json.loads(urllib.request.urlopen(
                req, timeout=60).read())
            _check("http_smoke", "pred" in hit or "class" in hit,
                   f"POST /predict -> {json.dumps(hit)[:120]}")
        finally:
            server.shutdown()
            server.server_close()
    except Exception as e:  # noqa: BLE001
        _check("serving_smoke", False, repr(e))

    if _FAILURES:
        print(f"NO-GO: {len(_FAILURES)} gate(s) failed: "
              f"{', '.join(_FAILURES)}")
        return 1
    print("GO: all acceptance gates passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
