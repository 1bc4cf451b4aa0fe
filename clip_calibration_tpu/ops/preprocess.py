"""Device-side image preprocessing.

Batches arrive as uint8 [B, H, W, 3]; scaling to [0,1] and CLIP mean/std
normalization happen inside the jit'd step so XLA fuses them into the
first patchify matmul's input pipeline (reference does this on host per
image in torchvision, ``clip/clip.py:74-81``).
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenAI CLIP normalization constants (``clip/clip.py:79``)
CLIP_PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_images(images: jnp.ndarray,
                     mean=CLIP_PIXEL_MEAN,
                     std=CLIP_PIXEL_STD,
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 (or float [0,1]) NHWC -> normalized compute-dtype NHWC.

    ``mean=None`` skips the mean/std step (Dassl's pipeline without
    "normalize" in ``INPUT.TRANSFORMS`` is ToTensor only: just /255)."""
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    if mean is None:
        return x.astype(dtype)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def device_preprocess(images: jnp.ndarray, size: int,
                      mean=CLIP_PIXEL_MEAN, std=CLIP_PIXEL_STD,
                      dtype=jnp.bfloat16,
                      method: str = "bicubic") -> jnp.ndarray:
    """Full test-time preprocessing as jax ops (BASELINE.json north
    star): uint8 [B, H, W, 3] at any uniform source size -> normalized
    [B, size, size, 3] compute-dtype, fused by XLA into the encode.

    Mirrors the host test pipeline (``data/transforms.py``: torchvision
    shorter-side resize with int-truncated long side, then center crop
    — the geometry of ``clip/clip.py:74-81``), with ``jax.image.resize``
    (antialiased Keys cubic) standing in for PIL's resampler; the two
    interpolators differ by ~1/255 per pixel on natural images. Source
    H/W are static under jit: each distinct input resolution compiles
    once (serve uniform-size batches).
    """
    import jax

    b, h, w, c = images.shape
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    if (h, w) != (size, size):
        # shorter side -> size, long side int-truncated
        # (data/transforms._resize_shorter)
        if w <= h:
            nw, nh = size, max(1, int(h * size / w))
        else:
            nw, nh = max(1, int(w * size / h)), size
        x = jax.image.resize(x, (b, nh, nw, c), method=method,
                             antialias=True)
        # center crop (data/transforms._center_crop)
        left = int(round((nw - size) / 2.0))
        top = int(round((nh - size) / 2.0))
        x = x[:, top:top + size, left:left + size, :]
        x = jnp.clip(x, 0.0, 1.0)  # cubic overshoot
    if mean is None:
        return x.astype(dtype)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def pixel_stats_from_cfg(cfg):
    """(mean, std) for the device-side normalize, honoring the Dassl
    contract: ``Normalize(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD)``
    applies only when "normalize" is listed in ``cfg.INPUT.TRANSFORMS``
    (the reference trainer yamls all list it, with the CLIP constants);
    otherwise the pipeline is ToTensor only -> (None, None)."""
    if "normalize" not in tuple(cfg.INPUT.TRANSFORMS):
        return None, None
    return tuple(cfg.INPUT.PIXEL_MEAN), tuple(cfg.INPUT.PIXEL_STD)
