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
    """uint8 (or float [0,1]) NHWC -> normalized compute-dtype NHWC."""
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((x - mean) / std).astype(dtype)
