"""CLIP backbone resolution.

The reference downloads OpenAI weights by URL with SHA256 verification
(``/root/reference/clip/clip.py:42-71``). This build runs in egress-free
environments, so resolution order is local-first:

1. native npz: ``$CLIP_CHECKPOINT_DIR/<name>.npz`` or ``~/.cache/clip/<name>.npz``
2. torch checkpoint: same dirs, ``<name>.pt`` (OpenAI naming, e.g.
   ``ViT-B-16.pt``) — converted on the fly
3. seeded random init (loud warning) — keeps tests/demos runnable with no
   weights on disk.
"""

from __future__ import annotations

import os
import os.path as osp

import jax

from .clip import PRESETS, CLIPConfig, init_clip
from .weights import load_params, load_torch_clip


def _candidate_names(backbone_name: str):
    """Filesystem spellings for a zoo name: ``ViT-B/16`` -> ``ViT-B-16``;
    ``ViT-L/14@336px`` additionally matches OpenAI's published filename
    ``ViT-L-14-336px`` (reference ``clip/clip.py:38`` URL basename)."""
    safe = backbone_name.replace("/", "-")
    names = [safe]
    if "@" in safe:
        names.append(safe.replace("@", "-"))
    return names


def available_models():
    """Names `load_clip_backbone` accepts (reference
    ``clip/clip.py:84-86`` public API; the public zoo plus this repo's
    tiny test backbones)."""
    return sorted(PRESETS)


def _search_dirs():
    dirs = []
    env = os.environ.get("CLIP_CHECKPOINT_DIR")
    if env:
        dirs.append(env)
    dirs.append(osp.expanduser("~/.cache/clip"))
    return dirs


def load_clip_backbone(backbone_name: str, dtype_str: str = "bfloat16"):
    """Returns (params, CLIPConfig) for the named backbone.

    dtype_str ("bfloat16" | "float32" | "float16") sets the matmul-
    weight dtype for the .pt conversion and random-init paths — fp32
    runs must load fp32 weights or exact parity is impossible
    (trainers pass it from their PREC / MODEL.PRECISION setting). npz
    checkpoints load at their STORED dtype: a bf16-saved npz cannot
    recover fp32 precision, so save fp32 npz files for fp32 runs."""
    if backbone_name not in PRESETS:
        raise KeyError(
            f"Unknown backbone {backbone_name!r}; known: "
            f"{sorted(PRESETS)}")
    cfg = PRESETS[backbone_name]

    for d in _search_dirs():
        # extensions OUTER: every filesystem spelling of the native npz
        # outranks any .pt (the docstring's resolution order — a curated
        # fp32 npz must not be shadowed by a torch file under another
        # spelling)
        for fname in _candidate_names(backbone_name):
            npz = osp.join(d, fname + ".npz")
            if osp.exists(npz):
                print(f"Loading CLIP weights from {npz}")
                return load_params(npz), cfg
        for fname in _candidate_names(backbone_name):
            pt = osp.join(d, fname + ".pt")
            if osp.exists(pt):
                print(f"Converting CLIP torch weights from {pt}")
                params, inferred = load_torch_clip(pt, dtype_str)
                if inferred != cfg:
                    # the .pt route infers the config from tensor shapes
                    # with the reference's build_model rules (heads =
                    # width // 64, clip/model.py:656-699) — for the
                    # public zoo that reproduces the preset exactly, so
                    # a mismatch means the file is NOT the named model;
                    # the inferred config wins (it matches the weights)
                    # but silence here once cost a debugging session
                    print(f"WARNING: {pt} does not match the "
                          f"{backbone_name!r} preset (inferred "
                          f"{inferred}); using the inferred config")
                return params, inferred

    print(f"WARNING: no pretrained weights found for {backbone_name!r} "
          f"(searched {_search_dirs()}); using seeded random init. "
          f"Set CLIP_CHECKPOINT_DIR to point at real weights.")
    import zlib
    seed = zlib.crc32(backbone_name.encode()) % (2 ** 31)
    import jax.numpy as jnp
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
             "float16": jnp.float16}[dtype_str]
    return init_clip(jax.random.PRNGKey(seed), cfg, dtype=dtype), cfg
