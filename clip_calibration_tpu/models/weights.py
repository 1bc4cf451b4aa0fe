"""Weight import/export.

- ``convert_torch_clip``: OpenAI/reference CLIP torch state dict -> our
  param pytree (shape-inference semantics of ``clip/model.py:656-699``).
  torch is only needed when actually reading a ``.pt`` file; converted
  numpy dicts work torch-free.
- ``save_params`` / ``load_params``: native flat-key ``.npz`` checkpoint
  format (torch-free, memory-mappable).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from .clip import CLIPConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# flat npz <-> nested pytree
# ---------------------------------------------------------------------------

def flatten_params(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Params:
    out: Params = {}
    for key, v in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_params(path: str, params: Params) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = flatten_params(params)
    # bf16 has no numpy dtype in npz; store as uint16 view + dtype tag
    arrays = {}
    for k, v in flat.items():
        if str(v.dtype) == "bfloat16":
            arrays[k + "::bf16"] = np.asarray(v).view(np.uint16)
        else:
            arrays[k] = v
    np.savez_compressed(path, **arrays)


def load_params(path: str) -> Params:
    import ml_dtypes
    with np.load(path) as data:
        flat = {}
        for k in data.files:
            v = data[k]
            if k.endswith("::bf16"):
                flat[k[:-6]] = v.view(ml_dtypes.bfloat16)
            else:
                flat[k] = v
    return unflatten_params(flat)


# ---------------------------------------------------------------------------
# torch import
# ---------------------------------------------------------------------------

def config_from_torch_state_dict(sd: Dict[str, np.ndarray]) -> CLIPConfig:
    """Infer architecture hyperparams from tensor shapes (parity with
    reference ``build_model``, ``clip/model.py:656-680``)."""
    is_vit = "visual.proj" in sd

    if is_vit:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len([k for k in sd
                             if k.startswith("visual.")
                             and k.endswith(".attn.in_proj_weight")])
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid
    else:
        counts = [len({k.split(".")[2] for k in sd
                       if k.startswith(f"visual.layer{b}")})
                  for b in [1, 2, 3, 4]]
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_width = round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        vision_patch_size = None
        image_resolution = out_width * 32

    embed_dim = sd["text_projection"].shape[1]
    context_length = sd["positional_embedding"].shape[0]
    vocab_size = sd["token_embedding.weight"].shape[0]
    transformer_width = sd["ln_final.weight"].shape[0]
    transformer_layers = len({k.split(".")[2] for k in sd
                              if k.startswith("transformer.resblocks")})
    return CLIPConfig(
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        transformer_width=transformer_width,
        transformer_heads=transformer_width // 64,
        transformer_layers=transformer_layers,
        context_length=context_length,
        vocab_size=vocab_size,
    )


def _stack_blocks(sd: Dict[str, np.ndarray], prefix: str, n_layers: int,
                  dtype) -> Params:
    """Torch per-layer resblock tensors -> stacked [L, ...] pytree.

    torch Linear stores [out, in]; we store [in, out] (x @ W convention).
    """
    def get(i, name):
        return np.asarray(sd[f"{prefix}.{i}.{name}"], dtype=np.float32)

    def stack(name, transpose=False, cast=True):
        arrs = [get(i, name) for i in range(n_layers)]
        if transpose:
            arrs = [a.T for a in arrs]
        out = np.stack(arrs)
        return out.astype(dtype) if cast else out

    return {
        "ln_1": {"scale": stack("ln_1.weight", cast=False),
                 "bias": stack("ln_1.bias", cast=False)},
        "ln_2": {"scale": stack("ln_2.weight", cast=False),
                 "bias": stack("ln_2.bias", cast=False)},
        "attn": {
            "wqkv": stack("attn.in_proj_weight", transpose=True),
            "bqkv": stack("attn.in_proj_bias"),
            "wo": stack("attn.out_proj.weight", transpose=True),
            "bo": stack("attn.out_proj.bias"),
        },
        "mlp": {
            "w_fc": stack("mlp.c_fc.weight", transpose=True),
            "b_fc": stack("mlp.c_fc.bias"),
            "w_proj": stack("mlp.c_proj.weight", transpose=True),
            "b_proj": stack("mlp.c_proj.bias"),
        },
    }


def convert_torch_clip(sd: Dict[str, Any], dtype_str: str = "bfloat16",
                       cfg: Optional[CLIPConfig] = None):
    """Convert a torch CLIP state dict (tensors or numpy arrays) to
    (params, cfg). Matmul weights cast to ``dtype_str``; norms, embeddings
    and logit_scale stay fp32 (reference fp16 policy: convert_weights
    touches Linear/Conv/MHA + projections only, ``clip/model.py:632-653``).
    """
    import ml_dtypes
    dtype = {"bfloat16": ml_dtypes.bfloat16,
             "float32": np.float32,
             "float16": np.float16}[dtype_str]

    sd = {k: _to_numpy(v) for k, v in sd.items()
          if k not in ("input_resolution", "context_length", "vocab_size")}
    if cfg is None:
        cfg = config_from_torch_state_dict(sd)

    f32 = np.float32
    if cfg.is_vit:
        p = cfg.vision_patch_size
        conv1 = sd["visual.conv1.weight"].astype(f32)  # [vw, 3, p, p]
        # -> [(ph, pw, c), vw] to match patchify()'s patch vector order
        patch_kernel = conv1.transpose(2, 3, 1, 0).reshape(p * p * 3, -1)
        visual = {
            "patch_kernel": patch_kernel.astype(dtype),
            "class_embedding": sd["visual.class_embedding"].astype(f32),
            "positional_embedding":
                sd["visual.positional_embedding"].astype(f32),
            "ln_pre": {"scale": sd["visual.ln_pre.weight"].astype(f32),
                       "bias": sd["visual.ln_pre.bias"].astype(f32)},
            "blocks": _stack_blocks(sd, "visual.transformer.resblocks",
                                    cfg.vision_layers, dtype),
            "ln_post": {"scale": sd["visual.ln_post.weight"].astype(f32),
                        "bias": sd["visual.ln_post.bias"].astype(f32)},
            "proj": sd["visual.proj"].astype(f32).astype(dtype),
        }
    else:
        from .resnet import convert_torch_resnet
        visual = convert_torch_resnet(sd, cfg, dtype)

    text = {
        "token_embedding": sd["token_embedding.weight"].astype(f32),
        "positional_embedding": sd["positional_embedding"].astype(f32),
        "blocks": _stack_blocks(sd, "transformer.resblocks",
                                cfg.transformer_layers, dtype),
        "ln_final": {"scale": sd["ln_final.weight"].astype(f32),
                     "bias": sd["ln_final.bias"].astype(f32)},
        "text_projection": sd["text_projection"].astype(f32).astype(dtype),
    }

    params = {
        "visual": visual,
        "text": text,
        "logit_scale": sd["logit_scale"].astype(f32),
    }
    return params, cfg


def load_torch_clip(path: str, dtype_str: str = "bfloat16"):
    """Read an OpenAI ``.pt`` checkpoint (TorchScript archive or plain state
    dict) and convert. Requires torch (CPU) at call time only."""
    import torch
    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        if "state_dict" in sd:
            sd = sd["state_dict"]
    return convert_torch_clip(sd, dtype_str)


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor without importing torch at module scope
    if hasattr(v, "detach"):
        return v.detach().to("cpu").float().numpy()
    return np.asarray(v)
