"""ModifiedResNet vision tower (RN50/RN101 backbones).

Parity target: ``/root/reference/clip/model.py:10-150``: 3-conv stem with
avgpool, anti-aliased strided bottlenecks (avgpool before stride>1 convs),
and QKV attention pooling instead of global average pooling.

TPU-native details: NHWC layout throughout, stride-2 average pools as
reshape-means, and the attention pool evaluates ONLY the mean-token query
(the reference computes full self-attention and discards all but row 0,
``clip/model.py:72-90``). BatchNorm runs in inference mode with frozen
statistics — the backbone is always frozen in this framework.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, kernel, stride=1):
    # torch-style symmetric padding (k-1)//2; XLA's SAME pads
    # asymmetrically for stride > 1, which would shift receptive fields
    k = kernel.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride),
        ((pad, pad), (pad, pad)), dimension_numbers=_DN)


def _bn(x, p):
    scale = (p["scale"] / jnp.sqrt(p["var"] + 1e-5)).astype(x.dtype)
    bias = (p["bias"] - p["mean"] * p["scale"]
            / jnp.sqrt(p["var"] + 1e-5)).astype(x.dtype)
    return x * scale + bias


def _avgpool2(x):
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


def _bottleneck(p, x, stride):
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"]), p["bn2"]))
    if stride > 1:
        out = _avgpool2(out)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    identity = x
    if "down_conv" in p:
        if stride > 1:
            identity = _avgpool2(identity)
        identity = _bn(_conv(identity, p["down_conv"]), p["down_bn"])
    return jax.nn.relu(out + identity)


def _attn_pool(p, x, n_heads):
    """x: [B, H, W, C] -> [B, out_dim]; single mean-token query."""
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C)
    mean_tok = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # [B, HW+1, C]
    tokens = tokens + p["positional_embedding"].astype(tokens.dtype)

    head = C // n_heads

    def proj(t, name):
        return (jnp.dot(t, p[name + "_w"].astype(t.dtype))
                + p[name + "_b"].astype(t.dtype))

    q = proj(tokens[:, :1], "q").reshape(B, 1, n_heads, head)
    k = proj(tokens, "k").reshape(B, -1, n_heads, head)
    v = proj(tokens, "v").reshape(B, -1, n_heads, head)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * (head ** -0.5), k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(tokens.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, 1, C)
    out = (jnp.dot(out, p["c_w"].astype(out.dtype))
           + p["c_b"].astype(out.dtype))
    return out[:, 0]


def modified_resnet_forward(params: Params, cfg, x: jnp.ndarray
                            ) -> jnp.ndarray:
    """x: [B, H, W, 3] preprocessed -> [B, embed_dim]."""
    p = params
    x = jax.nn.relu(_bn(_conv(x, p["stem"]["conv1"], stride=2),
                        p["stem"]["bn1"]))
    x = jax.nn.relu(_bn(_conv(x, p["stem"]["conv2"]), p["stem"]["bn2"]))
    x = jax.nn.relu(_bn(_conv(x, p["stem"]["conv3"]), p["stem"]["bn3"]))
    x = _avgpool2(x)
    for li, layer in enumerate(("layer1", "layer2", "layer3", "layer4")):
        for b, block in enumerate(p[layer]):
            # stride 2 on the first block of layers 2-4 (static)
            stride = 2 if (b == 0 and li > 0) else 1
            x = _bottleneck(block, x, stride)
    return _attn_pool(p["attnpool"], x, cfg.vision_heads)


# ---------------------------------------------------------------------------
# init / conversion
# ---------------------------------------------------------------------------

def _bn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


def _conv_init(rng, k, cin, cout, dtype):
    fan_in = k * k * cin
    std = (2.0 / fan_in) ** 0.5
    return (jax.random.normal(rng, (k, k, cin, cout)) * std).astype(dtype)


def init_modified_resnet(rng, cfg, dtype=jnp.bfloat16) -> Params:
    width = cfg.vision_width
    layers = cfg.vision_layers
    # 3 stem convs + per block 3 convs (+1 possible downsample) + 5
    # attnpool leaves; RN101's depth-23 layer3 needs far more than a
    # fixed pool (a 64-key pool crashed its init)
    n_keys = 3 + 4 * sum(layers) + 5
    ks = list(jax.random.split(rng, n_keys))

    def nk():
        return ks.pop()

    stem = {
        "conv1": _conv_init(nk(), 3, 3, width // 2, dtype),
        "bn1": _bn_init(width // 2),
        "conv2": _conv_init(nk(), 3, width // 2, width // 2, dtype),
        "bn2": _bn_init(width // 2),
        "conv3": _conv_init(nk(), 3, width // 2, width, dtype),
        "bn3": _bn_init(width),
    }

    params: Params = {"stem": stem}
    inplanes = width
    for li, (planes_mult, n_blocks, stride) in enumerate(
            [(1, layers[0], 1), (2, layers[1], 2), (4, layers[2], 2),
             (8, layers[3], 2)]):
        planes = width * planes_mult
        blocks = []
        for b in range(n_blocks):
            s = stride if b == 0 else 1
            block = {
                "conv1": _conv_init(nk(), 1, inplanes, planes, dtype),
                "bn1": _bn_init(planes),
                "conv2": _conv_init(nk(), 3, planes, planes, dtype),
                "bn2": _bn_init(planes),
                "conv3": _conv_init(nk(), 1, planes, planes * 4, dtype),
                "bn3": _bn_init(planes * 4),
            }
            if s > 1 or inplanes != planes * 4:
                block["down_conv"] = _conv_init(nk(), 1, inplanes,
                                                planes * 4, dtype)
                block["down_bn"] = _bn_init(planes * 4)
            blocks.append(block)
            inplanes = planes * 4
        params[f"layer{li + 1}"] = blocks

    embed_dim = width * 32
    spacial = cfg.image_resolution // 32
    std = embed_dim ** -0.5
    attn = {
        "positional_embedding": (jax.random.normal(
            nk(), (spacial ** 2 + 1, embed_dim), jnp.float32) * std),
    }
    for name, out in (("q", embed_dim), ("k", embed_dim),
                      ("v", embed_dim), ("c", cfg.embed_dim)):
        attn[name + "_w"] = (jax.random.normal(
            nk(), (embed_dim, out)) * std).astype(dtype)
        attn[name + "_b"] = jnp.zeros((out,), jnp.float32)
    params["attnpool"] = attn
    return params


def convert_torch_resnet(sd: Dict[str, np.ndarray], cfg, dtype) -> Params:
    """Torch 'visual.*' ModifiedResNet tensors -> our pytree."""
    f32 = np.float32

    def conv(name):
        w = np.asarray(sd[f"visual.{name}.weight"], f32)
        return w.transpose(2, 3, 1, 0).astype(dtype)  # OIHW -> HWIO

    def bn(name):
        g = lambda s: np.asarray(sd[f"visual.{name}.{s}"], f32)
        return {"scale": g("weight"), "bias": g("bias"),
                "mean": g("running_mean"), "var": g("running_var")}

    params: Params = {"stem": {
        "conv1": conv("conv1"), "bn1": bn("bn1"),
        "conv2": conv("conv2"), "bn2": bn("bn2"),
        "conv3": conv("conv3"), "bn3": bn("bn3"),
    }}

    layers = cfg.vision_layers
    width = cfg.vision_width
    inplanes = width
    for li, (mult, n_blocks, stride) in enumerate(
            [(1, layers[0], 1), (2, layers[1], 2), (4, layers[2], 2),
             (8, layers[3], 2)]):
        planes = width * mult
        blocks = []
        for b in range(n_blocks):
            s = stride if b == 0 else 1
            pre = f"layer{li + 1}.{b}"
            block = {
                "conv1": conv(f"{pre}.conv1"), "bn1": bn(f"{pre}.bn1"),
                "conv2": conv(f"{pre}.conv2"), "bn2": bn(f"{pre}.bn2"),
                "conv3": conv(f"{pre}.conv3"), "bn3": bn(f"{pre}.bn3"),
            }
            if f"visual.{pre}.downsample.0.weight" in sd:
                block["down_conv"] = conv(f"{pre}.downsample.0")
                block["down_bn"] = bn(f"{pre}.downsample.1")
            blocks.append(block)
            inplanes = planes * 4
        params[f"layer{li + 1}"] = blocks

    f = lambda name: np.asarray(sd[f"visual.attnpool.{name}"], f32)
    attn = {
        "positional_embedding": f("positional_embedding"),
    }
    for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                         ("v", "v_proj"), ("c", "c_proj")):
        attn[ours + "_w"] = f(f"{theirs}.weight").T.astype(dtype)
        attn[ours + "_b"] = f(f"{theirs}.bias")
    params["attnpool"] = attn
    return params
