"""Interpret learned prompt vectors as nearest vocabulary words.

Parity target: ``/root/reference/interpret_prompts/interpret_prompt.py``.
Loads a prompt checkpoint, computes Euclidean distance from each learned
context vector (shallow and per-layer compound prompts) to every token
embedding in the CLIP vocabulary, and prints the top-k nearest words.
Offline analysis utility — plain numpy on host.

Usage:
    python interpret_prompts/interpret_prompt.py <ckpt> <topk> \
        [--backbone ViT-B/16]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# honor JAX_PLATFORMS=cpu before anything imports jax — the axon TPU
# plugin ignores the env var and would grab the TPU tunnel (the shared
# workaround train.py/conftest use; this is a host-side numpy utility)
if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    from clip_calibration_tpu.tools.platform import force_cpu_platform
    force_cpu_platform()

from clip_calibration_tpu.engine.checkpoint import load_checkpoint
from clip_calibration_tpu.models.backbone import load_clip_backbone
from clip_calibration_tpu.models.tokenizer import CLIPTokenizer


def nearest_words(ctx: np.ndarray, token_embedding: np.ndarray,
                  tokenizer: CLIPTokenizer, topk: int):
    """ctx: [n_ctx, D] or [n_cls, n_ctx, D]."""
    if ctx.ndim == 2:
        ctx = ctx[None]
    for row in range(ctx.shape[0]):
        if ctx.shape[0] > 1:
            print(f"--- class/prompt {row}")
        for m, vec in enumerate(ctx[row]):
            dists = np.linalg.norm(token_embedding - vec[None], axis=1)
            idxs = np.argsort(dists)[:topk]
            words = [tokenizer.decoder[int(i)] for i in idxs]
            dist_str = [f"{dists[i]:.4f}" for i in idxs]
            print(f"{m + 1}: {words} {dist_str}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("fpath", type=str,
                        help="path to the learned prompt checkpoint")
    parser.add_argument("topk", type=int,
                        help="select top-k similar words")
    parser.add_argument("--backbone", type=str, default="ViT-B/16")
    args = parser.parse_args()

    assert os.path.exists(args.fpath)
    print(f"Return the top-{args.topk} matched words")

    tokenizer = CLIPTokenizer()
    params, _ = load_clip_backbone(args.backbone)
    token_embedding = np.asarray(params["text"]["token_embedding"],
                                 np.float32)
    print(f"Size of token embedding: {token_embedding.shape}")

    state = load_checkpoint(args.fpath)["state_dict"]

    # shallow context (all prompt trainers name it "ctx"; reference torch
    # checkpoints prefix with "prompt_learner.")
    layers = []
    ctx = state.get("ctx")
    if ctx is None:
        ctx = state.get("prompt_learner", {}).get("ctx") \
            if isinstance(state.get("prompt_learner"), dict) else None
    if ctx is not None:
        layers.append(("shallow ctx", np.asarray(ctx, np.float32)))

    # per-layer compound/deep text prompts (MaPLe / PromptSRC); the
    # reference's torch MaPLe checkpoints store them as
    # compound_prompts_text.<i> (unflattened to a nested dict here)
    for key in ("compound_text", "deep_text"):
        if key in state:
            stack = np.asarray(state[key], np.float32)
            for i in range(stack.shape[0]):
                layers.append((f"layer {i + 1} ({key})", stack[i]))
    ref = state.get("compound_prompts_text")
    if isinstance(ref, dict):
        for i in sorted(ref, key=int):
            layers.append((f"layer {int(i) + 1} (compound_prompts_text)",
                           np.asarray(ref[i], np.float32)))

    if not layers:
        print("No prompt vectors found in checkpoint; keys:",
              sorted(state))
        return

    for name, ctx in layers:
        print(f"SHOWING RESULTS FOR: {name}  shape={ctx.shape}")
        nearest_words(ctx, token_embedding, tokenizer, args.topk)


if __name__ == "__main__":
    main()
