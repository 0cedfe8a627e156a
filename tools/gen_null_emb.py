#!/usr/bin/env python
"""Regenerate the reference's cached embedding assets natively.

The reference ships `assets/null_emb_sd21base.pt` — the frozen SD2.1-base
text encoder's output for the empty prompt, loaded at
train_textboost.py:649 — and its eval variant loads per-model
`assets/start_emb_{model}.pt` fixed-BOS embeddings
(eval_dreambooth.py:179-181).  The training/eval paths here compute the
embedding in-process (pipeline.compute_null_embedding), so no asset is
required; this tool exports one anyway, in the reference's byte format
(torch-pickled fp32 [77, hidden] tensor), for consumers of the reference
layout or for pinning the embedding across runs.

Usage:
  python tools/gen_null_emb.py --model sd21base --out assets/null_emb_sd21base.pt
  python tools/gen_null_emb.py --model /path/to/converted_snapshot --out start_emb_sd15.pt
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True,
                        help="preset name (sd15/sd21base/...) or converted "
                        "snapshot dir")
    parser.add_argument("--out", required=True, help="output .pt path")
    parser.add_argument("--prompt", default="",
                        help="prompt to embed (default: empty = null "
                        "embedding; the BOS row doubles as start_emb)")
    args = parser.parse_args()

    from textboost_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    import jax.numpy as jnp

    from textboost_tpu.data.tokenizer import load_tokenizer
    from textboost_tpu.models.pretrained import load_models
    from textboost_tpu.pipelines import TextToImagePipeline

    bundle = load_models(args.model, dtype=jnp.float32)
    pipe = TextToImagePipeline(
        bundle.spec, load_tokenizer(None), bundle.te_params,
        bundle.unet_params, bundle.vae_params, dtype=jnp.float32,
    )
    arr = pipe.compute_null_embedding(args.prompt)

    import torch

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    torch.save(torch.from_numpy(arr.copy()), args.out)
    print(f"wrote {args.out}: shape {tuple(arr.shape)} fp32 "
          f"(prompt={args.prompt!r})")


if __name__ == "__main__":
    main()
