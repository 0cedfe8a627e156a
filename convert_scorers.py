#!/usr/bin/env python
"""Convert metric-scorer checkpoints (torch) into native msgpack weights.

The reference scores with openai CLIP ViT-L/14@336px and torch.hub
dinov2_vitl14 (eval_dreambooth.py:358-366, 459-461).  This CLI converts
locally available torch serializations of those models — transformers
CLIPModel dirs/safetensors and DINOv2 checkpoints in either the
facebookresearch hub layout or the transformers Dinov2Model layout — into
`<out>/{clip,dino}.msgpack` consumed by `eval_dreambooth.py
--scorer-weights <out>`.

Usage:
  python convert_scorers.py --out scorer_weights \
      --clip /path/to/clip-vit-large-patch14-336 \
      --dino /path/to/dinov2_vitl14_pretrain.pth
"""
import argparse
import os


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--clip", type=str, default=None,
                        help="transformers CLIPModel checkpoint (dir, "
                        ".safetensors, or .bin/.pt)")
    parser.add_argument("--dino", type=str, default=None,
                        help="DINOv2 checkpoint (facebookresearch .pth or "
                        "transformers Dinov2Model dir/safetensors)")
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args()
    if not (args.clip or args.dino):
        parser.error("nothing to convert: pass --clip and/or --dino")

    import jax

    jax.config.update("jax_platforms", "cpu")  # conversion is host work

    from textboost_tpu.eval.clip_scorer import CLIPConfig, CLIPScorer
    from textboost_tpu.eval.dino import DINOScorer, ViTConfig
    from textboost_tpu.eval.scorer_weights import (
        _load_state_dict,
        convert_clip_model,
        convert_dinov2,
        save_converted,
    )

    os.makedirs(args.out, exist_ok=True)
    if args.clip:
        scorer = CLIPScorer(CLIPConfig())
        params = convert_clip_model(_load_state_dict(args.clip), scorer.params)
        out = os.path.join(args.out, "clip.msgpack")
        save_converted(params, out)
        print(f"wrote {out}")
    if args.dino:
        scorer = DINOScorer(ViTConfig())
        params = convert_dinov2(_load_state_dict(args.dino), scorer.params)
        out = os.path.join(args.out, "dino.msgpack")
        save_converted(params, out)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
