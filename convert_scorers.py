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
    parser.add_argument("--vqa-t5", type=str, default=None,
                        help="flan-t5 T5ForConditionalGeneration checkpoint "
                        "(the clip-flant5 language backbone)")
    parser.add_argument("--vqa-vision", type=str, default=None,
                        help="CLIP checkpoint for the clip-flant5 vision "
                        "tower (transformers CLIPModel layout)")
    parser.add_argument("--vqa-projector", type=str, default=None,
                        help="mm_projector weights (LLaVA nn.Sequential "
                        "layout: indices 0/2)")
    parser.add_argument("--vqa-tokenizer", type=str, default=None,
                        help="flan-t5 tokenizer.json (copied into <out>/vqa)")
    parser.add_argument("--yes-token-id", type=int, default=2163,
                        help="token id of 'Yes' in the T5 vocab (VQAScore "
                        "answer token)")
    parser.add_argument("--vqa-config", type=str, default=None,
                        help="JSON file with geometry overrides "
                        '({"t5": {...}, "vision": {...}}) for non-xxl '
                        "clip-flant5 variants; written into <out>/vqa/"
                        "config.json for the scorer to reconstruct")
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args()
    vqa_parts = args.vqa_t5 or args.vqa_vision or args.vqa_projector
    if not (args.clip or args.dino or vqa_parts or args.vqa_tokenizer):
        parser.error("nothing to convert: pass --clip/--dino/--vqa-*")

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

    if vqa_parts or args.vqa_tokenizer:
        import json
        import shutil

        from textboost_tpu.eval.scorer_weights import (
            convert_clip_vision,
            convert_mm_projector,
            convert_t5,
        )
        from textboost_tpu.eval.vqa import CLIPT5Model

        vqa_dir = os.path.join(args.out, "vqa")
        os.makedirs(vqa_dir, exist_ok=True)
        geom = {}
        if args.vqa_config:
            geom = json.load(open(args.vqa_config))
        if geom:
            from textboost_tpu.eval.clip_scorer import CLIPVisionConfig
            from textboost_tpu.eval.t5 import T5Config

            model = CLIPT5Model(
                T5Config(**geom.get("t5", {})) if "t5" in geom else None,
                CLIPVisionConfig(**geom["vision"]) if "vision" in geom else None,
            )
        else:
            model = CLIPT5Model()  # clip-flant5-xxl geometry defaults
        template = model.shape_template()
        if args.vqa_t5:
            # The language backbone is the multi-GB part (clip-flant5-xxl:
            # ~44 GB as fp32) — stream it tensor-by-tensor from a lazy
            # source into .safetensors so peak RSS stays bounded by one
            # tensor, not the checkpoint (VERDICT r4 #7).
            from textboost_tpu.eval.scorer_weights import (
                LazyStateDict,
                stream_convert_t5,
            )

            out = os.path.join(vqa_dir, "t5.safetensors")
            stream_convert_t5(LazyStateDict(args.vqa_t5), template["t5"], out)
            print(f"wrote {out} (streamed)")
        for part, src, fn in (
            ("vision", args.vqa_vision, convert_clip_vision),
            ("projector", args.vqa_projector, convert_mm_projector),
        ):
            if not src:
                continue
            params = fn(_load_state_dict(src), template[part])
            out = os.path.join(vqa_dir, f"{part}.msgpack")
            save_converted(params, out)
            print(f"wrote {out}")
        if args.vqa_tokenizer:
            shutil.copy(args.vqa_tokenizer, os.path.join(vqa_dir, "tokenizer.json"))
        with open(os.path.join(vqa_dir, "config.json"), "w") as f:
            json.dump({"yes_token_id": args.yes_token_id, **geom}, f)
        print(f"wrote {os.path.join(vqa_dir, 'config.json')}")


if __name__ == "__main__":
    main()
