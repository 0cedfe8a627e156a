#!/usr/bin/env python3
"""Single-prompt sampling CLI — parity with /root/reference/inference.py.

Loads a trained TextBoost model dir (PEFT adapter + token bins) on top of a
base model, samples one prompt across N seeds with DPM-Solver++ (25 steps),
and writes per-seed images or a 1xN grid.
"""
import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")


def _platform_override():
    from textboost_tpu.utils.platform import (
        apply_platform_override,
        start_device_warmup,
    )

    apply_platform_override()
    start_device_warmup()


STABLE_DIFFUSION = {
    "sd14": "sd14",
    "sd15": "sd15",
    "sd21base": "sd21base",
    "sd21": "sd21",
    "tiny": "tiny",
}


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str, help="path to model")
    parser.add_argument("--model", type=str, default="sd21base")
    parser.add_argument(
        "--prompt",
        type=str,
        default="photo of a <dog> dog",
        help="[<INSTANCE> SUBJECT] for TextBoost models.",
    )
    parser.add_argument("--outdir", type=str, default="./benchmarks")
    parser.add_argument("--checkpoint", type=int, default=None)
    parser.add_argument("--skip-gen", action="store_true")
    parser.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3])
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--steps", type=int, default=25)
    parser.add_argument("--guidance-scale", type=float, default=7.5)
    parser.add_argument("--lora-rank", type=int, default=4)
    args = parser.parse_args()
    if args.model in STABLE_DIFFUSION:
        args.model = STABLE_DIFFUSION[args.model]
    return args


def main(args):
    _platform_override()
    import numpy as np
    from PIL import Image

    from textboost_tpu.pipelines.loading import load_textboost_pipeline

    args.path = args.path.rstrip("/")
    import jax as _jax

    mesh = None
    n_dev = len(_jax.devices())
    if n_dev > 1 and len(args.seeds) % n_dev == 0:
        from textboost_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=n_dev, tp=1)
    pipeline = load_textboost_pipeline(
        args.path, args.model, checkpoint=args.checkpoint,
        lora_rank=args.lora_rank, mesh=mesh,
    )

    import jax

    # All seeds in ONE batched call (each with its own initial latent):
    # one compiled program, and the batch shards over the dp mesh when
    # multiple devices are present.
    lh = lw = (pipeline.spec.resolution) // 8
    # Seed-for-seed continuity with the per-seed pipeline path (and earlier
    # CLI versions): JAX PRNG output depends on shape, so draw the batch-1
    # latent each seed would have drawn and concatenate ON DEVICE.  The old
    # np.asarray fetch here was the process's first d2h, which pays the
    # relay's 1-4 min first-sync tax BEFORE the sampler compile even
    # starts; device-side latents let the tax overlap the compile (the
    # values are identical — threefry output is backend-deterministic and
    # depends only on key and shape).
    import jax.numpy as jnp

    latents = jnp.concatenate([
        jax.random.normal(jax.random.PRNGKey(s), (1, lh, lw, 4))
        for s in args.seeds
    ], axis=0)
    out = pipeline(
        [args.prompt] * len(args.seeds),
        num_inference_steps=args.steps,
        guidance_scale=args.guidance_scale,
        latents=latents,
        sampler="dpm++2m",
    )
    images = list(out)

    if args.output is not None:
        grid = np.concatenate(images, axis=1)
        Image.fromarray(grid).save(args.output)
        print(f"Saved grid to {args.output}")
    else:
        for seed, image in zip(args.seeds, images):
            output = args.prompt.replace(" ", "_") + f"_{seed}.jpg"
            Image.fromarray(image).save(output)
            print(f"Saved {output}")


if __name__ == "__main__":
    main(parse_args())
