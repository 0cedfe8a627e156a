"""Class-prior image generation for prior preservation.

Counterpart of `generate_prior_images` (/root/reference/textboost/utils.py:
50-114): when --with_image_prior is set and class_data_dir holds fewer than
num_prior_images images, sample the missing ones from the BASE pipeline
with PromptDataset prompts; filenames encode index-hash-caption so the
dataset can recover captions (dataset.py prior branch).  Fixes the
reference's broken call site (train_textboost.py:620-627 drops the
num_prior_images argument — SURVEY.md §7 known bugs).  BLIP captioning is
gated on local weights availability.
"""
from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Optional

from ..data.datasets import PromptDataset


def generate_prior_images(
    pipeline,
    class_images_dir: str,
    class_token: str,
    num_prior_images: int,
    *,
    sample_batch_size: int = 4,
    num_inference_steps: int = 25,
    guidance_scale: float = 7.5,
    seed: int = 0,
    blip_model_path: Optional[str] = None,
) -> int:
    """Top up class_images_dir to num_prior_images using `pipeline`.

    Returns the number of newly generated images.
    """
    from PIL import Image

    class_images_dir = Path(class_images_dir)
    class_images_dir.mkdir(parents=True, exist_ok=True)
    cur = len(list(class_images_dir.iterdir()))
    if cur >= num_prior_images:
        return 0

    captioner = None
    if blip_model_path:
        try:
            from transformers import BlipForConditionalGeneration, BlipProcessor

            processor = BlipProcessor.from_pretrained(blip_model_path)
            blip = BlipForConditionalGeneration.from_pretrained(blip_model_path)

            def captioner(img):  # noqa: F811
                inputs = processor(img, return_tensors="pt")
                out = blip.generate(**inputs)
                return processor.decode(out[0], skip_special_tokens=True)

        except Exception as e:  # noqa: BLE001 — captioning is best-effort
            print(f"BLIP captioning unavailable ({e}); using prompt captions.")

    prompt = f"a photo of {class_token}"
    dataset = PromptDataset(prompt, num_prior_images - cur)
    import jax

    made = 0
    for start in range(0, len(dataset), sample_batch_size):
        idxs = list(range(start, min(start + sample_batch_size, len(dataset))))
        prompts = [dataset[i]["prompt"] for i in idxs]
        images = pipeline(
            prompts,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            rng=jax.random.fold_in(jax.random.PRNGKey(seed), start),
        )
        for i, arr in zip(idxs, images):
            img = Image.fromarray(arr)
            digest = hashlib.sha1(img.tobytes()).hexdigest()  # noqa: S324
            caption = prompts[i - start]
            if captioner is not None:
                caption = captioner(img)
            filename = f"{i + cur}-{digest}-{caption.replace(' ', '_')}.jpg"
            img.save(os.path.join(class_images_dir, filename))
            made += 1
    return made
