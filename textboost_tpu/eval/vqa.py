"""VQAScore metric (clip-flant5-xxl), gated on external availability.

Counterpart of eval_dreambooth.py:546-565: the reference scores
image/prompt alignment with `t2v_metrics.VQAScore(model="clip-flant5-xxl")`.
That model (an image-conditioned Flan-T5-XXL) is a ~10GB external
dependency with its own package; in offline/TPU environments it is
unavailable, so this wrapper uses it when importable and otherwise raises
with a clear message (eval_dreambooth keeps "vqa" in the default metric
set for CLI parity and skips it with a warning when gated off).
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np


def vqa_available() -> bool:
    try:
        import t2v_metrics  # noqa: F401

        return True
    except ImportError:
        return False


class VQAScorer:
    def __init__(self, model: str = "clip-flant5-xxl", device: str = "cpu"):
        if not vqa_available():
            raise ImportError(
                "VQAScore requires the `t2v_metrics` package (and the "
                "clip-flant5-xxl checkpoint); unavailable in this environment. "
                "Use --metric clip-t clip-i dino instead."
            )
        import t2v_metrics

        self._scorer = t2v_metrics.VQAScore(model=model, device=device)

    def score(self, images: Sequence[np.ndarray], prompts: List[str]) -> float:
        """Mean VQA alignment over (image, prompt) pairs."""
        import tempfile

        from PIL import Image

        scores = []
        with tempfile.TemporaryDirectory() as td:
            for i, (img, prompt) in enumerate(zip(images, prompts)):
                path = f"{td}/{i}.png"
                Image.fromarray(np.asarray(img)).save(path)
                scores.append(float(self._scorer(images=[path], texts=[prompt])))
        return float(np.mean(scores))
