from .clip_scorer import CLIPConfig, CLIPModel, CLIPScorer, TINY_CLIP  # noqa: F401
from .dino import TINY_VIT, DINOScorer, ViTConfig, ViTFeatures  # noqa: F401
from .vqa import CLIPT5Model, NativeVQAScorer, VQAScorer, vqa_available  # noqa: F401
