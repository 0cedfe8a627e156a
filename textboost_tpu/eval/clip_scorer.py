"""Native CLIP scorer for CLIP-T / CLIP-I metrics.

Counterpart of the reference's metric stack (eval_dreambooth.py:353-453):
CLIP-T via t2v_metrics CLIPScore('openai:ViT-L-14-336') and CLIP-I via
openai CLIP ViT-L/14@336px cosine similarity.  Here the full CLIP (vision
ViT + text transformer + projection heads) is a Flax model; weights come
from a converted local snapshot (zero-egress environments can't download
them) and a seeded random init keeps the code path exercisable offline —
scores are then only self-consistent, not comparable to the paper.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import ACT
from ..models.configs import CLIPTextConfig


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    text: CLIPTextConfig = CLIPTextConfig()
    vision: CLIPVisionConfig = CLIPVisionConfig()
    projection_dim: int = 768


TINY_CLIP = CLIPConfig(
    text=CLIPTextConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2, num_attention_heads=4
    ),
    vision=CLIPVisionConfig(
        image_size=56, patch_size=14, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
    ),
    projection_dim=32,
)

# ImageNet-CLIP preprocessing constants (openai CLIP normalize).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class _VisionLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        # Reuse the text encoder layer minus causality by building the same
        # blocks with a non-causal attention: implemented via CLIPEncoderLayer
        # equivalent inline.
        from ..ops.attention import merge_heads, multi_head_attention, split_heads

        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name=name)
        res = hidden
        h = ln("layer_norm1")(hidden)
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)
        q, k, v = dense("q_proj")(h), dense("k_proj")(h), dense("v_proj")(h)
        heads = cfg.num_attention_heads
        o = multi_head_attention(
            split_heads(q, heads), split_heads(k, heads), split_heads(v, heads)
        )
        h = dense("out_proj")(merge_heads(o))
        hidden = res + h
        res = hidden
        h = ln("layer_norm2")(hidden)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = ACT[cfg.hidden_act](h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return res + h


class CLIPVisionModel(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, feature_layer=None) -> jnp.ndarray:
        """pixels [B,H,W,3], CLIP-normalized -> pooled (CLS, post-LN) [B,D].

        feature_layer (e.g. -2) switches to LLaVA-style patch-feature
        extraction for the VQA scorer: run through hidden_states[
        feature_layer] (HF indexing, embeddings = index 0) and return the
        patch tokens [B, P, D] — no CLS, no post_layernorm (the clip-flant5
        vision conditioning, eval/vqa.py)."""
        cfg = self.config
        patches = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixels.astype(self.dtype))
        b, gh, gw, d = patches.shape
        patches = patches.reshape(b, gh * gw, d)
        cls_emb = self.param("class_embedding", nn.initializers.normal(0.02), (d,))
        cls_tok = jnp.broadcast_to(cls_emb.astype(self.dtype)[None, None], (b, 1, d))
        hidden = jnp.concatenate([cls_tok, patches], axis=1)
        num_pos = gh * gw + 1
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (num_pos, d)
        )
        hidden = hidden + pos.astype(self.dtype)[None]
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="pre_layrnorm")(hidden)
        n_run = cfg.num_hidden_layers
        if feature_layer is not None:
            # hidden_states[k] = output of block k-1 (index 0 = embeddings):
            # -2 ==> stop after num_layers-1 blocks.
            n_run = (
                cfg.num_hidden_layers + 1 + feature_layer
                if feature_layer < 0
                else feature_layer
            )
            assert 0 < n_run <= cfg.num_hidden_layers, feature_layer
        for i in range(n_run):
            hidden = _VisionLayer(cfg, self.dtype, name=f"layers_{i}")(hidden)
        if feature_layer is not None:
            return hidden[:, 1:]  # patch tokens, no CLS, no post-LN
        pooled = hidden[:, 0]
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="post_layernorm")(pooled)


class CLIPModel(nn.Module):
    """Dual-encoder CLIP with projection heads and logit scale."""

    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from ..models.clip import CLIPTextModel

        self.text_model = CLIPTextModel(self.config.text, dtype=self.dtype)
        self.vision_model = CLIPVisionModel(self.config.vision, dtype=self.dtype)
        self.text_projection = nn.Dense(
            self.config.projection_dim, use_bias=False, dtype=self.dtype
        )
        self.visual_projection = nn.Dense(
            self.config.projection_dim, use_bias=False, dtype=self.dtype
        )

    def get_text_features(self, input_ids):
        _, pooled = self.text_model(input_ids)
        return self.text_projection(pooled)

    def get_image_features(self, pixels):
        return self.visual_projection(self.vision_model(pixels))

    def __call__(self, input_ids, pixels):
        t = self.get_text_features(input_ids)
        v = self.get_image_features(pixels)
        return t, v


def normalize_images(uint8_images: np.ndarray, size: int) -> np.ndarray:
    """uint8 [B,H,W,3] -> CLIP-normalized float32 [B,size,size,3] (bicubic
    resize + center crop, openai preprocessing)."""
    from PIL import Image

    out = np.zeros((len(uint8_images), size, size, 3), np.float32)
    for i, arr in enumerate(uint8_images):
        img = Image.fromarray(arr)
        w, h = img.size
        scale = size / min(w, h)
        img = img.resize((max(round(w * scale), size), max(round(h * scale), size)),
                         Image.BICUBIC)
        left = (img.width - size) // 2
        top = (img.height - size) // 2
        img = img.crop((left, top, left + size, top + size))
        out[i] = np.asarray(img, np.float32) / 255.0
    return (out - CLIP_MEAN) / CLIP_STD


class CLIPScorer:
    """clip_score / clip_i counterpart (eval_dreambooth.py:353-453)."""

    def __init__(self, config: CLIPConfig = None, params=None, seed: int = 0):
        self.config = config or CLIPConfig()
        self.model = CLIPModel(self.config)
        if params is None:
            ids = jnp.zeros((1, 77), jnp.int32)
            px = jnp.zeros(
                (1, self.config.vision.image_size, self.config.vision.image_size, 3)
            )
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), ids, px)
        self.params = params
        self._text_fn = jax.jit(
            lambda p, ids: self.model.apply(p, ids, method="get_text_features")
        )
        self._image_fn = jax.jit(
            lambda p, px: self.model.apply(p, px, method="get_image_features")
        )

    def text_features(self, tokenizer, prompts: Sequence[str]) -> np.ndarray:
        from ..data.tokenizer import tokenize_prompt

        ids = jnp.asarray(tokenize_prompt(tokenizer, list(prompts)))
        return np.asarray(self._text_fn(self.params, ids), np.float32)

    def image_features(self, uint8_images: np.ndarray) -> np.ndarray:
        px = jnp.asarray(
            normalize_images(uint8_images, self.config.vision.image_size)
        )
        return np.asarray(self._image_fn(self.params, px), np.float32)

    @staticmethod
    def cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        a = a / np.clip(np.linalg.norm(a, axis=-1, keepdims=True), 1e-8, None)
        b = b / np.clip(np.linalg.norm(b, axis=-1, keepdims=True), 1e-8, None)
        return a @ b.T

    def clip_t(self, tokenizer, uint8_images, prompts) -> float:
        """Mean cos(text, image) over aligned pairs."""
        t = self.text_features(tokenizer, prompts)
        v = self.image_features(uint8_images)
        cos = np.einsum("id,id->i",
                        t / np.clip(np.linalg.norm(t, axis=-1, keepdims=True), 1e-8, None),
                        v / np.clip(np.linalg.norm(v, axis=-1, keepdims=True), 1e-8, None))
        return float(cos.mean())

    def clip_i(self, gen_images, ref_images) -> float:
        """Mean pairwise cos(gen, ref), clamped at 0
        (eval_dreambooth.py clip_i clamps negatives)."""
        g = self.image_features(gen_images)
        r = self.image_features(ref_images)
        sims = np.clip(self.cosine(g, r), 0.0, None)
        return float(sims.mean())
