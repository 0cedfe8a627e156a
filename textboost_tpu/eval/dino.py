"""DINOv2 ViT feature extractor for the DINO metric.

Counterpart of eval_dreambooth.py:456-543 (torch.hub dinov2_vitl14 CLS
features + cosine).  Standard ViT with patch 14, optional register tokens;
weights load from a converted local snapshot — random init otherwise (the
metric then only measures self-consistency).
"""
from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import merge_heads, multi_head_attention, split_heads

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    mlp_ratio: int = 4
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    layer_norm_eps: float = 1e-6
    num_register_tokens: int = 0


TINY_VIT = ViTConfig(
    image_size=56, hidden_size=64, num_hidden_layers=2, num_attention_heads=4
)


class _Block(nn.Module):
    config: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name=name)
        # DINOv2 uses LayerScale on both residual branches (gamma init 1.0
        # keeps random-init behavior neutral; real weights load tiny gammas).
        ls1 = self.param("ls1", nn.initializers.ones, (cfg.hidden_size,))
        ls2 = self.param("ls2", nn.initializers.ones, (cfg.hidden_size,))
        h = ln("norm1")(x)
        qkv = nn.Dense(cfg.hidden_size * 3, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        heads = cfg.num_attention_heads
        o = multi_head_attention(
            split_heads(q, heads), split_heads(k, heads), split_heads(v, heads)
        )
        x = x + ls1.astype(self.dtype) * nn.Dense(
            cfg.hidden_size, dtype=self.dtype, name="proj"
        )(merge_heads(o))
        h = ln("norm2")(x)
        h = nn.Dense(cfg.hidden_size * cfg.mlp_ratio, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + ls2.astype(self.dtype) * nn.Dense(
            cfg.hidden_size, dtype=self.dtype, name="fc2"
        )(h)


class ViTFeatures(nn.Module):
    config: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        p = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )(pixels.astype(self.dtype))
        b, gh, gw, d = p.shape
        tokens = [
            jnp.broadcast_to(
                self.param("cls_token", nn.initializers.zeros, (d,)).astype(self.dtype)[
                    None, None
                ],
                (b, 1, d),
            )
        ]
        if cfg.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.zeros,
                (cfg.num_register_tokens, d),
            )
            tokens.append(jnp.broadcast_to(reg.astype(self.dtype)[None], (b,) + reg.shape))
        x = jnp.concatenate(tokens + [p.reshape(b, gh * gw, d)], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1 + gh * gw, d)
        )
        # Registers (if any) carry no positional embedding (DINOv2-reg).
        x = x.at[:, :1].add(pos.astype(self.dtype)[None, :1])
        x = x.at[:, 1 + cfg.num_register_tokens :].add(pos.astype(self.dtype)[None, 1:])
        for i in range(cfg.num_hidden_layers):
            x = _Block(cfg, self.dtype, name=f"blocks_{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm")(x)
        return x[:, 0]  # CLS feature


class DINOScorer:
    def __init__(self, config: ViTConfig = None, params=None, seed: int = 0):
        self.config = config or ViTConfig()
        self.model = ViTFeatures(self.config)
        if params is None:
            px = jnp.zeros((1, self.config.image_size, self.config.image_size, 3))
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), px)
        self.params = params
        self._fn = jax.jit(self.model.apply)

    def features(self, uint8_images: np.ndarray) -> np.ndarray:
        from .clip_scorer import normalize_images

        px = normalize_images(uint8_images, self.config.image_size)
        # Re-normalize from CLIP stats to ImageNet stats.
        from .clip_scorer import CLIP_MEAN, CLIP_STD

        px = (px * CLIP_STD + CLIP_MEAN - IMAGENET_MEAN) / IMAGENET_STD
        return np.asarray(self._fn(self.params, jnp.asarray(px)), np.float32)

    def dino_score(self, gen_images, ref_images) -> float:
        g = self.features(gen_images)
        r = self.features(ref_images)
        g = g / np.clip(np.linalg.norm(g, axis=-1, keepdims=True), 1e-8, None)
        r = r / np.clip(np.linalg.norm(r, axis=-1, keepdims=True), 1e-8, None)
        return float(np.clip(g @ r.T, 0.0, None).mean())
