"""Flax AutoencoderKL — the frozen VAE of the SD family.

TPU-native counterpart of diffusers' `AutoencoderKL`
(/root/reference/train_textboost.py:651,1036-1037).  NHWC layout; the
training path only needs `encode` + a diagonal-Gaussian sample, the
inference pipeline only needs `decode`.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import VAEConfig
from .layers import Downsample, ResnetBlock, Upsample, VAEAttention, group_norm


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in"
        )(x)
        num_levels = len(cfg.block_out_channels)
        for level, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(
                    out_channels=out_ch,
                    use_time_emb=False, eps=1e-6,
                    num_groups=cfg.norm_num_groups,
                    dtype=self.dtype,
                    name=f"down_{level}_resnet_{j}",
                )(x)
            if level != num_levels - 1:
                x = Downsample(out_ch, dtype=self.dtype, name=f"down_{level}_downsample")(x)

        mid_ch = cfg.block_out_channels[-1]
        x = ResnetBlock(
            out_channels=mid_ch, use_time_emb=False, eps=1e-6,
            num_groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_resnet_0",
        )(x)
        x = VAEAttention(cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(
            out_channels=mid_ch, use_time_emb=False, eps=1e-6,
            num_groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_resnet_1",
        )(x)

        x = group_norm(x, cfg.norm_num_groups, "conv_norm_out", eps=1e-6, silu=True)
        # 2x latent channels: [mean, logvar] moments.
        return nn.Conv(
            cfg.latent_channels * 2, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(x)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        mid_ch = cfg.block_out_channels[-1]
        x = nn.Conv(mid_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)

        x = ResnetBlock(
            out_channels=mid_ch, use_time_emb=False, eps=1e-6,
            num_groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_resnet_0",
        )(x)
        x = VAEAttention(cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(
            out_channels=mid_ch, use_time_emb=False, eps=1e-6,
            num_groups=cfg.norm_num_groups, dtype=self.dtype, name="mid_resnet_1",
        )(x)

        num_levels = len(cfg.block_out_channels)
        for up_idx, level in enumerate(reversed(range(num_levels))):
            out_ch = cfg.block_out_channels[level]
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock(
                    out_channels=out_ch, use_time_emb=False, eps=1e-6,
                    num_groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f"up_{up_idx}_resnet_{j}",
                )(x)
            if up_idx != num_levels - 1:
                x = Upsample(out_ch, dtype=self.dtype, name=f"up_{up_idx}_upsample")(x)

        x = group_norm(x, cfg.norm_num_groups, "conv_norm_out", eps=1e-6, silu=True)
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(x)


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        self.quant_conv = nn.Conv(
            self.config.latent_channels * 2, (1, 1), dtype=self.dtype
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), dtype=self.dtype
        )

    def encode_moments(self, pixels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pixels [B,H,W,3] in [-1,1] -> (mean, logvar) of the latent posterior."""
        moments = self.quant_conv(self.encoder(pixels))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, pixels: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Sample z ~ posterior (NOT yet multiplied by scaling_factor)."""
        mean, logvar = self.encode_moments(pixels)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """latents (already divided by scaling_factor) -> pixels in [-1,1]."""
        return self.decoder(self.post_quant_conv(latents))

    def __call__(self, pixels: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        z = self.encode(pixels, rng)
        return self.decode(z)
