"""Flax UNet2DCondition — the frozen denoiser of the SD family.

TPU-native counterpart of diffusers' `UNet2DConditionModel` used by the
reference at /root/reference/train_textboost.py:654,1063-1067.  Built
NHWC with attention through ops/attention.py (Pallas flash path for the
large spatial sequences), optional per-block rematerialization for the
backward-through-activations pass the TextBoost objective needs (gradients
flow to the text encoder through every cross-attention layer).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .configs import UNetConfig
from .layers import (
    Downsample,
    ResnetBlock,
    Transformer2D,
    Upsample,
    timestep_embedding,
)


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # LoRA rank on cross-attention to_k/to_v (--unet_params_to_train=crossattn_kv).
    cross_lora_rank: int = 0

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, H, W, C_in] noisy latents
        timesteps: jnp.ndarray,  # [B] int
        encoder_hidden_states: jnp.ndarray,  # [B, T, cross_dim]
    ) -> jnp.ndarray:
        cfg = self.config
        Res = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        Attn = nn.remat(Transformer2D) if self.remat else Transformer2D

        ch0 = cfg.block_out_channels[0]
        temb = timestep_embedding(
            timesteps, ch0, cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        temb = nn.Dense(ch0 * 4, dtype=self.dtype, name="time_embedding_linear_1")(temb)
        temb = nn.Dense(ch0 * 4, dtype=self.dtype, name="time_embedding_linear_2")(
            jax.nn.silu(temb)
        )

        ctx = encoder_hidden_states.astype(self.dtype)
        x = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            sample.astype(self.dtype)
        )

        def make_attn(level: int, name: str):
            return Attn(
                num_heads=cfg.num_attention_heads[level],
                depth=cfg.transformer_layers_per_block,
                use_linear_projection=cfg.use_linear_projection,
                num_groups=cfg.norm_num_groups,
                dtype=self.dtype,
                cross_lora_rank=self.cross_lora_rank,
                name=name,
            )

        # ------------------------- down -------------------------
        skips = [x]
        num_levels = len(cfg.block_out_channels)
        for level, out_ch in enumerate(cfg.block_out_channels):
            has_attn = cfg.cross_attention_levels[level]
            for j in range(cfg.layers_per_block):
                x = Res(
                    out_channels=out_ch,
                    num_groups=cfg.norm_num_groups,
                    dtype=self.dtype,
                    name=f"down_{level}_resnet_{j}",
                )(x, temb)
                if has_attn:
                    x = make_attn(level, f"down_{level}_attn_{j}")(x, ctx)
                skips.append(x)
            if level != num_levels - 1:
                # downsample_padding=1 (symmetric) in every published SD
                # UNet config — asym_pad is the VAE-encoder convention only.
                x = Downsample(out_ch, asym_pad=False, dtype=self.dtype,
                               name=f"down_{level}_downsample")(x)
                skips.append(x)

        # ------------------------- mid --------------------------
        mid_ch = cfg.block_out_channels[-1]
        x = Res(
            out_channels=mid_ch,
            num_groups=cfg.norm_num_groups,
            dtype=self.dtype,
            name="mid_resnet_0",
        )(x, temb)
        x = make_attn(num_levels - 1, "mid_attn")(x, ctx)
        x = Res(
            out_channels=mid_ch,
            num_groups=cfg.norm_num_groups,
            dtype=self.dtype,
            name="mid_resnet_1",
        )(x, temb)

        # -------------------------- up --------------------------
        for up_idx, level in enumerate(reversed(range(num_levels))):
            out_ch = cfg.block_out_channels[level]
            has_attn = cfg.cross_attention_levels[level]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = Res(
                    out_channels=out_ch,
                    num_groups=cfg.norm_num_groups,
                    dtype=self.dtype,
                    name=f"up_{up_idx}_resnet_{j}",
                )(x, temb)
                if has_attn:
                    x = make_attn(level, f"up_{up_idx}_attn_{j}")(x, ctx)
            if up_idx != num_levels - 1:
                x = Upsample(out_ch, dtype=self.dtype, name=f"up_{up_idx}_upsample")(x)

        # ------------------------- out --------------------------
        from .layers import group_norm

        x = group_norm(x, cfg.norm_num_groups, "conv_norm_out", silu=True)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x
