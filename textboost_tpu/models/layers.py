"""Shared building blocks for the UNet and VAE (NHWC, TPU-native layouts).

Functional counterparts of the diffusers blocks the reference inherits
(ResnetBlock2D, Transformer2DModel, Attention, Up/Downsample2D) — written
fresh for XLA: NHWC convolutions, attention through the shared dispatch in
ops/attention.py, bf16-friendly GroupNorm in fp32 for stability.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import merge_heads, multi_head_attention, split_heads


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis, fp32 stats, optional fused
    SiLU epilogue.

    Dispatches to the Pallas fused kernel (ops/group_norm.py: one HBM read
    + one write per direction) on TPU when the per-batch slab fits VMEM;
    falls back to inline flax-equivalent math otherwise.  Param tree
    (scale/bias) matches nn.GroupNorm so checkpoints convert identically.
    """

    num_groups: int
    eps: float = 1e-5
    silu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        from ..ops.group_norm import (
            fused_group_norm,
            group_norm_impl,
            supports_fused,
        )

        rows = 1
        for d in x.shape[1:-1]:
            rows *= d
        impl = group_norm_impl()
        use_fused = impl == "fused" or (
            impl == "auto"
            and jax.default_backend() == "tpu"
            and supports_fused(rows, c, self.num_groups)
        )
        if use_fused:
            return fused_group_norm(
                x, scale, bias, self.num_groups, eps=self.eps, silu=self.silu
            )

        # XLA fallback: flax nn.GroupNorm's exact computation — one-pass
        # stats (E[x], E[x^2] reduced together; var = E[x^2] - E[x]^2) over
        # the unsplit spatial axes.  An earlier variant that flattened
        # spatial dims to [B, rows, G, S] and used .var() (two passes over
        # the slab) compiled to a measurably slower program on TPU
        # (~+60 ms/step inside the 512px VAE encoder, where every slab
        # exceeds the fused kernel's VMEM budget).
        xf = x.astype(jnp.float32)
        grouped = xf.reshape(x.shape[:-1] + (self.num_groups, c // self.num_groups))
        red_axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        mean = grouped.mean(axis=red_axes, keepdims=True)
        mean2 = jnp.square(grouped).mean(axis=red_axes, keepdims=True)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        y = ((grouped - mean) * jax.lax.rsqrt(var + self.eps)).reshape(xf.shape)
        y = (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
            x.dtype
        )
        if self.silu:
            y = jax.nn.silu(y)
        return y


def group_norm(
    x: jnp.ndarray, num_groups: int, name: str, eps: float = 1e-5, silu: bool = False
):
    """GroupNorm over the channel (last) axis, computed in fp32."""
    return GroupNorm(num_groups=num_groups, eps=eps, silu=silu, name=name)(x)


class ResnetBlock(nn.Module):
    """GN -> SiLU -> conv3x3 -> (+time) -> GN -> SiLU -> conv3x3 -> +skip.

    `eps`: the UNet's blocks normalize with the model-wide norm_eps (1e-5
    for the SD family); the VAE's encoder/decoder blocks are built with
    eps=1e-6 (diffusers AutoencoderKL passes resnet_eps=1e-6 throughout).
    Verified at activation level vs an independent torch implementation in
    tests/test_torch_oracle.py.
    """

    out_channels: int
    use_time_emb: bool = True
    num_groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None):
        in_channels = x.shape[-1]
        h = group_norm(x, self.num_groups, "norm1", eps=self.eps, silu=True)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                jax.nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = group_norm(h, self.num_groups, "norm2", eps=self.eps, silu=True)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class Downsample(nn.Module):
    """Stride-2 3x3 downsampling conv.

    Padding follows diffusers Downsample2D: the VAE encoder builds it with
    padding=0 and applies an explicit asymmetric (0,1)x(0,1) pad
    (`asym_pad=True`); the UNet builds it with downsample_padding=1 —
    ordinary symmetric padding (`asym_pad=False`).  Using the VAE-style
    asymmetric pad in the UNet shifts every conv window one pixel off the
    published weights' training distribution (caught by the torch
    activation oracle, r5)."""

    out_channels: int
    asym_pad: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((0, 1), (0, 1)) if self.asym_pad else ((1, 1), (1, 1))
        return nn.Conv(
            self.out_channels,
            (3, 3),
            strides=(2, 2),
            padding=pad,
            dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class GEGLU(nn.Module):
    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_features * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * 4, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(dim, dtype=self.dtype, name="net_2")(h)


class CrossAttention(nn.Module):
    """Attention with optional encoder context (self-attn when context=None).

    kv_lora_rank > 0 adds LoRA adapters on to_k/to_v — the UNet
    `--unet_params_to_train=crossattn_kv` capability
    (train_textboost.py:712-721 targets attn2.to_k/to_v)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    kv_lora_rank: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None):
        from ..models.clip import LoRADense

        dim = x.shape[-1]
        ctx = x if context is None else context
        q = nn.Dense(dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        if self.kv_lora_rank > 0:
            k = LoRADense(
                dim, lora_rank=self.kv_lora_rank, use_bias=False,
                dtype=self.dtype, name="to_k",
            )(ctx)
            v = LoRADense(
                dim, lora_rank=self.kv_lora_rank, use_bias=False,
                dtype=self.dtype, name="to_v",
            )(ctx)
        else:
            k = nn.Dense(dim, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
            v = nn.Dense(dim, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        out = multi_head_attention(
            split_heads(q, self.num_heads),
            split_heads(k, self.num_heads),
            split_heads(v, self.num_heads),
        )
        return nn.Dense(dim, dtype=self.dtype, name="to_out")(merge_heads(out))


class BasicTransformerBlock(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    cross_lora_rank: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray):
        # eps=1e-5: torch nn.LayerNorm's default, which the reference stack
        # inherits (flax's default is 1e-6 — caught by the torch oracle).
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        x = x + CrossAttention(self.num_heads, self.dtype, name="attn1")(ln("norm1")(x))
        x = x + CrossAttention(
            self.num_heads, self.dtype, kv_lora_rank=self.cross_lora_rank, name="attn2"
        )(ln("norm2")(x), context)
        x = x + FeedForward(self.dtype, name="ff")(ln("norm3")(x))
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> proj_in -> N blocks -> proj_out -> +residual."""

    num_heads: int
    depth: int = 1
    use_linear_projection: bool = False
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    cross_lora_rank: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray):
        b, h, w, c = x.shape
        residual = x
        x = group_norm(x, self.num_groups, "norm", eps=1e-6)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(c, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.num_heads,
                self.dtype,
                cross_lora_rank=self.cross_lora_rank,
                name=f"transformer_blocks_{i}",
            )(x, context)
        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, c)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial positions (VAE mid block)."""

    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, h, w, c = x.shape
        residual = x
        x = group_norm(x, self.num_groups, "group_norm", eps=1e-6)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        out = multi_head_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return residual + out.reshape(b, h, w, c)


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding parity)."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
