"""Flax CLIP text encoder with first-class LoRA support.

TPU-native counterpart of `transformers.CLIPTextModel` as used by the
reference (/root/reference/textboost/text_encoder.py:17-87,
train_textboost.py:646-649).  Differences by design:

  * LoRA is part of the module (`LoRADense` on q/k/v/out projections with a
    static rank), not a runtime monkey-patch — the adapted forward is a
    single fused XLA program.
  * The null-embedding / fixed-BOS patching lives in
    `textboost_tpu.models.textboost` as two `jnp.where` ops inside jit.
  * Causal masking is folded into the attention dispatch (ops/attention.py).

Param tree mirrors HF's flax CLIP naming so torch checkpoints convert
mechanically (models/convert.py).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import merge_heads, multi_head_attention, split_heads
from .configs import CLIPTextConfig

ACT = {
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
}


class LoRADense(nn.Module):
    """Dense layer with an optional low-rank adapter branch.

    y = x W + b + (alpha/r) * (x A) B  —  A ~ N(0, 1/r), B = 0 at init
    (peft `init_lora_weights="gaussian"` semantics; reference config at
    train_textboost.py:702-709 uses alpha = r = rank).
    The base kernel/bias and the adapter live in the same param tree;
    trainability is decided by the optimizer mask (lora.partition).
    """

    features: int
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02), (in_features, self.features)
        )
        y = x @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        if self.lora_rank > 0:
            alpha = self.lora_alpha if self.lora_alpha is not None else self.lora_rank
            a = self.param(
                "lora_a",
                nn.initializers.normal(1.0 / self.lora_rank),
                (in_features, self.lora_rank),
            )
            b = self.param(
                "lora_b", nn.initializers.zeros, (self.lora_rank, self.features)
            )
            scale = alpha / self.lora_rank
            y = y + ((x @ a.astype(self.dtype)) @ b.astype(self.dtype)) * scale
        return y


def pad_attention_mask(input_ids: jnp.ndarray, eos_token_id: int) -> jnp.ndarray:
    """Boolean [B, L] padding mask computed from the ids: True through the
    first EOS, False after — exactly the tokenizer `attention_mask` the
    reference threads into the CLIP forward when
    --text_encoder_use_attention_mask is set
    (/root/reference/textboost/utils.py:11-26, train_textboost.py:319-330).
    Computing it in-graph avoids shipping a second [B, 77] host array."""
    eos_pos = jnp.argmax((input_ids == eos_token_id).astype(jnp.int32), axis=-1)
    return jnp.arange(input_ids.shape[-1])[None, :] <= eos_pos[:, None]


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, hidden: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        cfg = self.config
        heads = cfg.num_attention_heads
        dense = lambda name, rank: LoRADense(
            cfg.hidden_size, lora_rank=rank, dtype=self.dtype, name=name
        )
        # Reference LoRA targets: q_proj, k_proj, v_proj only
        # (train_textboost.py:702-709); out_proj stays dense.
        q = dense("q_proj", self.lora_rank)(hidden)
        k = dense("k_proj", self.lora_rank)(hidden)
        v = dense("v_proj", self.lora_rank)(hidden)
        # Key-padding mask [B, L] -> [B, 1, 1, L]; combined with the causal
        # mask inside the dispatch.
        mask = attention_mask[:, None, None, :] if attention_mask is not None else None
        out = multi_head_attention(
            split_heads(q, heads),
            split_heads(k, heads),
            split_heads(v, heads),
            causal=True,
            mask=mask,
        )
        return dense("out_proj", 0)(merge_heads(out))


class CLIPMLP(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        h = LoRADense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(hidden)
        h = ACT[cfg.hidden_act](h)
        return LoRADense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, hidden: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name=name)
        residual = hidden
        hidden = ln("layer_norm1")(hidden)
        hidden = CLIPAttention(cfg, self.lora_rank, self.dtype, name="self_attn")(
            hidden, attention_mask
        )
        hidden = residual + hidden
        residual = hidden
        hidden = ln("layer_norm2")(hidden)
        hidden = CLIPMLP(cfg, self.dtype, name="mlp")(hidden)
        return residual + hidden


class CLIPTextModel(nn.Module):
    """CLIP text transformer returning (last_hidden_state, pooled_output).

    `vocab_size_override` supports token surgery: after adding placeholder
    tokens the embedding matrix is re-created with extra rows
    (tokens/surgery.py) and the model re-bound with the grown vocab.
    """

    config: CLIPTextConfig
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32
    vocab_size_override: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        position_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        vocab = self.vocab_size_override or cfg.vocab_size
        seq_len = input_ids.shape[-1]
        if position_ids is None:
            position_ids = jnp.arange(seq_len)[None, :]

        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02), (vocab, cfg.hidden_size)
        )
        pos_emb = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        hidden = tok_emb[input_ids].astype(self.dtype) + pos_emb[position_ids].astype(self.dtype)

        for i in range(cfg.num_hidden_layers):
            hidden = CLIPEncoderLayer(
                cfg, self.lora_rank, self.dtype, name=f"layers_{i}"
            )(hidden, attention_mask)

        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm"
        )(hidden)

        # Pooled output = hidden state at the (first) EOS token position.
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(hidden, eos_pos[:, None, None], axis=1)[:, 0]
        return hidden, pooled
