"""Flax T5 encoder-decoder (Flan-T5 v1.1 architecture) for VQAScore.

The reference's VQAScore metric runs `t2v_metrics.VQAScore
(model="clip-flant5-xxl")` (/root/reference/eval_dreambooth.py:546-565):
a CLIP-ViT-L-vision-conditioned Flan-T5-XXL that scores image/text
alignment as the probability of the answer "Yes" to a yes/no question
about the image (VQAScore, Lin et al., arXiv 2404.01291).  The language
backbone of that model is this module: T5 v1.1 — RMSNorm (pre-norm, no
bias), relative-position-bucket attention bias held by the first block of
each stack, gated-GELU feed-forward, untied LM head, no sqrt(d) attention
scaling.

The encoder accepts `inputs_embeds` so image tokens projected into the
embedding space can be prepended to the question tokens (the clip-flant5
conditioning mechanism — see eval/vqa.py::NativeVQAScorer).

Weight layout mirrors the HF torch state dict closely enough that
`eval/scorer_weights.py::convert_t5` is a direct key map; parity against
`transformers.T5ForConditionalGeneration` is asserted at the logit level
in tests/test_vqa_native.py.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096  # flan-t5-xxl geometry as the default
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_decoder_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    tie_word_embeddings: bool = False  # flan-t5 / t5-v1.1: untied lm head
    decoder_start_token_id: int = 0
    pad_token_id: int = 0


TINY_T5 = T5Config(
    vocab_size=256, d_model=32, d_kv=8, d_ff=64,
    num_layers=2, num_decoder_layers=2, num_heads=4,
)


def _gelu_new(x):
    # HF "gelu_new" (the gated activation of t5-v1.1 / flan-t5), exact
    # tanh-approximation formula.
    return 0.5 * x * (
        1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * jnp.power(x, 3.0)))
    )


class T5LayerNorm(nn.Module):
    """T5 RMSNorm: no mean subtraction, no bias, fp32 accumulation."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.epsilon)
        return (weight * x).astype(self.dtype)


def relative_position_bucket(
    relative_position: jnp.ndarray,
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jnp.ndarray:
    """HF T5's bucketing of relative positions (key_pos - query_pos)."""
    buckets = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        buckets = buckets + (relative_position > 0).astype(jnp.int32) * num_buckets
        relative_position = jnp.abs(relative_position)
    else:
        relative_position = -jnp.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = relative_position < max_exact
    rp = jnp.maximum(relative_position, 1)  # guard log(0); masked by is_small
    if_large = max_exact + (
        jnp.log(rp.astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    if_large = jnp.minimum(if_large, num_buckets - 1)
    return buckets + jnp.where(is_small, relative_position, if_large)


class T5Attention(nn.Module):
    config: T5Config
    causal: bool = False
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    def _compute_bias(self, q_len: int, k_len: int) -> jnp.ndarray:
        cfg = self.config
        bias_table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        ctx = jnp.arange(q_len)[:, None]
        mem = jnp.arange(k_len)[None, :]
        buckets = relative_position_bucket(
            mem - ctx,
            bidirectional=not self.causal,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )
        bias = bias_table[buckets]  # [Lq, Lk, H]
        return bias.transpose(2, 0, 1)[None].astype(jnp.float32)  # [1,H,Lq,Lk]

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,
        kv: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        position_bias: Optional[jnp.ndarray] = None,
    ):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: nn.Dense(
            inner, use_bias=False, dtype=self.dtype, name=name
        )
        src = hidden if kv is None else kv
        b, lq, _ = hidden.shape
        lk = src.shape[1]
        split = lambda x: x.reshape(b, -1, cfg.num_heads, cfg.d_kv).transpose(
            0, 2, 1, 3
        )
        q = split(dense("q")(hidden))
        k = split(dense("k")(src))
        v = split(dense("v")(src))
        # T5 applies NO 1/sqrt(d) scaling (folded into init).
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        if position_bias is None:
            if self.has_relative_bias:
                position_bias = self._compute_bias(lq, lk)
            else:
                position_bias = jnp.zeros((1, 1, lq, lk), jnp.float32)
        scores = scores + position_bias
        neg = jnp.asarray(-1e9, jnp.float32)
        if self.causal:
            cmask = jnp.tril(jnp.ones((lq, lk), bool))
            scores = jnp.where(cmask[None, None], scores, neg)
        if mask is not None:  # [B, Lk] pad mask, True = attend
            scores = jnp.where(mask[:, None, None, :], scores, neg)
        probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, inner)
        return nn.Dense(
            cfg.d_model, use_bias=False, dtype=self.dtype, name="o"
        )(out), position_bias


class T5FeedForward(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        cfg = self.config
        gate = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(
            hidden
        )
        lin = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(
            hidden
        )
        h = _gelu_new(gate) * lin
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")(h)


class T5Block(nn.Module):
    config: T5Config
    is_decoder: bool = False
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden,
        enc_hidden=None,
        self_mask=None,
        cross_mask=None,
        position_bias=None,
    ):
        cfg = self.config
        ln = lambda name: T5LayerNorm(
            epsilon=cfg.layer_norm_epsilon, dtype=self.dtype, name=name
        )
        h, position_bias = T5Attention(
            cfg,
            causal=self.is_decoder,
            has_relative_bias=self.has_relative_bias,
            dtype=self.dtype,
            name="self_attn",
        )(ln("self_attn_norm")(hidden), mask=self_mask, position_bias=position_bias)
        hidden = hidden + h
        if self.is_decoder:
            h, _ = T5Attention(cfg, dtype=self.dtype, name="cross_attn")(
                ln("cross_attn_norm")(hidden), kv=enc_hidden, mask=cross_mask
            )
            hidden = hidden + h
        h = T5FeedForward(cfg, dtype=self.dtype, name="ff")(ln("ff_norm")(hidden))
        return hidden + h, position_bias


class T5Stack(nn.Module):
    config: T5Config
    is_decoder: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs_embeds, enc_hidden=None, self_mask=None, cross_mask=None):
        cfg = self.config
        n = cfg.num_decoder_layers if self.is_decoder else cfg.num_layers
        hidden = inputs_embeds
        position_bias = None  # block 0 computes it; later blocks reuse it
        for i in range(n):
            hidden, position_bias = T5Block(
                cfg,
                is_decoder=self.is_decoder,
                has_relative_bias=(i == 0),
                dtype=self.dtype,
                name=f"block_{i}",
            )(
                hidden,
                enc_hidden=enc_hidden,
                self_mask=self_mask,
                cross_mask=cross_mask,
                position_bias=position_bias,
            )
        return T5LayerNorm(
            epsilon=cfg.layer_norm_epsilon, dtype=self.dtype, name="final_layer_norm"
        )(hidden)


class T5ForConditionalGeneration(nn.Module):
    """Encoder-decoder LM.  `encode` takes ids OR raw inputs_embeds (the
    image-token injection point); `decode` returns vocab logits."""

    config: T5Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.shared = nn.Embed(
            cfg.vocab_size, cfg.d_model, dtype=self.dtype, name="shared"
        )
        self.encoder = T5Stack(cfg, is_decoder=False, dtype=self.dtype)
        self.decoder = T5Stack(cfg, is_decoder=True, dtype=self.dtype)
        if not cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head"
            )

    def embed(self, input_ids):
        return self.shared(input_ids)

    def encode(self, input_ids=None, inputs_embeds=None, attention_mask=None):
        if inputs_embeds is None:
            inputs_embeds = self.shared(input_ids)
        return self.encoder(inputs_embeds, self_mask=attention_mask)

    def decode(self, decoder_input_ids, enc_hidden, enc_mask=None):
        hidden = self.decoder(
            self.shared(decoder_input_ids),
            enc_hidden=enc_hidden,
            cross_mask=enc_mask,
        )
        if self.config.tie_word_embeddings:
            # Tied head: scale hidden by d_model^-0.5, project on E^T.
            hidden = hidden * (self.config.d_model ** -0.5)
            return hidden @ self.shared.embedding.T.astype(self.dtype)
        return self.lm_head(hidden)

    def __call__(self, input_ids, decoder_input_ids, attention_mask=None):
        enc = self.encode(input_ids=input_ids, attention_mask=attention_mask)
        return self.decode(decoder_input_ids, enc, enc_mask=attention_mask)
