"""Multi-head attention dispatch: XLA einsum path + Pallas flash-attention.

All attention in the framework (UNet self/cross attention, CLIP text
encoder) funnels through `multi_head_attention` so the implementation can
be switched globally: "xla" lets the compiler fuse the softmax chain;
"flash" uses the Pallas TPU kernel (ops/flash_attention.py) for long
spatial sequences where materializing the [B,H,N,M] score matrix is
HBM-bandwidth-bound.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

import os

_DEFAULT_IMPL = os.environ.get("TEXTBOOST_ATTENTION", "auto")
# Whether "auto" routes short-KV cross-attention (m != n, e.g. 77 text
# tokens) through the Pallas kernel.  Measured on v5e (sd15 train step,
# bs8/512px): self-attn flash wins big (463 -> 335 ms/step vs XLA) but
# kv-padded cross flash LOSES ~15 ms/step to XLA's fused softmax at
# kv=77, so "auto" defaults to self-attention only.
_FLASH_CROSS = os.environ.get("TEXTBOOST_FLASH_CROSS", "0") != "0"


def set_default_attention_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("auto", "xla", "flash")
    _DEFAULT_IMPL = impl


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
) -> jnp.ndarray:
    # q: [B, N, H, D], k/v: [B, M, H, D]
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over [batch, seq, heads, head_dim].

    Args:
      q: [B, N, H, D]; k, v: [B, M, H, D].
      causal: apply a lower-triangular mask (requires N == M).
      mask: optional boolean mask broadcastable to [B, H, N, M]; True keeps.
      impl: "xla" | "flash" | "auto" (None uses the global default).
    Returns [B, N, H, D] in q's dtype.
    """
    impl = impl or _DEFAULT_IMPL
    n, m = q.shape[1], k.shape[1]
    scale = q.shape[-1] ** -0.5

    if causal:
        assert n == m, "causal attention requires equal query/key lengths"
        tri = jnp.tril(jnp.ones((n, m), dtype=bool))[None, None]
        mask = tri if mask is None else jnp.logical_and(mask, tri)

    if impl == "auto":
        # Flash pays off when the score matrix is large; tiny sequences
        # (CLIP's 77 tokens) are faster through plain XLA fusion.  Covers
        # both big self-attention (m == n) and cross-attention over text
        # (m = 77, KV padded + tail-masked inside the kernel).
        from .flash_attention import supports_flash

        use_flash = (
            jax.default_backend() == "tpu"
            and mask is None
            and not causal
            and n >= 1024
            and (m == n or _FLASH_CROSS)
            # f32 operands double every VMEM buffer and blow the 16 MB
            # scoped limit in the fused backward; full-precision runs take
            # the XLA path instead.
            and q.dtype in (jnp.bfloat16, jnp.float16)
            and supports_flash(n, m, q.shape[-1])
        )
        impl = "flash" if use_flash else "xla"

    if impl == "flash":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale).astype(q.dtype)
    return _xla_attention(q, k, v, mask, scale).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, n, d = x.shape
    return x.reshape(b, n, num_heads, d // num_heads)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, n, h, d = x.shape
    return x.reshape(b, n, h * d)
