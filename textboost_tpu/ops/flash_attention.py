"""Pallas TPU flash attention.

Placeholder that currently routes to the XLA path; replaced by the real
Pallas kernel in the performance pass (SURVEY.md §7 step 7).  Keeping the
symbol stable lets ops/attention.py dispatch unconditionally.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, scale: float
) -> jnp.ndarray:
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)
