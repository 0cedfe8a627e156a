"""TextBoost text-encoder semantics: null-embedding and fixed-BOS patching.

Functional counterpart of `TextBoostModel.forward`
(/root/reference/textboost/text_encoder.py:34-87): after the CLIP forward,
(1) rows whose second token is EOS (i.e. the empty prompt) have their whole
output sequence replaced by a cached frozen-encoder null embedding, and
(2) when fixed-special mode is on, position 0 (the BOS output) of every row
is pinned to null_embedding[0].  Here both patches are two `jnp.where` ops
inside the jitted step; the cached embedding is a [77, hidden] constant.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def load_null_embedding_asset(
    path: str, expected_shape: Optional[Tuple[int, int]] = None
) -> np.ndarray:
    """Load a reference-format cached embedding asset
    (assets/null_emb_*.pt / start_emb_*.pt: a fp32 [77, hidden] torch
    tensor, train_textboost.py:649 / eval_dreambooth.py:179-181)."""
    import torch

    tensor = torch.load(path, map_location="cpu", weights_only=True)
    arr = np.asarray(tensor.float().numpy(), np.float32)
    if expected_shape is not None and tuple(arr.shape) != tuple(expected_shape):
        raise ValueError(
            f"embedding asset {path} has shape {arr.shape}, "
            f"expected {tuple(expected_shape)} for this model family"
        )
    return arr


def apply_null_embedding_patch(
    hidden: jnp.ndarray,  # [B, T, H] last hidden state
    input_ids: jnp.ndarray,  # [B, T]
    null_embedding: Optional[jnp.ndarray],  # [T, H] or None
    eos_token_id: int = 49407,
    fixed_special: bool = True,
) -> jnp.ndarray:
    if null_embedding is None:
        return hidden
    null_embedding = null_embedding.astype(hidden.dtype)
    is_null = (input_ids[:, 1] == eos_token_id)[:, None, None]
    hidden = jnp.where(is_null, null_embedding[None, :, :], hidden)
    if fixed_special:
        bos_row = jnp.broadcast_to(
            null_embedding[0][None, None, :], (hidden.shape[0], 1, hidden.shape[2])
        )
        hidden = jnp.concatenate([bos_row, hidden[:, 1:]], axis=1)
    return hidden


def encode_prompt(
    text_encoder_apply,
    params,
    input_ids: jnp.ndarray,
    null_embedding: Optional[jnp.ndarray] = None,
    eos_token_id: int = 49407,
    fixed_special: bool = True,
) -> jnp.ndarray:
    """Counterpart of utils.encode_prompt (/root/reference/textboost/utils.py:11-26)
    composed with the TextBoost output patch."""
    hidden, _ = text_encoder_apply(params, input_ids)
    return apply_null_embedding_patch(
        hidden, input_ids, null_embedding, eos_token_id, fixed_special
    )
