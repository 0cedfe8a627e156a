"""Trainable-parameter partitioning and gradient surgery.

TPU-native counterpart of the reference's imperative parameter handling:
peft wrapping + requires_grad flags (train_textboost.py:699-722), in-place
grad zeroing for original vocab rows (:1109-1117), lora_B "mixing" masks
(:1119-1126), encoder-only grad clipping (:1128-1133) and post-step
embedding renorm (:1138-1150).  Here all of it is pure pytree math fused
into the jitted train step.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

Params = Any

EMB_LABEL = "embedding"
LORA_LABEL = "lora"
FROZEN_LABEL = "frozen"


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_labels(params: Params) -> Params:
    """Label pytree for optax.multi_transform: token embedding trains at
    emb_lr, LoRA adapters at lr, everything else frozen (two param groups,
    train_textboost.py:829-854)."""

    def label(path, _):
        p = _path_str(path)
        if p.endswith("token_embedding"):
            return EMB_LABEL
        if "lora_a" in p or "lora_b" in p:
            return LORA_LABEL
        return FROZEN_LABEL

    return jax.tree_util.tree_map_with_path(label, params)


def trainable_mask(params: Params) -> Params:
    labels = param_labels(params)
    return jax.tree.map(lambda l: l != FROZEN_LABEL, labels)


def count_params(params: Params, mask: Params = None) -> int:
    if mask is None:
        return sum(x.size for x in jax.tree.leaves(params))
    return sum(
        x.size for x, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask)) if m
    )


def zero_frozen_grads(grads: Params, mask: Params) -> Params:
    return jax.tree.map(lambda g, m: g if m else jnp.zeros_like(g), grads, mask)


def zero_original_vocab_rows(grads: Params, first_added_id: int) -> Params:
    """Only added-token embedding rows learn (train_textboost.py:1109-1117)."""

    def fix(path, g):
        if _path_str(path).endswith("token_embedding"):
            rows = jnp.arange(g.shape[0])[:, None]
            return jnp.where(rows < first_added_id, 0.0, g)
        return g

    return jax.tree_util.tree_map_with_path(fix, grads)


def apply_mixing_mask(grads: Params, augment_ops: str = "object") -> Params:
    """Partition LoRA-B capacity between object/style (train:1119-1126).

    torch lora_B rows are output features; our lora_b kernel is [r, out],
    so the mask runs over the output (last) axis: object zeroes odd output
    dims, style zeroes even ones.
    """
    start = 1 if augment_ops == "object" else 0

    def fix(path, g):
        if "lora_b" in _path_str(path):
            cols = jnp.arange(g.shape[-1])[None, :]
            zero = (cols % 2) == (start % 2)
            return jnp.where(zero, 0.0, g)
        return g

    return jax.tree_util.tree_map_with_path(fix, grads)


def _is_encoder_path(path) -> bool:
    # Text-encoder transformer params only: the reference clips
    # text_model.encoder.parameters() — not the embedding matrix and
    # not UNet adapters.
    p = _path_str(path)
    return not p.endswith("token_embedding") and "unet_lora" not in p


def encoder_grad_norm(grads: Params) -> jnp.ndarray:
    """Global norm over encoder (non-embedding, non-UNet) grads."""
    leaves = [
        g
        for path, g in jax.tree_util.tree_leaves_with_path(grads)
        if _is_encoder_path(path)
    ]
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))


def clip_encoder_grads(grads: Params, max_norm: float) -> Params:
    """Clip-by-global-norm over encoder (non-embedding) grads only
    (train_textboost.py:1128-1133 clips text_model.encoder parameters)."""
    gnorm = encoder_grad_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))

    def fix(path, g):
        return g * scale if _is_encoder_path(path) else g

    return jax.tree_util.tree_map_with_path(fix, grads), gnorm


def clip_encoder_transform(max_norm: float) -> optax.GradientTransformation:
    """The encoder-only clip as a GradientTransformation, placed INSIDE the
    optimizer chain (before the AdamW groups) so that under gradient
    accumulation it runs once on the accumulated/averaged grads — matching
    the reference, which clips the synced grads after accumulation
    (train_textboost.py:1128-1133) rather than each micro-batch."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        clipped, _ = clip_encoder_grads(updates, max_norm)
        return clipped, state

    return optax.GradientTransformation(init_fn, update_fn)


def renorm_added_embeddings(
    params: Params, first_added_id: int, target_norm: float
) -> Params:
    """Rescale added-token embeddings to norm <= target (mean pre-training
    norm), train_textboost.py:1138-1150."""

    def fix(path, p):
        if _path_str(path).endswith("token_embedding"):
            norms = jnp.linalg.norm(p, axis=-1, keepdims=True)
            scale = jnp.minimum(target_norm, norms) / jnp.maximum(norms, 1e-12)
            rows = jnp.arange(p.shape[0])[:, None]
            return jnp.where(rows >= first_added_id, p * scale, p)
        return p

    return jax.tree_util.tree_map_with_path(fix, params)


def added_embedding_norm(params: Params, first_added_id: int) -> jnp.ndarray:
    """Mean norm of added-token rows (logged as added_embedding_norm)."""
    flat = jax.tree_util.tree_leaves_with_path(params)
    for path, p in flat:
        if _path_str(path).endswith("token_embedding"):
            return jnp.linalg.norm(p[first_added_id:], axis=-1).mean()
    return jnp.array(0.0)


def split_lora(params: Params):
    """Split a param tree into (base, lora_only) flat-dict halves — used to
    train UNet cross-attention adapters without computing full-UNet grads."""
    import flax

    has_outer = "params" in params
    flat = flax.traverse_util.flatten_dict(
        params["params"] if has_outer else params
    )
    base, lora = {}, {}
    for k, v in flat.items():
        (lora if k[-1] in ("lora_a", "lora_b") else base)[k] = v
    return base, lora


def merge_lora(base: Dict, lora: Dict) -> Params:
    """Inverse of split_lora -> {"params": tree}."""
    import flax

    flat = dict(base)
    flat.update(lora)
    return {"params": flax.traverse_util.unflatten_dict(flat)}


def make_optimizer(
    learning_rate,
    emb_learning_rate,
    params: Params,
    *,
    beta1: float = 0.9,
    beta2: float = 0.999,
    weight_decay: float = 1e-2,
    eps: float = 1e-8,
    accumulate_steps: int = 1,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW with two LR groups (embeddings @ emb_lr, LoRA @ lr) and frozen
    everything-else (train_textboost.py:829-854).  accumulate_steps > 1
    wraps in optax.MultiSteps (gradient accumulation — supported natively
    here; the reference forbids it for multi-process two-model training,
    train_textboost.py:573-577).  max_grad_norm, when set, applies the
    encoder-only clip inside the chain — i.e. AFTER accumulation, on the
    averaged grads, as the reference does (:1128-1133)."""
    labels = param_labels(params)
    adamw = lambda lr: optax.adamw(
        lr, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay
    )
    tx = optax.multi_transform(
        {
            EMB_LABEL: adamw(emb_learning_rate),
            LORA_LABEL: adamw(learning_rate),
            FROZEN_LABEL: optax.set_to_zero(),
        },
        labels,
    )
    if max_grad_norm is not None:
        tx = optax.chain(clip_encoder_transform(max_grad_norm), tx)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def lr_schedule(name: str, base_lr: float, warmup_steps: int, total_steps: int):
    """Constant / constant_with_warmup / linear / cosine schedules
    (--lr_scheduler flag, train_textboost.py:223-231)."""
    if name == "constant":
        return optax.constant_schedule(base_lr)
    if name == "constant_with_warmup":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base_lr, warmup_steps),
                optax.constant_schedule(base_lr),
            ],
            [warmup_steps],
        )
    if name == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base_lr, warmup_steps),
                optax.linear_schedule(base_lr, 0.0, max(total_steps - warmup_steps, 1)),
            ],
            [warmup_steps],
        )
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup_steps, total_steps
        )
    raise ValueError(f"Unknown lr scheduler: {name}")
