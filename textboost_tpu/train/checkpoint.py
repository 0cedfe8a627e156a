"""Checkpoint save/restore: native orbax trainer state + reference-format
exports.

Mirrors the reference's three cooperating formats (SURVEY.md §5,
train_textboost.py:959-981,1156-1266):
  1. full trainer state (params/opt/step/rng) -> orbax (the accelerate
     `save_state` counterpart), under checkpoint-{step}/state;
  2. PEFT adapter dir `text_encoder/` (adapter_model.safetensors +
     adapter_config.json) for `load_adapter` consumers;
  3. per-token `{token}.bin` textual-inversion files.
Retention pruning honors checkpoints_total_limit (:1159-1175).
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..lora.peft_io import export_lora_adapter, export_token_embeddings

_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def checkpoint_dirs(output_dir: str) -> List[str]:
    if not os.path.isdir(output_dir):
        return []
    entries = [
        d for d in os.listdir(output_dir) if _CKPT_RE.match(d)
    ]
    return sorted(entries, key=lambda d: int(_CKPT_RE.match(d).group(1)))


def prune_checkpoints(output_dir: str, total_limit: Optional[int]):
    if total_limit is None:
        return
    dirs = checkpoint_dirs(output_dir)
    # Reference removes enough to leave room for the new one (:1165-1175).
    if len(dirs) >= total_limit:
        for d in dirs[: len(dirs) - total_limit + 1]:
            shutil.rmtree(os.path.join(output_dir, d), ignore_errors=True)


def save_checkpoint(
    output_dir: str,
    step: int,
    state,
    *,
    token_to_id: Dict[str, int],
    lora_rank: int,
    base_model_name: str = "",
    total_limit: Optional[int] = None,
):
    prune_checkpoints(output_dir, total_limit)
    ckpt_dir = os.path.join(output_dir, f"checkpoint-{step}")
    os.makedirs(ckpt_dir, exist_ok=True)

    # (1) native trainer state.
    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.abspath(os.path.join(ckpt_dir, "state"))
    payload = {
        "step": np.asarray(state.step),
        "te_params": jax.tree.map(np.asarray, state.te_params),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
        "rng": np.asarray(state.rng),
    }
    ckptr.save(state_path, payload, force=True)
    ckptr.wait_until_finished()

    # (2) PEFT adapter (fp32), consumed by inference `load_adapter`.
    te_tree = (
        state.te_params["te"]
        if isinstance(state.te_params, dict) and "te" in state.te_params
        else state.te_params
    )
    if lora_rank > 0:
        export_lora_adapter(
            te_tree,
            os.path.join(ckpt_dir, "text_encoder"),
            rank=lora_rank,
            base_model_name=base_model_name,
        )

    # (3) token bins.
    emb = np.asarray(_find_embedding(te_tree), dtype=np.float32)
    export_token_embeddings(emb, token_to_id, ckpt_dir)
    return ckpt_dir


def _find_embedding(params) -> np.ndarray:
    flat = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in flat:
        if str(getattr(path[-1], "key", path[-1])) == "token_embedding":
            return leaf
    raise KeyError("token_embedding not found in params")


def latest_checkpoint(output_dir: str) -> Optional[str]:
    dirs = checkpoint_dirs(output_dir)
    return os.path.join(output_dir, dirs[-1]) if dirs else None


def restore_checkpoint(path: str, state_template) -> Any:
    """Restore a TextBoostTrainState saved by save_checkpoint.  `path` is a
    checkpoint-N dir or the output dir (resolves to latest)."""
    if os.path.basename(path).startswith("checkpoint-"):
        ckpt_dir = path
    else:
        ckpt_dir = latest_checkpoint(path)
        if ckpt_dir is None:
            raise FileNotFoundError(f"No checkpoint-* under {path}")
    ckptr = ocp.StandardCheckpointer()
    template = {
        "step": np.asarray(state_template.step),
        "te_params": jax.tree.map(np.asarray, state_template.te_params),
        "opt_state": jax.tree.map(np.asarray, state_template.opt_state),
        "rng": np.asarray(state_template.rng),
    }
    restored = ckptr.restore(
        os.path.abspath(os.path.join(ckpt_dir, "state")), template
    )
    from .step import TextBoostTrainState

    return TextBoostTrainState(
        step=restored["step"],
        te_params=restored["te_params"],
        opt_state=restored["opt_state"],
        rng=restored["rng"],
    )
