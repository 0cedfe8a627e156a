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

TPU-native twist — COMPACT, ASYNC checkpoints.  The reference's
`save_state` writes the whole trainable tree + optimizer state; here that
would drag the full trainable tree + Adam moments (~500 MB: frozen encoder
base weights, grown embedding matrix) to the host synchronously, over a
d2h link measured at 1-5 MB/s — minutes per checkpoint.  But the optimizer
pins everything frozen exactly (FROZEN -> set_to_zero; original vocab rows
zeroed in-step), so those leaves are bit-identical to the freshly-
initialized template: the checkpoint only needs the ADDED embedding rows
(a few KB), the LoRA leaves and their moments (~MBs), and small scalars
(step/rng/schedule counts).  `snapshot_compact` classifies every leaf
(slice/keep/drop), slices+copies on device in one jitted program; a
background thread then fetches and writes without blocking the train loop.
Restore re-expands into the live template on device, so frozen weights
never cross the host link in either direction.
"""
from __future__ import annotations

import functools
import json
import os
import re
import shutil
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
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


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)


def _is_embedding_leaf(path, leaf) -> bool:
    return _path_str(path).endswith("token_embedding") and getattr(
        leaf, "ndim", 0
    ) == 2


# Leaves worth persisting besides the sliced embedding rows: LoRA adapters
# (and their Adam moments, whose paths mirror the param paths) and anything
# small — scalars (step, schedule counts), rng keys, norm scales.  Large
# leaves outside these are the frozen encoder base weights, which the
# optimizer pins exactly (FROZEN -> optax.set_to_zero), so storing them
# would ship ~340 MB of bit-identical template data through a 1-5 MB/s
# d2h tunnel per checkpoint.
_KEEP_SUBSTRINGS = ("lora_a", "lora_b", "unet_lora")
# Everything trainable is lora/embedding-pathed; leaves above this size
# elsewhere are frozen weights (kernels/mlp).  Threshold only has to sit
# above the biggest non-param scalar-ish leaf (rng keys, schedule counts,
# norm scales ~hidden_size) and below the smallest frozen kernel.
_SMALL_LEAF_SIZE = 2048


def _leaf_class(path, leaf) -> str:
    """'slice' (embedding: keep added rows), 'keep', or 'drop' (frozen
    base weights — restored from the live template)."""
    if _is_embedding_leaf(path, leaf):
        return "slice"
    p = _path_str(path)
    if any(s in p for s in _KEEP_SUBSTRINGS):
        return "keep"
    size = 1
    for d in getattr(leaf, "shape", ()):
        size *= d
    return "keep" if size <= _SMALL_LEAF_SIZE else "drop"


def _state_dict(state) -> Dict[str, Any]:
    return {
        "step": state.step,
        "te_params": state.te_params,
        "opt_state": state.opt_state,
        "rng": state.rng,
    }


@functools.lru_cache(maxsize=8)
def _snapshot_fn(first_added_id: int):
    def fix(path, leaf):
        cls = _leaf_class(path, leaf)
        if cls == "drop":
            # One-element placeholder keeps the tree structure (orbax
            # rejects zero-size arrays) at negligible storage cost.
            return jnp.zeros((1,), leaf.dtype)
        if cls == "slice":
            leaf = leaf[first_added_id:]
        # jnp.copy: the returned buffers must not alias the (donated) train
        # state, or the next step would invalidate them under the async
        # writer.
        return jnp.copy(leaf)

    return jax.jit(lambda t: jax.tree_util.tree_map_with_path(fix, t))


def snapshot_compact(state, first_added_id: int):
    """Device-side compact copy of the train state (one jitted program,
    cached per (first_added_id, shapes)).  Returns fresh device buffers."""
    return _snapshot_fn(int(first_added_id))(_state_dict(state))


def _validate_trainable_coverage(te_params):
    """Every leaf the optimizer can update MUST be persisted (slice/keep)
    — 'drop' is only legal for frozen leaves.  The keep/drop decision in
    _leaf_class is a name/size heuristic; cross-checking it against the
    optimizer's own labels (lora/partition.py) turns a future mismatch
    (e.g. a new trainable leaf whose path lacks 'lora_') into a loud
    error at save time instead of silent state corruption at resume."""
    from ..lora.partition import FROZEN_LABEL, param_labels

    labels = param_labels(te_params)
    flat_params = jax.tree_util.tree_leaves_with_path(te_params)
    flat_labels = jax.tree.leaves(labels)
    for (path, leaf), label in zip(flat_params, flat_labels):
        if label != FROZEN_LABEL and _leaf_class(path, leaf) == "drop":
            raise ValueError(
                f"trainable leaf {_path_str(path)} (label={label}) would "
                "be DROPPED from the compact checkpoint — extend "
                "checkpoint._leaf_class to persist it"
            )


class _RowView:
    """Sparse stand-in for the full embedding matrix: supports only
    `view[token_id]` for ids >= first_added_id (export path)."""

    def __init__(self, added_rows: np.ndarray, first_added_id: int):
        self._rows = added_rows
        self._first = first_added_id

    def __getitem__(self, tid):
        return self._rows[int(tid) - self._first]


def _fetch_local(x) -> np.ndarray:
    """d2h fetch that also works for replicated global (multi-process)
    arrays: every process holds a full copy in its first local shard."""
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        return np.asarray(x.addressable_shards[0].data)
    return np.asarray(x)


def _write_checkpoint(
    ckpt_dir: str,
    payload_dev,
    *,
    first_added_id: int,
    token_to_id: Dict[str, int],
    aug_tokens: Sequence[str],
    lora_rank: int,
    base_model_name: str,
):
    """Runs in the writer thread: d2h fetch + the three on-disk formats."""
    payload = jax.tree.map(_fetch_local, payload_dev)

    # (1) native trainer state (compact).  Only process 0 runs this writer,
    # but orbax's save() barriers over its active_processes set — with the
    # default (all processes) the barrier never completes and the writer
    # thread hangs until the daemon is killed at exit.  Scope the
    # checkpointer to process 0 (the payload is plain host numpy; no other
    # process owns any shard of it).
    mp_opts = (
        ocp.options.MultiprocessingOptions(primary_host=0, active_processes={0})
        if jax.process_count() > 1
        else ocp.options.MultiprocessingOptions()
    )
    ckptr = ocp.StandardCheckpointer(multiprocessing_options=mp_opts)
    ckptr.save(os.path.abspath(os.path.join(ckpt_dir, "state")), payload, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
        json.dump(
            {"format": "compact-v2", "first_added_id": int(first_added_id),
             "step": int(payload["step"])},
            f,
        )

    # (2) PEFT adapter (fp32), consumed by inference `load_adapter`.
    te_tree = (
        payload["te_params"]["te"]
        if isinstance(payload["te_params"], dict) and "te" in payload["te_params"]
        else payload["te_params"]
    )
    if lora_rank > 0:
        export_lora_adapter(
            te_tree,
            os.path.join(ckpt_dir, "text_encoder"),
            rank=lora_rank,
            base_model_name=base_model_name,
        )
    # UNet cross-attn LoRA (crossattn_kv runs): adapter-format unet/ dir so
    # a periodic checkpoint is loadable standalone, like the final save.
    unet_lora = (
        payload["te_params"].get("unet_lora")
        if isinstance(payload["te_params"], dict)
        else None
    )
    if unet_lora:
        from ..lora.peft_io import export_unet_lora_adapter

        export_unet_lora_adapter(
            unet_lora,
            os.path.join(ckpt_dir, "unet"),
            rank=lora_rank,
            base_model_name=base_model_name,
        )

    # (3) token bins — added rows only ever cross the host link.
    added = np.asarray(_find_embedding(te_tree), dtype=np.float32)
    export_token_embeddings(
        _RowView(added, first_added_id), token_to_id, ckpt_dir,
        aug_tokens=aug_tokens,
    )


def save_checkpoint(
    output_dir: str,
    step: int,
    state,
    *,
    first_added_id: int,
    token_to_id: Dict[str, int],
    aug_tokens: Sequence[str] = (),
    lora_rank: int,
    base_model_name: str = "",
    total_limit: Optional[int] = None,
    blocking: bool = True,
) -> Tuple[str, Optional[threading.Thread]]:
    """Write checkpoint-{step}/.  With blocking=False the d2h fetch and all
    file writes happen on a daemon thread; the device-side compact copy
    (cheap, ~MBs) is taken synchronously so the donated train state can
    move on immediately.  Returns (ckpt_dir, writer_thread|None).

    Multi-process: call from EVERY process (the snapshot is one SPMD
    program over the global state); only process 0 writes."""
    is_writer = jax.process_index() == 0
    ckpt_dir = os.path.join(output_dir, f"checkpoint-{step}")
    if is_writer:
        prune_checkpoints(output_dir, total_limit)
        os.makedirs(ckpt_dir, exist_ok=True)

    _validate_trainable_coverage(state.te_params)
    payload_dev = snapshot_compact(state, first_added_id)
    if not is_writer:
        return ckpt_dir, None
    kwargs = dict(
        first_added_id=first_added_id,
        token_to_id=token_to_id,
        aug_tokens=tuple(aug_tokens),
        lora_rank=lora_rank,
        base_model_name=base_model_name,
    )
    if blocking:
        _write_checkpoint(ckpt_dir, payload_dev, **kwargs)
        return ckpt_dir, None
    def _run():
        # Daemon-thread exceptions are otherwise only printed to stderr —
        # stash them so join_checkpoint_writers can re-raise (a failed save
        # must fail the run, like the reference's synchronous save would).
        try:
            _write_checkpoint(ckpt_dir, payload_dev, **kwargs)
        except BaseException as e:  # noqa: BLE001 — re-raised at join
            thread.exception = e

    thread = threading.Thread(
        target=_run, daemon=True, name=f"ckpt-writer-{step}"
    )
    thread.exception = None
    thread.start()
    return ckpt_dir, thread


def _find_embedding(params) -> np.ndarray:
    flat = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in flat:
        if str(getattr(path[-1], "key", path[-1])) == "token_embedding":
            return leaf
    raise KeyError("token_embedding not found in params")


def latest_checkpoint(output_dir: str) -> Optional[str]:
    dirs = checkpoint_dirs(output_dir)
    return os.path.join(output_dir, dirs[-1]) if dirs else None


def restore_checkpoint(path: str, state_template, first_added_id: int) -> Any:
    """Restore a TextBoostTrainState saved by save_checkpoint.  `path` is a
    checkpoint-N dir or the output dir (resolves to latest).

    Compact format: embedding-shaped leaves hold only the added rows; they
    are re-expanded ON DEVICE into the live template's buffers (the
    template's original rows are exact — the step freezes them), so the
    full matrix never crosses the host link.  Restore therefore assumes the
    same base weights the checkpoint was trained from, which resuming a run
    always satisfies."""
    if os.path.basename(path).startswith("checkpoint-"):
        ckpt_dir = path
    else:
        ckpt_dir = latest_checkpoint(path)
        if ckpt_dir is None:
            raise FileNotFoundError(f"No checkpoint-* under {path}")
    meta_path = os.path.join(ckpt_dir, "meta.json")
    if not os.path.isfile(meta_path):
        # Pre-compact (full-state) checkpoints have no meta.json; their
        # on-disk shapes don't match the compact template and orbax would
        # fail with an opaque structure error — refuse clearly instead.
        raise ValueError(
            f"{ckpt_dir} has no meta.json — it predates the compact-v2 "
            "checkpoint format and cannot be restored by this version; "
            "re-run training or export its adapters via the PEFT/token-bin "
            "files it contains"
        )
    meta = json.load(open(meta_path))
    if meta.get("first_added_id") != int(first_added_id):
        raise ValueError(
            f"checkpoint {ckpt_dir} was saved with first_added_id="
            f"{meta.get('first_added_id')}, current run has "
            f"{first_added_id} — token configuration changed?"
        )

    template = _state_dict(state_template)

    def abstract(path, leaf):
        cls = _leaf_class(path, leaf)
        if cls == "drop":
            return jax.ShapeDtypeStruct((1,), leaf.dtype)
        shape = tuple(leaf.shape)
        if cls == "slice":
            shape = (shape[0] - first_added_id,) + shape[1:]
        return jax.ShapeDtypeStruct(shape, leaf.dtype)

    abs_tree = jax.tree_util.tree_map_with_path(abstract, template)
    # Barrier-free restore: the payload is replicated plain-numpy read from
    # a shared FS, so every process restores independently and identically.
    # Orbax's default cross-process sync here is the FIRST collective of a
    # resumed run; on skewed hosts the 30 s Gloo context-init deadline can
    # lapse before the slowest process arrives (observed on the 1-core CI
    # host).  Scoping active_processes to self makes orbax skip the sync.
    ckptr = ocp.StandardCheckpointer(
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=jax.process_index(),
            active_processes={jax.process_index()},
            barrier_sync_key_prefix=f"p{jax.process_index()}",
        )
    )
    restored = ckptr.restore(
        os.path.abspath(os.path.join(ckpt_dir, "state")), abs_tree
    )

    expand = jax.jit(
        lambda full, rows: full.at[first_added_id:].set(
            rows.astype(full.dtype)
        )
    )

    def merge(path, tpl, rest):
        cls = _leaf_class(path, tpl)
        if cls == "slice":
            return expand(tpl, jnp.asarray(rest))
        if cls == "drop":
            # Frozen base leaf: bit-identical in the live template (the
            # optimizer maps FROZEN params through set_to_zero).
            return tpl
        return rest

    merged = jax.tree_util.tree_map_with_path(merge, template, restored)

    from .step import TextBoostTrainState

    return TextBoostTrainState(
        step=merged["step"],
        te_params=merged["te_params"],
        opt_state=merged["opt_state"],
        rng=merged["rng"],
    )
