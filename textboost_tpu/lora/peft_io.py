"""Checkpoint-format parity with the reference's on-disk artifacts.

The reference emits (train_textboost.py:1178-1209, 1234-1266):
  1. a PEFT adapter (`adapter_model.safetensors` + `adapter_config.json`)
     consumed by `text_encoder.load_adapter` (inference.py:56-58);
  2. per-token textual-inversion files `{token}.bin` holding
     {token: tensor}, consumed by `load_textual_inversion`
     (inference.py:61-68).

This module converts between those torch-layout formats and the Flax
param tree (lora_a [in,r] <-> lora_A.weight [r,in]; lora_b [out,r]^T).
"""
from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Sequence

import numpy as np

import flax

_LAYER_RE = re.compile(r"layers\.(\d+)\.self_attn\.([qkv]_proj)\.lora_([AB])\.weight")

PEFT_PREFIX = "base_model.model.text_model.encoder.layers"


def _flat(params):
    return flax.traverse_util.flatten_dict(
        params["params"] if "params" in params else params
    )


def export_lora_adapter(
    params,
    out_dir: str,
    rank: int,
    alpha: float = None,
    base_model_name: str = "",
    target_modules: Sequence[str] = ("q_proj", "k_proj", "v_proj"),
) -> str:
    """Write a PEFT-compatible LoRA adapter directory from Flax params."""
    os.makedirs(out_dir, exist_ok=True)
    flat = _flat(params)
    tensors: Dict[str, np.ndarray] = {}
    for key, val in flat.items():
        # key like ('layers_3', 'self_attn', 'q_proj', 'lora_a')
        if key[-1] not in ("lora_a", "lora_b"):
            continue
        layer = key[0].split("_")[-1]
        proj = key[-2]
        arr = np.asarray(val, dtype=np.float32)
        if key[-1] == "lora_a":
            name = f"{PEFT_PREFIX}.{layer}.self_attn.{proj}.lora_A.weight"
            arr = arr.T  # [in, r] -> [r, in]
        else:
            name = f"{PEFT_PREFIX}.{layer}.self_attn.{proj}.lora_B.weight"
            arr = arr.T  # [r, out] -> [out, r]
        tensors[name] = np.ascontiguousarray(arr)

    from safetensors.numpy import save_file

    save_file(tensors, os.path.join(out_dir, "adapter_model.safetensors"))

    config = {
        "peft_type": "LORA",
        "auto_mapping": None,
        "base_model_name_or_path": base_model_name,
        "task_type": None,
        "inference_mode": True,
        "r": rank,
        "lora_alpha": alpha if alpha is not None else rank,
        "lora_dropout": 0.0,
        "fan_in_fan_out": False,
        "bias": "none",
        "init_lora_weights": "gaussian",
        "target_modules": list(target_modules),
        "modules_to_save": None,
    }
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return out_dir


def import_lora_adapter(params, adapter_dir: str):
    """Merge a PEFT adapter's weights into a Flax param tree (which must
    already have lora_a/lora_b leaves of the right rank)."""
    from safetensors.numpy import load_file

    path = os.path.join(adapter_dir, "adapter_model.safetensors")
    tensors = load_file(path)

    has_outer = "params" in params
    flat = _flat(params)
    for name, arr in tensors.items():
        m = _LAYER_RE.search(name)
        if not m:
            raise ValueError(f"Unrecognized adapter key: {name}")
        layer, proj, ab = m.groups()
        key = (f"layers_{layer}", "self_attn", proj, "lora_a" if ab == "A" else "lora_b")
        if key not in flat:
            raise ValueError(
                f"Param tree has no leaf {key}; was the model built with lora_rank>0?"
            )
        expected = flat[key].shape
        converted = np.asarray(arr).T.astype(np.asarray(flat[key]).dtype)
        if converted.shape != expected:
            raise ValueError(
                f"Rank mismatch for {name}: adapter {converted.shape} vs model {expected}"
            )
        flat[key] = converted
    tree = flax.traverse_util.unflatten_dict(flat)
    return {"params": tree} if has_outer else tree


def export_token_embeddings(
    embedding: np.ndarray,
    token_to_id: Dict[str, int],
    out_dir: str,
) -> List[str]:
    """Write one `{token}.bin` per learned token ({token: tensor} torch
    pickle, the textual-inversion format; train_textboost.py:534-546)."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for token, tid in token_to_id.items():
        path = os.path.join(out_dir, f"{token}.bin")
        torch.save(
            {token: torch.from_numpy(np.array(embedding[tid], np.float32, copy=True))},
            path,
        )
        paths.append(path)
    return paths


def import_token_embeddings(paths: Sequence[str]) -> Dict[str, np.ndarray]:
    """Load `{token}.bin` files -> {token: [hidden] float32}.  Skips
    non-embedding bins the way inference.py:61-68 skips optimizer/scheduler
    state files."""
    import torch

    out: Dict[str, np.ndarray] = {}
    for path in paths:
        base = os.path.basename(path)
        if base in ("optimizer.bin", "scheduler.bin", "scaler.pt"):
            continue
        blob = torch.load(path, map_location="cpu", weights_only=True)
        for token, tensor in blob.items():
            out[token] = np.asarray(tensor.detach().float().numpy())
    return out
