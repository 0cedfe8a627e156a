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


def _write_peft_adapter(
    tensors: Dict[str, np.ndarray],
    out_dir: str,
    rank: int,
    alpha: float,
    base_model_name: str,
    target_modules: Sequence[str],
) -> str:
    """Shared adapter-dir writer: safetensors + the PEFT adapter_config.json
    fields both exporters must agree on (a consumer's `load_adapter` reads
    r/alpha/targets from here)."""
    os.makedirs(out_dir, exist_ok=True)
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


def export_lora_adapter(
    params,
    out_dir: str,
    rank: int,
    alpha: float = None,
    base_model_name: str = "",
    target_modules: Sequence[str] = ("q_proj", "k_proj", "v_proj"),
) -> str:
    """Write a PEFT-compatible LoRA adapter directory from Flax params."""
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

    return _write_peft_adapter(
        tensors, out_dir, rank, alpha, base_model_name, target_modules
    )


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


UNET_PEFT_PREFIX = "base_model.model"


def _unet_module_path(flax_prefix) -> str:
    """Diffusers module path ('down_blocks.1.attentions.0...attn2.to_k')
    for a Flax UNet LoRA param prefix, via the authored state-dict manifest
    mapping (models/convert.py) so adapter keys match the names a torch
    consumer of the reference's UNet would see."""
    from ..models.convert import _unet_leaf_to_torch

    torch_key, _ = _unet_leaf_to_torch(tuple(flax_prefix) + ("kernel",), 4)
    assert torch_key.endswith(".weight")
    return torch_key[: -len(".weight")]


def export_unet_lora_adapter(
    lora_flat: Dict,
    out_dir: str,
    rank: int,
    alpha: float = None,
    base_model_name: str = "",
) -> str:
    """Write the trained UNet cross-attn LoRA (`--unet_params_to_train=
    crossattn_kv`) as a PEFT-style adapter dir `unet/`.

    Documented deviation from the reference, which writes the FULL UNet via
    `unet.save_pretrained(output_dir/unet)` (train_textboost.py:1237-1239):
    the full SD UNet is ~3.4 GB fp32 and no reference consumer ever reads
    the dir (inference.py:47-77 and eval_dreambooth.py:175-215 both load
    the base UNet), so we persist the ~100 KB of adapter deltas in the same
    PEFT layout as the text-encoder adapter, keyed by diffusers module
    paths (attn2.to_k/to_v, the reference's LoraConfig target_modules at
    train_textboost.py:712-721)."""
    tensors: Dict[str, np.ndarray] = {}
    for key, val in lora_flat.items():
        if key[-1] not in ("lora_a", "lora_b"):
            continue
        module = _unet_module_path(key[:-1])
        ab = "A" if key[-1] == "lora_a" else "B"
        # lora_a [in, r] -> lora_A.weight [r, in]; lora_b [r, out] -> [out, r].
        arr = np.ascontiguousarray(np.asarray(val, dtype=np.float32).T)
        tensors[f"{UNET_PEFT_PREFIX}.{module}.lora_{ab}.weight"] = arr

    return _write_peft_adapter(
        tensors, out_dir, rank, alpha, base_model_name,
        ("attn2.to_k", "attn2.to_v"),
    )


def import_unet_lora_adapter(unet_params, adapter_dir: str):
    """Merge a `unet/` adapter dir into a UNet param tree: inserts
    lora_a/lora_b leaves next to each targeted attn2 to_k/to_v kernel
    (the tree need not have been built with LoRA).  Returns
    ({"params": tree}, rank)."""
    from safetensors.numpy import load_file

    tensors = load_file(os.path.join(adapter_dir, "adapter_model.safetensors"))
    with open(os.path.join(adapter_dir, "adapter_config.json")) as f:
        rank = int(json.load(f).get("r", 4))

    has_outer = "params" in unet_params
    flat = _flat(unet_params)
    # Module-path -> flax prefix map from the tree's own attn2 kv kernels.
    by_module = {}
    for key in flat:
        if key[-1] == "kernel" and len(key) >= 3 and key[-3] == "attn2" and key[-2] in ("to_k", "to_v"):
            by_module[_unet_module_path(key[:-1])] = key[:-1]
    for name, arr in tensors.items():
        m = re.match(
            re.escape(UNET_PEFT_PREFIX) + r"\.(.+)\.lora_([AB])\.weight$", name
        )
        if not m:
            raise ValueError(f"Unrecognized UNet adapter key: {name}")
        module, ab = m.groups()
        prefix = by_module.get(module)
        if prefix is None:
            raise ValueError(f"UNet param tree has no attn2 kv module {module}")
        leaf = "lora_a" if ab == "A" else "lora_b"
        kernel = np.asarray(flat[prefix + ("kernel",)])
        flat[prefix + (leaf,)] = np.asarray(arr).T.astype(kernel.dtype)
    tree = flax.traverse_util.unflatten_dict(flat)
    return ({"params": tree} if has_outer else tree), rank


def token_bin_filename(token: str) -> str:
    """Reference filename convention (train_textboost.py:1195-1197): the
    dict key inside the bin keeps the bracketed token, but the FILENAME
    strips `<>` — the reference eval detects multi-vector tokens by
    `filename.startswith(instance)` (eval_dreambooth.py:329-330), which
    only matches unbracketed names."""
    return token.replace("<", "").replace(">", "") + ".bin"


def export_token_embeddings(
    embedding: np.ndarray,
    token_to_id: Dict[str, int],
    out_dir: str,
    aug_tokens: Sequence[str] = (),
) -> List[str]:
    """Write one `{token}.bin` per learned token ({token: tensor} torch
    pickle, the textual-inversion format; train_textboost.py:1188-1209).
    Tokens in `aug_tokens` are saved as [1, hidden] (the reference slices
    `weight[token_id:token_id+1]` for augmentation tokens, :1199-1209);
    everything else as [hidden] (`weight[token_id]`, :1188-1197)."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    aug = set(aug_tokens)
    paths = []
    for token, tid in token_to_id.items():
        path = os.path.join(out_dir, token_bin_filename(token))
        row = np.array(embedding[tid], np.float32, copy=True)
        if token in aug:
            row = row[None, :]
        torch.save({token: torch.from_numpy(row)}, path)
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
            vec = np.asarray(tensor.detach().float().numpy())
            # Aug-token bins hold [1, hidden] (reference's token_id:token_id+1
            # slice); normalize to the [hidden] row everyone downstream wants.
            if vec.ndim == 2 and vec.shape[0] == 1:
                vec = vec[0]
            out[token] = vec
    return out
