"""Load a trained TextBoost model directory into a sampling pipeline.

Counterpart of `load_pipeline` in /root/reference/inference.py:47-77 and
eval_dreambooth.py:175-215: base model + PEFT text-encoder adapter +
textual-inversion token bins, with the TextBoost null-embedding patch
active (eval variant semantics).
"""
from __future__ import annotations

import os
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tokenizer import load_tokenizer
from ..lora.peft_io import import_lora_adapter, import_token_embeddings
from ..models import CLIPTextModel
from ..models.pretrained import load_models
from .text_to_image import TextToImagePipeline


def _natural_sorted_bins(model_path: str):
    """*.bin paths in natural (numeric-aware) order so multi-vector tokens
    load in index order — x_10.bin after x_2.bin, not before it."""

    def key(name: str):
        return [
            int(part) if part.isdigit() else part
            for part in re.split(r"(\d+)", name)
        ]

    return [
        os.path.join(model_path, f)
        for f in sorted(
            (f for f in os.listdir(model_path) if f.endswith(".bin")), key=key
        )
    ]


# One-entry cache for the expensive per-process artifacts that are
# IDENTICAL across trained-model dirs of the same base model: the frozen
# bundle (its init/conversion program) and the frozen-encoder null
# embedding (a TE-forward program + d2h).  The 30-instance eval sweep
# (eval_dreambooth.generate) loads a pipeline per instance; without this
# every instance re-paid both programs on the tunneled relay.
_BASE_CACHE: dict = {}


def load_textboost_pipeline(
    model_path: str,
    base_model: str = "sd21base",
    *,
    checkpoint: Optional[int] = None,
    lora_rank: int = 4,
    dtype=jnp.bfloat16,
    use_null_embedding: bool = True,
    null_embedding_path: Optional[str] = None,
    mesh=None,
    reuse: Optional[TextToImagePipeline] = None,
) -> TextToImagePipeline:
    """Load `model_path` into a pipeline.

    `reuse`: a pipeline returned by a previous call with the same base
    model / ranks / mesh.  When every array shape matches (same vocab
    growth, same LoRA geometry), the new instance's params are rebound
    onto the EXISTING pipeline object and it is returned — its jitted
    sampler programs (shape-in/shape-out; params are traced arguments)
    keep serving, so a 30-instance eval sweep pays ONE sampler compile
    instead of one per instance (~65-75 s each on the tunneled relay —
    comparable to the actual sampling time per instance).  On any
    mismatch a fresh pipeline is built (correctness first)."""
    model_path = model_path.rstrip("/")
    if checkpoint is not None:
        model_path = os.path.join(model_path, f"checkpoint-{checkpoint}")

    # Disk-backed base models (snapshot/diffusers dirs) are NOT cached:
    # their contents can change between calls (same staleness rule as
    # models/pretrained._PRESET_MEMO).
    cacheable = not (base_model and os.path.isdir(base_model))
    cache_key = (base_model, lora_rank, str(dtype), bool(use_null_embedding))
    if cacheable and _BASE_CACHE.get("key") == cache_key:
        bundle = _BASE_CACHE["bundle"]
    else:
        bundle = load_models(base_model, lora_rank=lora_rank, dtype=dtype)
        _BASE_CACHE.clear()
        if cacheable:
            _BASE_CACHE.update(key=cache_key, bundle=bundle)
    spec = bundle.spec
    tokenizer = load_tokenizer(base_model)

    # Learned token embeddings ({token}.bin files; inference.py:61-68).
    bins = _natural_sorted_bins(model_path)
    learned = import_token_embeddings(bins)

    emb = np.asarray(bundle.te_params["params"]["token_embedding"], np.float32)
    token_rows = []
    for token, vec in learned.items():
        tokenizer.add_tokens(token)
        token_rows.append((tokenizer.convert_tokens_to_ids(token), vec))
    if token_rows:
        new_vocab = len(tokenizer)
        grown = np.zeros((new_vocab, emb.shape[1]), emb.dtype)
        grown[: emb.shape[0]] = emb
        for tid, vec in token_rows:
            grown[tid] = vec
        emb = grown

    te_params = {"params": dict(bundle.te_params["params"])}
    te_params["params"]["token_embedding"] = jnp.asarray(emb)

    # PEFT LoRA adapter (inference.py:56-58).
    adapter_dir = os.path.join(model_path, "text_encoder")
    if os.path.isfile(os.path.join(adapter_dir, "adapter_model.safetensors")):
        te_params = import_lora_adapter(te_params, adapter_dir)
        print("Loaded text encoder LoRA weights")

    # UNet cross-attn LoRA (crossattn_kv runs; the reference's unet/ dir at
    # train_textboost.py:1237-1239, persisted here in adapter form).
    unet_params = bundle.unet_params
    unet_lora_rank = 0
    unet_dir = os.path.join(model_path, "unet")
    if os.path.isfile(os.path.join(unet_dir, "adapter_model.safetensors")):
        from ..lora.peft_io import import_unet_lora_adapter

        unet_params, unet_lora_rank = import_unet_lora_adapter(
            unet_params, unet_dir
        )
        print("Loaded UNet LoRA weights")

    # Null embedding: frozen-encoder output of the empty prompt — the
    # native regeneration of assets/null_emb_*.pt / start_emb_*.pt
    # (eval_dreambooth.py:176-183).  A reference-format torch asset can be
    # supplied explicitly instead.
    null_embedding = None
    if null_embedding_path:
        from ..models.textboost import load_null_embedding_asset

        null_embedding = load_null_embedding_asset(
            null_embedding_path,
            (
                spec.text_encoder.max_position_embeddings,
                spec.text_encoder.hidden_size,
            ),
        )
    elif use_null_embedding:
        if "null_embedding" in _BASE_CACHE:
            null_embedding = _BASE_CACHE["null_embedding"]
        else:
            frozen = CLIPTextModel(spec.text_encoder, dtype=dtype)
            ids = jnp.asarray(
                np.asarray(
                    tokenizer("", padding="max_length", max_length=77,
                              return_tensors="np")["input_ids"],
                    np.int32,
                )
            )
            hidden, _ = jax.jit(frozen.apply)(bundle.te_params, ids)
            null_embedding = np.asarray(hidden[0], np.float32)
            _BASE_CACHE["null_embedding"] = null_embedding

    if reuse is not None:
        same = (
            reuse.spec is spec
            and reuse.dtype == dtype
            and reuse.mesh is mesh
            and reuse.fixed_special == bool(use_null_embedding)
            and jax.tree.structure(reuse.te_params)
            == jax.tree.structure(te_params)
            and jax.tree.structure(reuse.unet_params)
            == jax.tree.structure(unet_params)
            and all(
                np.shape(a) == np.shape(b)
                for a, b in zip(
                    jax.tree.leaves((reuse.te_params, reuse.unet_params)),
                    jax.tree.leaves((te_params, unet_params)),
                )
            )
            and (reuse.null_embedding is None) == (null_embedding is None)
        )
        if same:
            reuse.tokenizer = tokenizer
            reuse.te_params = te_params
            reuse.unet_params = unet_params
            reuse.vae_params = bundle.vae_params
            if null_embedding is not None:
                reuse.null_embedding = jnp.asarray(null_embedding)
            # Params changed: re-place them on the mesh at next call.
            reuse._mesh_placed = False
            return reuse

    return TextToImagePipeline(
        spec,
        tokenizer,
        te_params,
        unet_params,
        bundle.vae_params,
        null_embedding=null_embedding,
        fixed_special=use_null_embedding,
        lora_rank=lora_rank,
        unet_lora_rank=unet_lora_rank,
        vocab_size=emb.shape[0],
        dtype=dtype,
        mesh=mesh,
    )
