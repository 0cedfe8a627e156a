"""Diffusers/transformers torch checkpoint <-> Flax param tree conversion.

The reference pulls all pretrained weights from HF-format checkpoints
(train_textboost.py:630-654); this module makes those checkpoints loadable
into the native Flax modules.  Conversion is *flax-tree-driven*: we walk
our param tree, derive the matching torch key for each leaf, and pull it
from the state dict — so any unmapped leaf is a hard error, not a silent
random-init.

Layout rules: torch Linear [out,in] -> kernel [in,out] (transpose);
torch Conv [out,in,kh,kw] -> kernel [kh,kw,in,out]; norm weight -> scale.
"""
from __future__ import annotations

import os
import re
from typing import Dict, List, Tuple

import numpy as np

import flax

Array = np.ndarray


def _leaf_to_torch(path: Tuple[str, ...]) -> Tuple[str, str]:
    """(flax path) -> (torch key, kind) where kind in
    {linear, conv, norm, embed, raw}."""
    name = "/".join(path)

    # ---------------- CLIP text encoder ----------------
    if path[0] == "token_embedding":
        return "text_model.embeddings.token_embedding.weight", "embed"
    if path[0] == "position_embedding":
        return "text_model.embeddings.position_embedding.weight", "embed"
    if path[0] == "final_layer_norm":
        return f"text_model.final_layer_norm.{_nb(path[-1])}", "norm"
    m = re.match(r"layers_(\d+)$", path[0])
    if m:
        i = m.group(1)
        rest = path[1:]
        if rest[0] == "self_attn":
            proj = rest[1]
            return (
                f"text_model.encoder.layers.{i}.self_attn.{proj}.{_wb(path[-1])}",
                "linear",
            )
        if rest[0] in ("layer_norm1", "layer_norm2"):
            return (
                f"text_model.encoder.layers.{i}.{rest[0]}.{_nb(path[-1])}",
                "norm",
            )
        if rest[0] == "mlp":
            return (
                f"text_model.encoder.layers.{i}.mlp.{rest[1]}.{_wb(path[-1])}",
                "linear",
            )

    raise KeyError(f"No torch mapping for CLIP leaf: {name}")


def _wb(leaf: str) -> str:
    return {"kernel": "weight", "bias": "bias"}[leaf]


def _nb(leaf: str) -> str:
    return {"scale": "weight", "bias": "bias"}[leaf]


def _convert_tensor(arr: Array, kind: str, flax_shape) -> Array:
    arr = np.asarray(arr, np.float32)
    if kind == "linear":
        if arr.ndim == 2:
            arr = arr.T
    elif kind == "conv":
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 2:  # linear proj used where we expect dense
            arr = arr.T
    if tuple(arr.shape) != tuple(flax_shape):
        raise ValueError(f"shape mismatch: torch {arr.shape} vs flax {flax_shape}")
    return arr


def convert_text_encoder(state_dict: Dict[str, Array], flax_params) -> Dict:
    """transformers CLIPTextModel state dict -> our CLIPTextModel params.
    LoRA leaves (absent from HF checkpoints) keep their current values."""
    flat = flax.traverse_util.flatten_dict(flax_params["params"])
    out = {}
    for path, leaf in flat.items():
        if path[-1] in ("lora_a", "lora_b"):
            out[path] = leaf
            continue
        key, kind = _leaf_to_torch(path)
        if key not in state_dict:
            raise KeyError(f"missing torch key {key}")
        out[path] = _convert_tensor(state_dict[key], kind, np.shape(leaf))
    return {"params": flax.traverse_util.unflatten_dict(out)}


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------
def _unet_leaf_to_torch(path: Tuple[str, ...], num_levels: int) -> Tuple[str, str]:
    name = "/".join(path)
    leaf = path[-1]

    def attn_inner(prefix: str, rest: Tuple[str, ...]) -> Tuple[str, str]:
        # rest inside a Transformer2D module.
        if rest[0] == "norm":
            return f"{prefix}.norm.{_nb(leaf)}", "norm"
        if rest[0] in ("proj_in", "proj_out"):
            return f"{prefix}.{rest[0]}.{_wb(leaf)}", "conv"
        m = re.match(r"transformer_blocks_(\d+)$", rest[0])
        if m:
            t = m.group(1)
            inner = rest[1:]
            base = f"{prefix}.transformer_blocks.{t}"
            if inner[0] in ("attn1", "attn2"):
                sub = inner[1]
                torch_sub = "to_out.0" if sub == "to_out" else sub
                return f"{base}.{inner[0]}.{torch_sub}.{_wb(leaf)}", "linear"
            if inner[0] in ("norm1", "norm2", "norm3"):
                return f"{base}.{inner[0]}.{_nb(leaf)}", "norm"
            if inner[0] == "ff":
                if inner[1] == "net_0":
                    return f"{base}.ff.net.0.proj.{_wb(leaf)}", "linear"
                return f"{base}.ff.net.2.{_wb(leaf)}", "linear"
        raise KeyError(f"No torch mapping for attention leaf: {name}")

    def resnet_inner(prefix: str, rest: Tuple[str, ...]) -> Tuple[str, str]:
        part = rest[0]
        if part in ("norm1", "norm2"):
            return f"{prefix}.{part}.{_nb(leaf)}", "norm"
        if part in ("conv1", "conv2", "conv_shortcut"):
            return f"{prefix}.{part}.{_wb(leaf)}", "conv"
        if part == "time_emb_proj":
            return f"{prefix}.time_emb_proj.{_wb(leaf)}", "linear"
        raise KeyError(f"No torch mapping for resnet leaf: {name}")

    if path[0] == "conv_in":
        return f"conv_in.{_wb(leaf)}", "conv"
    if path[0] == "conv_out":
        return f"conv_out.{_wb(leaf)}", "conv"
    if path[0] == "conv_norm_out":
        return f"conv_norm_out.{_nb(leaf)}", "norm"
    if path[0] == "time_embedding_linear_1":
        return f"time_embedding.linear_1.{_wb(leaf)}", "linear"
    if path[0] == "time_embedding_linear_2":
        return f"time_embedding.linear_2.{_wb(leaf)}", "linear"

    m = re.match(r"down_(\d+)_resnet_(\d+)$", path[0])
    if m:
        return resnet_inner(f"down_blocks.{m.group(1)}.resnets.{m.group(2)}", path[1:])
    m = re.match(r"down_(\d+)_attn_(\d+)$", path[0])
    if m:
        return attn_inner(
            f"down_blocks.{m.group(1)}.attentions.{m.group(2)}", path[1:]
        )
    m = re.match(r"down_(\d+)_downsample$", path[0])
    if m:
        return f"down_blocks.{m.group(1)}.downsamplers.0.conv.{_wb(leaf)}", "conv"
    m = re.match(r"up_(\d+)_resnet_(\d+)$", path[0])
    if m:
        return resnet_inner(f"up_blocks.{m.group(1)}.resnets.{m.group(2)}", path[1:])
    m = re.match(r"up_(\d+)_attn_(\d+)$", path[0])
    if m:
        return attn_inner(f"up_blocks.{m.group(1)}.attentions.{m.group(2)}", path[1:])
    m = re.match(r"up_(\d+)_upsample$", path[0])
    if m:
        return f"up_blocks.{m.group(1)}.upsamplers.0.conv.{_wb(leaf)}", "conv"
    if path[0] == "mid_resnet_0":
        return resnet_inner("mid_block.resnets.0", path[1:])
    if path[0] == "mid_resnet_1":
        return resnet_inner("mid_block.resnets.1", path[1:])
    if path[0] == "mid_attn":
        return attn_inner("mid_block.attentions.0", path[1:])
    raise KeyError(f"No torch mapping for UNet leaf: {name}")


def convert_unet(state_dict: Dict[str, Array], flax_params, num_levels: int = 4) -> Dict:
    flat = flax.traverse_util.flatten_dict(flax_params["params"])
    out = {}
    for path, leaf in flat.items():
        if path[-1] in ("lora_a", "lora_b"):
            out[path] = leaf
            continue
        key, kind = _unet_leaf_to_torch(path, num_levels)
        if key not in state_dict:
            raise KeyError(f"missing torch key {key}")
        out[path] = _convert_tensor(state_dict[key], kind, np.shape(leaf))
    return {"params": flax.traverse_util.unflatten_dict(out)}


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------
def _vae_leaf_to_torch(path: Tuple[str, ...]) -> Tuple[str, str]:
    name = "/".join(path)
    leaf = path[-1]
    if path[0] in ("quant_conv", "post_quant_conv"):
        return f"{path[0]}.{_wb(leaf)}", "conv"
    side = path[0]  # encoder | decoder
    rest = path[1:]
    if rest[0] in ("conv_in", "conv_out"):
        return f"{side}.{rest[0]}.{_wb(leaf)}", "conv"
    if rest[0] == "conv_norm_out":
        return f"{side}.conv_norm_out.{_nb(leaf)}", "norm"
    m = re.match(r"(down|up)_(\d+)_resnet_(\d+)$", rest[0])
    if m:
        kind_blk = "down_blocks" if m.group(1) == "down" else "up_blocks"
        prefix = f"{side}.{kind_blk}.{m.group(2)}.resnets.{m.group(3)}"
        part = rest[1]
        if part in ("norm1", "norm2"):
            return f"{prefix}.{part}.{_nb(leaf)}", "norm"
        return f"{prefix}.{part}.{_wb(leaf)}", "conv"
    m = re.match(r"down_(\d+)_downsample$", rest[0])
    if m:
        return f"{side}.down_blocks.{m.group(1)}.downsamplers.0.conv.{_wb(leaf)}", "conv"
    m = re.match(r"up_(\d+)_upsample$", rest[0])
    if m:
        return f"{side}.up_blocks.{m.group(1)}.upsamplers.0.conv.{_wb(leaf)}", "conv"
    if rest[0] == "mid_resnet_0":
        prefix = f"{side}.mid_block.resnets.0"
    elif rest[0] == "mid_resnet_1":
        prefix = f"{side}.mid_block.resnets.1"
    elif rest[0] == "mid_attn":
        attn_map = {
            "group_norm": ("group_norm", "norm"),
            "to_q": ("to_q", "linear"),
            "to_k": ("to_k", "linear"),
            "to_v": ("to_v", "linear"),
            "to_out": ("to_out.0", "linear"),
        }
        sub, kind = attn_map[rest[1]]
        suffix = _nb(leaf) if kind == "norm" else _wb(leaf)
        return f"{side}.mid_block.attentions.0.{sub}.{suffix}", kind
    else:
        raise KeyError(f"No torch mapping for VAE leaf: {name}")
    part = rest[1]
    if part in ("norm1", "norm2"):
        return f"{prefix}.{part}.{_nb(leaf)}", "norm"
    return f"{prefix}.{part}.{_wb(leaf)}", "conv"


# Hub checkpoints serialized by pre-0.17 diffusers use the legacy VAE
# attention naming (query/key/value/proj_attn); diffusers remaps these at
# load time, so we must too (the runwayml/sd15 vae file on the hub still
# carries them).
_VAE_LEGACY_ATTN = {
    "to_q": "query",
    "to_k": "key",
    "to_v": "value",
    "to_out.0": "proj_attn",
}


def _vae_lookup(state_dict: Dict[str, Array], key: str):
    if key in state_dict:
        return state_dict[key]
    if ".attentions.0." in key:
        prefix, suffix = key.rsplit(".", 1)  # suffix = weight|bias
        base, sub = prefix.split(".attentions.0.")
        legacy = _VAE_LEGACY_ATTN.get(sub)
        if legacy is not None:
            lk = f"{base}.attentions.0.{legacy}.{suffix}"
            if lk in state_dict:
                arr = np.asarray(state_dict[lk])
                # legacy proj layers may be stored as [out,in,1,1] convs
                if arr.ndim == 4 and arr.shape[2:] == (1, 1):
                    arr = arr[:, :, 0, 0]
                return arr
    raise KeyError(f"missing torch key {key}")


def convert_vae(state_dict: Dict[str, Array], flax_params) -> Dict:
    flat = flax.traverse_util.flatten_dict(flax_params["params"])
    out = {}
    for path, leaf in flat.items():
        key, kind = _vae_leaf_to_torch(path)
        out[path] = _convert_tensor(_vae_lookup(state_dict, key), kind, np.shape(leaf))
    return {"params": flax.traverse_util.unflatten_dict(out)}


# ---------------------------------------------------------------------------
# Inverse direction (for tests and for exporting to diffusers format)
# ---------------------------------------------------------------------------
def flax_to_torch_state_dict(flax_params, module: str) -> Dict[str, Array]:
    """Export our params to diffusers/transformers torch key layout."""
    mapper = {
        "text_encoder": _leaf_to_torch,
        "unet": lambda p: _unet_leaf_to_torch(p, 4),
        "vae": _vae_leaf_to_torch,
    }[module]
    flat = flax.traverse_util.flatten_dict(flax_params["params"])
    out: Dict[str, Array] = {}
    for path, leaf in flat.items():
        if path[-1] in ("lora_a", "lora_b"):
            continue
        key, kind = mapper(path)
        arr = np.asarray(leaf, np.float32)
        if kind == "linear" and arr.ndim == 2:
            arr = arr.T
        elif kind == "conv" and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        elif kind == "conv" and arr.ndim == 2:
            arr = arr.T
        out[key] = np.ascontiguousarray(arr)
    return out


def torch_key_manifest(module: str, spec_name: str) -> Dict[str, Tuple[int, ...]]:
    """Torch-side {key: shape} our conversion expects for a model family.

    Built by `jax.eval_shape`-ing the Flax module (no parameter data is
    materialized) and inverting the layout rules, so it reflects exactly the
    keys `convert_*` will demand from a diffusers/transformers checkpoint.
    Compared in tests against independently-authored manifests of the
    published SD state dicts — the offline structural-parity check for the
    modules whose reference stacks (diffusers UNet/VAE) aren't installed.
    """
    import jax
    import jax.numpy as jnp

    from .clip import CLIPTextModel
    from .configs import get_spec
    from .unet import UNet2DCondition
    from .vae import AutoencoderKL

    spec = get_spec(spec_name)
    if module == "text_encoder":
        mod = CLIPTextModel(spec.text_encoder)
        shapes = jax.eval_shape(mod.init, jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
        mapper = _leaf_to_torch
    elif module == "unet":
        mod = UNet2DCondition(spec.unet)
        shapes = jax.eval_shape(
            mod.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, spec.unet.sample_size, spec.unet.sample_size, 4)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, spec.unet.cross_attention_dim)),
        )
        mapper = lambda p: _unet_leaf_to_torch(p, len(spec.unet.block_out_channels))
    elif module == "vae":
        mod = AutoencoderKL(spec.vae)
        shapes = jax.eval_shape(
            mod.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(0)
        )
        mapper = _vae_leaf_to_torch
    else:
        raise ValueError(module)

    out: Dict[str, Tuple[int, ...]] = {}
    for path, leaf in flax.traverse_util.flatten_dict(shapes["params"]).items():
        if path[-1] in ("lora_a", "lora_b"):
            continue
        key, kind = mapper(path)
        shape = tuple(leaf.shape)
        if kind == "linear" and len(shape) == 2:
            shape = shape[::-1]
        elif kind == "conv" and len(shape) == 4:
            shape = (shape[3], shape[2], shape[0], shape[1])
        elif kind == "conv" and len(shape) == 2:
            shape = shape[::-1]
        out[key] = shape
    return out


# ---------------------------------------------------------------------------
# Snapshot loading
# ---------------------------------------------------------------------------
def _load_torch_dir(path: str) -> Dict[str, Array]:
    """Load all safetensors (or torch .bin) weights in a model subfolder."""
    tensors: Dict[str, Array] = {}
    files: List[str] = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if files:
        from safetensors import safe_open

        for f in files:
            with safe_open(os.path.join(path, f), framework="np") as sf:
                for k in sf.keys():
                    tensors[k] = sf.get_tensor(k)
        return tensors
    bins = sorted(f for f in os.listdir(path) if f.endswith(".bin"))
    if bins:
        import torch

        for f in bins:
            blob = torch.load(
                os.path.join(path, f), map_location="cpu", weights_only=True
            )
            for k, v in blob.items():
                tensors[k] = v.float().numpy()
        return tensors
    raise FileNotFoundError(f"No weight files under {path}")


def load_diffusers_snapshot(
    path: str,
    *,
    lora_rank: int = 0,
    dtype=None,
    vae_dtype=None,
    remat: bool = False,
    spec_name=None,
):
    """Local diffusers checkpoint dir (model_index.json layout) -> ModelBundle."""
    import jax.numpy as jnp

    from .configs import get_spec
    from .pretrained import ModelBundle, _init_params
    from .clip import CLIPTextModel
    from .unet import UNet2DCondition
    from .vae import AutoencoderKL

    dtype = dtype or jnp.bfloat16
    if spec_name is None:
        # Infer family from the text-encoder hidden size.
        te_sd = _load_torch_dir(os.path.join(path, "text_encoder"))
        hidden = te_sd["text_model.embeddings.token_embedding.weight"].shape[1]
        spec_name = "sd15" if hidden == 768 else "sd21base"
    else:
        te_sd = _load_torch_dir(os.path.join(path, "text_encoder"))
    spec = get_spec(spec_name)

    text_encoder = CLIPTextModel(spec.text_encoder, lora_rank=lora_rank, dtype=dtype)
    unet = UNet2DCondition(spec.unet, dtype=dtype, remat=remat)
    vae = AutoencoderKL(spec.vae, dtype=vae_dtype or dtype)

    te_params = convert_text_encoder(
        te_sd, _init_params(spec, text_encoder, "te", 0)
    )
    unet_params = convert_unet(
        _load_torch_dir(os.path.join(path, "unet")),
        _init_params(spec, unet, "unet", 1),
    )
    vae_params = convert_vae(
        _load_torch_dir(os.path.join(path, "vae")),
        _init_params(spec, vae, "vae", 2),
    )
    return ModelBundle(spec, text_encoder, unet, vae, te_params, unet_params, vae_params)
