"""Model bundle assembly: modules + params from presets or local snapshots.

The reference pulls pretrained components from the HF hub
(train_textboost.py:630-654).  Zero-egress TPU environments instead load
from a local converted snapshot (models/convert.py produces one from a
diffusers checkpoint) — or fall back to seeded random init so every code
path stays exercisable offline.

Snapshot layout (native):  <dir>/{text_encoder,unet,vae}.msgpack + spec.json
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

import flax

from .clip import CLIPTextModel
from .configs import ModelSpec, get_spec
from .unet import UNet2DCondition
from .vae import AutoencoderKL


@dataclasses.dataclass
class ModelBundle:
    spec: ModelSpec
    text_encoder: CLIPTextModel
    unet: UNet2DCondition
    vae: AutoencoderKL
    te_params: Any
    unet_params: Any
    vae_params: Any


def _init_params(spec: ModelSpec, module, kind: str, seed: int):
    rng = jax.random.PRNGKey(seed)
    if kind == "te":
        return jax.jit(module.init)(rng, jnp.zeros((1, 77), jnp.int32))
    if kind == "unet":
        return jax.jit(module.init)(
            rng,
            jnp.zeros((1, spec.unet.sample_size, spec.unet.sample_size, 4)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, spec.unet.cross_attention_dim)),
        )
    return jax.jit(module.init)(
        rng, jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(0)
    )


def resolve_spec_name(
    model_name_or_path: Optional[str], preset: Optional[str]
) -> Optional[str]:
    """Light host-only resolution of the spec name load_models would use.

    Returns None for layouts that need deep inspection (raw diffusers
    dirs) — callers use this to decide whether the train step can be
    AOT-compiled before any model is loaded."""
    if model_name_or_path and os.path.isdir(model_name_or_path):
        spec_file = os.path.join(model_name_or_path, "spec.json")
        if os.path.isfile(spec_file):
            with open(spec_file) as f:
                return json.load(f)["name"]
        if os.path.isfile(os.path.join(model_name_or_path, "model_index.json")):
            return None
    name = preset or model_name_or_path or "sd15"
    try:
        get_spec(name)
    except Exception:  # noqa: BLE001 — unknown name: let load_models error
        return None
    return name


def save_snapshot(bundle: ModelBundle, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    for name, params in (
        ("text_encoder", bundle.te_params),
        ("unet", bundle.unet_params),
        ("vae", bundle.vae_params),
    ):
        with open(os.path.join(out_dir, f"{name}.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(params))
    with open(os.path.join(out_dir, "spec.json"), "w") as f:
        json.dump({"name": bundle.spec.name}, f)


# One-entry memo for preset-resolved bundles: an in-process sequential
# sweep (run_textboost_db.py --sequential) loads the IDENTICAL frozen base
# per instance; re-serving the bundle skips the _init_all program round
# trip each time.  Safe because bundle trees are never mutated (trainers
# copy the trainable embedding through the setup program and never donate
# frozen args) and deterministic because preset init is seeded.  Disk-
# backed loads (snapshot / diffusers dirs) are NOT cached — their contents
# can change between calls.
_PRESET_MEMO: dict = {}


def load_models(
    model_name_or_path: Optional[str] = None,
    *,
    preset: Optional[str] = None,
    lora_rank: int = 0,
    dtype=jnp.bfloat16,
    vae_dtype=None,
    seed: int = 0,
    remat: bool = False,
) -> ModelBundle:
    """Resolve (path | preset) -> ModelBundle.

    Search order: native snapshot dir -> converted-diffusers dir
    (convert.load_diffusers_snapshot) -> known preset name -> error.
    """
    memo_key = (
        model_name_or_path, preset, lora_rank, str(dtype), str(vae_dtype),
        seed, remat,
    )
    if not (model_name_or_path and os.path.isdir(model_name_or_path)):
        cached = _PRESET_MEMO.get("key") == memo_key and _PRESET_MEMO.get("bundle")
        if cached:
            return cached
    spec = None
    snapshot_dir = None
    if model_name_or_path and os.path.isdir(model_name_or_path):
        spec_file = os.path.join(model_name_or_path, "spec.json")
        if os.path.isfile(spec_file):
            with open(spec_file) as f:
                spec = get_spec(json.load(f)["name"])
            snapshot_dir = model_name_or_path
        elif os.path.isfile(os.path.join(model_name_or_path, "model_index.json")):
            from .convert import load_diffusers_snapshot

            return load_diffusers_snapshot(
                model_name_or_path,
                lora_rank=lora_rank,
                dtype=dtype,
                vae_dtype=vae_dtype,
                remat=remat,
            )
    if spec is None:
        spec = get_spec(preset or model_name_or_path or "sd15")

    text_encoder = CLIPTextModel(spec.text_encoder, lora_rank=lora_rank, dtype=dtype)
    unet = UNet2DCondition(spec.unet, dtype=dtype, remat=remat)
    vae = AutoencoderKL(spec.vae, dtype=vae_dtype or dtype)

    # ONE jitted program for all three inits: on the tunneled TPU every
    # compile round-trip has tens of seconds of fixed overhead, so three
    # separate init programs cost far more wall time than one merged one.
    def _init_all(r_te, r_unet, r_vae, r_vae_sample):
        te_p = text_encoder.init(r_te, jnp.zeros((1, 77), jnp.int32))
        unet_p = unet.init(
            r_unet,
            jnp.zeros((1, spec.unet.sample_size, spec.unet.sample_size, 4)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, spec.unet.cross_attention_dim)),
        )
        vae_p = vae.init(r_vae, jnp.zeros((1, 64, 64, 3)), r_vae_sample)
        return te_p, unet_p, vae_p

    te_params, unet_params, vae_params = jax.jit(_init_all)(
        jax.random.PRNGKey(seed),
        jax.random.PRNGKey(seed + 1),
        jax.random.PRNGKey(seed + 2),
        jax.random.PRNGKey(0),
    )

    if snapshot_dir:
        def _load(name, template):
            path = os.path.join(snapshot_dir, f"{name}.msgpack")
            with open(path, "rb") as f:
                return flax.serialization.from_bytes(template, f.read())

        if lora_rank > 0:
            # Snapshots hold base weights only; graft them under the LoRA
            # tree (adapter leaves keep their fresh init).
            base_te = CLIPTextModel(spec.text_encoder, dtype=dtype)
            base_params = _load("text_encoder", _init_params(spec, base_te, "te", seed))
            flat = flax.traverse_util.flatten_dict(te_params["params"])
            for k, v in flax.traverse_util.flatten_dict(base_params["params"]).items():
                flat[k] = v
            te_params = {"params": flax.traverse_util.unflatten_dict(flat)}
        else:
            te_params = _load("text_encoder", te_params)
        unet_params = _load("unet", unet_params)
        vae_params = _load("vae", vae_params)

    bundle = ModelBundle(spec, text_encoder, unet, vae, te_params, unet_params, vae_params)
    if not snapshot_dir:
        _PRESET_MEMO.clear()
        _PRESET_MEMO.update(key=memo_key, bundle=bundle)
    return bundle
