"""Golden parity vs the reference model stacks.

The reference runs on transformers CLIPTextModel + diffusers UNet/VAE
(/root/reference/train_textboost.py:630-654).  transformers+torch are
installed here, so the CLIP conversion is verified ACTIVATION-level: build
an HF CLIPTextModel with random weights, convert with
`convert_text_encoder`, and demand last-hidden-state / pooled agreement.
diffusers is not installed, so UNet/VAE are verified STRUCTURALLY: the
conversion's eval_shape-derived torch-key manifest must agree
key-for-key/shape-for-shape with independently-authored manifests of the
published SD state dicts (tests/fixtures/generate_manifests.py).
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from textboost_tpu.models.clip import CLIPTextModel
from textboost_tpu.models.configs import CLIPTextConfig, get_spec
from textboost_tpu.models.convert import (
    convert_text_encoder,
    convert_vae,
    flax_to_torch_state_dict,
    torch_key_manifest,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _load_manifest(name):
    out = {}
    with open(os.path.join(FIXTURES, name + ".manifest")) as f:
        for line in f:
            key, shape = line.split()
            out[key] = tuple(int(x) for x in shape.split(","))
    return out


# ---------------------------------------------------------------------------
# CLIP: activation-level parity against transformers
# ---------------------------------------------------------------------------
def _hf_clip(cfg: CLIPTextConfig, seed: int):
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    torch.manual_seed(seed)
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act=cfg.hidden_act,
        layer_norm_eps=cfg.layer_norm_eps,
        eos_token_id=cfg.eos_token_id,
        bos_token_id=cfg.bos_token_id,
    )
    model = HFModel(hf_cfg).eval()
    # widen random init so mismatches aren't hidden by near-zero activations
    with torch.no_grad():
        for p in model.parameters():
            p.mul_(3.0)
    return model


def _parity_case(cfg: CLIPTextConfig, seed: int, lora_rank: int = 0):
    import torch

    hf = _hf_clip(cfg, seed)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    rng = np.random.default_rng(seed)
    batch = 3
    ids = rng.integers(1, cfg.vocab_size - 2, size=(batch, 77)).astype(np.int32)
    ids[:, 0] = cfg.bos_token_id
    ids[0, 40:] = cfg.eos_token_id  # padded row: first EOS mid-sequence
    ids[1, -1] = cfg.eos_token_id
    ids[2, 5:] = cfg.eos_token_id

    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64)))
    ref_hidden = ref.last_hidden_state.numpy()
    ref_pooled = ref.pooler_output.numpy()

    model = CLIPTextModel(cfg, lora_rank=lora_rank, dtype=jnp.float32)
    init = model.init(__import__("jax").random.PRNGKey(0), jnp.asarray(ids))
    params = convert_text_encoder(sd, init)
    hidden, pooled = model.apply(params, jnp.asarray(ids))

    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=1e-4, rtol=1e-4)


def test_clip_parity_small_quick_gelu():
    cfg = CLIPTextConfig(
        vocab_size=1000,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        hidden_act="quick_gelu",
        eos_token_id=999,
        bos_token_id=998,
    )
    _parity_case(cfg, seed=0)


def test_clip_parity_small_gelu_sd2_style():
    cfg = CLIPTextConfig(
        vocab_size=1000,
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=3,
        num_attention_heads=4,
        hidden_act="gelu",
        eos_token_id=999,
        bos_token_id=998,
    )
    _parity_case(cfg, seed=1)


def test_clip_parity_small_with_lora_leaves():
    # LoRA leaves are absent from HF checkpoints; conversion must keep the
    # fresh adapter init and (with B=0) leave the forward unchanged.
    cfg = CLIPTextConfig(
        vocab_size=500,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        eos_token_id=499,
        bos_token_id=498,
    )
    _parity_case(cfg, seed=2, lora_rank=4)


def test_clip_parity_sd15_sized():
    # Full SD1.5 text-encoder geometry (768/12L/12H quick_gelu), random HF
    # weights — the shape/mapping path the real checkpoint will take.
    _parity_case(get_spec("sd15").text_encoder, seed=3)


def test_clip_parity_sd21base_sized():
    # SD2.1-base geometry (1024/23L/16H gelu).
    _parity_case(get_spec("sd21base").text_encoder, seed=4)


# ---------------------------------------------------------------------------
# UNet / VAE: structural parity against authored state-dict manifests
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "module,spec,fixture",
    [
        ("text_encoder", "sd15", "clip_sd15"),
        ("text_encoder", "sd21base", "clip_sd21base"),
        ("unet", "sd15", "unet_sd15"),
        ("unet", "sd21base", "unet_sd21base"),
        ("vae", "sd15", "vae_sd"),
    ],
)
def test_state_dict_manifest(module, spec, fixture):
    ours = torch_key_manifest(module, spec)
    ref = _load_manifest(fixture)
    missing = sorted(set(ref) - set(ours))
    extra = sorted(set(ours) - set(ref))
    assert not missing, f"conversion never consumes reference keys: {missing[:10]}"
    assert not extra, f"conversion demands nonexistent keys: {extra[:10]}"
    mismatched = {k: (ours[k], ref[k]) for k in ref if ours[k] != ref[k]}
    assert not mismatched, f"shape mismatches: {dict(list(mismatched.items())[:10])}"


def test_flax_export_matches_manifest_tiny():
    # flax_to_torch_state_dict emits the same key set the manifest predicts
    # (data-level check on the tiny spec where init is cheap).
    import jax

    from textboost_tpu.models.pretrained import load_models

    bundle = load_models(preset="tiny", dtype=jnp.float32)
    exported = flax_to_torch_state_dict(bundle.te_params, "text_encoder")
    expected = torch_key_manifest("text_encoder", "tiny")
    assert set(exported) == set(expected)
    for k, v in exported.items():
        assert tuple(v.shape) == expected[k], k


def test_vae_legacy_attention_keys():
    # Pre-0.17 diffusers serialized VAE attention as query/key/value/
    # proj_attn (the runwayml sd15 hub file still does); conversion must
    # accept both namings and produce identical params.
    import jax

    from textboost_tpu.models.pretrained import ModelBundle, _init_params
    from textboost_tpu.models.vae import AutoencoderKL

    spec = get_spec("tiny")
    vae = AutoencoderKL(spec.vae, dtype=jnp.float32)
    init = _init_params(spec, vae, "vae", 0)
    modern = flax_to_torch_state_dict(init, "vae")

    legacy = {}
    ren = {"to_q": "query", "to_k": "key", "to_v": "value", "to_out.0": "proj_attn"}
    for k, v in modern.items():
        for new, old in ren.items():
            marker = f".attentions.0.{new}."
            if marker in k:
                k = k.replace(marker, f".attentions.0.{old}.")
                break
        legacy[k] = v

    a = convert_vae(modern, init)
    b = convert_vae(legacy, init)
    import flax as flaxlib

    fa = flaxlib.traverse_util.flatten_dict(a["params"])
    fb = flaxlib.traverse_util.flatten_dict(b["params"])
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])
