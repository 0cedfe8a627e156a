"""Model snapshot round-trips: native msgpack dir and diffusers-layout dir."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from textboost_tpu.models.pretrained import ModelBundle, load_models, save_snapshot


def test_native_snapshot_roundtrip(tmp_path):
    bundle = load_models("tiny", dtype=jnp.float32, seed=3)
    out = str(tmp_path / "snap")
    save_snapshot(bundle, out)
    assert os.path.isfile(os.path.join(out, "unet.msgpack"))
    assert json.load(open(os.path.join(out, "spec.json")))["name"] == "tiny"

    restored = load_models(out, dtype=jnp.float32, seed=99)
    np.testing.assert_allclose(
        np.asarray(restored.unet_params["params"]["conv_in"]["kernel"]),
        np.asarray(bundle.unet_params["params"]["conv_in"]["kernel"]),
    )
    np.testing.assert_allclose(
        np.asarray(restored.te_params["params"]["token_embedding"]),
        np.asarray(bundle.te_params["params"]["token_embedding"]),
    )


def test_native_snapshot_with_lora_graft(tmp_path):
    bundle = load_models("tiny", dtype=jnp.float32, seed=3)
    out = str(tmp_path / "snap")
    save_snapshot(bundle, out)
    # Loading with lora_rank>0 grafts base weights under the LoRA tree.
    restored = load_models(out, lora_rank=4, dtype=jnp.float32)
    q = restored.te_params["params"]["layers_0"]["self_attn"]["q_proj"]
    assert "lora_a" in q and "lora_b" in q
    np.testing.assert_allclose(
        np.asarray(q["kernel"]),
        np.asarray(
            bundle.te_params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
        ),
    )
    np.testing.assert_allclose(np.asarray(q["lora_b"]), 0.0)


def test_diffusers_layout_snapshot(tmp_path):
    """Synthetic diffusers checkpoint dir loads through the converter."""
    from safetensors.numpy import save_file

    from textboost_tpu.models.convert import flax_to_torch_state_dict

    bundle = load_models("tiny", dtype=jnp.float32, seed=5)
    root = tmp_path / "diffusers_ckpt"
    for sub, params, module in (
        ("text_encoder", bundle.te_params, "text_encoder"),
        ("unet", bundle.unet_params, "unet"),
        ("vae", bundle.vae_params, "vae"),
    ):
        d = root / sub
        d.mkdir(parents=True)
        sd = flax_to_torch_state_dict(params, module)
        save_file(sd, str(d / "model.safetensors"))
    (root / "model_index.json").write_text(json.dumps({"_class_name": "StableDiffusionPipeline"}))

    from textboost_tpu.models.convert import load_diffusers_snapshot

    # hidden=64 is neither 768 nor 1024, so pass the spec explicitly.
    restored = load_diffusers_snapshot(str(root), dtype=jnp.float32, spec_name="tiny")
    np.testing.assert_allclose(
        np.asarray(restored.unet_params["params"]["conv_in"]["kernel"]),
        np.asarray(bundle.unet_params["params"]["conv_in"]["kernel"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(restored.vae_params["params"]["encoder"]["conv_in"]["kernel"]),
        np.asarray(bundle.vae_params["params"]["encoder"]["conv_in"]["kernel"]),
        atol=1e-6,
    )
