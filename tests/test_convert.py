"""Checkpoint conversion round-trips: flax -> torch layout -> flax."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textboost_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    UNet2DCondition,
    get_spec,
)
from textboost_tpu.models.convert import (
    convert_text_encoder,
    convert_unet,
    convert_vae,
    flax_to_torch_state_dict,
)

SPEC = get_spec("tiny")
RNG = jax.random.PRNGKey(0)


def _randomize(params, seed=0):
    rs = np.random.RandomState(seed)
    return jax.tree.map(
        lambda p: jnp.asarray(rs.randn(*p.shape).astype(np.float32)), params
    )


def test_text_encoder_roundtrip():
    model = CLIPTextModel(SPEC.text_encoder)
    params = _randomize(
        jax.jit(model.init)(RNG, jnp.zeros((1, 77), jnp.int32))
    )
    sd = flax_to_torch_state_dict(params, "text_encoder")
    # Torch layout sanity: linear weights are [out, in].
    q = sd["text_model.encoder.layers.0.self_attn.q_proj.weight"]
    assert q.shape == (SPEC.text_encoder.hidden_size, SPEC.text_encoder.hidden_size)
    assert "text_model.embeddings.token_embedding.weight" in sd
    restored = convert_text_encoder(sd, jax.tree.map(jnp.zeros_like, params))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        params,
        restored,
    )


def test_text_encoder_roundtrip_with_lora():
    model = CLIPTextModel(SPEC.text_encoder, lora_rank=4)
    params = jax.jit(model.init)(RNG, jnp.zeros((1, 77), jnp.int32))
    sd = flax_to_torch_state_dict(params, "text_encoder")
    assert not any("lora" in k for k in sd)  # HF layout has no adapter keys
    restored = convert_text_encoder(sd, params)
    # LoRA leaves preserved from the template.
    a = restored["params"]["layers_0"]["self_attn"]["q_proj"]["lora_a"]
    np.testing.assert_allclose(
        np.asarray(a),
        np.asarray(params["params"]["layers_0"]["self_attn"]["q_proj"]["lora_a"]),
    )


def test_unet_roundtrip():
    model = UNet2DCondition(SPEC.unet)
    params = _randomize(
        jax.jit(model.init)(
            RNG,
            jnp.zeros((1, 16, 16, 4)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, SPEC.unet.cross_attention_dim)),
        ),
        seed=1,
    )
    sd = flax_to_torch_state_dict(params, "unet")
    conv = sd["conv_in.weight"]
    assert conv.shape == (SPEC.unet.block_out_channels[0], 4, 3, 3)  # torch layout
    assert "mid_block.attentions.0.transformer_blocks.0.attn2.to_k.weight" in sd
    assert "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight" in sd
    restored = convert_unet(sd, jax.tree.map(jnp.zeros_like, params))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        params,
        restored,
    )


def test_vae_roundtrip():
    model = AutoencoderKL(SPEC.vae)
    params = _randomize(
        jax.jit(model.init)(RNG, jnp.zeros((1, 64, 64, 3)), RNG), seed=2
    )
    sd = flax_to_torch_state_dict(params, "vae")
    assert "encoder.mid_block.attentions.0.to_q.weight" in sd
    assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in sd
    assert "quant_conv.weight" in sd
    restored = convert_vae(sd, jax.tree.map(jnp.zeros_like, params))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        params,
        restored,
    )


def test_missing_key_raises():
    model = CLIPTextModel(SPEC.text_encoder)
    params = jax.jit(model.init)(RNG, jnp.zeros((1, 77), jnp.int32))
    sd = flax_to_torch_state_dict(params, "text_encoder")
    del sd["text_model.final_layer_norm.weight"]
    with pytest.raises(KeyError):
        convert_text_encoder(sd, params)
