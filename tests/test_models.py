import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textboost_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    UNet2DCondition,
    apply_null_embedding_patch,
    get_spec,
)

SPEC = get_spec("tiny")
RNG = jax.random.PRNGKey(0)
EOS = SPEC.text_encoder.eos_token_id
BOS = SPEC.text_encoder.bos_token_id


def _ids(tokens):
    """Build a padded-to-77 CLIP input row: BOS, tokens..., EOS, EOS-pad."""
    row = [BOS] + list(tokens) + [EOS]
    row = row + [EOS] * (77 - len(row))
    return jnp.asarray(row, dtype=jnp.int32)


@pytest.fixture(scope="module")
def clip():
    model = CLIPTextModel(SPEC.text_encoder)
    ids = _ids([100, 200])[None]
    params = jax.jit(model.init)(RNG, ids)
    return model, params


def test_clip_shapes_and_pooling(clip):
    model, params = clip
    ids = jnp.stack([_ids([100, 200, 300]), _ids([])])
    hidden, pooled = jax.jit(model.apply)(params, ids)
    assert hidden.shape == (2, 77, SPEC.text_encoder.hidden_size)
    # Pooled output is the hidden state at the first EOS position.
    np.testing.assert_allclose(
        np.asarray(pooled[0]), np.asarray(hidden[0, 4]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pooled[1]), np.asarray(hidden[1, 1]), atol=1e-5
    )


def test_clip_causal_mask(clip):
    model, params = clip
    a = _ids([100, 200, 300])[None]
    b = a.at[0, 3].set(999)  # change a later token
    ha, _ = jax.jit(model.apply)(params, a)
    hb, _ = jax.jit(model.apply)(params, b)
    # Positions before the edit are unaffected (causal), after differ.
    np.testing.assert_allclose(np.asarray(ha[0, :3]), np.asarray(hb[0, :3]), atol=1e-5)
    assert float(jnp.abs(ha[0, 3:] - hb[0, 3:]).max()) > 1e-4


def test_lora_zero_init_is_identity(clip):
    model, params = clip
    lora_model = CLIPTextModel(SPEC.text_encoder, lora_rank=4)
    ids = _ids([123])[None]
    lora_params = jax.jit(lora_model.init)(jax.random.PRNGKey(1), ids)

    # Graft the base weights into the LoRA param tree (lora_b starts at 0,
    # so outputs must match the base model exactly).
    import flax

    flat_base = flax.traverse_util.flatten_dict(params["params"])
    flat_lora = flax.traverse_util.flatten_dict(lora_params["params"])
    for k, v in flat_base.items():
        flat_lora[k] = v
    merged = {"params": flax.traverse_util.unflatten_dict(flat_lora)}

    h_base, _ = jax.jit(model.apply)(params, ids)
    h_lora, _ = jax.jit(lora_model.apply)(merged, ids)
    np.testing.assert_allclose(np.asarray(h_base), np.asarray(h_lora), atol=1e-5)
    # And the adapter params exist with the right shapes.
    flat = flax.traverse_util.flatten_dict(lora_params["params"])
    lora_keys = [k for k in flat if "lora_a" in k or "lora_b" in k]
    # 3 targets (q,k,v) x 2 tensors x num_layers
    assert len(lora_keys) == 3 * 2 * SPEC.text_encoder.num_hidden_layers


def test_null_embedding_patch():
    hidden = jnp.ones((3, 77, 8))
    null_emb = jnp.full((77, 8), 5.0)
    ids = jnp.stack([_ids([]), _ids([10]), _ids([])])
    out = apply_null_embedding_patch(hidden, ids, null_emb, EOS, fixed_special=True)
    # Null rows (0 and 2) fully replaced.
    np.testing.assert_allclose(np.asarray(out[0]), 5.0)
    np.testing.assert_allclose(np.asarray(out[2]), 5.0)
    # Non-null row: only BOS position replaced.
    np.testing.assert_allclose(np.asarray(out[1, 0]), 5.0)
    np.testing.assert_allclose(np.asarray(out[1, 1:]), 1.0)
    # fixed_special=False leaves non-null rows untouched.
    out2 = apply_null_embedding_patch(hidden, ids, null_emb, EOS, fixed_special=False)
    np.testing.assert_allclose(np.asarray(out2[1]), 1.0)
    # None null embedding is a no-op.
    out3 = apply_null_embedding_patch(hidden, ids, None, EOS)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(hidden))


def test_unet_shapes_and_determinism():
    unet = UNet2DCondition(SPEC.unet)
    x = jax.random.normal(RNG, (2, 16, 16, 4))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(jax.random.fold_in(RNG, 1), (2, 77, SPEC.unet.cross_attention_dim))
    params = jax.jit(unet.init)(RNG, x, t, ctx)
    out = jax.jit(unet.apply)(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    # Cross-attention context actually conditions the output.
    out2 = jax.jit(unet.apply)(params, x, t, ctx * 0.0)
    assert float(jnp.abs(out - out2).max()) > 1e-5
    # Timestep conditions the output.
    out3 = jax.jit(unet.apply)(params, x, jnp.array([11, 501]), ctx)
    assert float(jnp.abs(out - out3).max()) > 1e-6


def test_unet_remat_matches():
    unet = UNet2DCondition(SPEC.unet)
    unet_r = UNet2DCondition(SPEC.unet, remat=True)
    x = jax.random.normal(RNG, (1, 16, 16, 4))
    t = jnp.array([100])
    ctx = jax.random.normal(RNG, (1, 77, SPEC.unet.cross_attention_dim))
    params = jax.jit(unet.init)(RNG, x, t, ctx)
    out = jax.jit(unet.apply)(params, x, t, ctx)
    out_r = jax.jit(unet_r.apply)(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)


def test_vae_roundtrip():
    vae = AutoencoderKL(SPEC.vae)
    px = jax.random.normal(RNG, (1, 64, 64, 3)) * 0.5
    params = jax.jit(vae.init)(RNG, px, RNG)
    mean, logvar = jax.jit(lambda p, x: vae.apply(p, x, method="encode_moments"))(params, px)
    assert mean.shape == (1, 8, 8, 4) and logvar.shape == (1, 8, 8, 4)
    z = jax.jit(lambda p, x, r: vae.apply(p, x, r, method="encode"))(params, px, RNG)
    img = jax.jit(lambda p, z: vae.apply(p, z, method="decode"))(params, z)
    assert img.shape == (1, 64, 64, 3)
    # Sampling with the same rng is deterministic.
    z2 = jax.jit(lambda p, x, r: vae.apply(p, x, r, method="encode"))(params, px, RNG)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2))


def test_spec_aliases():
    assert get_spec("sd1.5").name == "sd15"
    assert get_spec("stabilityai/stable-diffusion-2-1-base").name == "sd21base"
    assert get_spec("sd21").scheduler.prediction_type == "v_prediction"
    with pytest.raises(ValueError):
        get_spec("nope")
