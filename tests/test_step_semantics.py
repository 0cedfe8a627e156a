"""Unit-level semantics of the jitted train step (tiny shapes, CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textboost_tpu.lora.partition import make_optimizer
from textboost_tpu.models import CLIPTextModel, get_spec
from textboost_tpu.models.pretrained import load_models
from textboost_tpu.ops.schedule import NoiseSchedule
from textboost_tpu.train.step import StepConfig, TextBoostTrainState, make_train_step

SPEC = get_spec("tiny")


def _setup(**config_overrides):
    bundle = load_models("tiny", lora_rank=4, dtype=jnp.float32)
    frozen_te = CLIPTextModel(SPEC.text_encoder, dtype=jnp.float32)
    schedule = NoiseSchedule.create()
    # Realistic null embedding: the frozen encoder's empty-prompt output
    # (an all-zero placeholder makes cosine KPL degenerate at the patched
    # BOS position — cos(0,0)=0).
    null_ids = jnp.full((1, 77), 49407, jnp.int32).at[:, 0].set(49406)
    null_emb, _ = jax.jit(frozen_te.apply)(
        {"params": dict(bundle.te_params["params"])}, null_ids
    )
    null_emb = null_emb[0]
    optimizer = make_optimizer(1e-3, 1e-2, bundle.te_params)
    config = StepConfig(
        vae_scaling=SPEC.vae.scaling_factor,
        first_added_token_id=SPEC.text_encoder.vocab_size - 2,
        embedding_target_norm=0.15,
        **config_overrides,
    )
    step = make_train_step(
        text_encoder_apply=bundle.text_encoder.apply,
        frozen_text_encoder_apply=frozen_te.apply,
        unet_apply=bundle.unet.apply,
        vae_encode_moments=lambda p, x: bundle.vae.apply(p, x, method="encode_moments"),
        optimizer=optimizer,
        schedule=schedule,
        config=config,
        null_embedding=null_emb,
    )
    te_params = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(bundle.te_params)
    state = TextBoostTrainState(
        step=jnp.zeros((), jnp.int32),
        te_params=te_params,
        opt_state=jax.jit(optimizer.init)(te_params),
        rng=jax.random.PRNGKey(0),
    )
    frozen = {
        "unet": bundle.unet_params,
        "vae": bundle.vae_params,
        "te": {"params": dict(bundle.te_params["params"])},
    }
    batch_size = 2
    batch = {
        "pixel_values": jax.random.normal(
            jax.random.PRNGKey(1), (batch_size, 128, 128, 3)
        )
        * 0.3,
        "input_ids": jnp.full((batch_size, 77), 49407, jnp.int32)
        .at[:, 0].set(49406)
        .at[:, 1].set(1234),
        # Non-null prior prompts: the null-row patch replaces rows whose
        # second token is EOS with the cached null embedding, which in this
        # synthetic setup is all-zeros (degenerate for cosine KPL).
        "prior_input_ids": jnp.full((batch_size, 77), 49407, jnp.int32)
        .at[:, 0].set(49406)
        .at[:, 1].set(2345),
    }
    return step, state, batch, frozen, bundle


def test_original_vocab_rows_frozen():
    step, state, batch, frozen, bundle = _setup()
    jit_step = jax.jit(step)
    new_state, metrics = jit_step(state, batch, frozen)
    emb0 = np.asarray(bundle.te_params["params"]["token_embedding"])
    emb1 = np.asarray(new_state.te_params["params"]["token_embedding"])
    first = SPEC.text_encoder.vocab_size - 2
    # Original rows receive NO gradient signal — they move only by AdamW
    # weight decay (lr*wd = 1e-4 relative), exactly like the reference,
    # whose optimizer also holds the full embedding matrix with zeroed
    # grads for original rows (train_textboost.py:829-854, 1109-1117).
    rel = np.abs(emb1[:first] - emb0[:first]) / (np.abs(emb0[:first]) + 1e-12)
    assert rel.max() < 3e-4, f"original rows moved beyond weight decay: {rel.max()}"
    # Added rows move by a grad-driven step, orders of magnitude larger.
    delta_added = np.abs(emb1[first:] - emb0[first:]).max()
    assert delta_added > 1e-3
    assert np.isfinite(float(metrics["loss"]))


def test_renorm_bounds_added_rows():
    step, state, batch, frozen, _ = _setup()
    jit_step = jax.jit(step)
    s = state
    for _ in range(3):
        s, _ = jit_step(s, batch, frozen)
    emb = np.asarray(s.te_params["params"]["token_embedding"])
    first = SPEC.text_encoder.vocab_size - 2
    norms = np.linalg.norm(emb[first:], axis=-1)
    assert np.all(norms <= 0.15 + 1e-5)


def test_kpl_zero_for_identical_encoders():
    """At step 0 (tuned == frozen base weights and zero-init LoRA), the KPL
    must be ~0: the tuned and frozen encoders produce identical outputs."""
    step, state, batch, frozen, _ = _setup(kpl_weight=0.1)
    _, metrics = jax.jit(step)(state, batch, frozen)
    assert float(metrics["kpl"]) < 1e-5


def test_kpl_weight_zero_disables():
    step, state, batch, frozen, _ = _setup(kpl_weight=0.0)
    _, metrics = jax.jit(step)(state, batch, frozen)
    assert float(metrics["kpl"]) == 0.0


def test_weighted_timesteps_config_compiles():
    step, state, batch, frozen, _ = _setup(weighted_timesteps=True)
    _, metrics = jax.jit(step)(state, batch, frozen)
    assert np.isfinite(float(metrics["loss"]))


def test_masked_loss():
    step, state, batch, frozen, _ = _setup()
    batch = dict(batch)
    # All-ones mask must equal the unmasked loss path numerically.
    batch["mask"] = jnp.ones((2, 16, 16, 1))
    _, m_masked = jax.jit(step)(state, batch, frozen)
    assert np.isfinite(float(m_masked["loss"]))


def test_v_prediction_target():
    step, state, batch, frozen, _ = _setup(prediction_type="v_prediction")
    _, metrics = jax.jit(step)(state, batch, frozen)
    assert np.isfinite(float(metrics["loss"]))
