"""Round-3 fixes: attention-mask wiring, post-accumulation clipping, and
exact-freeze of original vocab rows (VERDICT r2 items 5, 6; ADVICE items)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from textboost_tpu.lora.partition import (
    make_optimizer,
    lr_schedule,
    zero_original_vocab_rows,
)
from textboost_tpu.models import CLIPTextModel, get_spec

SPEC = get_spec("tiny")
EOS = SPEC.text_encoder.eos_token_id


def _ids_with_padding():
    # prompt: BOS tok tok EOS pad pad ... (CLIP pads with EOS)
    ids = np.full((1, 77), EOS, np.int64)
    ids[0, 0] = SPEC.text_encoder.bos_token_id
    ids[0, 1] = 100
    ids[0, 2] = 200
    ids[0, 3] = EOS  # first EOS at position 3
    return jnp.asarray(ids)


def test_attention_mask_changes_only_pad_positions():
    """--text_encoder_use_attention_mask semantics (reference
    textboost/utils.py:11-26): the pad mask removes padding keys.  Under
    causal masking, positions <= first-EOS can never see pad keys anyway,
    so their outputs are identical; pad-position outputs change."""
    from textboost_tpu.models.clip import pad_attention_mask

    te = CLIPTextModel(SPEC.text_encoder)
    ids = _ids_with_padding()
    params = jax.jit(te.init)(jax.random.PRNGKey(0), ids)

    mask = pad_attention_mask(ids, EOS)
    assert bool(mask[0, 3]) and not bool(mask[0, 4])
    assert int(mask.sum()) == 4

    h0, _ = jax.jit(te.apply)(params, ids)
    h1, _ = jax.jit(lambda p, i, m: te.apply(p, i, attention_mask=m))(
        params, ids, mask
    )
    np.testing.assert_allclose(
        np.asarray(h0[0, :4]), np.asarray(h1[0, :4]), rtol=1e-5, atol=1e-6
    )
    assert float(jnp.abs(h0[0, 4:] - h1[0, 4:]).max()) > 1e-5


def test_attention_mask_flag_reaches_step_config():
    from textboost_tpu.train.aot import build_step_config
    from textboost_tpu.train.config import TrainConfig

    cfg = TrainConfig(model_preset="tiny", text_encoder_use_attention_mask=True)
    sc = build_step_config(cfg, SPEC, first_added_id=49408)
    assert sc.use_attention_mask
    sc2 = build_step_config(
        TrainConfig(model_preset="tiny"), SPEC, first_added_id=49408
    )
    assert not sc2.use_attention_mask


def _tiny_params():
    model = CLIPTextModel(SPEC.text_encoder, lora_rank=4)
    ids = jnp.full((1, 77), EOS, jnp.int32)
    return jax.jit(model.init)(jax.random.PRNGKey(0), ids)


def test_clip_after_accumulation_matches_big_batch():
    """Reference clips the accumulated/synced grads once
    (train_textboost.py:1128-1133).  k micro-batches through
    MultiSteps(chain(clip, adamw)) must produce the SAME update as the
    averaged big-batch gradient through the unaccumulated optimizer —
    which only holds when clipping runs post-accumulation."""
    params = _tiny_params()

    def build(accum):
        return make_optimizer(
            lr_schedule("constant", 1e-2, 0, 10),
            lr_schedule("constant", 1e-2, 0, 10),
            params,
            accumulate_steps=accum,
            max_grad_norm=0.05,  # small: clipping definitely engages
        )

    # Two very different micro-grads so per-micro clipping would NOT
    # commute with averaging.
    g1 = jax.tree.map(lambda p: jnp.full_like(p, 8.0), params)
    g2 = jax.tree.map(lambda p: jnp.full_like(p, -2.0), params)
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)

    opt_k = build(2)
    st = opt_k.init(params)
    up, st = opt_k.update(g1, st, params)
    p_k = optax.apply_updates(params, up)
    up, st = opt_k.update(g2, st, p_k)
    p_k = optax.apply_updates(p_k, up)

    opt_1 = build(1)
    st1 = opt_1.init(params)
    up1, _ = opt_1.update(g_mean, st1, params)
    p_1 = optax.apply_updates(params, up1)

    for a, b in zip(jax.tree.leaves(p_k), jax.tree.leaves(p_1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8
        )

    # And the clip really fired: encoder kernels moved less than they
    # would unclipped (unclipped AdamW step ~ lr).
    moved = np.abs(
        np.asarray(
            p_1["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
            - params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
        )
    ).max()
    assert moved < 1e-2  # lr=1e-2; clipped grads ⇒ far smaller step


def test_original_vocab_rows_exactly_frozen():
    """Weight decay must not drift original embedding rows: the step zeroes
    the optimizer UPDATES for rows < first_added_id (train/step.py), making
    the compact checkpoint lossless (PARITY.md deviation 4)."""
    params = _tiny_params()
    first_added = SPEC.text_encoder.vocab_size - 3
    opt = make_optimizer(
        lr_schedule("constant", 1e-2, 0, 10),
        lr_schedule("constant", 1e-2, 0, 10),
        params,
        weight_decay=1e-2,
        max_grad_norm=1.0,
    )
    st = opt.init(params)
    grads = zero_original_vocab_rows(
        jax.tree.map(jnp.ones_like, params), first_added
    )
    updates, st = opt.update(grads, st, params)
    # Without the fix, decoupled weight decay makes original-row updates
    # nonzero even with zero grads:
    raw = np.asarray(updates["params"]["token_embedding"][:first_added])
    assert np.abs(raw).max() > 0.0
    updates = zero_original_vocab_rows(updates, first_added)
    new_params = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(
        np.asarray(new_params["params"]["token_embedding"][:first_added]),
        np.asarray(params["params"]["token_embedding"][:first_added]),
    )
    # Added rows did move.
    assert (
        np.abs(
            np.asarray(new_params["params"]["token_embedding"][first_added:])
            - np.asarray(params["params"]["token_embedding"][first_added:])
        ).max()
        > 0.0
    )


def test_fetch_metrics_single_transfer_matches_per_item_float():
    """Trainer._fetch_metrics (one stacked d2h instead of a round-trip per
    scalar) returns the same values as per-item float()."""
    import jax.numpy as jnp

    from textboost_tpu.train.trainer import Trainer

    metrics = {
        "loss": jnp.float32(0.125),
        "grad_norm": jnp.float32(3.5),
        "kpl": jnp.asarray(0.25),
        "prior_loss": 0.0,  # python scalar leaves survive too
    }
    got = Trainer._fetch_metrics(object.__new__(Trainer), metrics)
    want = {k: float(v) for k, v in metrics.items()}
    assert got == want
