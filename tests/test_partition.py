import jax
import jax.numpy as jnp
import numpy as np
import optax

from textboost_tpu.lora import (
    apply_mixing_mask,
    clip_encoder_grads,
    count_params,
    import_lora_adapter,
    export_lora_adapter,
    export_token_embeddings,
    import_token_embeddings,
    lr_schedule,
    make_optimizer,
    param_labels,
    renorm_added_embeddings,
    trainable_mask,
    zero_original_vocab_rows,
)
from textboost_tpu.models import CLIPTextModel, get_spec

SPEC = get_spec("tiny")


def _params():
    model = CLIPTextModel(SPEC.text_encoder, lora_rank=4)
    ids = jnp.full((1, 77), 49407, jnp.int32)
    return model, jax.jit(model.init)(jax.random.PRNGKey(0), ids)


def test_labels_and_mask():
    _, params = _params()
    labels = param_labels(params)
    mask = trainable_mask(params)
    flat_l = jax.tree_util.tree_leaves_with_path(labels)
    seen = set(l for _, l in flat_l)
    assert seen == {"embedding", "lora", "frozen"}
    n_train = count_params(params, mask)
    n_total = count_params(params)
    # trainable = token embedding + 2*rank*(hidden) per q/k/v per layer
    cfg = SPEC.text_encoder
    expected = (cfg.vocab_size * cfg.hidden_size) + (
        cfg.num_hidden_layers * 3 * 2 * 4 * cfg.hidden_size
    )
    assert n_train == expected and n_train < n_total


def test_zero_original_vocab_rows():
    _, params = _params()
    grads = jax.jit(lambda p: jax.tree.map(jnp.ones_like, p))(params)
    out = jax.jit(lambda g: zero_original_vocab_rows(g, 49408 - 2))(grads)
    emb_grad = out["params"]["token_embedding"]
    assert float(emb_grad[: 49408 - 2].sum()) == 0.0
    assert float(emb_grad[49408 - 2 :].sum()) > 0.0


def test_mixing_mask():
    _, params = _params()
    grads = jax.tree.map(jnp.ones_like, params)
    out_obj = jax.jit(lambda g: apply_mixing_mask(g, "object"))(grads)
    lb = out_obj["params"]["layers_0"]["self_attn"]["q_proj"]["lora_b"]
    np.testing.assert_allclose(np.asarray(lb[:, 1::2]), 0.0)
    np.testing.assert_allclose(np.asarray(lb[:, 0::2]), 1.0)
    out_sty = jax.jit(lambda g: apply_mixing_mask(g, "style"))(grads)
    lb = out_sty["params"]["layers_0"]["self_attn"]["q_proj"]["lora_b"]
    np.testing.assert_allclose(np.asarray(lb[:, 0::2]), 0.0)
    # lora_a untouched
    la = out_obj["params"]["layers_0"]["self_attn"]["q_proj"]["lora_a"]
    np.testing.assert_allclose(np.asarray(la), 1.0)


def test_clip_encoder_grads():
    _, params = _params()
    grads = jax.tree.map(lambda p: jnp.full_like(p, 10.0), params)
    clipped, gnorm = jax.jit(lambda g: clip_encoder_grads(g, 1.0))(grads)
    # Encoder grads scaled down; embedding untouched.
    emb = clipped["params"]["token_embedding"]
    np.testing.assert_allclose(np.asarray(emb), 10.0)
    enc = clipped["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert float(jnp.abs(enc).max()) < 10.0
    assert float(gnorm) > 1.0


def test_renorm_added_embeddings():
    _, params = _params()
    emb = np.asarray(params["params"]["token_embedding"]).copy()
    first_added = emb.shape[0] - 3
    emb[first_added:] = 100.0  # blow up added rows
    params["params"]["token_embedding"] = jnp.asarray(emb)
    out = jax.jit(lambda p: renorm_added_embeddings(p, first_added, 1.0))(params)
    new_emb = np.asarray(out["params"]["token_embedding"])
    norms = np.linalg.norm(new_emb[first_added:], axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # Original rows untouched.
    np.testing.assert_allclose(new_emb[: first_added], emb[: first_added])


def test_optimizer_freezes_base():
    _, params = _params()
    opt = make_optimizer(1e-4, 1e-3, params)
    state = jax.jit(opt.init)(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = jax.jit(opt.update)(grads, state, params)
    base_kernel = updates["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    np.testing.assert_allclose(np.asarray(base_kernel), 0.0)
    lora_update = updates["params"]["layers_0"]["self_attn"]["q_proj"]["lora_a"]
    assert float(jnp.abs(lora_update).max()) > 0.0
    emb_update = updates["params"]["token_embedding"]
    # emb lr 10x lora lr (AdamW with uniform grads -> ~lr-sized steps).
    assert float(jnp.abs(emb_update).max()) > float(jnp.abs(lora_update).max())


def test_lr_schedules():
    for name in ("constant", "constant_with_warmup", "linear", "cosine"):
        sched = lr_schedule(name, 1e-4, 10, 100)
        assert float(sched(50)) >= 0.0
    assert float(lr_schedule("constant", 1e-4, 0, 100)(99)) == 1e-4
    # warmup starts at 0
    assert float(lr_schedule("linear", 1e-4, 10, 100)(0)) == 0.0


def test_peft_roundtrip(tmp_path):
    model, params = _params()
    # Randomize lora weights so the roundtrip is meaningful.
    params = jax.tree.map(
        lambda p: jnp.asarray(np.random.RandomState(0).randn(*p.shape), p.dtype)
        if p.ndim > 0
        else p,
        params,
    )
    out = export_lora_adapter(params, str(tmp_path / "adapter"), rank=4)
    import json, os

    assert os.path.exists(tmp_path / "adapter" / "adapter_model.safetensors")
    cfg = json.load(open(tmp_path / "adapter" / "adapter_config.json"))
    assert cfg["r"] == 4 and cfg["peft_type"] == "LORA"
    assert set(cfg["target_modules"]) == {"q_proj", "k_proj", "v_proj"}

    # Import into a fresh tree and compare.
    _, fresh = _params()
    merged = import_lora_adapter(fresh, str(tmp_path / "adapter"))
    a0 = merged["params"]["layers_0"]["self_attn"]["q_proj"]["lora_a"]
    np.testing.assert_allclose(
        np.asarray(a0),
        np.asarray(params["params"]["layers_0"]["self_attn"]["q_proj"]["lora_a"]),
        atol=1e-6,
    )
    # Torch-side check: safetensors keys follow the PEFT naming scheme.
    from safetensors.numpy import load_file

    tensors = load_file(str(tmp_path / "adapter" / "adapter_model.safetensors"))
    key = "base_model.model.text_model.encoder.layers.0.self_attn.q_proj.lora_A.weight"
    assert key in tensors and tensors[key].shape == (4, SPEC.text_encoder.hidden_size)


def test_token_bin_roundtrip(tmp_path):
    emb = np.random.RandomState(1).randn(10, 8).astype(np.float32)
    paths = export_token_embeddings(emb, {"<dog>": 3, "<cat>": 7}, str(tmp_path))
    assert sorted(os.path.basename(p) for p in paths) == ["cat.bin", "dog.bin"]
    loaded = import_token_embeddings(paths + [str(tmp_path / "optimizer.bin")])
    np.testing.assert_allclose(loaded["<dog>"], emb[3])
    np.testing.assert_allclose(loaded["<cat>"], emb[7])


import os  # noqa: E402  (used in tests above)
