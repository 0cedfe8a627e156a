"""Cross-stack PEFT parity against the real peft/transformers consumer.

The reference's "full text_encoder save" (`save_pretrained`,
/root/reference/train_textboost.py:1178-1182 and :1244-1246) runs on a
model whose LoRA was injected through the transformers PEFT integration
(`text_encoder.add_adapter`, :709).  With `_hf_peft_config_loaded` set,
transformers saves ONLY the adapter — `adapter_config.json` +
`adapter_model.safetensors`, no base weights, no config.json.  So the
reference's on-disk `text_encoder/` artifact IS an adapter-only dir, and
this repo's `export_lora_adapter` output is the same layout, not a
deviation (PARITY.md item 7).

These tests pin both halves with the real libraries:
  (a) what the reference's save call actually writes (adapter-only);
  (b) that OUR exported adapter dir is consumed by the reference's actual
      loader (`text_encoder.load_adapter`, /root/reference/inference.py:56-58)
      and produces activation-identical forwards.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

peft = pytest.importorskip("peft")
torch = pytest.importorskip("torch")

import flax

from textboost_tpu.lora.peft_io import export_lora_adapter
from textboost_tpu.models.clip import CLIPTextModel
from textboost_tpu.models.configs import CLIPTextConfig
from textboost_tpu.models.convert import convert_text_encoder

CFG = CLIPTextConfig(
    vocab_size=500,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    eos_token_id=499,
    bos_token_id=498,
)

LORA = dict(
    r=4,
    lora_alpha=4,
    init_lora_weights="gaussian",
    target_modules=["q_proj", "k_proj", "v_proj"],
)


def _hf_clip(seed: int):
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    torch.manual_seed(seed)
    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        hidden_act=CFG.hidden_act,
        layer_norm_eps=CFG.layer_norm_eps,
        eos_token_id=CFG.eos_token_id,
        bos_token_id=CFG.bos_token_id,
    )
    return HFModel(hf_cfg).eval()


def _ids():
    rng = np.random.default_rng(7)
    ids = rng.integers(1, CFG.vocab_size - 2, size=(2, 77)).astype(np.int32)
    ids[:, 0] = CFG.bos_token_id
    ids[0, 40:] = CFG.eos_token_id
    ids[1, -1] = CFG.eos_token_id
    return ids


def test_reference_final_save_is_adapter_only(tmp_path):
    # Reproduces train_textboost.py:1244-1246 with the pinned libraries:
    # save_pretrained on an adapter-loaded model writes the adapter only.
    hf = _hf_clip(0)
    hf.add_adapter(peft.LoraConfig(**LORA))
    out = tmp_path / "text_encoder"
    hf.to(torch.float32).save_pretrained(str(out))
    files = {f for f in os.listdir(out) if not f.startswith(".")}
    assert files == {"adapter_config.json", "adapter_model.safetensors"}, files


def test_exported_adapter_consumed_by_transformers(tmp_path):
    # Base weights shared via convert_text_encoder; LoRA weights randomized
    # on our side, exported, then loaded through the reference's consumer
    # path — the forwards must agree with the adapter ACTIVE (nonzero B).
    hf = _hf_clip(1)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    ids = _ids()
    model = CLIPTextModel(CFG, lora_rank=4, dtype=jnp.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    params = convert_text_encoder(sd, init)

    rng = np.random.default_rng(3)
    flat = flax.traverse_util.flatten_dict(params["params"])
    for k in flat:
        if k[-1] in ("lora_a", "lora_b"):
            flat[k] = jnp.asarray(
                rng.normal(scale=0.2, size=flat[k].shape), jnp.float32
            )
    params = {"params": flax.traverse_util.unflatten_dict(flat)}

    adapter_dir = export_lora_adapter(
        params, str(tmp_path / "text_encoder"), rank=4
    )

    hf.load_adapter(adapter_dir)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).last_hidden_state.numpy()

    ours, _ = model.apply(params, jnp.asarray(ids))
    # The adapter must actually matter (guards against comparing two
    # adapter-free forwards): same base weights, B zeroed.
    noadapter = {
        "params": flax.traverse_util.unflatten_dict(
            {
                k: (jnp.zeros_like(v) if k[-1] == "lora_b" else v)
                for k, v in flat.items()
            }
        )
    }
    base, _ = model.apply(noadapter, jnp.asarray(ids))
    assert float(jnp.abs(ours - base).max()) > 1e-3
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)
