"""Round-4 closure tests (VERDICT r3 items 1-2):

- token-bin FILENAMES strip `<>` (train_textboost.py:1195-1197) while the
  dict key inside keeps the bracketed token; aug-token bins are [1, hidden]
  (the reference's token_id:token_id+1 slice, :1199-1209);
- the reference eval's multi-vector detection (`startswith(instance)`,
  eval_dreambooth.py:329-330) works on repo-produced dirs;
- `--unet_params_to_train=crossattn_kv` runs export a unet/ adapter at
  final save and periodic checkpoints (ref writes unet/ at
  train_textboost.py:1237-1239), and `load_textboost_pipeline` consumes it
  so generated images carry the trained UNet deltas.
"""
import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def instance_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("instance")
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (160, 160, 3), dtype=np.uint8)).save(
        d / "dog.jpg"
    )
    return str(d)


def _config(instance_dir, out_dir, **overrides):
    from textboost_tpu.train import TrainConfig

    base = dict(
        model_preset="tiny",
        instance_data_dir=instance_dir,
        placeholder_token="<dog>",
        instance_token="<dog>",
        initializer_token="dog",
        output_dir=out_dir,
        resolution=128,
        train_batch_size=2,
        max_train_steps=2,
        checkpointing_steps=2,
        validation_steps=0,
        lora_rank=4,
        augment="pda",
        augment_inversion=True,
        template="textboost",
        seed=0,
        dataloader_num_workers=1,
        mixed_precision="no",
        human_prompts_path=None,
    )
    base.update(overrides)
    return TrainConfig(**base).validate()


# ---------------------------------------------------------------------------
# Token-bin filename layout
# ---------------------------------------------------------------------------
def test_token_bin_filename_strips_brackets():
    from textboost_tpu.lora.peft_io import token_bin_filename

    assert token_bin_filename("<dog>") == "dog.bin"
    assert token_bin_filename("<dog_0>") == "dog_0.bin"
    assert token_bin_filename("<zoom-in_1>") == "zoom-in_1.bin"


def test_token_bin_layout_and_aug_shapes(tmp_path):
    """Emitted file set == reference names; keys keep brackets; aug bins
    are [1, hidden], instance bins [hidden]."""
    import torch

    from textboost_tpu.lora.peft_io import (
        export_token_embeddings,
        import_token_embeddings,
    )

    emb = np.random.RandomState(0).randn(12, 8).astype(np.float32)
    token_to_id = {"<dog_0>": 3, "<dog_1>": 4, "<grayscale>": 5, "<zoom-in_0>": 6}
    paths = export_token_embeddings(
        emb, token_to_id, str(tmp_path),
        aug_tokens=["<grayscale>", "<zoom-in_0>"],
    )
    names = sorted(os.path.basename(p) for p in paths)
    # Reference naming rule applied to the same token set.
    expected = sorted(
        t.replace("<", "").replace(">", "") + ".bin" for t in token_to_id
    )
    assert names == expected
    assert all("<" not in n and ">" not in n for n in names)

    # Raw torch payloads: bracketed keys; aug rows 2-D.
    blob = torch.load(tmp_path / "dog_0.bin", weights_only=True)
    assert list(blob) == ["<dog_0>"] and blob["<dog_0>"].shape == (8,)
    blob = torch.load(tmp_path / "grayscale.bin", weights_only=True)
    assert list(blob) == ["<grayscale>"] and blob["<grayscale>"].shape == (1, 8)

    # Import normalizes both shapes to [hidden] rows.
    loaded = import_token_embeddings(paths)
    for tok, tid in token_to_id.items():
        assert loaded[tok].shape == (8,)
        np.testing.assert_allclose(loaded[tok], emb[tid])


def test_detect_num_vectors_reference_convention(tmp_path):
    import eval_dreambooth

    files = [
        "dog_0.bin", "dog_1.bin", "grayscale.bin", "text_encoder",
        "unet", "training.log", "validation_50.jpg",
    ]
    assert eval_dreambooth.detect_num_vectors(files, "dog") == 2
    assert eval_dreambooth.detect_num_vectors(["dog.bin"], "dog") == 1
    # A repo-era bracketed dir would be (mis)read as 0 — the convention is
    # load-bearing for the reference protocol.
    assert eval_dreambooth.detect_num_vectors(["<dog>.bin"], "dog") == 0


def test_trainer_emits_reference_layout(instance_dir, tmp_path):
    """End-to-end: an augment_inversion run's .bin file set equals the
    reference naming rule applied to its own token set, at the output root
    AND inside periodic checkpoints."""
    from textboost_tpu.train import Trainer

    out = str(tmp_path / "run")
    trainer = Trainer(_config(instance_dir, out))
    trainer.train()

    expected = sorted(
        t.replace("<", "").replace(">", "") + ".bin" for t in trainer.token_to_id
    )
    for d in (out, os.path.join(out, "checkpoint-2")):
        names = sorted(f for f in os.listdir(d) if f.endswith(".bin"))
        assert names == expected, d
    # dog.bin is the single-vector instance bin; aug bins are 2-D.
    import torch

    blob = torch.load(os.path.join(out, "dog.bin"), weights_only=True)
    assert blob["<dog>"].shape[0] == trainer.bundle.spec.text_encoder.hidden_size
    aug = [t for t in trainer.aug_tokens][0]
    aug_name = aug.replace("<", "").replace(">", "") + ".bin"
    blob = torch.load(os.path.join(out, aug_name), weights_only=True)
    assert blob[aug].ndim == 2 and blob[aug].shape[0] == 1


# ---------------------------------------------------------------------------
# UNet LoRA adapter export / import
# ---------------------------------------------------------------------------
def test_unet_lora_adapter_unit_roundtrip(tmp_path):
    """export -> import recovers the exact leaves, keyed by diffusers
    module paths, inserted into a LoRA-less base tree."""
    import jax
    import jax.numpy as jnp

    from textboost_tpu.lora.partition import split_lora
    from textboost_tpu.lora.peft_io import (
        export_unet_lora_adapter,
        import_unet_lora_adapter,
    )
    from textboost_tpu.models import UNet2DCondition, get_spec

    spec = get_spec("tiny")
    unet = UNet2DCondition(spec.unet, cross_lora_rank=4)
    params = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, spec.unet.sample_size, spec.unet.sample_size, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, spec.unet.cross_attention_dim)),
    )
    base_flat, lora_flat = split_lora(params)
    # Make the leaves distinctive (lora_b inits to 0).
    lora_flat = {
        k: np.random.RandomState(hash(k) % 2**31).randn(*v.shape).astype(np.float32)
        for k, v in lora_flat.items()
    }
    out = str(tmp_path / "unet")
    export_unet_lora_adapter(lora_flat, out, rank=4, base_model_name="tiny")

    from safetensors.numpy import load_file

    tensors = load_file(os.path.join(out, "adapter_model.safetensors"))
    # Keys are diffusers module paths under the PEFT prefix, attn2 kv only.
    assert all(".attn2.to_" in k for k in tensors)
    assert all(k.startswith("base_model.model.") for k in tensors)
    assert len(tensors) == len(lora_flat)
    cfg = json.load(open(os.path.join(out, "adapter_config.json")))
    assert cfg["r"] == 4
    assert cfg["target_modules"] == ["attn2.to_k", "attn2.to_v"]

    # Import into a LoRA-less tree: leaves appear with exact values.
    import flax

    base_tree = {"params": flax.traverse_util.unflatten_dict(base_flat)}
    merged, rank = import_unet_lora_adapter(base_tree, out)
    assert rank == 4
    merged_flat = flax.traverse_util.flatten_dict(merged["params"])
    for k, v in lora_flat.items():
        np.testing.assert_allclose(np.asarray(merged_flat[k]), v, rtol=0, atol=0)


def test_unet_lora_export_reload_e2e(instance_dir, tmp_path):
    """VERDICT r3 item 1 done-condition: train crossattn_kv on the tiny
    preset, reload through load_textboost_pipeline, assert generated images
    match make_pipeline from live state and DIFFER from the base-UNet
    pipeline."""
    import jax.numpy as jnp

    from textboost_tpu.pipelines.loading import load_textboost_pipeline
    from textboost_tpu.train import Trainer

    out = str(tmp_path / "unet_run")
    trainer = Trainer(
        _config(
            instance_dir,
            out,
            unet_params_to_train="crossattn_kv",
            augment_inversion=False,
            augment="none",
        )
    )
    trainer.train()
    assert os.path.isfile(os.path.join(out, "unet", "adapter_model.safetensors"))
    assert os.path.isfile(
        os.path.join(out, "checkpoint-2", "unet", "adapter_model.safetensors")
    )

    prompt = f"a photo of {trainer.concept_tokens['<dog>']}"
    latents = np.random.RandomState(7).randn(16, 16, 4).astype(np.float32)
    kw = dict(num_inference_steps=2, guidance_scale=1.0, latents=latents,
              output_type="np")

    img_live = trainer.make_pipeline()(prompt, **kw)

    pipe_loaded = load_textboost_pipeline(out, "tiny", lora_rank=4,
                                          dtype=jnp.float32)
    img_loaded = pipe_loaded(prompt, **kw)
    np.testing.assert_allclose(img_loaded, img_live, atol=2e-4)

    # Base-UNet pipeline (unet/ hidden): images must differ — the trained
    # UNet deltas are actually flowing through the loaded pipeline.
    os.rename(os.path.join(out, "unet"), os.path.join(out, "unet.bak"))
    try:
        pipe_base = load_textboost_pipeline(out, "tiny", lora_rank=4,
                                            dtype=jnp.float32)
        img_base = pipe_base(prompt, **kw)
    finally:
        os.rename(os.path.join(out, "unet.bak"), os.path.join(out, "unet"))
    assert float(np.abs(img_base - img_loaded).max()) > 0
