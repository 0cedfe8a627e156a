"""Round-2 fidelity fixes: hflip wiring, CLI booleans, resume data stream,
natural-sorted token bins, VAE precision flag, multi-host batch assembly."""
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


def _base_argv(instance_dir, out_dir):
    return [
        "--model_preset", "tiny",
        "--instance_data_dir", instance_dir,
        "--placeholder_token", "<dog>",
        "--instance_token", "<dog>",
        "--initializer_token", "dog",
        "--output_dir", out_dir,
        "--resolution", "128",
        "--train_batch_size", "2",
        "--max_train_steps", "2",
        "--checkpointing_steps", "0",
        "--validation_steps", "0",
        "--lora_rank", "4",
        "--template", "textboost",
        "--seed", "0",
        "--mixed_precision", "no",
    ]


# ---------------------------------------------------------------------------
# CLI booleans: every bool flag has a working --no-X form
# ---------------------------------------------------------------------------
def test_cli_bool_flags_are_falsifiable():
    from textboost_tpu.train.config import parse_args

    cfg = parse_args(["--no-disable_weighted_sample"])
    assert cfg.disable_weighted_sample is False
    cfg = parse_args(["--disable_weighted_sample"])
    assert cfg.disable_weighted_sample is True
    cfg = parse_args([])
    assert cfg.disable_weighted_sample is True  # reference default preserved
    # default-False flags keep working both ways
    assert parse_args(["--mixing"]).mixing is True
    assert parse_args(["--no-mixing"]).mixing is False


def test_cli_weighted_sampler_end_to_end(instance_dir, tmp_path):
    # --no-disable_weighted_sample must reach the jitted step: SNR-weighted
    # timestep sampling enabled, training still runs to a finite loss
    # (the reference's unfalsifiable flag, train_textboost.py:406-411).
    from textboost_tpu.train import Trainer
    from textboost_tpu.train.config import parse_args

    out = str(tmp_path / "run")
    cfg = parse_args(_base_argv(instance_dir, out) + ["--no-disable_weighted_sample"])
    assert cfg.disable_weighted_sample is False
    trainer = Trainer(cfg)
    assert trainer.step_config.weighted_timesteps is True
    result = trainer.train()
    assert result["steps"] == 2
    assert np.isfinite(result["loss"])


# ---------------------------------------------------------------------------
# hflip: pda + inversion must put horizontal_flip in the geometric op bank
# ---------------------------------------------------------------------------
def test_hflip_wired_under_inversion(instance_dir, tmp_path):
    from textboost_tpu.data.augment import horizontal_flip
    from textboost_tpu.train import Trainer
    from textboost_tpu.train.config import parse_args

    cfg = parse_args(
        _base_argv(instance_dir, str(tmp_path / "run"))
        + ["--augment", "pda", "--augment_inversion", "--augment_p", "0.9"]
    )
    trainer = Trainer(cfg)
    pipe = trainer.train_loader.dataset.augment_pipe
    assert horizontal_flip in pipe.geometric_ops

    # <hflip> captions appear in the sample stream (the aug token trains).
    rng = np.random.default_rng(0)
    seen = False
    for _ in range(200):
        _, prompt = pipe(Image.new("RGB", (64, 64)), "a photo of <dog>", rng=rng)[:2]
        if "<hflip>" in prompt:
            seen = True
            break
    assert seen, "<hflip> never appeared in 200 augmented captions"
    trainer.train_loader.stop()
    trainer.prior_loader.stop()


def test_hflip_not_wired_without_inversion(instance_dir, tmp_path):
    from textboost_tpu.data.augment import horizontal_flip
    from textboost_tpu.train import Trainer
    from textboost_tpu.train.config import parse_args

    cfg = parse_args(
        _base_argv(instance_dir, str(tmp_path / "run"))
        + ["--augment", "pda", "--augment_prompt", "0"]
    )
    trainer = Trainer(cfg)
    pipe = trainer.train_loader.dataset.augment_pipe
    assert horizontal_flip not in pipe.geometric_ops
    trainer.train_loader.stop()
    trainer.prior_loader.stop()


# ---------------------------------------------------------------------------
# Resume continues the data stream
# ---------------------------------------------------------------------------
def test_loader_start_step_offsets_stream():
    from textboost_tpu.data.loader import PrefetchLoader

    class Ds:
        def __len__(self):
            return 100

        def __getitem__(self, idx, rng=None):
            return (idx, float(rng.random()) if rng is not None else -1.0)

    def collate(samples):
        return {
            "idx": np.array([s[0] for s in samples]),
            "r": np.array([s[1] for s in samples]),
        }

    fresh = PrefetchLoader(Ds(), batch_size=4, collate=collate, seed=7, num_workers=1)
    it = iter(fresh)
    batches = [next(it) for _ in range(5)]
    fresh.stop()

    resumed = PrefetchLoader(Ds(), batch_size=4, collate=collate, seed=7, num_workers=1)
    resumed.set_start_step(3)
    it = iter(resumed)
    b3, b4 = next(it), next(it)
    resumed.stop()

    np.testing.assert_array_equal(b3["idx"], batches[3]["idx"])
    np.testing.assert_array_equal(b3["r"], batches[3]["r"])
    np.testing.assert_array_equal(b4["idx"], batches[4]["idx"])
    # and NOT a replay of batch 0
    assert not np.array_equal(b3["r"], batches[0]["r"])


def test_trainer_resume_advances_data_stream(instance_dir, tmp_path):
    from textboost_tpu.train import Trainer
    from textboost_tpu.train.config import parse_args

    out = str(tmp_path / "run")
    argv = _base_argv(instance_dir, out)
    argv[argv.index("--checkpointing_steps") + 1] = "2"
    argv[argv.index("--max_train_steps") + 1] = "2"
    Trainer(parse_args(argv)).train()

    argv[argv.index("--max_train_steps") + 1] = "4"
    resumed = Trainer(parse_args(argv + ["--resume_from_checkpoint", "latest"]))
    assert resumed.start_step == 2
    assert resumed.train_loader._start_step == 2
    assert resumed.prior_loader._start_step == 2
    result = resumed.train()
    assert result["steps"] == 4


# ---------------------------------------------------------------------------
# Natural-sorted token bins
# ---------------------------------------------------------------------------
def test_token_bins_natural_sort(tmp_path):
    import torch

    from textboost_tpu.pipelines.loading import _natural_sorted_bins

    names = [f"<x_{i}>.bin" for i in (0, 1, 2, 10, 11)]
    for n in names:
        torch.save({n[:-4]: torch.zeros(4)}, tmp_path / n)
    bins = _natural_sorted_bins(str(tmp_path))
    assert [os.path.basename(b) for b in bins] == names


# ---------------------------------------------------------------------------
# VAE precision flag
# ---------------------------------------------------------------------------
def test_vae_fp32_flag(instance_dir, tmp_path):
    import jax.numpy as jnp

    from textboost_tpu.train import Trainer
    from textboost_tpu.train.config import parse_args

    argv = _base_argv(instance_dir, str(tmp_path / "run")) + [
        "--mixed_precision", "bf16", "--vae_fp32",
    ]
    trainer = Trainer(parse_args(argv))
    assert trainer.bundle.vae.dtype == jnp.float32
    assert trainer.bundle.unet.dtype == jnp.bfloat16
    trainer.train_loader.stop()
    trainer.prior_loader.stop()


# ---------------------------------------------------------------------------
# Multi-host batch assembly (single-process path; the multi-process path is
# exercised by tests/test_multihost.py subprocesses)
# ---------------------------------------------------------------------------
def test_assemble_global_batch_single_process():
    import jax

    from textboost_tpu.parallel.mesh import assemble_global_batch, make_mesh

    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    batch = {"x": np.arange(8, dtype=np.float32).reshape(8, 1)}
    out = assemble_global_batch(mesh, batch)
    assert out["x"].shape == (8, 1)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
