"""Pipeline + trained-model loading + inference CLI end-to-end (tiny)."""
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from textboost_tpu.pipelines import TextToImagePipeline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pipe():
    return TextToImagePipeline.from_random("tiny", dtype=jax.numpy.float32)


def test_pipeline_basic(pipe):
    imgs = pipe("a photo of a dog", num_inference_steps=3, guidance_scale=7.5, seed=0)
    assert imgs.shape == (1, 128, 128, 3) and imgs.dtype == np.uint8


def test_pipeline_seed_determinism_and_cfg(pipe):
    a = pipe("a dog", num_inference_steps=3, seed=1)
    b = pipe("a dog", num_inference_steps=3, seed=1)
    np.testing.assert_array_equal(a, b)
    c = pipe("a dog", num_inference_steps=3, seed=2)
    assert np.abs(a.astype(int) - c.astype(int)).max() > 0
    # guidance off runs the single-pass path
    d = pipe("a dog", num_inference_steps=3, seed=1, guidance_scale=1.0)
    assert d.shape == a.shape


def test_aot_fallback_semantics(pipe, caplog):
    """Installed-AOT failure handling: a TypeError (signature mismatch —
    permanent for the key) drops the executable; any other exception (a
    transient relay/runtime failure) KEEPS it so later rounds retry the
    fast path, and this call falls back to plain jit."""
    import logging

    caplog.set_level(logging.INFO, logger="textboost_tpu")
    key = (1, 128, 128, 3, True, "dpm++2m")
    kwargs = dict(num_inference_steps=3, guidance_scale=7.5, seed=3)
    ref = pipe("a dog", **kwargs)

    def mismatch(*a):
        raise TypeError("wrong avals")

    pipe.install_aot(key, mismatch)
    out = pipe("a dog", **kwargs)
    np.testing.assert_array_equal(out, ref)
    assert key not in pipe._aot, "signature mismatch must drop the AOT"
    assert "sampler AOT mismatch" in caplog.text

    caplog.clear()

    def transient(*a):
        raise RuntimeError("relay hiccup")

    pipe.install_aot(key, transient)
    out = pipe("a dog", **kwargs)
    np.testing.assert_array_equal(out, ref)
    assert key in pipe._aot, "one transient failure must keep the AOT"
    assert "falling back to plain jit for this call" in caplog.text

    # A second CONSECUTIVE failure is no longer treated as transient (a
    # sharding/device mismatch raises a non-TypeError every call): drop.
    out = pipe("a dog", **kwargs)
    np.testing.assert_array_equal(out, ref)
    assert key not in pipe._aot, "second consecutive failure must drop it"
    assert "failed 2 consecutive calls" in caplog.text
    assert pipe._aot_failures == {}, "drop must clear the failure counter"


def test_pipeline_shared_latent(pipe):
    lat = jax.random.normal(jax.random.PRNGKey(0), (16, 16, 4))
    a = pipe(["a dog", "a cat"], num_inference_steps=3, latents=lat)
    assert a.shape == (2, 128, 128, 3)


def test_null_embedding_regeneration(pipe):
    null = pipe.compute_null_embedding()
    assert null.shape == (77, pipe.spec.text_encoder.hidden_size)
    assert np.isfinite(null).all()


def test_trained_model_loading(tmp_path):
    """Train 1 step on tiny, then load the artifacts via the inference path."""
    from PIL import Image

    inst = tmp_path / "inst"
    inst.mkdir()
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (140, 140, 3), dtype=np.uint8)
    ).save(inst / "x.jpg")

    from textboost_tpu.train import TrainConfig, Trainer

    out = str(tmp_path / "model")
    cfg = TrainConfig(
        model_preset="tiny",
        instance_data_dir=str(inst),
        placeholder_token="<dog>",
        initializer_token="dog",
        output_dir=out,
        resolution=128,
        train_batch_size=2,
        max_train_steps=1,
        checkpointing_steps=10,
        lora_rank=4,
        template="textboost",
        seed=0,
        dataloader_num_workers=1,
        mixed_precision="no",
        human_prompts_path=None,
    ).validate()
    Trainer(cfg).train()

    from textboost_tpu.pipelines.loading import load_textboost_pipeline

    pipe2 = load_textboost_pipeline(out, "tiny", lora_rank=4, dtype=jax.numpy.float32)
    # The learned token is usable in prompts.
    imgs = pipe2("a photo of a <dog>", num_inference_steps=2, seed=0)
    assert imgs.shape == (1, 128, 128, 3)
    tid = pipe2.tokenizer.convert_tokens_to_ids("<dog>")
    assert tid >= 49408  # loaded as an added token


def test_load_pipeline_reuse_rebinds_params(tmp_path):
    """`reuse=` returns the SAME pipeline object with the new instance's
    params rebound (the eval sweep's one-compile path) and its output is
    bit-identical to a fresh pipeline of the same model dir; a shape
    mismatch (different vocab growth) falls back to a new pipeline."""
    import torch

    from textboost_tpu.pipelines.loading import load_textboost_pipeline

    def model_dir(name, tokens):
        d = tmp_path / name
        d.mkdir()
        g = torch.Generator().manual_seed(hash(name) % (2**31))
        for t in tokens:
            torch.save({t: torch.randn(64, generator=g)}, d / f"{t.strip('<>')}.bin")
        return str(d)

    a = model_dir("a", ["<dog>"])
    b = model_dir("b", ["<cat>"])
    kw = dict(lora_rank=0, dtype=jax.numpy.float32)

    pipe_a = load_textboost_pipeline(a, "tiny", **kw)
    img_a = pipe_a("a photo of a <dog>", num_inference_steps=2, seed=0)

    pipe_b = load_textboost_pipeline(b, "tiny", reuse=pipe_a, **kw)
    assert pipe_b is pipe_a  # rebound, not rebuilt
    img_b = pipe_b("a photo of a <cat>", num_inference_steps=2, seed=0)
    assert np.abs(img_a.astype(np.int32) - img_b.astype(np.int32)).max() > 0

    fresh_b = load_textboost_pipeline(b, "tiny", **kw)
    img_b_fresh = fresh_b("a photo of a <cat>", num_inference_steps=2, seed=0)
    np.testing.assert_array_equal(img_b, img_b_fresh)

    # Two-vector instance grows the vocab differently -> fresh pipeline.
    c = model_dir("c", ["<x_0>", "<x_1>"])
    pipe_c = load_textboost_pipeline(c, "tiny", reuse=pipe_b, **kw)
    assert pipe_c is not pipe_b
    assert pipe_c("a <x_0> <x_1>", num_inference_steps=2, seed=0).shape[0] == 1


def test_inference_cli(tmp_path):
    """Drive the inference.py CLI surface end-to-end on a trained tiny model."""
    model_dir = tmp_path / "model"
    # Minimal trained-model layout: token bin only (adapter optional).
    import torch

    model_dir.mkdir()
    torch.save(
        {"<dog>": torch.randn(64)}, model_dir / "dog.bin"
    )
    out_img = tmp_path / "grid.jpg"
    # TEXTBOOST_PLATFORM (not JAX_PLATFORMS, which the axon plugin ignores)
    # forces the subprocess onto CPU; without env= the CLI would run against
    # the live TPU relay and time out whenever the relay degrades.
    env = dict(os.environ, TEXTBOOST_PLATFORM="cpu")
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "inference.py"),
            str(model_dir),
            "--model", "tiny",
            "--prompt", "photo of a <dog> dog",
            "--seeds", "0", "1",
            "--steps", "2",
            "--output", str(out_img),
        ],
        capture_output=True,
        text=True,
        timeout=500,
        cwd=REPO,
        env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert out_img.exists()
    from PIL import Image

    grid = Image.open(out_img)
    assert grid.size == (256, 128)  # 2 seeds side by side


def test_pipeline_dp_mesh_sharded_generation(pipe):
    """Generation batch sharded over the 8-device dp mesh (SURVEY §7
    step 5) matches the single-device result bit-for-bit (pure data
    parallelism — no cross-device math)."""
    from textboost_tpu.parallel.mesh import make_mesh

    ref = pipe(["a dog"] * 8, num_inference_steps=2, seed=3)

    sharded = TextToImagePipeline(
        pipe.spec,
        pipe.tokenizer,
        pipe.te_params,
        pipe.unet_params,
        pipe.vae_params,
        dtype=jax.numpy.float32,
        mesh=make_mesh(dp=8, tp=1),
    )
    out = sharded(["a dog"] * 8, num_inference_steps=2, seed=3)
    assert out.shape == ref.shape
    # Per-shard compilation fuses/reduces in a different order than the
    # single-device program, and a random-init VAE decode amplifies that
    # f32 noise to a few uint8 LSBs.  A routing bug (wrong shard order /
    # wrong batch split) would produce entirely different images, so
    # assert closeness, not bit-equality.
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.mean() < 8.0 and float((diff > 30).mean()) < 0.01, (
        f"sharded generation diverged: mean|diff|={diff.mean():.2f}, "
        f"p>30={float((diff > 30).mean()):.4f}"
    )
