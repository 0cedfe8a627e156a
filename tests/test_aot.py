"""Tests for the background train-step AOT compiler (train/aot.py).

The correctness-critical invariant is that the AOT thread's StepConfig is
byte-identical to the trainer's — identical config ⇒ identical traced
program ⇒ the AOT executable and the plain jit share one cache entry and
one set of semantics.  The full AOT path only activates on the TPU
backend, so these tests cover the host-side logic (envelope gating,
config equality, spec resolution).
"""
import dataclasses

import pytest

from textboost_tpu.models import get_spec
from textboost_tpu.models.pretrained import resolve_spec_name
from textboost_tpu.train.aot import build_step_config, launch_step_aot
from textboost_tpu.train.config import TrainConfig


def _cfg(**kw):
    base = dict(
        instance_data_dir="/tmp/x",
        instance_token="<x>",
        initializer_token="dog",
        output_dir="/tmp/out",
        model_preset="tiny",
    )
    base.update(kw)
    return TrainConfig(**base)


def test_build_step_config_matches_trainer_semantics():
    cfg = _cfg(kpl_weight=0.1, mixing=True, augment_ops="style")
    spec = get_spec("tiny")
    sc = build_step_config(cfg, spec, first_added_id=123)
    assert sc.first_added_token_id == 123
    assert sc.kpl_weight == 0.1
    assert sc.mixing is True
    assert sc.augment_ops == "style"
    assert sc.eos_token_id == spec.text_encoder.eos_token_id
    # Instance-dependent value must NOT be baked into the config (it rides
    # the frozen dict as a traced scalar) — 0.0 keeps the program hash
    # identical across instances.
    assert sc.embedding_target_norm == 0.0


def test_build_step_config_is_deterministic():
    cfg = _cfg()
    spec = get_spec("tiny")
    a = build_step_config(cfg, spec, first_added_id=7)
    b = build_step_config(cfg, spec, first_added_id=7)
    assert dataclasses.asdict(a) == dataclasses.asdict(b)


@pytest.mark.parametrize(
    "kw",
    [
        {"unet_params_to_train": "crossattn_kv"},
        {"with_image_prior": True, "class_data_dir": "/tmp/c", "class_token": "dog"},
        {"mesh_tp": 2},
        {"gradient_accumulation_steps": 2},
    ],
)
def test_launch_skips_unsupported_envelopes(kw):
    # On the CPU test backend launch always returns None; these configs
    # must be skipped on ANY backend.
    import jax

    from textboost_tpu.parallel.mesh import make_mesh

    cfg = _cfg(**kw)
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    holder = launch_step_aot(
        cfg, get_spec("tiny"), vocab_size=1000, first_added_id=999,
        mesh=mesh, dtype=None,
    )
    assert holder is None


def test_launch_skips_cpu_backend():
    import jax

    from textboost_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    holder = launch_step_aot(
        _cfg(), get_spec("tiny"), vocab_size=1000, first_added_id=999,
        mesh=mesh, dtype=None,
    )
    assert holder is None  # tests run on the virtual CPU mesh


def test_resolve_spec_name():
    assert resolve_spec_name(None, "sd15") == "sd15"
    assert resolve_spec_name("sd21base", None) == "sd21base"
    assert resolve_spec_name(None, None) == "sd15"
    assert resolve_spec_name("/nonexistent/dir/zzz", None) is None
