"""VERDICT r3 item 4a: prove "ONE compile serves all 30 instances".

The sweep-throughput story rests on the train step's lowered HLO being
byte-identical across Trainer setups that differ only in instance /
initializer / concept values (all data-dependent scalars ride `frozen` as
traced inputs — trainer.py:595-608) and across resume.  This test lowers
each Trainer's OWN jitted step (not a reconstruction) with its own
state/batch/frozen signature and compares the stablehlo text byte-for-byte.

Scope note: identity holds per added-token COUNT — an initializer that
splits into k sub-tokens grows the vocab by k and legitimately changes the
program shape.  The DreamBooth runner's 30 initializers are all plain
words; instances with equal sub-token counts share one executable.
"""
import hashlib
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("instances")
    rng = np.random.RandomState(0)
    for name in ("dog", "cat"):
        d = root / name
        d.mkdir()
        Image.fromarray(
            rng.randint(0, 255, (160, 160, 3), dtype=np.uint8)
        ).save(d / f"{name}.jpg")
    return root


def _trainer(image_root, out_dir, instance, initializer, **overrides):
    from textboost_tpu.train import TrainConfig, Trainer

    base = dict(
        model_preset="tiny",
        instance_data_dir=str(image_root / instance),
        placeholder_token=f"<{instance}>",
        instance_token=f"<{instance}>",
        initializer_token=initializer,
        output_dir=str(out_dir),
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
    return Trainer(TrainConfig(**base).validate())


def _lowered_digest(trainer):
    """sha256 of the trainer's own jitted step lowered at its real call
    signature (ShapeDtypeStructs mirroring state/batch/frozen, with the
    mesh shardings the loop uses)."""
    import jax

    from textboost_tpu.parallel.mesh import batch_sharding, replicated

    rep = replicated(trainer.mesh)

    def sds(tree, sharding):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding),
            tree,
        )

    b = trainer.config.train_batch_size
    res = trainer.config.resolution
    batch_abs = {
        "pixel_values": jax.ShapeDtypeStruct(
            (b, res, res, 3), np.uint8, sharding=batch_sharding(trainer.mesh, 4)
        ),
        "input_ids": jax.ShapeDtypeStruct(
            (b, 77), np.int32, sharding=batch_sharding(trainer.mesh, 2)
        ),
        "prior_input_ids": jax.ShapeDtypeStruct(
            (b, 77), np.int32, sharding=batch_sharding(trainer.mesh, 2)
        ),
    }
    lowered = trainer.train_step.lower(
        sds(trainer.state, rep), batch_abs, sds(trainer.frozen, rep)
    )
    text = lowered.as_text()
    return hashlib.sha256(text.encode()).hexdigest(), len(text)


def test_step_hlo_identical_across_instances_and_resume(image_root, tmp_path):
    # Trainer A: <dog> / "dog".
    t_a = _trainer(image_root, tmp_path / "a", "dog", "dog")
    dig_a, len_a = _lowered_digest(t_a)

    # Trainer B: different instance, initializer, and data dir.
    t_b = _trainer(image_root, tmp_path / "b", "cat", "toy")
    dig_b, len_b = _lowered_digest(t_b)
    assert (dig_a, len_a) == (dig_b, len_b), (
        "train-step HLO differs across instances — a data-dependent value "
        "leaked out of `frozen` into the traced program"
    )

    # Across resume: train A to its checkpoint, then a fresh Trainer
    # resuming from it must lower the identical program.
    t_a.train()
    assert os.path.isdir(tmp_path / "a" / "checkpoint-2")
    t_r = _trainer(
        image_root, tmp_path / "a", "dog", "dog",
        resume_from_checkpoint="latest",
    )
    assert t_r.start_step == 2
    dig_r, len_r = _lowered_digest(t_r)
    assert (dig_a, len_a) == (dig_r, len_r), (
        "train-step HLO differs across resume"
    )
    t_b.train_loader.stop(); t_b.prior_loader.stop()
    t_r.train_loader.stop(); t_r.prior_loader.stop()


def test_sampler_hlo_identical_across_instances(image_root, tmp_path):
    """The background-compiled validation sampler is instance-independent
    too: the null embedding rides as a traced argument
    (pipelines/text_to_image.py::build_sample_program), and prompt CONTENT
    never enters the program (only the prompt COUNT does).  One sampler
    executable serves every instance of a sweep."""
    from textboost_tpu.train.aot import _lower_sampler, validation_signature

    val = dict(
        validation_steps=2,
        validation_prompts=["photo of a <0>", "a <0> in the snow"],
        num_validation_images=2,
    )
    t_a = _trainer(image_root, tmp_path / "sa", "dog", "dog", **val)
    t_b = _trainer(image_root, tmp_path / "sb", "cat", "toy", **val)
    digests = []
    for t in (t_a, t_b):
        sig = validation_signature(t.config, t.bundle.spec)
        assert sig is not None
        lowered = _lower_sampler(
            t.config, t.bundle.spec, len(t.tokenizer), t.mesh,
            t.weight_dtype, sig,
        )
        text = lowered.as_text()
        digests.append((hashlib.sha256(text.encode()).hexdigest(), len(text)))
        t.train_loader.stop(); t.prior_loader.stop()
    assert digests[0] == digests[1], (
        "validation-sampler HLO differs across instances — a data-dependent "
        "value leaked into the traced sampler program"
    )


def test_compile_step_logs_identical_hlo_fingerprint(image_root, tmp_path,
                                                     caplog):
    """The AOT thread logs a sha256 fingerprint of the lowered step HLO
    (train/aot.py::_compile_step) so two REAL runs can prove on-chip
    program identity from their training.logs alone (bench.py --mode
    sweep2 parses the line).  Assert the line's format and that two
    different-instance configs log the same hash."""
    import logging
    import re

    from textboost_tpu.train.aot import _compile_step

    fps = []
    for inst, init, sub in (("dog", "dog", "fa"), ("cat", "toy", "fb")):
        t = _trainer(image_root, tmp_path / sub, inst, init)
        t.train_loader.stop(); t.prior_loader.stop()
        with caplog.at_level(logging.INFO, logger="textboost_tpu"):
            caplog.clear()
            compiled = _compile_step(
                t.config, t.bundle.spec, len(t.tokenizer),
                t.first_added_id, t.mesh, t.weight_dtype,
            )
        assert compiled is not None
        lines = [r.getMessage() for r in caplog.records
                 if "HLO fingerprint" in r.getMessage()]
        assert len(lines) == 1, "exactly one fingerprint line per compile"
        m = re.search(r"step AOT: HLO fingerprint ([0-9a-f]{16})$", lines[0])
        assert m, f"unparseable fingerprint line: {lines[0]!r}"
        fps.append(m.group(1))
    assert fps[0] == fps[1], (
        "step HLO fingerprint differs across instances — a data-dependent "
        "value leaked out of `frozen` into the traced program"
    )
