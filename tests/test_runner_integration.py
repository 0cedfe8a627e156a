"""Sweep-runner integration: the EXACT flag strings run_textboost_db.py
composes (the place the r2 validation-substitution bug lived) drive a real
tiny-preset training run through train -> checkpoint -> validation -> eval
generation (VERDICT r2 next #8; ref run_textboost_db.py:106-168)."""
import argparse
import os
import sys

import numpy as np
import pytest
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _db_args(**over):
    base = dict(
        num_samples=1,
        model="tiny",
        instances=["dog"],
        lora_rank=4,
        total_steps=5,
        lr=1e-4,
        emb_lr=1e-3,
        batch_size=2,
        train_params="none",
        augment="pda",
        augment_p=0.5,
        null_prob=0.1,
        kpl_weight=0.1,
        no_weighted_sample=False,
        no_inversion=False,
        mixing=False,
        desc=None,
        data_dir="datasets/dreambooth_n1_train",
        mesh_tp=1,
        sequential=True,
        parallel=1,
        dry_run=False,
    )
    base.update(over)
    return argparse.Namespace(**base)


@pytest.fixture()
def sweep_cwd(tmp_path, monkeypatch):
    inst = tmp_path / "datasets" / "dreambooth_n1_train" / "dog"
    inst.mkdir(parents=True)
    rng = np.random.RandomState(3)
    Image.fromarray(rng.randint(0, 255, (160, 160, 3), dtype=np.uint8)).save(
        inst / "dog.jpg"
    )
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_dry_run_flag_composition(sweep_cwd, capsys):
    import run_textboost_db as runner

    runner.main(_db_args(dry_run=True, instances=None))
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("===")]
    assert len(lines) == 30  # full DreamBooth sweep
    dog = next(l for l in lines if l.startswith("=== dog:"))
    # The flagship sweep's literal validation prompts (indexed <0>).
    assert "photo of a <0>" in dog
    assert "--model_preset=tiny" in dog
    assert "--instance_token=<0>" in dog
    assert "--placeholder_token=<dog>" in dog
    assert "--initializer_token=corgi dog" in dog
    assert "--checkpointing_steps=1" in dog
    assert "--template=imagenet_small" in dog
    assert "--augment_inversion" in dog
    # Dry run created no training outputs.
    assert not os.path.isdir(sweep_cwd / "output" / "tb-tiny-n1" / "dog" / "checkpoint-1")


def test_runner_train_validate_eval_end_to_end(sweep_cwd):
    import run_textboost_db as runner

    runner.main(_db_args())
    run_dir = sweep_cwd / "output" / "tb-tiny-n1" / "dog"

    # Archival parity (ref :164-168).
    assert (run_dir / "cmd.txt").is_file()
    assert (run_dir / "train_textboost.py").is_file()

    # Checkpoints (every total_steps//5 = 1 step) + final token bins.
    assert (run_dir / "checkpoint-5" / "state").is_dir()
    bins = [f for f in os.listdir(run_dir) if f.endswith(".bin")]
    assert any(f.startswith("dog") for f in bins)

    # Validation ran with SUBSTITUTED prompts: the learned multi-vector
    # placeholder appears in the log, the raw "<0>" never does.
    log = (run_dir / "training.log").read_text()
    assert "Running validation with prompts" in log
    val_lines = [l for l in log.splitlines() if "validation with prompts" in l]
    assert all("<0>" not in l.split("prompts:")[1] for l in val_lines)
    assert "<dog_0>" in val_lines[0]
    # num_validation_images (default 4) images per prompt, 4 prompts.
    assert val_lines[0].count("photo of a") == 4
    grids = [f for f in os.listdir(run_dir) if f.startswith("validation_")]
    assert grids
    img = Image.open(run_dir / sorted(grids)[-1])
    # 4 prompts x 4 images of 128px tiles.
    assert img.size == (4 * 128, 4 * 128)

    # Eval generation over the trained output (25 prompts, 1 seed).
    import eval_dreambooth

    gen_args = argparse.Namespace(
        path=str(sweep_cwd / "output" / "tb-tiny-n1"),
        model="tiny",
        instances=["dog"],
        seeds=[0],
        steps=2,
        batch_size=5,
        checkpoint=None,
        lora_rank=4,
        token_format="<INSTANCE>",
        outdir=str(sweep_cwd / "gen"),
        output_desc=None,
        skip_gen=False,
        null_emb_path=None,
    )
    outdir = eval_dreambooth.generate(gen_args)
    pngs = os.listdir(os.path.join(outdir, "seed0", "dog"))
    assert len(pngs) == 25


def test_parallel_wave_scheduling(sweep_cwd, monkeypatch):
    """--parallel N: waves of N one-chip subprocesses with disjoint chip
    pins, per-run stdout logs, and the reference's archival artifacts."""
    import run_textboost_db as runner
    from textboost_tpu.utils import sweep as sweep_mod

    launched = []

    class FakeProc:
        def __init__(self, argv, env):
            self.argv, self.env = argv, env

        def wait(self):
            return 0

    def fake_popen(argv, stdout=None, stderr=None, env=None):
        launched.append({"argv": argv, "env": env})
        return FakeProc(argv, env)

    monkeypatch.setattr(sweep_mod.subprocess, "Popen", fake_popen)
    runner.main(
        _db_args(
            sequential=False,
            parallel=2,
            instances=["dog", "cat", "vase"],  # 2 waves: [cat, dog], [vase]
        )
    )

    assert len(launched) == 3
    # Wave slots pin disjoint chips; the wave restarts at chip 0.
    pins = [j["env"]["TPU_VISIBLE_DEVICES"] for j in launched]
    assert pins == ["0", "1", "0"]
    assert all(
        j["env"]["TPU_CHIPS_PER_PROCESS_BOUNDS"] == "1,1,1" for j in launched
    )
    ports = [j["env"]["TPU_MESH_CONTROLLER_PORT"] for j in launched]
    assert ports == ["8476", "8477", "8476"]

    for name in ("cat", "dog", "vase"):
        run_dir = sweep_cwd / "output" / "tb-tiny-n1" / name
        assert (run_dir / "cmd.txt").is_file()
        assert (run_dir / "train_textboost.py").is_file()
        assert (run_dir / "train_stdout.log").is_file()


def test_parallel_real_two_instances(sweep_cwd, monkeypatch):
    """Two REAL concurrent one-device training subprocesses (the --parallel
    TPU sweep model, each child on a single virtual CPU device)."""
    import run_textboost_db as runner

    inst2 = sweep_cwd / "datasets" / "dreambooth_n1_train" / "cat"
    inst2.mkdir(parents=True)
    rng = np.random.RandomState(5)
    Image.fromarray(rng.randint(0, 255, (160, 160, 3), dtype=np.uint8)).save(
        inst2 / "cat.jpg"
    )
    # Children: CPU platform (the axon plugin ignores JAX_PLATFORMS), ONE
    # device each — exactly the one-chip-per-instance sweep geometry.
    monkeypatch.setenv("TEXTBOOST_PLATFORM", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

    runner.main(
        _db_args(sequential=False, parallel=2, instances=["dog", "cat"],
                 total_steps=2)
    )

    for name in ("dog", "cat"):
        run_dir = sweep_cwd / "output" / "tb-tiny-n1" / name
        stdout_log = (run_dir / "train_stdout.log").read_text()
        assert "Training took" in (run_dir / "training.log").read_text(), (
            stdout_log[-2000:]
        )
        bins = [f for f in os.listdir(run_dir) if f.endswith(".bin")]
        assert any(f.startswith(name) for f in bins), bins


# ---------------------------------------------------------------------------
# StyleDrop runner (run_textboost_sdrp.py) — VERDICT r3 item 6
# ---------------------------------------------------------------------------
def _sdrp_args(**over):
    base = dict(
        gpu=None,
        model="tiny",
        instances=["02"],
        augment="pda",
        lora_rank=4,
        null_prob=0.1,
        kpl_weight=0.1,
        no_weighted_sample=False,
        no_inversion=False,
        total_steps=4,
        batch_size=2,
        validation_steps=2,
        checkpointing_steps=2,
        desc=None,
        data_dir="datasets/styledrop",
        sequential=True,
        parallel=1,
        dry_run=False,
    )
    base.update(over)
    return argparse.Namespace(**base)


@pytest.fixture()
def sdrp_cwd(tmp_path, monkeypatch):
    inst = tmp_path / "datasets" / "styledrop" / "02"
    inst.mkdir(parents=True)
    rng = np.random.RandomState(5)
    Image.fromarray(rng.randint(0, 255, (160, 160, 3), dtype=np.uint8)).save(
        inst / "style.jpg"
    )
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_sdrp_dry_run_flag_composition(sdrp_cwd, capsys):
    """Reference flag surface (run_textboost_sdrp.py:82-113): per-style
    template as --template, style aug ops, --mixing, 19 styles."""
    import run_textboost_sdrp as runner

    runner.main(_sdrp_args(dry_run=True, instances=None,
                           total_steps=150, batch_size=4,
                           validation_steps=25, checkpointing_steps=25))
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("===")]
    assert len(lines) == 19  # full StyleDrop sweep
    l02 = next(l for l in lines if l.startswith("=== 02:"))
    assert "--augment_ops=style" in l02
    assert "--mixing" in l02
    assert "--template A cat in {}" in l02
    assert "--initializer_token watercolor painting style" in l02
    assert "--instance_token=<0>" in l02
    assert "--placeholder_token <02>" in l02
    assert "--max_train_steps=150" in l02
    assert "--train_batch_size=4" in l02
    assert "A man in <0>" in l02  # the runner's validation prompts


def test_sdrp_runner_end_to_end(sdrp_cwd):
    """Tiny-preset StyleDrop run through runner-composed flags: training
    completes, the mixing mask engaged (style mode: even lora_B output
    rows exactly untouched from their 0 init), validation substituted the
    style placeholder, artifacts land."""
    import run_textboost_sdrp as runner

    runner.main(_sdrp_args())
    run_dir = sdrp_cwd / "output" / "tb_style-tiny" / "02"

    # Artifacts: archive + checkpoints + multi-vector token bins (the
    # 3-word initializer expands <02> into <02_0..2>) + style aug token.
    assert (run_dir / "cmd.txt").is_file()
    assert "Training took" in (run_dir / "training.log").read_text()
    assert (run_dir / "checkpoint-4" / "state").is_dir()
    bins = sorted(f for f in os.listdir(run_dir) if f.endswith(".bin"))
    assert any(f.startswith("02_") for f in bins), bins
    assert all("<" not in f for f in bins), bins

    # Validation fired with the substituted placeholder (mixing prompts
    # "A man in <0>" -> "A man in <02_0> <02_1> ...").
    log = (run_dir / "training.log").read_text()
    val_lines = [l for l in log.splitlines() if "validation with prompts" in l]
    assert val_lines
    assert "<0>" not in val_lines[0].split("prompts:")[1]
    assert "<02_0>" in val_lines[0]

    # Mixing mask (lora/partition.py::apply_mixing_mask, style -> even
    # output dims zeroed): in the exported PEFT adapter lora_B.weight is
    # [out, r], so even ROWS must be exactly 0 while odd rows moved.
    from safetensors.numpy import load_file

    tensors = load_file(
        str(run_dir / "text_encoder" / "adapter_model.safetensors")
    )
    b_mats = {k: v for k, v in tensors.items() if ".lora_B." in k}
    assert b_mats
    moved = 0.0
    for k, v in b_mats.items():
        assert np.abs(v[0::2]).max() == 0.0, f"{k}: even rows moved under style mixing"
        moved = max(moved, float(np.abs(v[1::2]).max()))
    assert moved > 0.0, "odd lora_B rows never trained — mixing zeroed everything"


def test_sequential_sweep_two_instances_shares_process_caches(sweep_cwd):
    """Two instances through the in-process sequential runner: the second
    Trainer re-serves the preset bundle from the process memo (no second
    _init_all program) and both runs produce independent, correct outputs
    (no cross-instance state leakage through the shared caches)."""
    import run_textboost_db as runner
    from textboost_tpu.models import pretrained

    cat = sweep_cwd / "datasets" / "dreambooth_n1_train" / "cat"
    cat.mkdir(parents=True)
    rng = np.random.RandomState(7)
    Image.fromarray(rng.randint(0, 255, (160, 160, 3), dtype=np.uint8)).save(
        cat / "cat.jpg"
    )

    pretrained._PRESET_MEMO.clear()
    runner.main(_db_args(instances=["dog", "cat"], total_steps=2,
                         desc="seq2"))
    assert pretrained._PRESET_MEMO.get("bundle") is not None

    out = sweep_cwd / "output" / "tb-tiny-n1-seq2"
    learned = {}
    for name in ("dog", "cat"):
        run_dir = out / name
        bins = [f for f in os.listdir(run_dir) if f.endswith(".bin")]
        assert bins, f"{name}: no token bins written"
        import torch

        vecs = []
        for b in sorted(bins):
            vecs.extend(
                v.numpy().ravel()
                for v in torch.load(run_dir / b, weights_only=True).values()
            )
        learned[name] = np.concatenate(vecs)
    # Different instances (different images + initializers) learned
    # different embeddings — the shared bundle/caches did not alias state.
    assert learned["dog"].shape == learned["cat"].shape
    assert np.abs(learned["dog"] - learned["cat"]).max() > 1e-6
    # Log isolation: the second instance must not duplicate its lines
    # into the first run's training.log (stale FileHandler bug).
    for name in ("dog", "cat"):
        log = (out / name / "training.log").read_text()
        assert log.count("Training took") == 1, name
