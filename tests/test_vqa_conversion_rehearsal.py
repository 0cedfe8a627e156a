"""VERDICT r3 item 7: rehearse the large-weight clip-flant5 conversion.

The only VQA conversions exercised before this ran at tiny/hand-built
geometry; the real target is the 9 GB clip-flant5-xxl streaming path
(/root/reference/eval_dreambooth.py:546-565).  This test runs the ACTUAL
CLI (`convert_scorers.py --vqa-t5/--vqa-vision/--vqa-projector
--vqa-config`) end-to-end at a mid geometry — a full t5-base-scale random
torch checkpoint (~250M params, ~1 GB fp32 on disk) plus a ViT-B/32-scale
vision tower — through torch.save -> _load_state_dict -> convert ->
msgpack -> NativeVQAScorer, asserting P(Yes) logit parity against the same
torch pieces and recording peak RSS, so the xxl conversion is de-risked
mechanically before real weights are fed in.
"""
import json
import os
import resource
import sys

import numpy as np
import pytest

T5_BASE = dict(
    vocab_size=32128, d_model=768, d_kv=64, d_ff=2048,
    num_layers=12, num_decoder_layers=12, num_heads=12,
)
VIT_B32 = dict(
    image_size=224, patch_size=32, hidden_size=768,
    intermediate_size=3072, num_hidden_layers=12, num_attention_heads=12,
)


def _rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def test_vqa_mid_geometry_conversion_rehearsal(tmp_path):
    import torch

    from textboost_tpu.eval.t5 import T5Config

    from tests.test_vqa_native import _hf_t5, _hf_clip_vision

    t5_cfg = T5Config(**T5_BASE)
    hf_t5 = _hf_t5(t5_cfg, seed=0)

    from textboost_tpu.eval.clip_scorer import CLIPVisionConfig

    vis_cfg = CLIPVisionConfig(**VIT_B32)
    hf_vis = _hf_clip_vision(vis_cfg, seed=1)
    torch.manual_seed(2)
    proj = torch.nn.Sequential(
        torch.nn.Linear(vis_cfg.hidden_size, t5_cfg.d_model),
        torch.nn.GELU(),
        torch.nn.Linear(t5_cfg.d_model, t5_cfg.d_model),
    ).eval()

    # Real on-disk torch checkpoints, like a downloaded snapshot.
    t5_path = tmp_path / "t5.bin"
    torch.save(hf_t5.state_dict(), t5_path)
    size_mb = os.path.getsize(t5_path) / 1e6
    assert size_mb > 300, f"t5-base checkpoint unexpectedly small: {size_mb:.0f} MB"
    vis_path = tmp_path / "vision.bin"
    torch.save(
        {f"vision_model.{k}": v for k, v in hf_vis.vision_model.state_dict().items()},
        vis_path,
    )
    proj_path = tmp_path / "projector.bin"
    torch.save(proj.state_dict(), proj_path)
    geom_path = tmp_path / "geom.json"
    geom_path.write_text(json.dumps({"t5": T5_BASE, "vision": VIT_B32}))

    # The actual CLI, argv and all.
    out_dir = tmp_path / "scorer_weights"
    import convert_scorers

    argv = sys.argv
    sys.argv = [
        "convert_scorers.py",
        "--vqa-t5", str(t5_path),
        "--vqa-vision", str(vis_path),
        "--vqa-projector", str(proj_path),
        "--vqa-config", str(geom_path),
        "--yes-token-id", "2163",
        "--out", str(out_dir),
    ]
    try:
        convert_scorers.main()
    finally:
        sys.argv = argv
    # The T5 backbone streams into .safetensors (bounded-RSS xxl path);
    # the small parts keep the msgpack format.
    assert (out_dir / "vqa" / "t5.safetensors").is_file()
    for part in ("vision", "projector"):
        assert (out_dir / "vqa" / f"{part}.msgpack").is_file()

    from textboost_tpu.eval.vqa import NativeVQAScorer

    scorer = NativeVQAScorer(weights_dir=str(out_dir / "vqa"))
    assert scorer.yes_token_id == 2163

    rng = np.random.default_rng(3)
    px = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    q_ids = rng.integers(2, 30000, size=(1, 9)).astype(np.int32)
    q_mask = np.ones((1, 9), np.int32)
    ours = np.asarray(scorer._score_fn(
        scorer.params, px, q_ids, q_mask
    ))

    with torch.no_grad():
        vis_out = hf_vis(
            torch.from_numpy(px.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
        img_tokens = proj(vis_out.hidden_states[-2][:, 1:])
        txt = hf_t5.shared(torch.from_numpy(q_ids.astype(np.int64)))
        embeds = torch.cat([img_tokens, txt], dim=1)
        full_mask = torch.cat(
            [torch.ones(1, img_tokens.shape[1], dtype=torch.long),
             torch.from_numpy(q_mask.astype(np.int64))], dim=1
        )
        out = hf_t5(
            inputs_embeds=embeds, attention_mask=full_mask,
            decoder_input_ids=torch.zeros(1, 1, dtype=torch.long),
        )
        ref = torch.softmax(out.logits[:, 0], dim=-1)[:, 2163].numpy()

    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-3)
    # Mechanical de-risk record: peak RSS for the whole pipeline at ~1.4 GB
    # of checkpoints.  The xxl path is ~7x larger; linear scaling of the
    # conversion stage (stream per-tensor, no duplicate trees) keeps it
    # inside this host's 128 GB.
    print(f"\n[vqa-rehearsal] t5 ckpt {size_mb:.0f} MB, peak RSS {_rss_mb():.0f} MB")


# ---------------------------------------------------------------------------
# Bounded-RSS streaming proof (VERDICT r4 #7)
# ---------------------------------------------------------------------------
T5_LARGE = dict(
    vocab_size=32128, d_model=1024, d_kv=64, d_ff=2816,
    num_layers=24, num_decoder_layers=24, num_heads=16,
)


class _Recorder:
    """Captures the torch key t5_leaf reads for one flax leaf and hands
    back zeros of the flax shape — the returned array's shape then reveals
    whether the converter transposes (torch shape = reversed flax)."""

    def __init__(self, flax_shape):
        self.flax_shape = tuple(flax_shape)
        self.key = None

    def __getitem__(self, key):
        assert self.key is None, "one torch read per leaf expected"
        self.key = key
        return np.zeros(self.flax_shape, np.float32)


def _torch_key_shapes(template):
    """Enumerate the (torch key, torch shape) list a transformers T5
    checkpoint must contain, derived mechanically from the converter."""
    import flax

    from textboost_tpu.eval.scorer_weights import t5_leaf

    out = []
    for k, v in flax.traverse_util.flatten_dict(template["params"]).items():
        rec = _Recorder(np.shape(v))
        res = t5_leaf(rec, k)
        shape = (
            tuple(np.shape(v))
            if np.shape(res) == tuple(np.shape(v))
            else tuple(reversed(np.shape(v)))
        )
        out.append((rec.key, shape))
    return out


def test_t5_streaming_conversion_bounded_rss(tmp_path):
    """Synthesize a flan-t5-large-shaped checkpoint (~3.1 GB fp32) ON DISK
    without ever materializing it, stream-convert it in a SUBPROCESS, and
    assert the child's peak RSS stays far below the checkpoint size —
    bounded by process baseline + one tensor, i.e. independent of model
    scale (the clip-flant5-xxl guarantee)."""
    import subprocess

    from textboost_tpu.eval.t5 import T5Config
    from textboost_tpu.eval.vqa import CLIPT5Model
    from textboost_tpu.eval.scorer_weights import write_safetensors_stream

    template = CLIPT5Model(T5Config(**T5_LARGE), None).shape_template()["t5"]
    entries = _torch_key_shapes(template)
    ckpt = tmp_path / "t5_large_synth.safetensors"
    rng = np.random.default_rng(0)
    write_safetensors_stream(
        str(ckpt), entries,
        lambda name: rng.standard_normal(
            dict(entries)[name]).astype(np.float32) * 0.02,
    )
    size_gb = os.path.getsize(ckpt) / 1e9
    assert size_gb > 2.5, f"synthetic checkpoint too small: {size_gb:.2f} GB"

    geom = tmp_path / "geom.json"
    geom.write_text(json.dumps({"t5": T5_LARGE}))
    out_dir = tmp_path / "out"
    driver = tmp_path / "child.py"
    driver.write_text(
        "import os, sys\n"
        "sys.path.insert(0, os.getcwd())  # repo root (cwd import, not PYTHONPATH)\n"
        f"sys.argv = ['convert_scorers.py', '--vqa-t5', {str(ckpt)!r},\n"
        f"            '--vqa-config', {str(geom)!r}, '--out', {str(out_dir)!r}]\n"
        "import convert_scorers\n"
        "convert_scorers.main()\n"
        "# VmHWM, NOT getrusage ru_maxrss: ru_maxrss is a lifetime high-water\n"
        "# mark that SURVIVES execve, so a child forked from a large parent\n"
        "# (the full pytest suite peaked >13 GB) inherits the parent's RSS as\n"
        "# its own 'peak' and the bound fails spuriously.  VmHWM is reset\n"
        "# when execve installs the fresh address space.\n"
        "hwm_kb = 0.0\n"
        "for line in open('/proc/self/status'):\n"
        "    if line.startswith('VmHWM'):\n"
        "        hwm_kb = float(line.split()[1])\n"
        "print(f'CHILD_PEAK_RSS_MB {hwm_kb / 1024.0:.0f}')\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, str(driver)], cwd=repo, capture_output=True,
        text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rss_mb = float(
        [l for l in proc.stdout.splitlines() if "CHILD_PEAK_RSS_MB" in l][-1]
        .split()[-1]
    )
    out_file = out_dir / "vqa" / "t5.safetensors"
    assert out_file.is_file()
    assert os.path.getsize(out_file) / 1e9 > 2.5
    # Eager conversion held input+output trees: ~2x checkpoint (6+ GB).
    # Streaming must stay under 45% of the checkpoint (measured: python +
    # jax/torch imports + one ~130 MB tensor).
    budget_mb = 0.45 * size_gb * 1000
    assert rss_mb < budget_mb, (
        f"peak RSS {rss_mb:.0f} MB >= bound {budget_mb:.0f} MB "
        f"for a {size_gb:.2f} GB checkpoint — conversion is not streaming")
    print(f"\n[t5-streaming] ckpt {size_gb:.2f} GB, child peak RSS {rss_mb:.0f} MB")

    # Round-trip: the streamed file restores onto the template.
    import flax as flaxlib

    from textboost_tpu.eval.scorer_weights import load_safetensors_tree

    tree = load_safetensors_tree(str(out_file))
    flat = flaxlib.traverse_util.flatten_dict(tree["params"])
    tflat = flaxlib.traverse_util.flatten_dict(template["params"])
    assert set(flat) == set(tflat)
    for k in tflat:
        assert tuple(flat[k].shape) == tuple(np.shape(tflat[k])), k
