import numpy as np
import pytest

from textboost_tpu.data import HashTokenizer
from textboost_tpu.eval import CLIPScorer, DINOScorer, TINY_CLIP, TINY_VIT
from textboost_tpu.eval.dreambooth_bench import (
    INSTANCES,
    LIVE_PROMPTS,
    OBJ_PROMPTS,
    is_live,
    prompts_for,
)


def _imgs(n, seed=0, size=64):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, (n, size, size, 3), dtype=np.uint8)


def test_bench_constants():
    assert len(INSTANCES) == 30
    assert len(OBJ_PROMPTS) == 25 and len(LIVE_PROMPTS) == 25
    assert is_live("dog") and is_live("cat2") and not is_live("teapot")
    assert prompts_for("dog") is LIVE_PROMPTS
    assert all("{0}" in p for p in OBJ_PROMPTS)


def test_clip_scorer_tiny():
    scorer = CLIPScorer(TINY_CLIP)
    tok = HashTokenizer()
    imgs = _imgs(3)
    score = scorer.clip_t(tok, imgs, ["a dog", "a cat", "a house"])
    assert -1.0 <= score <= 1.0
    # Identical image sets -> clip_i at its maximum (1.0 after clamping).
    ci_same = scorer.clip_i(imgs, imgs)
    ci_diff = scorer.clip_i(imgs, _imgs(3, seed=9))
    assert ci_same >= ci_diff - 1e-6
    assert 0.0 <= ci_diff <= 1.0


def test_dino_scorer_tiny():
    scorer = DINOScorer(TINY_VIT)
    a, b = _imgs(2, seed=1), _imgs(2, seed=2)
    same = scorer.dino_score(a, a)
    cross = scorer.dino_score(a, b)
    assert same >= cross - 1e-6
    assert 0.0 <= cross <= 1.0


def test_clip_feature_shapes():
    scorer = CLIPScorer(TINY_CLIP)
    feats = scorer.image_features(_imgs(2, size=100))  # resized internally
    assert feats.shape == (2, TINY_CLIP.projection_dim)
    tok = HashTokenizer()
    tfeats = scorer.text_features(tok, ["hello world"])
    assert tfeats.shape == (1, TINY_CLIP.projection_dim)


def test_dinov2_weight_conversion_synthetic():
    """Synthetic DINOv2-layout state dict round-trips into the ViT."""
    from textboost_tpu.eval.scorer_weights import convert_dinov2

    cfg = TINY_VIT
    scorer = DINOScorer(cfg)
    import flax
    import jax

    flat = flax.traverse_util.flatten_dict(scorer.params["params"])
    rs = np.random.RandomState(0)
    sd = {}
    d = cfg.hidden_size
    sd["cls_token"] = rs.randn(1, 1, d).astype(np.float32)
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    sd["pos_embed"] = rs.randn(1, 1 + n_patches, d).astype(np.float32)
    sd["patch_embed.proj.weight"] = rs.randn(
        d, 3, cfg.patch_size, cfg.patch_size
    ).astype(np.float32)
    sd["patch_embed.proj.bias"] = rs.randn(d).astype(np.float32)
    sd["norm.weight"] = rs.randn(d).astype(np.float32)
    sd["norm.bias"] = rs.randn(d).astype(np.float32)
    for i in range(cfg.num_hidden_layers):
        sd[f"blocks.{i}.norm1.weight"] = rs.randn(d).astype(np.float32)
        sd[f"blocks.{i}.norm1.bias"] = rs.randn(d).astype(np.float32)
        sd[f"blocks.{i}.norm2.weight"] = rs.randn(d).astype(np.float32)
        sd[f"blocks.{i}.norm2.bias"] = rs.randn(d).astype(np.float32)
        sd[f"blocks.{i}.attn.qkv.weight"] = rs.randn(3 * d, d).astype(np.float32)
        sd[f"blocks.{i}.attn.qkv.bias"] = rs.randn(3 * d).astype(np.float32)
        sd[f"blocks.{i}.attn.proj.weight"] = rs.randn(d, d).astype(np.float32)
        sd[f"blocks.{i}.attn.proj.bias"] = rs.randn(d).astype(np.float32)
        sd[f"blocks.{i}.mlp.fc1.weight"] = rs.randn(4 * d, d).astype(np.float32)
        sd[f"blocks.{i}.mlp.fc1.bias"] = rs.randn(4 * d).astype(np.float32)
        sd[f"blocks.{i}.mlp.fc2.weight"] = rs.randn(d, 4 * d).astype(np.float32)
        sd[f"blocks.{i}.mlp.fc2.bias"] = rs.randn(d).astype(np.float32)
        sd[f"blocks.{i}.ls1.gamma"] = rs.randn(d).astype(np.float32)
        sd[f"blocks.{i}.ls2.gamma"] = rs.randn(d).astype(np.float32)
    converted = convert_dinov2(sd, scorer.params)
    cflat = flax.traverse_util.flatten_dict(converted["params"])
    assert set(cflat) == set(flat)
    np.testing.assert_allclose(
        cflat[("blocks_0", "qkv", "kernel")], sd["blocks.0.attn.qkv.weight"].T
    )
    np.testing.assert_allclose(cflat[("cls_token",)], sd["cls_token"].reshape(-1))
    np.testing.assert_allclose(
        cflat[("blocks_1", "ls1")], sd["blocks.1.ls1.gamma"]
    )


def test_clip_model_weight_conversion_synthetic():
    """Synthetic transformers-CLIPModel state dict loads into the scorer."""
    from textboost_tpu.eval.scorer_weights import convert_clip_model
    from textboost_tpu.models.convert import flax_to_torch_state_dict

    import flax

    scorer = CLIPScorer(TINY_CLIP)
    flat = flax.traverse_util.flatten_dict(scorer.params["params"])
    rs = np.random.RandomState(1)

    # Build the text side via the existing exporter on the text subtree.
    text_tree = {"params": flax.traverse_util.unflatten_dict(
        {k[1:]: v for k, v in flat.items() if k[0] == "text_model"}
    )}
    sd = flax_to_torch_state_dict(text_tree, "text_encoder")

    vcfg = TINY_CLIP.vision
    d = vcfg.hidden_size
    sd["vision_model.embeddings.patch_embedding.weight"] = rs.randn(
        d, 3, vcfg.patch_size, vcfg.patch_size
    ).astype(np.float32)
    sd["vision_model.embeddings.class_embedding"] = rs.randn(d).astype(np.float32)
    n_pos = (vcfg.image_size // vcfg.patch_size) ** 2 + 1
    sd["vision_model.embeddings.position_embedding.weight"] = rs.randn(
        n_pos, d
    ).astype(np.float32)
    for ln in ("pre_layrnorm", "post_layernorm"):
        sd[f"vision_model.{ln}.weight"] = rs.randn(d).astype(np.float32)
        sd[f"vision_model.{ln}.bias"] = rs.randn(d).astype(np.float32)
    for i in range(vcfg.num_hidden_layers):
        base = f"vision_model.encoder.layers.{i}"
        for proj in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                     "self_attn.out_proj"):
            sd[f"{base}.{proj}.weight"] = rs.randn(d, d).astype(np.float32)
            sd[f"{base}.{proj}.bias"] = rs.randn(d).astype(np.float32)
        for ln in ("layer_norm1", "layer_norm2"):
            sd[f"{base}.{ln}.weight"] = rs.randn(d).astype(np.float32)
            sd[f"{base}.{ln}.bias"] = rs.randn(d).astype(np.float32)
        sd[f"{base}.mlp.fc1.weight"] = rs.randn(vcfg.intermediate_size, d).astype(np.float32)
        sd[f"{base}.mlp.fc1.bias"] = rs.randn(vcfg.intermediate_size).astype(np.float32)
        sd[f"{base}.mlp.fc2.weight"] = rs.randn(d, vcfg.intermediate_size).astype(np.float32)
        sd[f"{base}.mlp.fc2.bias"] = rs.randn(d).astype(np.float32)
    sd["text_projection.weight"] = rs.randn(
        TINY_CLIP.projection_dim, TINY_CLIP.text.hidden_size
    ).astype(np.float32)
    sd["visual_projection.weight"] = rs.randn(
        TINY_CLIP.projection_dim, d
    ).astype(np.float32)

    converted = convert_clip_model(sd, scorer.params)
    cflat = flax.traverse_util.flatten_dict(converted["params"])
    assert set(cflat) == set(flat)
    np.testing.assert_allclose(
        cflat[("visual_projection", "kernel")], sd["visual_projection.weight"].T
    )


def test_metric_none_is_generation_only(tmp_path, capsys):
    """`--metric none` must complete without scorer weights (generation-
    only run): the no-weights guard only applies when something will
    actually score."""
    import argparse

    import eval_dreambooth as ed

    args = argparse.Namespace(metric=["none"], scorer_weights=None,
                              allow_random_scorers=False, vqa_weights=None)
    ed.compute_metrics(args, str(tmp_path))  # must not raise SystemExit
    assert "generation-only" in capsys.readouterr().out
