"""Activation-level parity of the metric scorers vs real torch forwards.

The reference metrics run openai CLIP ViT-L/14@336px and DINOv2
(eval_dreambooth.py:353-543).  transformers provides CLIPModel and
Dinov2Model here, so the scorer weight converters are verified end to end:
random torch weights -> convert -> feature agreement.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from textboost_tpu.eval.clip_scorer import CLIPConfig, CLIPScorer, CLIPVisionConfig
from textboost_tpu.eval.dino import DINOScorer, ViTConfig
from textboost_tpu.eval.scorer_weights import convert_clip_model, convert_dinov2
from textboost_tpu.models.configs import CLIPTextConfig


def _hf_clip_model(cfg: CLIPConfig, seed: int):
    import torch
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel as HFCLIPModel

    torch.manual_seed(seed)
    hf_cfg = HFCLIPConfig(
        text_config=dict(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.text.num_hidden_layers,
            num_attention_heads=cfg.text.num_attention_heads,
            max_position_embeddings=cfg.text.max_position_embeddings,
            hidden_act=cfg.text.hidden_act,
            eos_token_id=cfg.text.eos_token_id,
            bos_token_id=cfg.text.bos_token_id,
        ),
        vision_config=dict(
            image_size=cfg.vision.image_size,
            patch_size=cfg.vision.patch_size,
            hidden_size=cfg.vision.hidden_size,
            intermediate_size=cfg.vision.intermediate_size,
            num_hidden_layers=cfg.vision.num_hidden_layers,
            num_attention_heads=cfg.vision.num_attention_heads,
            hidden_act=cfg.vision.hidden_act,
        ),
        projection_dim=cfg.projection_dim,
    )
    return HFCLIPModel(hf_cfg).eval()


def _clip_case(cfg: CLIPConfig, seed: int, atol: float = 1e-4):
    import torch

    hf = _hf_clip_model(cfg, seed)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    scorer = CLIPScorer(cfg)
    params = convert_clip_model(sd, scorer.params)

    rng = np.random.default_rng(seed)
    ids = rng.integers(1, cfg.text.vocab_size - 2, size=(2, 77)).astype(np.int32)
    ids[:, 0] = cfg.text.bos_token_id
    ids[0, 20:] = cfg.text.eos_token_id
    ids[1, -1] = cfg.text.eos_token_id
    px = rng.standard_normal(
        (2, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)

    with torch.no_grad():
        ref_t = hf.get_text_features(torch.from_numpy(ids.astype(np.int64))).numpy()
        ref_v = hf.get_image_features(
            torch.from_numpy(px.transpose(0, 3, 1, 2))
        ).numpy()

    ours_t = np.asarray(
        scorer.model.apply(params, jnp.asarray(ids), method="get_text_features")
    )
    ours_v = np.asarray(
        scorer.model.apply(params, jnp.asarray(px), method="get_image_features")
    )
    np.testing.assert_allclose(ours_t, ref_t, atol=atol, rtol=1e-3)
    np.testing.assert_allclose(ours_v, ref_v, atol=atol, rtol=1e-3)


def test_clip_scorer_parity_small():
    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=1000,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            eos_token_id=999,
            bos_token_id=998,
        ),
        vision=CLIPVisionConfig(
            image_size=56,
            patch_size=14,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
        ),
        projection_dim=32,
    )
    _clip_case(cfg, seed=0)


@pytest.mark.slow
def test_clip_scorer_parity_vit_l_336_geometry():
    # The exact openai ViT-L/14@336px geometry the reference scores with.
    _clip_case(CLIPConfig(), seed=1, atol=5e-4)


def _dino_case(cfg: ViTConfig, seed: int, atol: float = 1e-4):
    import torch
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(seed)
    hf = Dinov2Model(
        Dinov2Config(
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            mlp_ratio=cfg.mlp_ratio,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
            layer_norm_eps=cfg.layer_norm_eps,
            layerscale_value=0.5,
        )
    ).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    scorer = DINOScorer(cfg)
    params = convert_dinov2(sd, scorer.params)

    rng = np.random.default_rng(seed)
    px = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = hf(torch.from_numpy(px.transpose(0, 3, 1, 2))).last_hidden_state
    ref_cls = ref[:, 0].numpy()

    ours = np.asarray(scorer.model.apply(params, jnp.asarray(px)))
    np.testing.assert_allclose(ours, ref_cls, atol=atol, rtol=1e-3)


def test_dino_scorer_parity_small():
    _dino_case(
        ViTConfig(
            image_size=56, hidden_size=64, num_hidden_layers=2, num_attention_heads=4
        ),
        seed=2,
    )


@pytest.mark.slow
def test_dino_scorer_parity_vitl14_geometry():
    # The dinov2_vitl14 geometry of eval_dreambooth.py:459-461.
    _dino_case(ViTConfig(), seed=3, atol=5e-4)


def test_convert_scorers_cli(tmp_path):
    # torch checkpoint files -> convert_scorers.py -> load_scorers msgpack.
    import subprocess
    import sys
    import os

    import torch
    from transformers import Dinov2Config, Dinov2Model

    hf = Dinov2Model(
        Dinov2Config(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=224,
            patch_size=14,
        )
    )
    src = tmp_path / "dinov2.pth"
    torch.save(hf.state_dict(), src)
    out = tmp_path / "weights"
    # tiny geometry is not the CLI default; drive the converter directly
    from textboost_tpu.eval.scorer_weights import (
        _load_state_dict,
        save_converted,
        load_scorers,
    )

    cfg = ViTConfig(
        image_size=224, hidden_size=64, num_hidden_layers=2, num_attention_heads=4
    )
    scorer = DINOScorer(cfg)
    params = convert_dinov2(_load_state_dict(str(src)), scorer.params)
    out.mkdir()
    save_converted(params, str(out / "dino.msgpack"))
    # msgpack loads bitwise-identically through the scorer path
    import flax

    restored = DINOScorer(cfg)
    with open(out / "dino.msgpack", "rb") as f:
        loaded = flax.serialization.from_bytes(restored.params, f.read())
    a = flax.traverse_util.flatten_dict(loaded["params"])
    b = flax.traverse_util.flatten_dict(params["params"])
    for k in b:
        np.testing.assert_array_equal(a[k], b[k])
