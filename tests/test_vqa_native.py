"""Native VQAScore (clip-flant5) activation parity vs torch transformers.

The reference scores VQA with t2v_metrics' clip-flant5-xxl
(eval_dreambooth.py:546-565).  That package is absent here, so the parity
falsifiers work at the component level against local torch modules: the
Flan-T5 backbone vs transformers T5ForConditionalGeneration, the vision
feature extraction vs CLIPModel hidden_states[-2], the mm_projector vs a
torch nn.Sequential, and the FULL composition (image tokens + question ->
P(Yes)) assembled from the same torch pieces.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textboost_tpu.eval.t5 import T5Config, T5ForConditionalGeneration, TINY_T5
from textboost_tpu.eval.vqa import CLIPT5Model, NativeVQAScorer, _tiny_vqa_config
from textboost_tpu.eval.clip_scorer import CLIPVisionConfig
from textboost_tpu.eval.scorer_weights import (
    convert_clip_vision,
    convert_mm_projector,
    convert_t5,
)

# Shared tiny clip-flant5 geometry (the scorer's offline mode uses the same).
_, TINY_VIS = _tiny_vqa_config()


def _hf_t5(cfg: T5Config, seed: int, tie: bool = False):
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration as HFT5

    torch.manual_seed(seed)
    return HFT5(
        HFT5Config(
            vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
            d_ff=cfg.d_ff, num_layers=cfg.num_layers,
            num_decoder_layers=cfg.num_decoder_layers, num_heads=cfg.num_heads,
            relative_attention_num_buckets=cfg.relative_attention_num_buckets,
            relative_attention_max_distance=cfg.relative_attention_max_distance,
            dropout_rate=0.0, layer_norm_epsilon=cfg.layer_norm_epsilon,
            feed_forward_proj="gated-gelu", tie_word_embeddings=tie,
            decoder_start_token_id=0, pad_token_id=0,
        )
    ).eval()


def _t5_case(tie: bool, seed: int):
    import torch

    cfg = TINY_T5 if not tie else T5Config(
        vocab_size=256, d_model=32, d_kv=8, d_ff=64,
        num_layers=2, num_decoder_layers=2, num_heads=4,
        tie_word_embeddings=True,
    )
    hf = _hf_t5(cfg, seed, tie=tie)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    model = T5ForConditionalGeneration(cfg)
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, cfg.vocab_size - 2, size=(2, 9)).astype(np.int32)
    dec = np.array([[0, 5, 6], [0, 7, 8]], np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, 6:] = 0
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(dec)
    )
    params = convert_t5(sd, params)

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
            decoder_input_ids=torch.from_numpy(dec.astype(np.int64)),
        ).logits.numpy()
    ours = np.asarray(
        model.apply(
            params, jnp.asarray(ids), jnp.asarray(dec),
            attention_mask=jnp.asarray(mask, bool),
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_t5_logit_parity_untied():
    _t5_case(tie=False, seed=0)


def test_t5_logit_parity_tied_head():
    _t5_case(tie=True, seed=1)


def test_t5_encoder_inputs_embeds_parity():
    import torch

    cfg = TINY_T5
    hf = _hf_t5(cfg, seed=2)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    model = T5ForConditionalGeneration(cfg)
    ids = np.random.default_rng(2).integers(2, 250, size=(2, 7)).astype(np.int32)
    mask = np.ones((2, 7), np.int32)
    mask[0, 5:] = 0
    dec = np.zeros((2, 1), np.int32)
    params = convert_t5(
        sd,
        jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(dec)),
    )
    # Encoder driven through raw inputs_embeds (the image-token injection
    # point) must match the ids path.
    emb = model.apply(params, jnp.asarray(ids), method="embed")
    enc = model.apply(
        params, inputs_embeds=emb, attention_mask=jnp.asarray(mask, bool),
        method="encode",
    )
    with torch.no_grad():
        ref = hf.encoder(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(enc), ref, atol=2e-4, rtol=1e-3)


def _hf_clip_vision(cfg: CLIPVisionConfig, seed: int):
    import torch
    from transformers import CLIPVisionConfig as HFVC
    from transformers import CLIPVisionModel as HFCLIPVision

    torch.manual_seed(seed)
    return HFCLIPVision(
        HFVC(
            image_size=cfg.image_size, patch_size=cfg.patch_size,
            hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            hidden_act=cfg.hidden_act,
        )
    ).eval()


def test_vision_feature_layer_parity():
    """Penultimate-layer patch features == HF hidden_states[-2][:, 1:]."""
    import torch

    from textboost_tpu.eval.clip_scorer import CLIPVisionModel

    hf = _hf_clip_vision(TINY_VIS, seed=3)
    sd = {f"vision_model.{k}": v.numpy() for k, v in hf.vision_model.state_dict().items()}

    model = CLIPVisionModel(TINY_VIS)
    px = np.random.default_rng(3).standard_normal(
        (2, TINY_VIS.image_size, TINY_VIS.image_size, 3)
    ).astype(np.float32)
    params = jax.jit(
        lambda k, x: model.init(k, x, feature_layer=-2)
    )(jax.random.PRNGKey(0), jnp.asarray(px))
    params = convert_clip_vision(sd, params)

    with torch.no_grad():
        out = hf(
            torch.from_numpy(px.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    ref = out.hidden_states[-2][:, 1:].numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(px), feature_layer=-2))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


def test_full_clip_flant5_composition_parity():
    """End-to-end P(Yes): native CLIPT5Model vs the same pieces in torch."""
    import torch

    t5_cfg = TINY_T5
    hf_t5 = _hf_t5(t5_cfg, seed=4)
    hf_vis = _hf_clip_vision(TINY_VIS, seed=5)
    torch.manual_seed(6)
    proj = torch.nn.Sequential(
        torch.nn.Linear(TINY_VIS.hidden_size, t5_cfg.d_model),
        torch.nn.GELU(),
        torch.nn.Linear(t5_cfg.d_model, t5_cfg.d_model),
    ).eval()

    model = CLIPT5Model(t5_cfg, TINY_VIS)
    template = model.shape_template()
    params = {
        "t5": convert_t5(
            {k: v.numpy() for k, v in hf_t5.state_dict().items()}, template["t5"]
        ),
        "vision": convert_clip_vision(
            {f"vision_model.{k}": v.numpy()
             for k, v in hf_vis.vision_model.state_dict().items()},
            template["vision"],
        ),
        "projector": convert_mm_projector(
            {k: v.numpy() for k, v in proj.state_dict().items()},
            template["projector"],
        ),
    }

    rng = np.random.default_rng(7)
    px = rng.standard_normal(
        (2, TINY_VIS.image_size, TINY_VIS.image_size, 3)
    ).astype(np.float32)
    q_ids = rng.integers(2, 250, size=(2, 11)).astype(np.int32)
    q_mask = np.ones((2, 11), np.int32)
    q_mask[1, 8:] = 0
    yes_id = 7

    ours = np.asarray(
        model.yes_probability(
            params, jnp.asarray(px), jnp.asarray(q_ids), jnp.asarray(q_mask),
            yes_token_id=yes_id,
        )
    )

    with torch.no_grad():
        vis_out = hf_vis(
            torch.from_numpy(px.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
        img_tokens = proj(vis_out.hidden_states[-2][:, 1:])
        txt = hf_t5.shared(torch.from_numpy(q_ids.astype(np.int64)))
        embeds = torch.cat([img_tokens, txt], dim=1)
        full_mask = torch.cat(
            [torch.ones(2, img_tokens.shape[1], dtype=torch.long),
             torch.from_numpy(q_mask.astype(np.int64))], dim=1
        )
        out = hf_t5(
            inputs_embeds=embeds, attention_mask=full_mask,
            decoder_input_ids=torch.zeros(2, 1, dtype=torch.long),
        )
        ref = torch.softmax(out.logits[:, 0], dim=-1)[:, yes_id].numpy()

    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_native_scorer_offline_tiny():
    s = NativeVQAScorer()
    imgs = np.random.default_rng(0).integers(
        0, 255, size=(3, 64, 64, 3)
    ).astype(np.uint8)
    prompts = ["a photo of a dog", "a cat", "a photo of a dog"]
    p = s.score_pairs(imgs, prompts)
    assert p.shape == (3,)
    assert ((p >= 0) & (p <= 1)).all()
    # Deterministic, sensitive to the image, mean == score().
    np.testing.assert_array_equal(p, s.score_pairs(imgs, prompts))
    assert not np.allclose(p, s.score_pairs(imgs[::-1].copy(), prompts))
    assert np.isclose(s.score(imgs, prompts), p.mean())


def test_native_scorer_weights_roundtrip(tmp_path):
    """Converted msgpack weights + config.json geometry load back through
    the ShapeDtypeStruct template and reproduce the direct-params scores."""
    import json

    import flax

    from textboost_tpu.eval.vqa import _tiny_vqa_config

    t5_cfg, vis_cfg = _tiny_vqa_config()
    model = CLIPT5Model(t5_cfg, vis_cfg)
    params = model.init_params(11)
    wdir = tmp_path / "vqa"
    wdir.mkdir()
    for part in ("vision", "projector", "t5"):
        with open(wdir / f"{part}.msgpack", "wb") as f:
            f.write(flax.serialization.to_bytes(params[part]))
    geom = {
        "yes_token_id": 5,
        "t5": {
            "vocab_size": t5_cfg.vocab_size, "d_model": t5_cfg.d_model,
            "d_kv": t5_cfg.d_kv, "d_ff": t5_cfg.d_ff,
            "num_layers": t5_cfg.num_layers,
            "num_decoder_layers": t5_cfg.num_decoder_layers,
            "num_heads": t5_cfg.num_heads,
        },
        "vision": {
            "image_size": vis_cfg.image_size, "patch_size": vis_cfg.patch_size,
            "hidden_size": vis_cfg.hidden_size,
            "intermediate_size": vis_cfg.intermediate_size,
            "num_hidden_layers": vis_cfg.num_hidden_layers,
            "num_attention_heads": vis_cfg.num_attention_heads,
        },
    }
    (wdir / "config.json").write_text(json.dumps(geom))

    scorer = NativeVQAScorer(str(wdir))
    assert scorer.yes_token_id == 5
    imgs = np.random.default_rng(1).integers(
        0, 255, size=(2, 64, 64, 3)
    ).astype(np.uint8)
    got = scorer.score_pairs(imgs, ["a dog", "a cat"])

    # Reference: same params driven directly.
    from textboost_tpu.eval.clip_scorer import normalize_images

    px = jnp.asarray(normalize_images(imgs, vis_cfg.image_size))
    ids, mask = scorer._encode_questions(["a dog", "a cat"])
    want = np.asarray(
        model.yes_probability(
            params, px, jnp.asarray(ids), jnp.asarray(mask), yes_token_id=5
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_eval_cli_vqa_gating():
    """--metric vqa without weights: skipped unless --allow-random-scorers
    (then the tiny native scorer engages)."""
    from textboost_tpu.eval.vqa import vqa_available

    if vqa_available():  # t2v_metrics installed: reference path wins
        pytest.skip("t2v_metrics present — native gating path not reachable")
    s = NativeVQAScorer()  # random-scorer path constructs and scores
    assert 0.0 <= s.score(
        np.zeros((1, 32, 32, 3), np.uint8), ["x"]
    ) <= 1.0


def test_question_truncation_keeps_eos(tmp_path):
    """Real-tokenizer path: over-length questions truncate WITHOUT dropping
    the terminal </s> (id 1), mirroring the offline path's reservation."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from tokenizers.processors import TemplateProcessing

    vocab = {f"w{i}": i + 10 for i in range(50)}
    vocab.update({"[UNK]": 9, "</s>": 1})
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    tok.post_processor = TemplateProcessing(
        single="$A </s>", special_tokens=[("</s>", 1)]
    )

    s = NativeVQAScorer()
    s._tokenizer = tok
    long_prompt = " ".join(f"w{i % 50}" for i in range(200))
    ids, mask = s._encode_questions([long_prompt], max_len=16)
    assert mask[0].sum() == 16
    assert ids[0, 15] == 1  # </s> survives truncation
    short_ids, short_mask = s._encode_questions(["w1 w2"], max_len=16)
    n = short_mask[0].sum()
    assert short_ids[0, n - 1] == 1  # untruncated question also ends in </s>
