"""VQAScore metric (clip-flant5), native implementation + t2v_metrics gate.

Counterpart of eval_dreambooth.py:546-565: the reference scores
image/prompt alignment with `t2v_metrics.VQAScore(model="clip-flant5-xxl")`
— a CLIP-ViT-L/14-336-conditioned Flan-T5 that answers a yes/no question
about the image; the score is P("Yes") (VQAScore, Lin et al.,
arXiv 2404.01291).

Two paths:

* `NativeVQAScorer` — the model re-implemented natively (TPU-first):
  CLIP vision tower penultimate-layer patch features -> 2-layer GELU MLP
  projector into the T5 embedding space -> tokens prepended to the
  embedded question -> Flan-T5 encoder-decoder (eval/t5.py) -> softmax
  over the first decoder step -> probability of the "Yes" token.  The T5
  backbone and CLIP tower are activation-tested against torch
  transformers (tests/test_vqa_native.py); the composition (feature
  layer -2, mlp2x_gelu projector, question template, single-token answer
  scoring) follows the published VQAScore/LLaVA-1.5 recipe — the
  t2v_metrics package itself is not importable in this environment to
  diff against, so real clip-flant5-xxl weights (converted via
  scorer_weights.convert_t5 + convert_clip_model pieces) are required
  for paper-comparable numbers.
* `VQAScorer` — thin wrapper over `t2v_metrics` when that package is
  importable (reference behavior, byte-identical protocol).

eval_dreambooth keeps "vqa" in the default metric set for CLI parity and
skips it with a warning when neither path is available.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Sequence

import numpy as np

QUESTION_TEMPLATE = 'Does this figure show "{}"? Please answer yes or no.'


def vqa_available() -> bool:
    try:
        import t2v_metrics  # noqa: F401

        return True
    except ImportError:
        return False


class VQAScorer:
    def __init__(self, model: str = "clip-flant5-xxl", device: str = "cpu"):
        if not vqa_available():
            raise ImportError(
                "VQAScore requires the `t2v_metrics` package (and the "
                "clip-flant5-xxl checkpoint); unavailable in this environment. "
                "Use --metric clip-t clip-i dino instead."
            )
        import t2v_metrics

        self._scorer = t2v_metrics.VQAScore(model=model, device=device)

    def score(self, images: Sequence[np.ndarray], prompts: List[str]) -> float:
        """Mean VQA alignment over (image, prompt) pairs."""
        import tempfile

        from PIL import Image

        scores = []
        with tempfile.TemporaryDirectory() as td:
            for i, (img, prompt) in enumerate(zip(images, prompts)):
                path = f"{td}/{i}.png"
                Image.fromarray(np.asarray(img)).save(path)
                scores.append(float(self._scorer(images=[path], texts=[prompt])))
        return float(np.mean(scores))


# ---------------------------------------------------------------------------
# Native clip-flant5
# ---------------------------------------------------------------------------
def _vqa_config():
    from .clip_scorer import CLIPVisionConfig
    from .t5 import T5Config

    return T5Config(), CLIPVisionConfig()


def _tiny_vqa_config():
    from .clip_scorer import CLIPVisionConfig
    from .t5 import TINY_T5

    # The single source of tiny clip-flant5 geometry (tests import this).
    return TINY_T5, CLIPVisionConfig(
        image_size=56, patch_size=14, hidden_size=48, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4,
    )


class CLIPT5Model:
    """The clip-flant5 composition as a Flax module pair.

    Built with setup-free composition (plain apply functions) so the
    vision tower, projector, and T5 keep independent param trees — each
    converted and shipped separately (the -xxl T5 alone is ~9 GB; keeping
    trees separate lets the converter stream them independently)."""

    def __init__(self, t5_config=None, vision_config=None,
                 feature_layer: int = -2, projector_depth: int = 2):
        import flax.linen as nn
        import jax.numpy as jnp

        from .clip_scorer import CLIPVisionModel
        from .t5 import T5ForConditionalGeneration

        t5_cfg, vis_cfg = _vqa_config()
        self.t5_config = t5_config or t5_cfg
        self.vision_config = vision_config or vis_cfg
        self.feature_layer = feature_layer
        self.vision = CLIPVisionModel(self.vision_config)
        self.t5 = T5ForConditionalGeneration(self.t5_config)

        d_model = self.t5_config.d_model

        class _Projector(nn.Module):  # LLaVA-1.5 "mlp2x_gelu"
            depth: int

            @nn.compact
            def __call__(self, x):
                for i in range(self.depth):
                    x = nn.Dense(d_model, name=f"linear_{i}")(x)
                    if i + 1 < self.depth:
                        x = nn.gelu(x, approximate=False)
                return x

        self.projector = _Projector(projector_depth)
        self._jnp = jnp

    def _init_thunks(self, rng_seed: int = 0):
        import jax
        import jax.numpy as jnp

        cfg = self.vision_config
        px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(rng_seed), 3)
        n_patch = (cfg.image_size // cfg.patch_size) ** 2
        ids = jnp.zeros((1, 4), jnp.int32)
        return {
            "vision": (
                lambda f: f(
                    lambda k, x: self.vision.init(
                        k, x, feature_layer=self.feature_layer
                    ),
                    k1, px,
                )
            ),
            "projector": (
                lambda f: f(
                    self.projector.init, k2, jnp.zeros((1, n_patch, cfg.hidden_size))
                )
            ),
            "t5": (lambda f: f(self.t5.init, k3, ids, ids[:, :1])),
        }

    def init_params(self, rng_seed: int = 0):
        """Random-init all three trees (offline self-consistency mode)."""
        import jax

        jit_call = lambda fn, *a: jax.jit(fn)(*a)
        return {k: t(jit_call) for k, t in self._init_thunks(rng_seed).items()}

    def shape_template(self):
        """ShapeDtypeStruct trees for all three parts — the conversion /
        deserialization template.  Never materializes weights (the -xxl T5
        random init alone would be ~45 GB)."""
        import jax

        return {k: t(jax.eval_shape) for k, t in self._init_thunks().items()}

    def yes_probability(self, params, pixels, question_ids, question_mask,
                        yes_token_id: int, decoder_start_token_id: int = 0):
        """P(first answer token == yes | image, question) for each row.

        pixels: CLIP-normalized [B,H,W,3]; question_ids/mask: [B,L]."""
        jnp = self._jnp
        feats = self.vision.apply(
            params["vision"], pixels, feature_layer=self.feature_layer
        )
        img_tokens = self.projector.apply(params["projector"], feats)
        txt_embeds = self.t5.apply(
            params["t5"], question_ids, method="embed"
        )
        embeds = jnp.concatenate([img_tokens, txt_embeds.astype(img_tokens.dtype)],
                                 axis=1)
        b, p = img_tokens.shape[:2]
        mask = jnp.concatenate(
            [jnp.ones((b, p), bool), question_mask.astype(bool)], axis=1
        )
        enc = self.t5.apply(
            params["t5"], inputs_embeds=embeds, attention_mask=mask,
            method="encode",
        )
        dec_ids = jnp.full((b, 1), decoder_start_token_id, jnp.int32)
        logits = self.t5.apply(
            params["t5"], dec_ids, enc, mask, method="decode"
        )
        import jax

        probs = jax.nn.softmax(logits[:, 0].astype(jnp.float32), axis=-1)
        return probs[:, yes_token_id]


class NativeVQAScorer:
    """VQAScore with the native clip-flant5 model.

    weights_dir layout (produced by convert_scorers.py --vqa):
      vqa/{vision,projector,t5}.msgpack  converted param trees
      vqa/tokenizer.json                 flan-t5 fast tokenizer
      vqa/config.json                    {"yes_token_id": ..., geometry...}
    Without weights_dir the scorer runs the TINY random-init geometry —
    code-path exercise only, scores are self-consistent, not
    paper-comparable (same policy as the CLIP/DINO scorers)."""

    def __init__(self, weights_dir: Optional[str] = None, seed: int = 0):
        import jax

        self._tokenizer = None
        if weights_dir:
            cfg_path = os.path.join(weights_dir, "config.json")
            meta = json.load(open(cfg_path)) if os.path.isfile(cfg_path) else {}
            self.yes_token_id = int(meta.get("yes_token_id", 2163))
            t5_cfg, vis_cfg = _vqa_config()
            if "t5" in meta:
                t5_cfg = dataclasses.replace(t5_cfg, **meta["t5"])
            if "vision" in meta:
                vis_cfg = dataclasses.replace(vis_cfg, **meta["vision"])
            self.model = CLIPT5Model(t5_cfg, vis_cfg)
            self.params = self._load_params(weights_dir)
            tok_path = os.path.join(weights_dir, "tokenizer.json")
            if os.path.isfile(tok_path):
                from tokenizers import Tokenizer

                self._tokenizer = Tokenizer.from_file(tok_path)
        else:
            t5_cfg, vis_cfg = _tiny_vqa_config()
            self.model = CLIPT5Model(t5_cfg, vis_cfg)
            self.params = self.model.init_params(seed)
            self.yes_token_id = 7  # arbitrary id inside the tiny vocab
        self._score_fn = jax.jit(
            lambda p, px, ids, mask: self.model.yes_probability(
                p, px, ids, mask, self.yes_token_id,
                self.model.t5_config.decoder_start_token_id,
            )
        )

    def _load_params(self, weights_dir: str):
        import flax

        template = self.model.shape_template()
        out = {}
        for part in ("vision", "projector", "t5"):
            st = os.path.join(weights_dir, f"{part}.safetensors")
            path = os.path.join(weights_dir, f"{part}.msgpack")
            if os.path.isfile(st):
                # Streaming-converter output (bounded-RSS xxl path,
                # scorer_weights.stream_convert_t5).
                from .scorer_weights import load_safetensors_tree

                out[part] = flax.serialization.from_state_dict(
                    template[part], load_safetensors_tree(st)
                )
                continue
            if not os.path.isfile(path):
                raise FileNotFoundError(
                    f"{path} (or .safetensors) missing — convert clip-flant5 "
                    "weights with convert_scorers.py --vqa first"
                )
            with open(path, "rb") as f:
                out[part] = flax.serialization.from_bytes(
                    template[part], f.read()
                )
        return out

    def _encode_questions(self, prompts: List[str], max_len: int = 77):
        if self._tokenizer is None:
            # Offline/tiny mode: stable crc32 word-ids keep the path
            # exercisable without a sentencepiece vocab (process-stable,
            # unlike builtin hash()).
            import zlib

            vocab = self.model.t5_config.vocab_size
            ids = np.zeros((len(prompts), max_len), np.int32)
            mask = np.zeros((len(prompts), max_len), np.int32)
            for i, p in enumerate(prompts):
                toks = [1 + (zlib.crc32(w.encode()) % (vocab - 2)) for w in
                        QUESTION_TEMPLATE.format(p).split()][: max_len - 1]
                toks.append(1)  # </s>
                ids[i, : len(toks)] = toks
                mask[i, : len(toks)] = 1
            return ids, mask
        encs = [
            self._tokenizer.encode(QUESTION_TEMPLATE.format(p)) for p in prompts
        ]
        ids = np.zeros((len(prompts), max_len), np.int32)
        mask = np.zeros((len(prompts), max_len), np.int32)
        eos = 1  # T5 </s>
        for i, e in enumerate(encs):
            toks = list(e.ids)
            if len(toks) > max_len:
                # Truncation must not drop </s> — keep the final EOS so
                # the encoder still sees a terminated question.
                toks = toks[: max_len - 1] + [eos]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask

    def score_pairs(self, images: Sequence[np.ndarray],
                    prompts: List[str]) -> np.ndarray:
        """P(Yes) per aligned (uint8 image, prompt) pair."""
        import jax.numpy as jnp

        from .clip_scorer import normalize_images

        px = jnp.asarray(
            normalize_images(
                np.asarray(images), self.model.vision_config.image_size
            )
        )
        ids, mask = self._encode_questions(prompts)
        return np.asarray(
            self._score_fn(self.params, px, jnp.asarray(ids), jnp.asarray(mask)),
            np.float32,
        )

    def score(self, images: Sequence[np.ndarray], prompts: List[str]) -> float:
        """Mean VQA alignment — same interface as VQAScorer.score."""
        return float(self.score_pairs(images, prompts).mean())
