"""Whole-pipeline activation oracle: prompt -> image against a torch replica.

The per-module oracles (test_torch_oracle.py: UNet/VAE vs independent
torch; test_golden_parity.py: CLIP vs transformers; test_sampler_oracle.py:
samplers vs float64 numpy) leave one gap: the COMPOSITION — CFG formula
and batch layout, null-embedding patching, latent scaling, decode
normalization, uint8 conversion.  This file replays the full
TextToImagePipeline trajectory in torch/numpy using those same independent
pieces (transformers CLIP + TorchUNet/TorchVAE + a float64 sampler loop)
on identical weights and latents, and demands the final uint8 images agree.

Weights come from the TORCH side's published default inits (HF CLIP's
std-0.02 recipe; torch conv/linear defaults) and flow torch->flax through
the real checkpoint-load converters (models/convert.py — the same path
pretrained weights take), for two reasons: it exercises the load
direction end-to-end, and it keeps the comparison numerically
well-conditioned.  A probe with flax-default random inits (token
embeddings at std 1.0) saturated the CLIP attention softmaxes and
amplified fp32 backend noise to ~3e-2 in the hidden states — 7.5x CFG
then blew the uint8 comparison to ~27/255 with no composition bug at all.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textboost_tpu.data.tokenizer import load_tokenizer
from textboost_tpu.models import AutoencoderKL, CLIPTextModel, UNet2DCondition
from textboost_tpu.models.configs import get_spec
from textboost_tpu.models.convert import (
    convert_text_encoder,
    convert_unet,
    convert_vae,
)
from textboost_tpu.pipelines import TextToImagePipeline
from textboost_tpu.pipelines.text_to_image import to_uint8

from tests.test_torch_oracle import TorchUNet, TorchVAE

torch = pytest.importorskip("torch")

N_TRAIN = 1000
BETA_START, BETA_END = 0.00085, 0.012


def _alphas_cumprod64():
    betas = (
        np.linspace(BETA_START**0.5, BETA_END**0.5, N_TRAIN, dtype=np.float64)
        ** 2
    )
    return np.cumprod(1.0 - betas)


def _hf_text_encoder(spec):
    """HF CLIPTextModel at its own default init (the published recipe)."""
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    cfg = spec.text_encoder
    return HFModel(HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act=cfg.hidden_act,
        layer_norm_eps=cfg.layer_norm_eps,
        eos_token_id=cfg.eos_token_id,
        bos_token_id=cfg.bos_token_id,
    )).eval()


def _np_sd(mod):
    return {k: v.numpy() for k, v in mod.state_dict().items()}


def _build_pair(with_null, seed):
    """(pipeline, torch modules, null_emb): torch default-init weights,
    converted torch->flax through the real load path."""
    spec = get_spec("tiny")
    torch.manual_seed(seed)
    hf = _hf_text_encoder(spec)
    tunet = TorchUNet(spec.unet).eval()
    tvae = TorchVAE(spec.vae).eval()

    te = CLIPTextModel(spec.text_encoder, dtype=jnp.float32)
    unet = UNet2DCondition(spec.unet, dtype=jnp.float32)
    vae = AutoencoderKL(spec.vae, dtype=jnp.float32)
    ids0 = jnp.zeros((1, 77), jnp.int32)
    lat0 = jnp.zeros((1, spec.unet.sample_size, spec.unet.sample_size, 4))
    t0 = jnp.zeros((1,), jnp.int32)
    ctx0 = jnp.zeros((1, 77, spec.unet.cross_attention_dim))
    px0 = jnp.zeros((1, spec.resolution, spec.resolution, 3))
    key = jax.random.PRNGKey(0)
    te_params = convert_text_encoder(_np_sd(hf), jax.jit(te.init)(key, ids0))
    unet_params = convert_unet(
        _np_sd(tunet), jax.jit(unet.init)(key, lat0, t0, ctx0)
    )
    vae_params = convert_vae(_np_sd(tvae), jax.jit(vae.init)(key, px0, key))

    rng = np.random.default_rng(seed)
    null_emb = (
        rng.standard_normal((77, spec.text_encoder.hidden_size))
        .astype(np.float32) * 0.3
        if with_null else None
    )
    pipe = TextToImagePipeline(
        spec, load_tokenizer(None), te_params, unet_params, vae_params,
        dtype=jnp.float32, null_embedding=null_emb, fixed_special=with_null,
    )
    return spec, pipe, hf, tunet, tvae, null_emb, rng


def _encode_torch(hf, ids, null_emb, eos_id, fixed_special):
    with torch.no_grad():
        hidden = hf(torch.from_numpy(ids.astype(np.int64))).last_hidden_state
    if null_emb is not None:
        null = torch.from_numpy(null_emb.astype(np.float32))
        is_null = torch.from_numpy(ids[:, 1] == eos_id)[:, None, None]
        hidden = torch.where(is_null, null[None], hidden)
        if fixed_special:
            hidden = torch.cat(
                [null[0][None, None].expand(hidden.shape[0], 1, -1),
                 hidden[:, 1:]], dim=1,
            )
    return hidden


def _dpm_pp_2m_torch(model_fn, x, num_steps):
    """Float64-coefficient DPM-Solver++(2M) loop around a torch model —
    the same published update rule as test_sampler_oracle.dpm_pp_2m_oracle."""
    ac = _alphas_cumprod64()
    ts = (
        np.linspace(0, N_TRAIN - 1, num_steps + 1).round()[::-1][:-1]
        .astype(np.int64)
    )
    alpha = np.sqrt(ac[ts])
    sigma = np.sqrt(1.0 - ac[ts])
    lam = np.log(alpha) - np.log(sigma)
    x = x.astype(np.float64)
    m_prev = h_prev = None
    for i in range(num_steps):
        out = model_fn(x.astype(np.float32), int(ts[i])).astype(np.float64)
        x0 = (x - sigma[i] * out) / alpha[i]  # epsilon parameterization
        last = i == num_steps - 1
        a_next = 1.0 if last else alpha[i + 1]
        s_next = 0.0 if last else sigma[i + 1]
        lam_next = np.inf if last else lam[i + 1]
        h = lam_next - lam[i]
        phi = np.expm1(-h)
        if (i == 0) or last:
            x = (s_next / sigma[i]) * x - a_next * phi * x0
        else:
            d1 = (x0 - m_prev) * (h / h_prev)
            x = (s_next / sigma[i]) * x - a_next * phi * (x0 + 0.5 * d1)
        m_prev, h_prev = x0, h
    return x


def _ddim_torch(model_fn, x, num_steps):
    ac = _alphas_cumprod64()
    ratio = N_TRAIN // num_steps
    ts = (np.arange(num_steps) * ratio).round()[::-1].astype(np.int64) + 1
    alpha = np.sqrt(ac[ts])
    sigma = np.sqrt(1.0 - ac[ts])
    x = x.astype(np.float64)
    for i in range(num_steps):
        out = model_fn(x.astype(np.float32), int(ts[i])).astype(np.float64)
        x0 = (x - sigma[i] * out) / alpha[i]
        a_next = 1.0 if i == num_steps - 1 else alpha[i + 1]
        s_next = 0.0 if i == num_steps - 1 else sigma[i + 1]
        x = a_next * x0 + s_next * out
    return x


_TORCH_SAMPLERS = {"dpm++2m": _dpm_pp_2m_torch, "ddim": _ddim_torch}


def _torch_trajectory(spec, hf, tunet, tvae, pipe, prompts, latents, *,
                      sampler, guidance, null_emb, fixed_special, steps=3):
    ids = np.asarray(pipe.encode_prompts(prompts))
    eos = spec.text_encoder.eos_token_id
    hidden = _encode_torch(hf, ids, null_emb, eos, fixed_special)
    do_cfg = guidance > 1.0
    if do_cfg:
        neg_ids = np.asarray(pipe.encode_prompts([""] * len(prompts)))
        neg_hidden = _encode_torch(hf, neg_ids, null_emb, eos, fixed_special)
        ctx = torch.cat([neg_hidden, hidden], dim=0)

    def model_fn(x_np, t):
        x = torch.from_numpy(x_np).permute(0, 3, 1, 2)
        with torch.no_grad():
            if do_cfg:
                x2 = torch.cat([x, x], dim=0)
                t2 = torch.full((x2.shape[0],), t, dtype=torch.long)
                out = tunet(x2, t2, ctx)
                uncond, cond = out.chunk(2, dim=0)
                out = uncond + guidance * (cond - uncond)
            else:
                out = tunet(x, torch.full((x.shape[0],), t, dtype=torch.long),
                            hidden)
        return out.permute(0, 2, 3, 1).numpy()

    z = _TORCH_SAMPLERS[sampler](model_fn, latents, steps)
    with torch.no_grad():
        imgs = tvae.decode(
            torch.from_numpy(
                (z / spec.vae.scaling_factor).astype(np.float32)
            ).permute(0, 3, 1, 2)
        )
    return to_uint8(np.clip(imgs.permute(0, 2, 3, 1).numpy(), -1.0, 1.0))


@pytest.mark.parametrize("sampler,guidance,with_null", [
    ("dpm++2m", 7.5, False),
    ("dpm++2m", 7.5, True),   # null-embedding + fixed-BOS patch composition
    ("dpm++2m", 1.0, False),  # no-CFG branch
    ("ddim", 7.5, False),
])
def test_pipeline_matches_torch_replica(sampler, guidance, with_null):
    spec, pipe, hf, tunet, tvae, null_emb, rng = _build_pair(with_null, 11)
    prompts = ["a photo of a dog", "an oil painting of a cat"]
    s = spec.unet.sample_size
    latents = rng.standard_normal((len(prompts), s, s, 4)).astype(np.float32)

    got = pipe(prompts, num_inference_steps=3, guidance_scale=guidance,
               latents=jnp.asarray(latents), sampler=sampler)
    want = _torch_trajectory(
        spec, hf, tunet, tvae, pipe, prompts, latents, sampler=sampler,
        guidance=guidance, null_emb=null_emb, fixed_special=with_null,
    )

    assert got.shape == want.shape
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    # fp32 jax (fp32 sampler coefficients) vs torch + float64-coefficient
    # replica through 3 chained CFG'd UNet calls and a VAE decode.  At the
    # published init scales the measured disagreement is <=2/255 at a
    # handful of pixels; a composition bug (wrong CFG order/scaling/
    # patching) produces tens-to-hundreds — proven by the sensitivity
    # control below.
    assert diff.max() <= 5, (diff.max(), (diff > 1).mean())
    assert (diff > 1).mean() < 0.01, (diff.max(), (diff > 1).mean())
    assert diff.mean() < 0.2


def test_pipeline_oracle_sensitivity():
    """The tolerance above is not vacuous: a single composition error (the
    VAE latent scaling skipped — z not divided by scaling_factor) blows the
    replica comparison past any plausible noise level."""
    spec, pipe, hf, tunet, tvae, _, rng = _build_pair(False, 13)
    prompts = ["a photo of a dog"]
    s = spec.unet.sample_size
    latents = rng.standard_normal((1, s, s, 4)).astype(np.float32)
    got = pipe(prompts, num_inference_steps=1, guidance_scale=1.0,
               latents=jnp.asarray(latents), sampler="ddim")

    ids = np.asarray(pipe.encode_prompts(prompts))
    hidden = _encode_torch(hf, ids, None, spec.text_encoder.eos_token_id,
                           False)

    def model_fn(x_np, t):
        x = torch.from_numpy(x_np).permute(0, 3, 1, 2)
        with torch.no_grad():
            out = tunet(x, torch.full((1,), t, dtype=torch.long), hidden)
        return out.permute(0, 2, 3, 1).numpy()

    z = _ddim_torch(model_fn, latents, 1)
    with torch.no_grad():
        imgs = tvae.decode(  # BUG ON PURPOSE: scaling_factor not applied
            torch.from_numpy(z.astype(np.float32)).permute(0, 3, 1, 2)
        )
    wrong = to_uint8(np.clip(imgs.permute(0, 2, 3, 1).numpy(), -1.0, 1.0))
    diff = np.abs(got.astype(np.int32) - wrong.astype(np.int32))
    assert diff.max() > 30 and diff.mean() > 2.0, (diff.max(), diff.mean())
