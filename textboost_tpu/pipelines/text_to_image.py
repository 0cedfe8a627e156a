"""Text-to-image sampling pipeline (the diffusers `DiffusionPipeline`
counterpart used all over the reference: inference.py:47-112,
eval_dreambooth.py:149-267, train validation :453-531).

The whole trajectory — CLIP encode (with null-embedding patch), CFG-doubled
UNet calls inside a lax.scan sampler, VAE decode — is ONE jitted XLA
program, cached per (batch, steps, size, sampler, guidance) signature.
Classifier-free guidance uses the empty prompt, which under the TextBoost
null patch resolves to the cached frozen-encoder embedding
(text_encoder.py:71-79 semantics).
"""
from __future__ import annotations

import functools
import logging
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.tokenizer import tokenize_prompt
from ..models import (
    AutoencoderKL,
    CLIPTextModel,
    UNet2DCondition,
    apply_null_embedding_patch,
    get_spec,
)
from ..ops.schedule import NoiseSchedule
from ..samplers import get_sampler

logger = logging.getLogger("textboost_tpu")


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[-1,1] float images -> uint8 (the pipeline's output convention).

    Single source of truth for the conversion — the trainer's validation
    writer uses it on device arrays fetched in the background."""
    images = np.asarray(images)
    return ((images + 1.0) * 127.5).round().clip(0, 255).astype(np.uint8)


def build_sample_program(spec, text_encoder, unet, vae, schedule, *,
                         steps: int, do_cfg: bool, sampler_name: str,
                         fixed_special: bool):
    """The whole-trajectory sampler program (CLIP encode -> CFG-doubled
    UNet lax.scan -> VAE decode) as a pure function of its arrays.

    Shared by the pipeline's lazy jit and the background sampler AOT
    (train/aot.py::launch_sampler_aot): the null embedding rides as a
    TRACED argument (not a closure constant), so the program is
    shape-in/shape-out — byte-identical across instances/runs and
    lowerable before any model weights exist."""
    sampler = get_sampler(sampler_name)

    def fn(te_params, unet_params, vae_params, ids, neg_ids, latents,
           guidance, null_emb):
        hidden, _ = text_encoder.apply(te_params, ids)
        hidden = apply_null_embedding_patch(
            hidden, ids, null_emb,
            spec.text_encoder.eos_token_id, fixed_special,
        )
        if do_cfg:
            neg_hidden, _ = text_encoder.apply(te_params, neg_ids)
            neg_hidden = apply_null_embedding_patch(
                neg_hidden, neg_ids, null_emb,
                spec.text_encoder.eos_token_id, fixed_special,
            )
            ctx = jnp.concatenate([neg_hidden, hidden], axis=0)

            def model_fn(x, t):
                x2 = jnp.concatenate([x, x], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                out = unet.apply(unet_params, x2, t2, ctx)
                uncond, cond = jnp.split(out, 2, axis=0)
                return uncond + guidance * (cond - uncond)

        else:

            def model_fn(x, t):
                return unet.apply(unet_params, x, t, hidden)

        z = sampler(model_fn, schedule, latents, steps)
        images = vae.apply(
            vae_params, z / spec.vae.scaling_factor, method="decode"
        )
        return jnp.clip(images.astype(jnp.float32), -1.0, 1.0)

    return fn


class TextToImagePipeline:
    def __init__(
        self,
        spec,
        tokenizer,
        te_params,
        unet_params,
        vae_params,
        *,
        null_embedding: Optional[np.ndarray] = None,
        fixed_special: bool = False,
        lora_rank: int = 0,
        unet_lora_rank: int = 0,
        vocab_size: Optional[int] = None,
        dtype=jnp.bfloat16,
        mesh=None,
    ):
        if isinstance(spec, str):
            spec = get_spec(spec)
        self.spec = spec
        # Optional dp mesh: generation batches shard over devices (params
        # replicated, batch dim split; XLA emits the collective-free
        # embarrassingly-parallel program) — SURVEY §7 step 5: eval
        # generation data-parallel across the slice.
        self.mesh = mesh
        self._mesh_placed = False
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.text_encoder = CLIPTextModel(
            spec.text_encoder,
            lora_rank=lora_rank,
            dtype=dtype,
            vocab_size_override=vocab_size,
        )
        # cross_lora_rank must match the param tree: flax SILENTLY ignores
        # extra leaves, so a crossattn_kv-trained tree applied through a
        # LoRA-less module would drop the trained UNet deltas.
        self.unet = UNet2DCondition(
            spec.unet, dtype=dtype, cross_lora_rank=unet_lora_rank
        )
        self.vae = AutoencoderKL(spec.vae, dtype=dtype)
        self.te_params = te_params
        self.unet_params = unet_params
        self.vae_params = vae_params
        self.null_embedding = (
            jnp.asarray(null_embedding) if null_embedding is not None else None
        )
        self.fixed_special = fixed_special
        self.schedule = NoiseSchedule.create(
            num_train_timesteps=spec.scheduler.num_train_timesteps,
            beta_start=spec.scheduler.beta_start,
            beta_end=spec.scheduler.beta_end,
            beta_schedule=spec.scheduler.beta_schedule,
            prediction_type=spec.scheduler.prediction_type,
        )

    # ------------------------------------------------------------------
    @classmethod
    def from_random(cls, spec_name: str, seed: int = 0, dtype=jnp.bfloat16, **kw):
        """Random-init pipeline for offline/bench use (no pretrained
        weights exist in zero-egress environments)."""
        from ..data.tokenizer import load_tokenizer

        spec = get_spec(spec_name)
        rng = jax.random.PRNGKey(seed)
        tok = load_tokenizer(None)
        te = CLIPTextModel(spec.text_encoder, dtype=dtype, lora_rank=kw.get("lora_rank", 0))
        unet = UNet2DCondition(spec.unet, dtype=dtype)
        vae = AutoencoderKL(spec.vae, dtype=dtype)
        ids = jnp.zeros((1, 77), jnp.int32)
        lat = jnp.zeros((1, spec.unet.sample_size, spec.unet.sample_size, 4))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, 77, spec.unet.cross_attention_dim))
        px = jnp.zeros((1, spec.resolution, spec.resolution, 3))
        r1, r2, r3 = jax.random.split(rng, 3)
        return cls(
            spec,
            tok,
            jax.jit(te.init)(r1, ids),
            jax.jit(unet.init)(r2, lat, t, ctx),
            jax.jit(vae.init)(r3, px, r3),
            **kw,
        )

    # ------------------------------------------------------------------
    def encode_prompts(self, prompts: Sequence[str]) -> np.ndarray:
        return tokenize_prompt(self.tokenizer, list(prompts))

    @functools.lru_cache(maxsize=32)
    def _sample_fn(self, batch: int, height: int, width: int, steps: int,
                   do_cfg: bool, sampler_name: str):
        return jax.jit(
            build_sample_program(
                self.spec, self.text_encoder, self.unet, self.vae,
                self.schedule, steps=steps, do_cfg=do_cfg,
                sampler_name=sampler_name, fixed_special=self.fixed_special,
            )
        )

    def install_aot(self, key, compiled) -> None:
        """Install a background-compiled sampler executable (train/aot.py)
        for the `(batch, height, width, steps, do_cfg, sampler)` signature.
        __call__ prefers it over the lazy jit; any call-time mismatch
        (sharding/layout/shape) falls back to the jit path."""
        if not hasattr(self, "_aot"):
            self._aot = {}
        self._aot[tuple(key)] = compiled

    # ------------------------------------------------------------------
    def __call__(
        self,
        prompt: Union[str, Sequence[str]],
        *,
        negative_prompt: str = "",
        num_inference_steps: int = 25,
        guidance_scale: float = 7.5,
        height: Optional[int] = None,
        width: Optional[int] = None,
        seed: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        sampler: str = "dpm++2m",
        output_type: str = "uint8",
    ) -> np.ndarray:
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        batch = len(prompts)
        height = height or self.spec.resolution
        width = width or self.spec.resolution
        lh, lw = height // 8, width // 8

        ids = jnp.asarray(self.encode_prompts(prompts))
        neg_ids = jnp.asarray(
            self.encode_prompts([negative_prompt] * batch)
        )
        if latents is None:
            if rng is None:
                rng = jax.random.PRNGKey(0 if seed is None else seed)
            latents = jax.random.normal(rng, (batch, lh, lw, 4), dtype=jnp.float32)
        else:
            latents = jnp.asarray(latents)
            if latents.ndim == 3:
                latents = jnp.broadcast_to(latents[None], (batch,) + latents.shape)

        do_cfg = guidance_scale > 1.0
        guidance = jnp.float32(guidance_scale)
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            rep = replicated(self.mesh)
            if not self._mesh_placed:
                self.te_params = jax.device_put(self.te_params, rep)
                self.unet_params = jax.device_put(self.unet_params, rep)
                self.vae_params = jax.device_put(self.vae_params, rep)
                if self.null_embedding is not None:
                    self.null_embedding = jax.device_put(
                        self.null_embedding, rep
                    )
                self._mesh_placed = True
            ids = jax.device_put(ids, batch_sharding(self.mesh, ids.ndim))
            neg_ids = jax.device_put(neg_ids, batch_sharding(self.mesh, neg_ids.ndim))
            latents = jax.device_put(
                latents, batch_sharding(self.mesh, latents.ndim)
            )
            guidance = jax.device_put(guidance, rep)
        key = (batch, height, width, num_inference_steps, do_cfg, sampler)
        args = (
            self.te_params, self.unet_params, self.vae_params,
            ids, neg_ids, latents, guidance, self.null_embedding,
        )
        compiled = getattr(self, "_aot", {}).get(key)
        images = None
        if compiled is not None:
            try:
                images = compiled(*args)
            except TypeError as e:
                # Signature mismatch: the AOT executable was lowered for
                # different shapes/shardings. Permanent for this key — drop it.
                logger.info(
                    "sampler AOT mismatch for %s (%s); using plain jit",
                    key, repr(e)[:200],
                )
                self._aot.pop(key, None)
            except Exception as e:  # noqa: BLE001 — runtime failure
                # Possibly transient (a degraded-relay execution error):
                # keep the executable so the next round retries the fast
                # path — recompiling via the jit fallback would put a
                # ~65-75 s sampler compile on the loop clock.  But not all
                # non-TypeError failures are transient (an input-sharding
                # or device mismatch raises XlaRuntimeError every time), so
                # cap the retries: after a second consecutive failure the
                # executable is dropped for good.
                fails = getattr(self, "_aot_failures", {})
                self._aot_failures = fails
                fails[key] = fails.get(key, 0) + 1
                if fails[key] >= 2:
                    logger.warning(
                        "sampler AOT for %s failed %d consecutive calls "
                        "(%s); dropping it — later rounds use plain jit",
                        key, fails[key], repr(e)[:200],
                    )
                    self._aot.pop(key, None)
                    fails.pop(key, None)
                else:
                    logger.warning(
                        "sampler AOT execution failed for %s (%s); "
                        "falling back to plain jit for this call",
                        key, repr(e)[:200],
                    )
        if images is not None:
            getattr(self, "_aot_failures", {}).pop(key, None)
        if images is None:
            images = self._sample_fn(*key)(*args)
        if output_type == "device":
            # Raw device array, float [-1,1]: lets callers overlap the d2h
            # fetch (slow over the tunnel) with other work — see
            # trainer.run_validation's background writer.
            return images
        images = np.asarray(images)
        if output_type == "uint8":
            return to_uint8(images)
        return images

    # ------------------------------------------------------------------
    def compute_null_embedding(self, prompt: str = "") -> np.ndarray:
        """Frozen-encoder output of `prompt` (default empty = the null
        embedding) — regenerates the reference's cached assets
        (assets/null_emb_*.pt / start_emb_*.pt) natively."""
        ids = jnp.asarray(self.encode_prompts([prompt]))
        hidden, _ = jax.jit(self.text_encoder.apply)(self.te_params, ids)
        return np.asarray(hidden[0], dtype=np.float32)
