"""The jitted TextBoost train step.

TPU-native counterpart of the reference hot loop
(/root/reference/train_textboost.py:1024-1150): VAE encode -> noise ->
text encode (null-patched) -> frozen UNet eps-pred -> masked MSE
(+ optional image-prior split-batch MSE) + knowledge-preservation loss ->
gradient surgery (original-vocab row zeroing, lora_B mixing mask,
encoder-only clip) -> AdamW (two LR groups) -> added-embedding renorm.

Everything — including the grad surgery the reference does with in-place
`.grad` mutation — is one pure, donated, GSPMD-sharded XLA program.  Data
parallelism comes from sharding the batch over the mesh "dp" axis; the
gradient all-reduce is emitted by XLA (no NCCL/DDP analogue).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..lora.partition import (
    added_embedding_norm,
    apply_mixing_mask,
    encoder_grad_norm,
    merge_lora,
    renorm_added_embeddings,
    trainable_mask,
    zero_frozen_grads,
    zero_original_vocab_rows,
)
from ..models.textboost import apply_null_embedding_patch
from ..ops.schedule import NoiseSchedule, snr_timestep_weights


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static configuration closed over by the jitted step."""

    prediction_type: str = "epsilon"
    vae_scaling: float = 0.18215
    kpl_weight: float = 0.1
    kpl_type: str = "cos"  # "cos" | "mse"
    with_image_prior: bool = False
    image_ppl_weight: float = 1.0
    # NOTE: grad clipping lives in the optimizer chain
    # (lora/partition.py::make_optimizer max_grad_norm), not here — it must
    # apply once to the ACCUMULATED grads (train_textboost.py:1128-1133).
    first_added_token_id: int = 49408
    embedding_target_norm: float = 0.0  # mean pre-training norm
    mixing: bool = False
    augment_ops: str = "object"
    weighted_timesteps: bool = False
    snr_gamma: float = 0.0  # 0 disables min-SNR loss weighting
    eos_token_id: int = 49407
    fixed_special: bool = True
    train_unet: bool = False  # --unet_params_to_train != none
    # --text_encoder_use_attention_mask: thread the tokenizer pad mask into
    # the CLIP forward (reference textboost/utils.py:11-26).
    use_attention_mask: bool = False


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TextBoostTrainState:
    step: jnp.ndarray
    te_params: Any  # trainable text-encoder params (incl. LoRA + embedding)
    opt_state: Any
    rng: jax.Array

    def tree_flatten(self):
        return (self.step, self.te_params, self.opt_state, self.rng), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


def make_train_step(
    *,
    text_encoder_apply: Callable,
    frozen_text_encoder_apply: Callable,
    unet_apply: Callable,
    vae_encode_moments: Callable,
    optimizer: optax.GradientTransformation,
    schedule: NoiseSchedule,
    config: StepConfig,
    null_embedding: Optional[jnp.ndarray],
) -> Callable:
    """Build the pure train-step function
    fn(state, batch, frozen) -> (state, metrics).

    Frozen parameter trees travel as arguments (`frozen` = dict with
    unet/vae/te keys), NOT closure constants: baking 860M UNet params into
    the jaxpr would blow up trace/compile time and duplicate them as HLO
    constants.  As arguments they stay resident in HBM across steps and
    the donated trainable state updates in place.
    """
    timestep_logits = (
        jnp.log(snr_timestep_weights(schedule)) if config.weighted_timesteps else None
    )

    def encode_text(params, input_ids, apply_fn, null_emb):
        if config.use_attention_mask:
            from ..models.clip import pad_attention_mask

            mask = pad_attention_mask(input_ids, config.eos_token_id)
            hidden, _ = apply_fn(params, input_ids, attention_mask=mask)
        else:
            hidden, _ = apply_fn(params, input_ids)
        return apply_null_embedding_patch(
            hidden, input_ids, null_emb, config.eos_token_id, config.fixed_special
        )

    def loss_fn(trainable, frozen, batch, noisy, noise, latents, timesteps):
        if config.train_unet:
            # UNet cross-attn LoRA: merge trainable adapters into the
            # frozen base so grads flow only into the adapter leaves.
            te_params = trainable["te"]
            unet_params = merge_lora(frozen["unet_base"], trainable["unet_lora"])
        else:
            te_params = trainable
            unet_params = frozen["unet"]
        # Traced input when provided (keeps the compiled step independent
        # of the init/model values); closure constant otherwise.
        null_emb = (
            frozen.get("null_embedding")
            if isinstance(frozen, dict) and "null_embedding" in frozen
            else null_embedding
        )
        hidden = encode_text(
            te_params, batch["input_ids"], text_encoder_apply, null_emb
        )
        model_pred = unet_apply(unet_params, noisy, timesteps, hidden)

        if config.prediction_type == "epsilon":
            target = noise
        else:
            target = schedule.velocity(latents, noise, timesteps)

        prior_loss = 0.0
        if config.with_image_prior:
            model_pred, model_pred_prior = jnp.split(model_pred, 2, axis=0)
            target, target_prior = jnp.split(target, 2, axis=0)
            prior_loss = jnp.mean(
                jnp.square(
                    model_pred_prior.astype(jnp.float32) - target_prior.astype(jnp.float32)
                )
            )

        sq = jnp.square(model_pred.astype(jnp.float32) - target.astype(jnp.float32))
        if config.snr_gamma > 0.0:
            # min-SNR-gamma weighting (optional extension; off by default).
            snr = schedule.snr(timesteps[: sq.shape[0]])
            w = jnp.minimum(snr, config.snr_gamma) / jnp.maximum(snr, 1e-8)
            sq = sq * w.reshape((-1,) + (1,) * (sq.ndim - 1))
        if "mask" in batch:
            mask = batch["mask"].astype(jnp.float32)
            if config.with_image_prior:
                mask = jnp.split(mask, 2, axis=0)[0]
            per = (sq * mask).sum(axis=(1, 2, 3)) / jnp.maximum(
                mask.sum(axis=(1, 2, 3)), 1e-6
            )
            loss = per.mean()
        else:
            loss = sq.mean()

        if config.with_image_prior:
            loss = loss + config.image_ppl_weight * prior_loss

        kpl = 0.0
        if config.kpl_weight > 0.0:
            prior_ids = batch["prior_input_ids"]
            tuned = encode_text(
                te_params, prior_ids, text_encoder_apply, null_emb
            ).astype(jnp.float32)
            ref = encode_text(
                frozen["te"], prior_ids, frozen_text_encoder_apply, null_emb
            ).astype(jnp.float32)
            ref = jax.lax.stop_gradient(ref)
            if config.kpl_type == "cos":
                cos = (tuned * ref).sum(-1) / jnp.maximum(
                    jnp.linalg.norm(tuned, axis=-1) * jnp.linalg.norm(ref, axis=-1),
                    1e-8,
                )
                kpl = (1.0 - cos).mean()
            else:
                kpl = jnp.mean(jnp.square(tuned - ref))
            loss = loss + config.kpl_weight * kpl

        return loss, {"den_loss": loss, "kpl": kpl, "prior_loss": prior_loss}

    def train_step(
        state: TextBoostTrainState,
        batch: Dict[str, jnp.ndarray],
        frozen: Dict[str, Any],
    ) -> Tuple[TextBoostTrainState, Dict[str, jnp.ndarray]]:
        rng, r_noise, r_t, r_vae = jax.random.split(state.rng, 4)

        pixel_values = batch["pixel_values"]
        if pixel_values.dtype == jnp.uint8:
            # Normalize on-device: uint8 ships 4x less host->device traffic.
            pixel_values = pixel_values.astype(jnp.float32) / 127.5 - 1.0
        mean, logvar = vae_encode_moments(frozen["vae"], pixel_values)
        std = jnp.exp(0.5 * logvar)
        latents = mean + std * jax.random.normal(r_vae, mean.shape, mean.dtype)
        latents = (latents * config.vae_scaling).astype(jnp.float32)

        bsz = latents.shape[0]
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        if timestep_logits is not None:
            timesteps = jax.random.categorical(
                r_t, jnp.broadcast_to(timestep_logits, (bsz,) + timestep_logits.shape)
            )
        else:
            timesteps = jax.random.randint(
                r_t, (bsz,), 0, schedule.num_train_timesteps
            )
        noisy = schedule.add_noise(latents, noise, timesteps)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.te_params, frozen, batch, noisy, noise, latents, timesteps
        )

        # ---- gradient surgery (train_textboost.py:1109-1126) ----
        grads = zero_frozen_grads(grads, trainable_mask(state.te_params))
        grads = zero_original_vocab_rows(grads, config.first_added_token_id)
        if config.mixing:
            grads = apply_mixing_mask(grads, config.augment_ops)
        # Pre-clip norm for metrics only; the encoder-only clip itself runs
        # INSIDE the optimizer chain (partition.make_optimizer) so that
        # under accumulation it applies once to the averaged grads, as the
        # reference does post-sync (train_textboost.py:1128-1133).
        grad_norm = encoder_grad_norm(grads)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.te_params)
        # Exact-freeze of original vocab rows: the reference's decoupled
        # weight decay shrinks zero-grad original embedding rows by
        # lr*wd/step as an invisible side effect (torch AdamW decays every
        # param in the group) — those rows are never exported and never
        # consumed at inference, so here they are pinned exactly.  This
        # also makes the compact checkpoint lossless (train/checkpoint.py
        # stores only added rows).  PARITY.md deviation 4.
        updates = zero_original_vocab_rows(updates, config.first_added_token_id)
        te_params = optax.apply_updates(state.te_params, updates)

        # ---- post-step embedding renorm (train_textboost.py:1138-1150) ----
        # The target norm is data-dependent (mean pre-training embedding
        # norm) — passed as a traced scalar in `frozen` so the compiled
        # step is reusable across instances/initializers; a value baked
        # into config would change the program hash (and force a full
        # recompile) whenever the initializer token changes.
        target_norm = (
            frozen.get("embedding_target_norm")
            if isinstance(frozen, dict) and "embedding_target_norm" in frozen
            else (
                config.embedding_target_norm
                if config.embedding_target_norm > 0.0
                else None
            )
        )
        if target_norm is not None:
            te_params = renorm_added_embeddings(
                te_params, config.first_added_token_id, target_norm
            )

        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "added_embedding_norm": added_embedding_norm(
                te_params, config.first_added_token_id
            ),
            **aux,
        }
        new_state = TextBoostTrainState(
            step=state.step + 1, te_params=te_params, opt_state=opt_state, rng=rng
        )
        return new_state, metrics

    return train_step
