"""Multi-chip validation at REAL model shapes without real params.

The dp-only dry run executes the tiny spec; that proves the step's mesh
plumbing but not that the TP partition rules survive sd15 head/channel
dimensions (an indivisible axis or an unmatched rule first appears at real
dims — VERDICT r4 weak #3).  Lowering catches sharding-spec failures
without paying a full XLA compile or materializing the 1.2 GB of sd15
parameters: every argument is a `jax.ShapeDtypeStruct` carrying its
intended `NamedSharding`, and `jax.eval_shape` derives all param/optimizer
trees abstractly.

Used by `__graft_entry__.dryrun_multichip` (driver hook) and
tests/test_multichip_sd15.py (8-device virtual CPU mesh).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..lora.partition import make_optimizer
from ..models import CLIPTextModel, get_spec
from ..models.unet import UNet2DCondition
from ..models.vae import AutoencoderKL
from ..ops.schedule import NoiseSchedule
from ..train.step import StepConfig, TextBoostTrainState, make_train_step
from .mesh import batch_sharding, param_sharding, replicated, tp_rule_report


def _with_shardings(shapes, shardings):
    return jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        shapes,
        shardings,
    )


def _replicated_sds(shapes, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep), shapes
    )


def lower_train_step_at_shape(
    mesh: Mesh,
    preset: str = "sd15",
    batch: int = 8,
    resolution: int = 512,
    lora_rank: int = 4,
    dtype=jnp.bfloat16,
) -> Tuple[object, dict]:
    """Trace + lower the full train step over `mesh` at `preset`'s real
    dimensions.  Returns (lowered, report) where report holds the TP-rule
    match counts and any matched-but-indivisible leaves.

    Raises if sharding specs are inconsistent with the mesh or shapes —
    the failure class this validation exists to catch.
    """
    spec = get_spec(preset)
    rng = jax.random.PRNGKey(0)
    ids0 = jnp.zeros((1, 77), jnp.int32)

    te = CLIPTextModel(spec.text_encoder, lora_rank=lora_rank, dtype=dtype)
    frozen_te = CLIPTextModel(spec.text_encoder, dtype=dtype)
    unet = UNet2DCondition(spec.unet, dtype=dtype)
    vae = AutoencoderKL(spec.vae, dtype=dtype)

    lat = resolution // 8
    te_shapes = jax.eval_shape(te.init, rng, ids0)
    unet_shapes = jax.eval_shape(
        unet.init,
        rng,
        jnp.zeros((1, lat, lat, 4), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, spec.unet.cross_attention_dim), jnp.float32),
    )
    vae_shapes = jax.eval_shape(
        vae.init, rng, jnp.zeros((1, resolution, resolution, 3), jnp.float32), rng
    )

    optimizer = make_optimizer(1e-4, 1e-3, te_shapes, max_grad_norm=1.0)
    opt_shapes = jax.eval_shape(optimizer.init, te_shapes)

    schedule = NoiseSchedule.create(
        beta_start=spec.scheduler.beta_start,
        beta_end=spec.scheduler.beta_end,
        beta_schedule=spec.scheduler.beta_schedule,
        prediction_type=spec.scheduler.prediction_type,
    )
    config = StepConfig(
        prediction_type=spec.scheduler.prediction_type,
        vae_scaling=spec.vae.scaling_factor,
        kpl_weight=0.1,
        first_added_token_id=spec.text_encoder.vocab_size - 1,
        embedding_target_norm=0.15,
    )
    step = make_train_step(
        text_encoder_apply=te.apply,
        frozen_text_encoder_apply=frozen_te.apply,
        unet_apply=unet.apply,
        vae_encode_moments=lambda p, x: vae.apply(p, x, method="encode_moments"),
        optimizer=optimizer,
        schedule=schedule,
        config=config,
        null_embedding=jnp.zeros((77, spec.text_encoder.hidden_size)),
    )

    # Shardings: frozen UNet/TE tensor-parallel, VAE replicated-or-dp,
    # trainable state replicated, batch over dp — the production layout.
    frozen_sds = {
        "unet": _with_shardings(
            unet_shapes, param_sharding(unet_shapes, mesh, tensor_parallel=True)
        ),
        "vae": _with_shardings(
            vae_shapes, param_sharding(vae_shapes, mesh, tensor_parallel=False)
        ),
        "te": _with_shardings(
            te_shapes, param_sharding(te_shapes, mesh, tensor_parallel=True)
        ),
    }
    state_sds = TextBoostTrainState(
        step=_replicated_sds(jax.eval_shape(lambda: jnp.zeros((), jnp.int32)), mesh),
        te_params=_replicated_sds(te_shapes, mesh),
        opt_state=_replicated_sds(opt_shapes, mesh),
        rng=_replicated_sds(jax.eval_shape(lambda: jax.random.PRNGKey(0)), mesh),
    )
    batch_sds = {
        "pixel_values": jax.ShapeDtypeStruct(
            (batch, resolution, resolution, 3), jnp.uint8,
            sharding=batch_sharding(mesh, 4),
        ),
        "input_ids": jax.ShapeDtypeStruct(
            (batch, 77), jnp.int32, sharding=batch_sharding(mesh, 2)
        ),
        "prior_input_ids": jax.ShapeDtypeStruct(
            (batch, 77), jnp.int32, sharding=batch_sharding(mesh, 2)
        ),
    }

    rep = replicated(mesh)
    jit_step = jax.jit(step, donate_argnums=(0,), out_shardings=(rep, rep))
    with mesh:
        lowered = jit_step.lower(state_sds, batch_sds, frozen_sds)

    counts_unet, indiv_unet = tp_rule_report(unet_shapes, mesh)
    counts_te, indiv_te = tp_rule_report(te_shapes, mesh)
    counts = {
        p: counts_unet.get(p, 0) + counts_te.get(p, 0) for p in counts_unet
    }
    report = {
        "mesh": dict(mesh.shape),
        "preset": preset,
        "batch": batch,
        "resolution": resolution,
        "tp_rule_matches": counts,
        "indivisible": {**indiv_unet, **indiv_te},
    }
    return lowered, report


def validate_tp_rules_at_shape(mesh: Mesh, preset: str = "sd15") -> dict:
    """Assert every TP rule fires at `preset` dims with nothing indivisible
    (only meaningful on a tp>1 mesh).  Returns the report."""
    lowered, report = lower_train_step_at_shape(mesh, preset)
    assert lowered is not None
    if mesh.shape.get("tp", 1) > 1:
        dead = [p for p, n in report["tp_rule_matches"].items() if n == 0]
        assert not dead, f"TP rules never matched at {preset} dims: {dead}"
        assert not report["indivisible"], (
            f"leaves matched a TP rule but can't divide by tp="
            f"{mesh.shape['tp']}: {report['indivisible']}"
        )
    return report
