"""Background AOT compilation of the train step.

The compiled train step is pure shape-in/shape-out: every data-dependent
value (grown embedding matrix, null embedding, target norm) is a traced
input, so the program can be lowered and compiled from ShapeDtypeStructs
alone — BEFORE any model weights exist.  On the tunneled TPU the step
compile/cache-load costs 25-170 s; launching it in a daemon thread at
setup start overlaps it with model-init compiles and the relay's
first-sync tax instead of serializing after them.

The thread builds its OWN module/optimizer/schedule instances from
(config, spec) — flax modules are cheap config dataclasses, and two
identically-configured instances trace to the identical HLO, so the
executable it produces is exactly the one the normal jit path would
compile.  If anything mismatches at call time the trainer falls back to
its plain jit (which then hits the persistent cache this thread wrote).
"""
from __future__ import annotations

import logging
import threading
from typing import Any, Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger("textboost_tpu")


class StepAot:
    """Holder for the background compile result."""

    def __init__(self, name: str = "step AOT"):
        self.name = name
        self._done = threading.Event()
        self._compiled = None
        self._error: Optional[str] = None

    def result(self, timeout: float = 900.0):
        """The compiled executable, or None (not ready in time / failed)."""
        if not self._done.wait(timeout):
            logger.info("%s: not ready after %.0fs; using plain jit",
                        self.name, timeout)
            return None
        if self._compiled is None and self._error:
            logger.info("%s failed (%s); using plain jit", self.name, self._error)
        return self._compiled


def build_step_config(cfg, spec, first_added_id: int):
    """The StepConfig both the trainer and the AOT thread must share —
    byte-identical config ⇒ byte-identical traced program."""
    from .step import StepConfig

    return StepConfig(
        train_unet=cfg.unet_params_to_train == "crossattn_kv",
        prediction_type=spec.scheduler.prediction_type,
        vae_scaling=spec.vae.scaling_factor,
        kpl_weight=cfg.kpl_weight,
        kpl_type=cfg.kpl_type,
        with_image_prior=cfg.with_image_prior,
        image_ppl_weight=cfg.image_ppl_weight,
        first_added_token_id=first_added_id,
        # Travels as a traced scalar in `frozen`; 0.0 here keeps the
        # config (and so the program hash) instance-independent.
        embedding_target_norm=0.0,
        mixing=cfg.mixing,
        augment_ops=cfg.augment_ops,
        weighted_timesteps=not cfg.disable_weighted_sample,
        eos_token_id=spec.text_encoder.eos_token_id,
        use_attention_mask=cfg.text_encoder_use_attention_mask,
    )


# Process-level executable memo: an in-process sequential sweep
# (run_textboost_db.py --sequential / utils/sweep.run_job) constructs a
# fresh Trainer per instance, but the compiled step/sampler are pure
# shape-in/shape-out — every per-instance value (weights, ids, target
# norm, null embedding) is a traced argument.  Re-serving the SAME
# executable skips the 25-170 s relay compile (or ~90 s persistent-cache
# deserialize) that each instance would otherwise re-pay.  Bounded:
# oldest entries are evicted past _AOT_MEMO_MAX so an in-process
# ABLATION sweep (each lr/bs/weight variant splits the key) doesn't pin
# every whole-step executable it ever compiled until process exit.
_AOT_MEMO: dict = {}
_AOT_MEMO_MAX = 6


def _memo_put(key, holder) -> None:
    while len(_AOT_MEMO) >= _AOT_MEMO_MAX:
        evicted = next(iter(_AOT_MEMO))
        _AOT_MEMO.pop(evicted)  # the holder itself stays valid for users
    _AOT_MEMO[key] = holder


# Config fields that CANNOT affect the compiled program: host-side paths,
# token strings (the program sees only vocab_size / first_added_id, which
# the memo key carries explicitly), trackers, and resume state (state
# shapes are fixed by the rest of the config).  Everything else — batch
# size, resolution, LR schedule, loss weights, precision, remat — stays in
# the key, so an unlisted new config field conservatively splits the cache
# rather than aliasing two different programs.
_PER_INSTANCE_FIELDS = frozenset({
    "instance_data_dir", "class_data_dir", "output_dir", "logging_dir",
    "placeholder_token", "instance_token", "initializer_token",
    "class_token", "concepts_list", "resume_from_checkpoint",
    "human_prompts_path", "report_to", "null_embedding_path",
})


def _memo_key(kind, cfg, spec, mesh, dtype, *extra):
    import dataclasses

    cfg_d = dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) else vars(cfg)
    cfg_items = tuple(
        (k, repr(v)) for k, v in sorted(cfg_d.items())
        if k not in _PER_INSTANCE_FIELDS
    )
    mesh_key = (
        tuple(mesh.axis_names),
        tuple(mesh.devices.shape),
        tuple(d.id for d in mesh.devices.flat),
    )
    return (kind, cfg_items, repr(spec), mesh_key, str(dtype), extra)


def launch_step_aot(cfg, spec, *, vocab_size: int, first_added_id: int,
                    mesh, dtype, allow_cpu: bool = False) -> Optional[StepAot]:
    """Start the background compile; returns None when the configuration
    is outside the supported envelope (the trainer then just uses its
    plain jit path).  allow_cpu (tests): compile on the CPU backend too."""
    if (
        cfg.unet_params_to_train != "none"
        or cfg.with_image_prior
        or cfg.mesh_tp > 1
        # The trainer's first-step swap runs exactly one micro-batch, which
        # only equals one counted step without accumulation.
        or cfg.gradient_accumulation_steps > 1
        or jax.process_count() > 1
        or (jax.default_backend() != "tpu" and not allow_cpu)
    ):
        return None

    key = _memo_key("step", cfg, spec, mesh, dtype, vocab_size, first_added_id)
    cached = _AOT_MEMO.get(key)
    if cached is not None:
        logger.info("step AOT: reusing this process's compiled executable")
        return cached

    holder = StepAot()
    _memo_put(key, holder)

    def _build():
        try:
            holder._compiled = _compile_step(
                cfg, spec, vocab_size, first_added_id, mesh, dtype
            )
        except Exception as e:  # noqa: BLE001 — fallback path must survive
            holder._error = repr(e)[:200]
            _AOT_MEMO.pop(key, None)  # let a later instance retry
        finally:
            holder._done.set()

    threading.Thread(target=_build, daemon=True, name="step-aot").start()
    return holder


def _compile_step(cfg, spec, vocab_size, first_added_id, mesh, dtype) -> Any:
    from ..lora.partition import lr_schedule, make_optimizer
    from ..models import CLIPTextModel, UNet2DCondition
    from ..models.vae import AutoencoderKL
    from ..ops.schedule import NoiseSchedule
    from ..parallel.mesh import batch_sharding, replicated
    from .step import TextBoostTrainState, make_train_step

    rep = replicated(mesh)

    # Modules: mirror load_models + trainer construction exactly.
    text_encoder = CLIPTextModel(
        spec.text_encoder,
        lora_rank=cfg.lora_rank,
        dtype=dtype,
        vocab_size_override=vocab_size,
    )
    frozen_te = CLIPTextModel(spec.text_encoder, dtype=dtype)
    bundle_te = CLIPTextModel(spec.text_encoder, lora_rank=cfg.lora_rank, dtype=dtype)
    unet = UNet2DCondition(spec.unet, dtype=dtype, remat=cfg.gradient_checkpointing)
    vae = AutoencoderKL(
        spec.vae, dtype=jnp.float32 if cfg.vae_fp32 else dtype
    )

    key = jax.random.PRNGKey(0)
    ids1 = jnp.zeros((1, 77), jnp.int32)

    def sds(tree, sharding):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding),
            tree,
        )

    te_abs = jax.eval_shape(text_encoder.init, key, ids1)
    # Trainable embedding matrix is promoted to f32 by the setup program.
    te_abs = jax.tree.map(lambda x: x, te_abs)
    te_abs["params"] = dict(te_abs["params"])
    emb = te_abs["params"]["token_embedding"]
    te_abs["params"]["token_embedding"] = jax.ShapeDtypeStruct(
        emb.shape, jnp.float32
    )
    frozen_te_abs = {"params": dict(jax.eval_shape(bundle_te.init, key, ids1)["params"])}
    unet_abs = jax.eval_shape(
        unet.init,
        key,
        jnp.zeros((1, spec.unet.sample_size, spec.unet.sample_size, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, spec.unet.cross_attention_dim)),
    )
    vae_abs = jax.eval_shape(vae.init, key, jnp.zeros((1, 64, 64, 3)), key)

    lr, emb_lr = cfg.learning_rate, cfg.emb_learning_rate
    if cfg.scale_lr:
        scale = (
            cfg.gradient_accumulation_steps
            * cfg.train_batch_size
            * jax.process_count()
        )
        lr, emb_lr = lr * scale, emb_lr * scale
    optimizer = make_optimizer(
        lr_schedule(cfg.lr_scheduler, lr, cfg.lr_warmup_steps, cfg.max_train_steps),
        lr_schedule(
            cfg.lr_scheduler, emb_lr, cfg.lr_warmup_steps, cfg.max_train_steps
        ),
        te_abs,
        beta1=cfg.adam_beta1,
        beta2=cfg.adam_beta2,
        weight_decay=cfg.adam_weight_decay,
        eps=cfg.adam_epsilon,
        accumulate_steps=cfg.gradient_accumulation_steps,
        max_grad_norm=cfg.max_grad_norm,
    )
    schedule = NoiseSchedule.create(
        num_train_timesteps=spec.scheduler.num_train_timesteps,
        beta_start=spec.scheduler.beta_start,
        beta_end=spec.scheduler.beta_end,
        beta_schedule=spec.scheduler.beta_schedule,
        prediction_type=spec.scheduler.prediction_type,
    )
    config = build_step_config(cfg, spec, first_added_id)
    raw_step = make_train_step(
        text_encoder_apply=text_encoder.apply,
        frozen_text_encoder_apply=frozen_te.apply,
        unet_apply=unet.apply,
        vae_encode_moments=lambda p, x: vae.apply(p, x, method="encode_moments"),
        optimizer=optimizer,
        schedule=schedule,
        config=config,
        null_embedding=None,  # travels in `frozen`
    )

    opt_abs = jax.eval_shape(optimizer.init, te_abs)
    rng_abs = jax.eval_shape(lambda: jax.random.PRNGKey(cfg.seed))
    state_abs = TextBoostTrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32, sharding=rep),
        te_params=sds(te_abs, rep),
        opt_state=sds(opt_abs, rep),
        rng=jax.ShapeDtypeStruct(rng_abs.shape, rng_abs.dtype, sharding=rep),
    )
    frozen_abs = {
        "unet": sds(unet_abs, rep),
        "vae": sds(vae_abs, rep),
        "te": sds(frozen_te_abs, rep),
        "embedding_target_norm": jax.ShapeDtypeStruct((), jnp.float32, sharding=rep),
        "null_embedding": jax.ShapeDtypeStruct(
            (
                spec.text_encoder.max_position_embeddings,
                spec.text_encoder.hidden_size,
            ),
            jnp.float32,
            sharding=rep,
        ),
    }
    b = cfg.train_batch_size // jax.process_count()
    res = cfg.resolution
    batch_abs = {
        "pixel_values": jax.ShapeDtypeStruct(
            (b, res, res, 3), jnp.uint8, sharding=batch_sharding(mesh, 4)
        ),
        "input_ids": jax.ShapeDtypeStruct(
            (b, 77), jnp.int32, sharding=batch_sharding(mesh, 2)
        ),
        "prior_input_ids": jax.ShapeDtypeStruct(
            (b, 77), jnp.int32, sharding=batch_sharding(mesh, 2)
        ),
    }

    jit_step = jax.jit(raw_step, donate_argnums=(0,), out_shardings=(rep, rep))
    lowered = jit_step.lower(state_abs, batch_abs, frozen_abs)
    # Fingerprint the lowered program so two runs can PROVE they compiled
    # the same step (cross-instance compile reuse, the sweep-throughput
    # claim): instance tokens/initializers ride `frozen` as traced values,
    # so different instances must log identical fingerprints.  bench.py
    # --mode sweep2 asserts this from the training.log of two real runs.
    try:
        # Hash the stablehlo TEXT, not the serialized module proto: the
        # proto embeds a process-unique module id, so even byte-identical
        # programs hash differently.  The text is canonical — the
        # compile-reuse tests prove it instance-invariant.
        import hashlib

        text = lowered.as_text()
        logger.info(
            "step AOT: HLO fingerprint %s",
            hashlib.sha256(text.encode()).hexdigest()[:16],
        )
        del text
    except Exception:  # noqa: BLE001 — diagnostics only
        pass
    compiled = lowered.compile()
    logger.info("step AOT: compiled in background")
    return compiled


# ----------------------------------------------------------------------
# Validation-sampler AOT.
#
# The 25-step validation sampler (CLIP encode + CFG-doubled UNet scan +
# VAE decode) costs a ~65-75 s compile on the tunneled relay, paid at
# validation round 1 ON the loop clock — and the persistent cache's
# >120 s threshold deliberately excludes it (deserializing mid-size
# programs through the relay is slower than recompiling them).  Like the
# train step, the program is pure shape-in/shape-out (the null embedding
# rides as a traced argument, pipelines/text_to_image.py::
# build_sample_program), so it can compile in a daemon thread from
# setup start; trainer._validation_pipe installs the executable into the
# cached validation pipeline.


def validation_signature(cfg, spec):
    """The (batch, h, w, steps, do_cfg, sampler) key run_validation's
    pipeline call will use — the contract between the AOT compile and
    pipeline.install_aot.  None when validation is off."""
    if not (cfg.validation_prompts and cfg.validation_steps):
        return None
    batch = len(cfg.validation_prompts) * max(cfg.num_validation_images, 1)
    res = spec.resolution
    # run_validation hardcodes 25 steps / CFG 7.5 (train_textboost.py:508).
    return (batch, res, res, 25, True, cfg.validation_scheduler)


def validation_mesh_ok(cfg, spec, mesh) -> bool:
    """Whether the validation batch can shard over `mesh`'s dp axis.

    The SINGLE sharding-envelope predicate shared by launch_sampler_aot
    (what the AOT executable is lowered for) and trainer._validation_mesh
    (what the cached pipeline shards over) — one definition so the two can
    never diverge and hand the pipeline a mesh the executable wasn't
    compiled for."""
    sig = validation_signature(cfg, spec)
    return (
        sig is not None
        and cfg.mesh_tp <= 1
        and jax.process_count() == 1
        and sig[0] % mesh.shape["dp"] == 0
    )


def launch_sampler_aot(cfg, spec, *, vocab_size: int, mesh, dtype,
                       allow_cpu: bool = False) -> Optional[StepAot]:
    """Background-compile the validation sampler; None when validation is
    off or the configuration is outside the supported envelope (the
    pipeline then compiles lazily at round 1, as before)."""
    sig = validation_signature(cfg, spec)
    if not validation_mesh_ok(cfg, spec, mesh) or (
        jax.default_backend() != "tpu" and not allow_cpu
    ):
        return None

    key = _memo_key("sampler", cfg, spec, mesh, dtype, vocab_size, sig)
    cached = _AOT_MEMO.get(key)
    if cached is not None:
        logger.info("sampler AOT: reusing this process's compiled executable")
        return cached

    holder = StepAot(name="sampler AOT")
    _memo_put(key, holder)

    def _build():
        try:
            holder._compiled = _compile_sampler(cfg, spec, vocab_size, mesh, dtype, sig)
        except Exception as e:  # noqa: BLE001 — fallback path must survive
            holder._error = repr(e)[:200]
            _AOT_MEMO.pop(key, None)  # let a later instance retry
        finally:
            holder._done.set()

    threading.Thread(target=_build, daemon=True, name="sampler-aot").start()
    return holder


def _compile_sampler(cfg, spec, vocab_size, mesh, dtype, sig) -> Any:
    compiled = _lower_sampler(cfg, spec, vocab_size, mesh, dtype, sig).compile()
    logger.info("sampler AOT: compiled in background")
    return compiled


def _lower_sampler(cfg, spec, vocab_size, mesh, dtype, sig):
    from ..models import CLIPTextModel, UNet2DCondition
    from ..models.vae import AutoencoderKL
    from ..ops.schedule import NoiseSchedule
    from ..parallel.mesh import batch_sharding, replicated
    from ..pipelines.text_to_image import build_sample_program

    batch, height, width, steps, do_cfg, sampler_name = sig
    rep = replicated(mesh)
    bsh = lambda ndim: batch_sharding(mesh, ndim)  # noqa: E731

    # Modules: mirror trainer.make_pipeline exactly (validation pipelines
    # are built without remat; the VAE runs in the pipeline dtype).
    train_unet = cfg.unet_params_to_train == "crossattn_kv"
    text_encoder = CLIPTextModel(
        spec.text_encoder,
        lora_rank=cfg.lora_rank,
        dtype=dtype,
        vocab_size_override=vocab_size,
    )
    unet = UNet2DCondition(
        spec.unet, dtype=dtype,
        cross_lora_rank=cfg.lora_rank if train_unet else 0,
    )
    vae = AutoencoderKL(spec.vae, dtype=dtype)
    # Param SHAPES/dtypes mirror the trainer's actual vae_params, which
    # load in f32 under --vae_fp32 (the compute module above still runs
    # in the pipeline dtype, like make_pipeline does).
    vae_abs_module = (
        AutoencoderKL(spec.vae, dtype=jnp.float32) if cfg.vae_fp32 else vae
    )
    schedule = NoiseSchedule.create(
        num_train_timesteps=spec.scheduler.num_train_timesteps,
        beta_start=spec.scheduler.beta_start,
        beta_end=spec.scheduler.beta_end,
        beta_schedule=spec.scheduler.beta_schedule,
        prediction_type=spec.scheduler.prediction_type,
    )

    key = jax.random.PRNGKey(0)
    ids1 = jnp.zeros((1, 77), jnp.int32)

    def sds(tree, sharding):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding),
            tree,
        )

    # The trainable TE tree the pipeline will be handed: token_embedding
    # promoted to f32 by the merged setup program.
    te_abs = jax.eval_shape(text_encoder.init, key, ids1)
    te_abs["params"] = dict(te_abs["params"])
    emb = te_abs["params"]["token_embedding"]
    te_abs["params"]["token_embedding"] = jax.ShapeDtypeStruct(
        emb.shape, jnp.float32
    )
    unet_abs = jax.eval_shape(
        unet.init,
        key,
        jnp.zeros((1, spec.unet.sample_size, spec.unet.sample_size, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, spec.unet.cross_attention_dim)),
    )
    vae_abs = jax.eval_shape(
        vae_abs_module.init, key, jnp.zeros((1, 64, 64, 3)), key
    )

    fn = build_sample_program(
        spec, text_encoder, unet, vae, schedule,
        steps=steps, do_cfg=do_cfg, sampler_name=sampler_name,
        fixed_special=True,
    )
    args_abs = (
        sds(te_abs, rep),
        sds(unet_abs, rep),
        sds(vae_abs, rep),
        jax.ShapeDtypeStruct((batch, 77), jnp.int32, sharding=bsh(2)),
        jax.ShapeDtypeStruct((batch, 77), jnp.int32, sharding=bsh(2)),
        jax.ShapeDtypeStruct(
            (batch, height // 8, width // 8, 4), jnp.float32, sharding=bsh(4)
        ),
        jax.ShapeDtypeStruct((), jnp.float32, sharding=rep),
        jax.ShapeDtypeStruct(
            (
                spec.text_encoder.max_position_embeddings,
                spec.text_encoder.hidden_size,
            ),
            jnp.float32,
            sharding=rep,
        ),
    )
    return jax.jit(fn).lower(*args_abs)
