"""Platform override for CLI entry points.

The axon TPU plugin ignores JAX_PLATFORMS; the config knob is
authoritative.  CLIs call apply_platform_override() before any device
use so `TEXTBOOST_PLATFORM=cpu python train_textboost.py ...` works for
CPU debugging (tests force cpu in conftest the same way).
"""
import os


def apply_platform_override():
    platform = os.environ.get("TEXTBOOST_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    configure_compilation_cache()


def start_device_warmup():
    """Pay the relay's per-process first-execution tax in the background.

    On the tunneled TPU the FIRST real device sync of a process (any
    device->host fetch) costs ~1-4 minutes regardless of workload — an
    infra warmup, not compute.  Kicking a tiny fetch off in a daemon
    thread lets it overlap the setup-phase remote compiles instead of
    serializing after them.  No-op off the TPU."""
    import threading

    if os.environ.get("TEXTBOOST_MULTIHOST") == "1":
        # jax.distributed.initialize() must win the backend-init race.
        return

    def _warm():
        try:
            import numpy as np
            import jax
            import jax.numpy as jnp

            if jax.default_backend() not in ("tpu",):
                return
            np.asarray(jnp.full((8, 128), 1.234567))
        except Exception:  # noqa: BLE001 — warmup must never break startup
            pass

    threading.Thread(target=_warm, daemon=True, name="device-warmup").start()


def single_chip_env(chip: int) -> dict:
    """Child-process environment pinning an independent JAX job to ONE chip.

    TPU-native sweep scaling is the transpose of the reference's launch
    model: instead of one job at a time spanning every accelerator
    (torchrun, run_textboost_db.py:106-162), run N one-chip jobs
    concurrently — a one-shot TextBoost instance fits a single v5e chip
    with HBM headroom (bs8/512px, no remat), per-job collectives
    disappear, and sweep throughput scales linearly in chips.

    Uses the standard libtpu host-splitting recipe: restrict the process
    topology to 1x1x1 and expose only `chip`.  Inert on CPU/GPU platforms
    (plain env vars no libtpu reads) and on relay-tunneled single-chip
    backends.
    """
    env = dict(os.environ)
    env.update(
        {
            "TPU_CHIPS_PER_PROCESS_BOUNDS": "1,1,1",
            "TPU_PROCESS_BOUNDS": "1,1,1",
            "TPU_VISIBLE_DEVICES": str(chip),
            # Independent jobs must not contend for one coordination port.
            "TPU_MESH_CONTROLLER_ADDRESS": f"localhost:{8476 + chip}",
            "TPU_MESH_CONTROLLER_PORT": str(8476 + chip),
        }
    )
    return env


def configure_compilation_cache():
    """Point the persistent compilation cache at JAX_COMPILATION_CACHE_DIR
    (default /tmp/jax_comp_cache) via the config knob.

    The env var alone does NOT work in this environment: a sitecustomize
    hook pre-imports jax._src at interpreter startup, so jax's config has
    already bound (empty) env vars before any user code can set os.environ.
    Only a shell-level export or jax.config.update takes effect — without
    this call every process recompiles the ~170 s train step from scratch.
    """
    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    # On the tunneled TPU, deserialized executables EXECUTE pathologically
    # slowly (measured: model-init programs ~250 s from cache vs ~30 s
    # freshly compiled), so only programs whose compile is truly enormous
    # (the ~170 s train step) are worth caching there.  On CPU the cache
    # is local and fast — cache everything nontrivial.
    on_cpu = (
        os.environ.get("TEXTBOOST_PLATFORM") == "cpu"
        or jax.config.jax_platforms == "cpu"
    )
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 0.5 if on_cpu else 120.0
    )
