"""Test configuration: force an 8-device virtual CPU platform.

Must run before the JAX backend initializes, hence the env mutation at
import time.  Multi-device sharding tests (dp x tp meshes) run on these
virtual devices exactly as they would on a v5e-8 slice.
"""
import os

# Force-override: the environment pre-sets JAX_PLATFORMS=axon (the real TPU
# tunnel); tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin regardless of the env
# var; the config knob is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# The sitecustomize pre-import of jax._src binds env vars before conftest
# runs, so the cache dir env above is a no-op — the config knob is the
# only thing that works (see utils/platform.py::configure_compilation_cache).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.device_count() == 8, (
    f"tests require the 8-device virtual CPU mesh, got {jax.devices()}"
)
