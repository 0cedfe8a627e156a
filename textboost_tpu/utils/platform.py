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
