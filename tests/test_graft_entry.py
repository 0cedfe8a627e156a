"""The driver's multi-chip dry-run hook must keep working as trainer/step
APIs evolve — a signature drift here would otherwise only surface in the
driver's own end-of-round run."""
import importlib.util
import os

import jax


def test_dryrun_multichip_in_process():
    # conftest already forces the 8-device virtual CPU platform, so the
    # hook's own env plumbing is a no-op here and the mesh builds directly.
    assert jax.device_count() == 8
    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)  # raises / asserts internally on failure
