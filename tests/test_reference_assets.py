"""Exercise the actual reference asset shipped at
/root/reference/assets/null_emb_sd21base.pt (the cached SD2.1-base frozen
text-encoder output of the empty prompt, train_textboost.py:649 — the eval
variant loads assets/start_emb_{model}.pt through the same machinery,
eval_dreambooth.py:176-183)."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

ASSET = "/root/reference/assets/null_emb_sd21base.pt"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(ASSET), reason="reference asset not available"
)


def test_real_asset_loads_for_sd21base():
    from textboost_tpu.models.configs import get_spec
    from textboost_tpu.models.textboost import load_null_embedding_asset

    spec = get_spec("sd21base")
    arr = load_null_embedding_asset(
        ASSET,
        (spec.text_encoder.max_position_embeddings, spec.text_encoder.hidden_size),
    )
    assert arr.shape == (77, 1024)
    assert arr.dtype == np.float32
    assert np.isfinite(arr).all()
    # Not degenerate: real hidden states vary along the sequence.
    assert np.abs(arr[0] - arr[1]).max() > 1e-3


def test_real_asset_rejected_for_sd15():
    from textboost_tpu.models.configs import get_spec
    from textboost_tpu.models.textboost import load_null_embedding_asset

    spec = get_spec("sd15")  # hidden 768 != 1024
    with pytest.raises(ValueError, match="expected"):
        load_null_embedding_asset(
            ASSET,
            (spec.text_encoder.max_position_embeddings, spec.text_encoder.hidden_size),
        )


def test_real_asset_through_patch():
    # The asset flows through the in-jit TextBoost patch: empty-prompt rows
    # take the cached sequence; BOS of every row is pinned to asset[0].
    from textboost_tpu.models.textboost import (
        apply_null_embedding_patch,
        load_null_embedding_asset,
    )

    null = jnp.asarray(load_null_embedding_asset(ASSET))
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.standard_normal((2, 77, 1024)).astype(np.float32))
    ids = np.full((2, 77), 49407, np.int32)
    ids[:, 0] = 49406
    ids[1, 1:5] = [320, 1125, 539, 1929]  # non-empty prompt
    patched = apply_null_embedding_patch(
        hidden, jnp.asarray(ids), null, eos_token_id=49407, fixed_special=True
    )
    np.testing.assert_allclose(np.asarray(patched[0]), np.asarray(null), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(patched[1, 0]), np.asarray(null[0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(patched[1, 1:]), np.asarray(hidden[1, 1:]), rtol=1e-6
    )
