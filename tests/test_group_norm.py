"""Fused GroupNorm(+SiLU) Pallas kernel vs the flax reference
(interpret mode on CPU)."""
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textboost_tpu.ops.group_norm import fused_group_norm, supports_fused


def _ref(x, gamma, beta, groups, eps, silu):
    mod = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
    y = mod.apply({"params": {"scale": gamma, "bias": beta}}, x).astype(x.dtype)
    if silu:
        y = jax.nn.silu(y.astype(jnp.float32)).astype(x.dtype)
    return y


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


@pytest.mark.parametrize("silu", [False, True])
@pytest.mark.parametrize(
    "shape,groups",
    [((2, 8, 8, 128), 32), ((1, 16, 16, 256), 32), ((1, 8, 8, 320), 32)],
)
def test_forward_matches_reference(shape, groups, silu):
    x = _rand(shape, 0)
    gamma = _rand((shape[-1],), 1) * 0.2 + 1.0
    beta = _rand((shape[-1],), 2) * 0.1
    out = fused_group_norm(x, gamma, beta, groups, silu=silu, interpret=True)
    ref = _ref(x, gamma, beta, groups, 1e-5, silu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_forward_bf16_io():
    x = _rand((2, 8, 8, 128), 0).astype(jnp.bfloat16)
    gamma = jnp.ones((128,))
    beta = jnp.zeros((128,))
    out = fused_group_norm(x, gamma, beta, 32, silu=True, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _ref(x, gamma, beta, 32, 1e-5, True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


@pytest.mark.parametrize("silu", [False, True])
def test_input_gradient_matches_reference(silu):
    x = _rand((1, 8, 8, 128), 3)
    gamma = _rand((128,), 4) * 0.2 + 1.0
    beta = _rand((128,), 5) * 0.1

    def loss_fused(x):
        return jnp.sum(
            fused_group_norm(x, gamma, beta, 32, silu=silu, interpret=True) ** 2
        )

    def loss_ref(x):
        return jnp.sum(_ref(x, gamma, beta, 32, 1e-5, silu) ** 2)

    g_fused = jax.grad(loss_fused)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), atol=5e-5, rtol=1e-3
    )


def test_eps_1e6_transformer_norm():
    # Transformer2D / VAE attention GroupNorms use eps=1e-6.
    x = _rand((1, 8, 8, 128), 6)
    gamma, beta = jnp.ones((128,)), jnp.zeros((128,))
    out = fused_group_norm(x, gamma, beta, 32, eps=1e-6, interpret=True)
    ref = _ref(x, gamma, beta, 32, 1e-6, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_supports_fused_envelope():
    assert supports_fused(4096, 320, 32)  # UNet level 0 @ 512px
    assert supports_fused(1024, 640, 32)
    assert not supports_fused(512 * 512, 128, 32)  # VAE slab too big
    assert not supports_fused(4096, 100, 32)  # lane-unaligned channels