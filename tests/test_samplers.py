"""Analytic correctness tests for the samplers.

For a delta data distribution x0 == mu the exact posterior denoiser is
eps(x_t, t) = (x_t - a_t * mu) / s_t.  Any correct sampler driven by this
exact model must land on mu from ANY starting latent.  For x0 ~ N(0, I)
the exact denoiser is eps = s_t * x_t and the probability-flow samplers
(DDIM / DPM-Solver++) must agree with each other since they discretize the
same ODE.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textboost_tpu.ops import NoiseSchedule
from textboost_tpu.samplers import (
    ddim_sample,
    ddpm_sample,
    dpm_solver_sample,
    get_sampler,
    make_timesteps,
)

SCHED = NoiseSchedule.create()


def _delta_model(mu):
    def model_fn(x, t):
        ac = SCHED.alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
        a, s = jnp.sqrt(ac), jnp.sqrt(1 - ac)
        return (x - a * mu) / s

    return model_fn


@pytest.mark.parametrize("sampler", [ddim_sample, dpm_solver_sample, ddpm_sample])
def test_delta_distribution_recovered(sampler):
    mu = 0.7
    model_fn = _delta_model(mu)
    x_t = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    out = sampler(model_fn, SCHED, x_t, 25)
    np.testing.assert_allclose(np.asarray(out), mu, atol=5e-3)


def test_gaussian_marginal_preserved_and_ode_agreement():
    # Exact denoiser for x0 ~ N(0, I):  eps(x_t) = s_t * x_t.
    def model_fn(x, t):
        ac = SCHED.alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.sqrt(1 - ac) * x

    x_t = jax.random.normal(jax.random.PRNGKey(1), (64, 4, 4, 4))
    out_ddim = np.asarray(ddim_sample(model_fn, SCHED, x_t, 50))
    out_dpm = np.asarray(dpm_solver_sample(model_fn, SCHED, x_t, 50))
    # Marginal std stays ~1 under the exact probability flow.
    assert abs(out_ddim.std() - 1.0) < 0.1
    assert abs(out_dpm.std() - 1.0) < 0.1
    # Same ODE, two discretizations (different spacings) -> close trajectories.
    np.testing.assert_allclose(out_ddim, out_dpm, atol=0.12)


def test_v_prediction_delta():
    sched_v = NoiseSchedule.create(prediction_type="v_prediction")
    mu = -0.3

    def model_fn(x, t):
        ac = sched_v.alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
        a, s = jnp.sqrt(ac), jnp.sqrt(1 - ac)
        eps = (x - a * mu) / s
        return a * eps - s * mu

    x_t = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 4))
    out = dpm_solver_sample(model_fn, sched_v, x_t, 25)
    np.testing.assert_allclose(np.asarray(out), mu, atol=5e-3)


def test_timestep_spacings():
    # linspace spacing drops t=0: the final update targets the terminal
    # boundary (alpha=1, sigma=0) analytically.
    ts = make_timesteps(1000, 25, "linspace")
    assert ts[0] == 999 and 0 < ts[-1] < 50 and len(ts) == 25
    assert np.all(np.diff(ts) < 0)
    ts_l = make_timesteps(1000, 25, "leading")
    assert len(ts_l) == 25 and ts_l[-1] == 1 and np.all(np.diff(ts_l) < 0)


def test_sampler_registry():
    assert get_sampler("DPMSolverMultistepScheduler") is dpm_solver_sample
    assert get_sampler("DDPMScheduler") is ddpm_sample
    with pytest.raises(ValueError):
        get_sampler("nope")


def test_samplers_jittable():
    model_fn = _delta_model(0.5)
    f = jax.jit(lambda x: dpm_solver_sample(model_fn, SCHED, x, 10))
    out = f(jnp.ones((1, 4, 4, 4)))
    assert out.shape == (1, 4, 4, 4)
