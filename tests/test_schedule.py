import jax
import jax.numpy as jnp
import numpy as np

from textboost_tpu.ops import NoiseSchedule, sample_timesteps, snr_timestep_weights


def test_sd_schedule_tables():
    s = NoiseSchedule.create()
    assert s.betas.shape == (1000,)
    # SD scaled_linear endpoints.
    np.testing.assert_allclose(float(s.betas[0]), 0.00085, rtol=1e-6)
    np.testing.assert_allclose(float(s.betas[-1]), 0.012, rtol=1e-6)
    ac = np.asarray(s.alphas_cumprod)
    assert np.all(np.diff(ac) < 0) and 0 < ac[-1] < ac[0] < 1


def test_add_noise_and_velocity_consistency():
    s = NoiseSchedule.create()
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (4, 8, 8, 4))
    eps = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t = jnp.array([0, 250, 500, 999])
    xt = s.add_noise(x0, eps, t)
    # pred_original_sample inverts add_noise for epsilon prediction.
    x0_hat = s.pred_original_sample(eps, xt, t)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)
    # v-prediction roundtrip: alpha*xt - sigma*v == x0.
    v = s.velocity(x0, eps, t)
    s2 = NoiseSchedule.create(prediction_type="v_prediction")
    x0_hat_v = s2.pred_original_sample(v, xt, t)
    np.testing.assert_allclose(np.asarray(x0_hat_v), np.asarray(x0), atol=1e-4)


def test_snr_matches_definition():
    s = NoiseSchedule.create()
    t = jnp.arange(1000)
    ac = s.alphas_cumprod
    np.testing.assert_allclose(
        np.asarray(s.snr(t)), np.asarray(ac / (1 - ac)), rtol=1e-5
    )


def test_snr_weights_normalized_and_monotone():
    s = NoiseSchedule.create()
    p = np.asarray(snr_timestep_weights(s))
    assert abs(p.sum() - 1.0) < 1e-5
    # -log SNR grows with t, so weights increase toward noisier timesteps.
    assert p[-1] > p[0] >= 0.0


def test_sample_timesteps_bounds_and_weighted():
    s = NoiseSchedule.create()
    t = sample_timesteps(jax.random.PRNGKey(0), s, 512)
    assert t.shape == (512,)
    assert int(t.min()) >= 0 and int(t.max()) < 1000
    tw = sample_timesteps(jax.random.PRNGKey(0), s, 2048, weighted=True)
    # Weighted sampling skews high-t (low SNR).
    assert float(tw.mean()) > float(t.astype(jnp.float32).mean()) - 100


def test_schedule_is_pytree():
    s = NoiseSchedule.create()
    leaves = jax.tree_util.tree_leaves(s)
    assert len(leaves) == 2

    @jax.jit
    def f(sched, x, eps, t):
        return sched.add_noise(x, eps, t)

    out = f(s, jnp.ones((2, 4)), jnp.zeros((2, 4)), jnp.array([10, 20]))
    assert out.shape == (2, 4)
