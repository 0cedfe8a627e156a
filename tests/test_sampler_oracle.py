"""Independent-oracle sampler tests (VERDICT r3 item 5 / SURVEY §7
"DPM-Solver++ step-for-step agreement").

The oracles below are standalone float64 numpy transcriptions of the
published update rules — written from the algorithms, NOT from
samplers/solvers.py — including the schedule itself (betas -> cumprod),
so agreement pins the whole pipeline:

- DPM-Solver++(2M), data prediction, midpoint multistep correction
  (Lu et al. 2022, Algorithm 2), with the diffusers conventions the
  reference runs under (`DPMSolverMultistepScheduler.from_config`,
  /root/reference/inference.py:88-90, eval_dreambooth.py:321-323):
  "linspace" timestep spacing, first step first-order, final step
  first-order to the sigma=0 boundary (final_sigmas_type="zero" /
  lower_order_final), epsilon and v-prediction parameterizations.
- DDIM eta=0 closed form (Song et al. 2020, eq. 12) with the "leading"
  spacing + steps_offset=1 grid; terminal boundary alpha_bar->1 (the
  samplers' convention; diffusers' set_alpha_to_one=False variant differs
  only in the final step's alpha_bar_prev and is not exercised by the
  reference, which samples exclusively through DPM-Solver++).

Agreement is asserted at several step counts (1/2/3/5/25) — each count
exercises a different mix of first-order, multistep, and terminal
updates, so a wrong coefficient at any step index shows up in at least
one of them.
"""
import numpy as np
import pytest

# ---------------------------------------------------------------------------
# Independent schedule: SD's scaled_linear betas, float64.
# ---------------------------------------------------------------------------
N_TRAIN = 1000
BETA_START, BETA_END = 0.00085, 0.012


def _alphas_cumprod64():
    betas = np.linspace(BETA_START**0.5, BETA_END**0.5, N_TRAIN, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def _model_np(x, t):
    """Deterministic pseudo-model, identical formula in numpy and jax."""
    return 0.9 * np.cos(0.37 * x + 0.011 * t)


def _x0_eps(x, out, a, s, prediction_type):
    if prediction_type == "epsilon":
        x0, eps = (x - s * out) / a, out
    else:  # v_prediction
        x0, eps = a * x - s * out, s * x + a * out
    return x0, eps


# ---------------------------------------------------------------------------
# Oracles (float64 numpy, no imports from the package)
# ---------------------------------------------------------------------------
def dpm_pp_2m_oracle(x, num_steps, prediction_type):
    ac = _alphas_cumprod64()
    ts = (
        np.linspace(0, N_TRAIN - 1, num_steps + 1)
        .round()[::-1][:-1]
        .astype(np.int64)
    )
    alpha = np.sqrt(ac[ts])
    sigma = np.sqrt(1.0 - ac[ts])
    lam = np.log(alpha) - np.log(sigma)

    x = x.astype(np.float64)
    m_prev = None  # previous x0 estimate
    h_prev = None
    for i in range(num_steps):
        out = _model_np(x, float(ts[i]))
        x0, _ = _x0_eps(x, out, alpha[i], sigma[i], prediction_type)
        last = i == num_steps - 1
        # Step target: next grid point, or the sigma=0 boundary.
        a_next = 1.0 if last else alpha[i + 1]
        s_next = 0.0 if last else sigma[i + 1]
        lam_next = np.inf if last else lam[i + 1]
        h = lam_next - lam[i]
        phi = np.expm1(-h)  # exp(-h) - 1;  -1 at the terminal boundary
        first_order = (i == 0) or last
        if first_order:
            x = (s_next / sigma[i]) * x - a_next * phi * x0
        else:
            d1 = (x0 - m_prev) * (h / h_prev)
            x = (s_next / sigma[i]) * x - a_next * phi * (x0 + 0.5 * d1)
        m_prev, h_prev = x0, h
    return x


def pndm_oracle(x, num_steps, prediction_type):
    """PNDM with skip_prk_steps=True (pure PLMS), the SD pipeline config:
    stateful transcription of the published algorithm (Liu et al. 2022 /
    diffusers PNDMScheduler semantics) — "leading" grid with steps_offset=1,
    Heun warm-up restarting from the original sample, 2nd/3rd/4th-order
    Adams-Bashforth eps combination, DDIM-form state update, terminal
    boundary alphas_cumprod[0] (set_alpha_to_one=False)."""
    ac = _alphas_cumprod64()
    ratio = N_TRAIN // num_steps
    ts_asc = np.arange(num_steps, dtype=np.int64) * ratio + 1
    if num_steps > 1:
        seq = np.concatenate([ts_asc[:-1], ts_asc[-2:-1], ts_asc[-1:]])[::-1]
    else:
        seq = ts_asc[::-1]
    x = x.astype(np.float64)
    ets = []
    cur = None
    for counter, t in enumerate(seq):
        e = _model_np(x, float(t))
        sample = x
        if counter == 1 and num_steps > 1:
            t_eff, t_prev = int(t) + ratio, int(t)
            et = (e + ets[-1]) / 2.0
            sample = cur
        else:
            t_eff, t_prev = int(t), int(t) - ratio
            ets.append(e)
            if counter == 0:
                cur = x
                et = e
            elif len(ets) == 2:
                et = (3.0 * ets[-1] - ets[-2]) / 2.0
            elif len(ets) == 3:
                et = (23.0 * ets[-1] - 16.0 * ets[-2] + 5.0 * ets[-3]) / 12.0
            else:
                et = (
                    55.0 * ets[-1] - 59.0 * ets[-2] + 37.0 * ets[-3]
                    - 9.0 * ets[-4]
                ) / 24.0
        ap_t = ac[t_eff]
        ap_prev = ac[t_prev] if t_prev >= 0 else ac[0]
        if prediction_type == "v_prediction":
            et = np.sqrt(ap_t) * et + np.sqrt(1.0 - ap_t) * sample
        denom = ap_t * np.sqrt(1.0 - ap_prev) + np.sqrt(
            ap_t * (1.0 - ap_t) * ap_prev
        )
        x = np.sqrt(ap_prev / ap_t) * sample - (ap_prev - ap_t) / denom * et
    return x


def ddim_oracle(x, num_steps, prediction_type):
    ac = _alphas_cumprod64()
    ratio = N_TRAIN // num_steps
    ts = (np.arange(num_steps) * ratio).round()[::-1].astype(np.int64) + 1
    alpha = np.sqrt(ac[ts])
    sigma = np.sqrt(1.0 - ac[ts])
    x = x.astype(np.float64)
    for i in range(num_steps):
        out = _model_np(x, float(ts[i]))
        x0, eps = _x0_eps(x, out, alpha[i], sigma[i], prediction_type)
        a_next = 1.0 if i == num_steps - 1 else alpha[i + 1]
        s_next = 0.0 if i == num_steps - 1 else sigma[i + 1]
        x = a_next * x0 + s_next * eps
    return x


# ---------------------------------------------------------------------------
# Agreement tests
# ---------------------------------------------------------------------------
def _run_repo_sampler(name, x, num_steps, prediction_type):
    import jax.numpy as jnp

    from textboost_tpu.ops.schedule import NoiseSchedule
    from textboost_tpu.samplers.solvers import get_sampler

    schedule = NoiseSchedule.create(
        num_train_timesteps=N_TRAIN,
        beta_start=BETA_START,
        beta_end=BETA_END,
        beta_schedule="scaled_linear",
        prediction_type=prediction_type,
    )

    def model_fn(x, t_batch):
        t = t_batch.astype(jnp.float32)[:, None, None, None]
        return 0.9 * jnp.cos(0.37 * x + 0.011 * t)

    return np.asarray(
        get_sampler(name)(model_fn, schedule, jnp.asarray(x), num_steps)
    )


@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
@pytest.mark.parametrize("num_steps", [1, 2, 3, 5, 25])
def test_dpm_solver_pp_2m_matches_independent_oracle(num_steps, prediction_type):
    x = np.random.RandomState(42).randn(2, 4, 4, 4).astype(np.float32)
    got = _run_repo_sampler("dpm++2m", x, num_steps, prediction_type)
    want = dpm_pp_2m_oracle(x, num_steps, prediction_type)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
@pytest.mark.parametrize("num_steps", [1, 2, 5, 25])
def test_ddim_matches_closed_form_oracle(num_steps, prediction_type):
    x = np.random.RandomState(7).randn(2, 4, 4, 4).astype(np.float32)
    got = _run_repo_sampler("ddim", x, num_steps, prediction_type)
    want = ddim_oracle(x, num_steps, prediction_type)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
@pytest.mark.parametrize("num_steps", [1, 2, 3, 5, 25])
def test_pndm_matches_independent_oracle(num_steps, prediction_type):
    x = np.random.RandomState(11).randn(2, 4, 4, 4).astype(np.float32)
    got = _run_repo_sampler("pndm", x, num_steps, prediction_type)
    want = pndm_oracle(x, num_steps, prediction_type)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


def test_pndm_registered_under_reference_class_name():
    from textboost_tpu.samplers.solvers import SAMPLERS, pndm_sample

    assert SAMPLERS["PNDMScheduler"] is pndm_sample
    assert SAMPLERS["pndm"] is pndm_sample


def test_dpm_timestep_grid_is_diffusers_linspace():
    """The inference grid itself (linspace, round, drop the trailing 0)
    pinned against an inline recomputation at the reference's 25 steps."""
    from textboost_tpu.samplers.solvers import make_timesteps

    ts = make_timesteps(N_TRAIN, 25, "linspace")
    want = np.linspace(0, 999, 26).round()[::-1][:-1].astype(np.int64)
    np.testing.assert_array_equal(ts, want)
    assert ts[0] == 999 and ts[-1] > 0
