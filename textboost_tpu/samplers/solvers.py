"""Diffusion samplers as jittable `lax.scan` loops.

TPU-native counterparts of the reference's diffusers schedulers
(`DPMSolverMultistepScheduler` / `DDPMScheduler` — /root/reference/
inference.py:88-90, train_textboost.py:340-346, eval_dreambooth.py:203).
Instead of stateful stepping objects, each sampler precomputes every
per-step coefficient on the host (numpy, static shapes) and runs the whole
trajectory as one `lax.scan` — a single XLA program, no host round trips.

A `model_fn(x, t_batch) -> model_output` callable abstracts the denoiser;
classifier-free guidance lives in the pipeline layer, not here.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.schedule import EPSILON, V_PREDICTION, NoiseSchedule

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def make_timesteps(
    num_train_timesteps: int, num_steps: int, spacing: str = "linspace"
) -> np.ndarray:
    """Descending inference timesteps.

    "linspace" matches diffusers DPMSolverMultistep's default; "leading"
    (with SD's steps_offset=1) matches DDIM/PNDM defaults.
    """
    if spacing == "linspace":
        ts = (
            np.linspace(0, num_train_timesteps - 1, num_steps + 1)
            .round()[::-1][:-1]
            .astype(np.int64)
        )
    elif spacing == "leading":
        ratio = num_train_timesteps // num_steps
        ts = (np.arange(0, num_steps) * ratio).round()[::-1].astype(np.int64) + 1
    else:
        raise ValueError(f"Unknown timestep spacing: {spacing}")
    return ts


def _alpha_sigma(schedule: NoiseSchedule, ts: np.ndarray):
    ac = np.asarray(schedule.alphas_cumprod)[ts]
    return np.sqrt(ac), np.sqrt(1.0 - ac)


def _predict_x0(
    schedule: NoiseSchedule,
    model_out: jnp.ndarray,
    x: jnp.ndarray,
    alpha_t: float,
    sigma_t: float,
):
    if schedule.prediction_type == EPSILON:
        return (x - sigma_t * model_out) / alpha_t
    elif schedule.prediction_type == V_PREDICTION:
        return alpha_t * x - sigma_t * model_out
    raise ValueError(schedule.prediction_type)


def _predict_eps(
    schedule: NoiseSchedule,
    model_out: jnp.ndarray,
    x: jnp.ndarray,
    alpha_t: float,
    sigma_t: float,
):
    if schedule.prediction_type == EPSILON:
        return model_out
    elif schedule.prediction_type == V_PREDICTION:
        return sigma_t * x + alpha_t * model_out
    raise ValueError(schedule.prediction_type)


# ---------------------------------------------------------------------------
# DPM-Solver++ (2M) — the reference's default inference scheduler.
# ---------------------------------------------------------------------------
class _DPMCoeffs(NamedTuple):
    timesteps: jnp.ndarray  # [N] int32
    alpha: jnp.ndarray  # [N] state alpha at each step input
    sigma: jnp.ndarray  # [N]
    c_x: jnp.ndarray  # [N] coefficient on x
    c_d0: jnp.ndarray  # [N] coefficient on D0 (= x0 estimate)
    c_d1: jnp.ndarray  # [N] coefficient on D1 (multistep correction)
    inv_r0: jnp.ndarray  # [N] 1/r0 = h_i / h_{i-1}
    use_second: jnp.ndarray  # [N] bool: apply 2nd-order correction


def _dpm_coeffs(schedule: NoiseSchedule, num_steps: int) -> _DPMCoeffs:
    ts = make_timesteps(schedule.num_train_timesteps, num_steps, "linspace")
    alpha, sigma = _alpha_sigma(schedule, ts)
    lam = np.log(alpha) - np.log(sigma)

    c_x = np.zeros(num_steps)
    c_d0 = np.zeros(num_steps)
    c_d1 = np.zeros(num_steps)
    inv_r0 = np.zeros(num_steps)
    use_second = np.zeros(num_steps, dtype=bool)

    h_prev = None
    for i in range(num_steps):
        last = i == num_steps - 1
        if last:
            # Terminal boundary (t -> 0): alpha=1, sigma=0, h -> inf.
            # exp(-h) -> 0 so the first-order update degenerates to x = x0.
            c_x[i], c_d0[i], c_d1[i] = 0.0, 1.0, 0.0
        else:
            h = lam[i + 1] - lam[i]
            phi = np.expm1(-h)
            c_x[i] = sigma[i + 1] / sigma[i]
            c_d0[i] = -alpha[i + 1] * phi
            if i > 0:
                # 2M midpoint correction: D1 = (x0 - x0_prev) / r0,
                # r0 = h_prev / h, contribution -0.5 * alpha_next * phi * D1.
                c_d1[i] = -0.5 * alpha[i + 1] * phi
                inv_r0[i] = h / h_prev
                use_second[i] = True
            h_prev = h

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return _DPMCoeffs(
        timesteps=jnp.asarray(ts, dtype=jnp.int32),
        alpha=f32(alpha),
        sigma=f32(sigma),
        c_x=f32(c_x),
        c_d0=f32(c_d0),
        c_d1=f32(c_d1),
        inv_r0=f32(inv_r0),
        use_second=jnp.asarray(use_second),
    )


def dpm_solver_sample(
    model_fn: ModelFn,
    schedule: NoiseSchedule,
    latents: jnp.ndarray,
    num_steps: int,
) -> jnp.ndarray:
    """DPM-Solver++ (2M), data-prediction, lower-order final step."""
    coeffs = _dpm_coeffs(schedule, num_steps)
    batch = latents.shape[0]

    def body(carry, per_step):
        x, x0_prev = carry
        (t, a, s, c_x, c_d0, c_d1, inv_r0, use_second) = per_step
        t_batch = jnp.full((batch,), t, dtype=jnp.int32)
        out = model_fn(x, t_batch).astype(jnp.float32)
        x0 = _predict_x0(schedule, out, x, a, s)
        d1 = (x0 - x0_prev) * inv_r0
        x_next = c_x * x + c_d0 * x0 + c_d1 * jnp.where(use_second, 1.0, 0.0) * d1
        return (x_next, x0), None

    (final, _), _ = jax.lax.scan(
        body, (latents.astype(jnp.float32), jnp.zeros_like(latents, jnp.float32)), coeffs
    )
    return final


# ---------------------------------------------------------------------------
# DDIM (eta = 0)
# ---------------------------------------------------------------------------
def ddim_sample(
    model_fn: ModelFn,
    schedule: NoiseSchedule,
    latents: jnp.ndarray,
    num_steps: int,
) -> jnp.ndarray:
    ts = make_timesteps(schedule.num_train_timesteps, num_steps, "leading")
    alpha, sigma = _alpha_sigma(schedule, ts)
    # State after the final step is x0 (alpha_next=1, sigma_next=0).
    alpha_next = np.concatenate([alpha[1:], [1.0]])
    sigma_next = np.concatenate([sigma[1:], [0.0]])
    per_step = (
        jnp.asarray(ts, jnp.int32),
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(sigma, jnp.float32),
        jnp.asarray(alpha_next, jnp.float32),
        jnp.asarray(sigma_next, jnp.float32),
    )
    batch = latents.shape[0]

    def body(x, step):
        t, a, s, a_next, s_next = step
        t_batch = jnp.full((batch,), t, dtype=jnp.int32)
        out = model_fn(x, t_batch).astype(jnp.float32)
        x0 = _predict_x0(schedule, out, x, a, s)
        eps = _predict_eps(schedule, out, x, a, s)
        return a_next * x0 + s_next * eps, None

    final, _ = jax.lax.scan(body, latents.astype(jnp.float32), per_step)
    return final


# ---------------------------------------------------------------------------
# DDPM ancestral (validation parity with DDPMScheduler)
# ---------------------------------------------------------------------------
def ddpm_sample(
    model_fn: ModelFn,
    schedule: NoiseSchedule,
    latents: jnp.ndarray,
    num_steps: int,
    rng: jax.Array = None,
) -> jnp.ndarray:
    if rng is None:
        rng = jax.random.PRNGKey(0)
    ts = make_timesteps(schedule.num_train_timesteps, num_steps, "leading")
    ac = np.asarray(schedule.alphas_cumprod)[ts]
    ac_prev = np.concatenate([ac[1:], [1.0]])
    beta_t = 1.0 - ac / ac_prev
    alpha, sigma = np.sqrt(ac), np.sqrt(1.0 - ac)
    # Posterior q(x_{t-1} | x_t, x0) coefficients.
    c_x0 = np.sqrt(ac_prev) * beta_t / (1.0 - ac)
    c_xt = np.sqrt(1.0 - beta_t) * (1.0 - ac_prev) / (1.0 - ac)
    var = np.clip(beta_t * (1.0 - ac_prev) / (1.0 - ac), 1e-20, None)
    std = np.sqrt(var)
    std[-1] = 0.0
    per_step = tuple(
        jnp.asarray(a, jnp.float32 if a.dtype != np.int64 else jnp.int32)
        for a in (ts, alpha, sigma, c_x0, c_xt, std)
    )
    batch = latents.shape[0]

    def body(carry, step):
        x, key = carry
        t, a, s, cx0, cxt, noise_std = step
        key, sub = jax.random.split(key)
        t_batch = jnp.full((batch,), t, dtype=jnp.int32)
        out = model_fn(x, t_batch).astype(jnp.float32)
        x0 = _predict_x0(schedule, out, x, a, s)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        return (cx0 * x0 + cxt * x + noise_std * noise, key), None

    (final, _), _ = jax.lax.scan(body, (latents.astype(jnp.float32), rng), per_step)
    return final


# ---------------------------------------------------------------------------
# PNDM / PLMS — SD1.x pipelines' stock scheduler before the reference swaps
# in DPM-Solver++ (/root/reference/inference.py:88-90).
# ---------------------------------------------------------------------------
def pndm_sample(
    model_fn: ModelFn,
    schedule: NoiseSchedule,
    latents: jnp.ndarray,
    num_steps: int,
) -> jnp.ndarray:
    """PNDM with the SD pipeline configuration: skip_prk_steps=True (pure
    PLMS: one Heun warm-up correction, then 2nd/3rd/4th-order linear
    multistep), steps_offset=1 "leading" grid, set_alpha_to_one=False
    (terminal boundary uses alphas_cumprod[0]).

    The stateful reference algorithm (Liu et al. 2022; diffusers
    PNDMScheduler semantics) is re-expressed as one `lax.scan`: every
    per-step scalar (DDIM-form sample/eps coefficients, Adams-Bashforth
    weights, corrector/append flags) is precomputed on the host, and the
    eps history rides the carry as a 3-slot shift register.  num_steps>1
    costs num_steps+1 model calls (the PLMS warm-up re-evaluates the
    second grid point), exactly like the reference scheduler.  Oracle:
    tests/test_sampler_oracle.py::test_pndm_matches_independent_oracle.
    """
    n_train = schedule.num_train_timesteps
    ratio = n_train // num_steps
    ts_asc = np.arange(num_steps, dtype=np.int64) * ratio + 1  # steps_offset=1
    if num_steps > 1:
        seq = np.concatenate([ts_asc[:-1], ts_asc[-2:-1], ts_asc[-1:]])[::-1]
    else:
        seq = ts_asc[::-1]
    n_total = len(seq)

    ac = np.asarray(schedule.alphas_cumprod, np.float64)
    final_ac = ac[0]  # set_alpha_to_one=False

    samp_c = np.zeros(n_total)
    coef_e = np.zeros(n_total)
    a_eff = np.zeros(n_total)
    s_eff = np.zeros(n_total)
    w = np.zeros((n_total, 4))
    use_cur = np.zeros(n_total, dtype=bool)
    do_append = np.zeros(n_total, dtype=bool)
    do_store = np.zeros(n_total, dtype=bool)
    do_store[0] = True  # snapshot the original sample for the warm-up corrector
    n_hist = 0
    for i, t in enumerate(seq):
        warmup_corrector = i == 1 and num_steps > 1
        if warmup_corrector:
            t_eff, t_prev = t + ratio, int(t)
            w[i, :2] = 0.5  # Heun average with the first prediction
            use_cur[i] = True  # step re-starts from the ORIGINAL sample
        else:
            t_eff, t_prev = int(t), int(t) - ratio
            do_append[i] = True
            n_hist += 1
            if n_hist == 1:
                w[i, 0] = 1.0
            elif n_hist == 2:
                w[i, :2] = (3.0 / 2.0, -1.0 / 2.0)
            elif n_hist == 3:
                w[i, :3] = (23.0 / 12.0, -16.0 / 12.0, 5.0 / 12.0)
            else:
                w[i] = (55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0)
        ap_t = ac[t_eff]
        ap_prev = ac[t_prev] if t_prev >= 0 else final_ac
        samp_c[i] = np.sqrt(ap_prev / ap_t)
        denom = ap_t * np.sqrt(1.0 - ap_prev) + np.sqrt(
            ap_t * (1.0 - ap_t) * ap_prev
        )
        coef_e[i] = (ap_prev - ap_t) / denom
        a_eff[i] = np.sqrt(ap_t)
        s_eff[i] = np.sqrt(1.0 - ap_t)

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    per_step = (
        jnp.asarray(seq, jnp.int32), f32(samp_c), f32(coef_e), f32(a_eff),
        f32(s_eff), f32(w), jnp.asarray(use_cur), jnp.asarray(do_append),
        jnp.asarray(do_store),
    )
    batch = latents.shape[0]
    is_v = schedule.prediction_type == V_PREDICTION

    def body(carry, step):
        x, cur, h1, h2, h3 = carry
        t, sc, ce, a_t, s_t, wi, uc, ap, st = step
        t_batch = jnp.full((batch,), t, dtype=jnp.int32)
        e = model_fn(x, t_batch).astype(jnp.float32)
        et = wi[0] * e + wi[1] * h1 + wi[2] * h2 + wi[3] * h3
        sample = jnp.where(uc, cur, x)
        if is_v:
            # v -> eps at the step's effective timestep, exactly where the
            # reference scheduler converts (after the multistep combination).
            et = a_t * et + s_t * sample
        x_next = sc * sample - ce * et
        cur_next = jnp.where(st, x, cur)
        h1n = jnp.where(ap, e, h1)
        h2n = jnp.where(ap, h1, h2)
        h3n = jnp.where(ap, h2, h3)
        return (x_next, cur_next, h1n, h2n, h3n), None

    x0f = latents.astype(jnp.float32)
    z = jnp.zeros_like(x0f)
    (final, _, _, _, _), _ = jax.lax.scan(body, (x0f, z, z, z, z), per_step)
    return final


SAMPLERS = {
    "dpm++2m": dpm_solver_sample,
    "ddim": ddim_sample,
    "ddpm": ddpm_sample,
    "pndm": pndm_sample,
    # Reference scheduler-class names (inference.py:88, train flag
    # --validation_scheduler) map onto the native samplers.
    "DPMSolverMultistepScheduler": dpm_solver_sample,
    "DDIMScheduler": ddim_sample,
    "DDPMScheduler": ddpm_sample,
    "PNDMScheduler": pndm_sample,
}


def get_sampler(name: str):
    if name not in SAMPLERS:
        raise ValueError(f"Unknown sampler '{name}'. Available: {sorted(SAMPLERS)}")
    return SAMPLERS[name]
