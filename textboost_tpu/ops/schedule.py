"""Diffusion noise schedule (DDPM forward process) as pure JAX functions.

TPU-native counterpart of the reference's use of `diffusers.DDPMScheduler`
(/root/reference/train_textboost.py:644, :1041-1052) and
`diffusers.training_utils.compute_snr` (:991-997).  Instead of a stateful
scheduler object, the schedule is an immutable pytree of precomputed tables
(betas / alphas_cumprod) that jitted code gathers from — static shapes, no
host round-trips inside the step.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPSILON = "epsilon"
V_PREDICTION = "v_prediction"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Precomputed DDPM schedule tables.

    All tables are float32 arrays of shape [num_train_timesteps]; they are
    leaves of a pytree so a `NoiseSchedule` can be closed over or passed into
    jitted functions.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int
    prediction_type: str

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.betas, self.alphas_cumprod), (
            self.num_train_timesteps,
            self.prediction_type,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        betas, alphas_cumprod = children
        return cls(betas, alphas_cumprod, *aux)

    # -- constructors ------------------------------------------------------
    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = EPSILON,
    ) -> "NoiseSchedule":
        """Defaults match Stable Diffusion 1.x/2.x training schedules."""
        if beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
        elif beta_schedule == "scaled_linear":
            betas = (
                np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
                ** 2
            )
        elif beta_schedule == "squaredcos_cap_v2":
            steps = np.arange(num_train_timesteps + 1, dtype=np.float64) / num_train_timesteps

            def acos2(t):
                return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

            betas = np.clip(1.0 - acos2(steps[1:]) / acos2(steps[:-1]), 0.0, 0.999)
        else:
            raise ValueError(f"Unknown beta schedule: {beta_schedule}")
        alphas_cumprod = np.cumprod(1.0 - betas)
        return cls(
            betas=jnp.asarray(betas, dtype=jnp.float32),
            alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
        )

    # -- schedule queries --------------------------------------------------
    def _gather_sqrt(self, timesteps: jnp.ndarray, ndim: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Return (sqrt_alpha_prod, sqrt_one_minus_alpha_prod) broadcastable
        against a sample with `ndim` dims, batch-leading."""
        ac = self.alphas_cumprod[timesteps]
        shape = (-1,) + (1,) * (ndim - 1)
        sqrt_ac = jnp.sqrt(ac).reshape(shape)
        sqrt_1mac = jnp.sqrt(1.0 - ac).reshape(shape)
        return sqrt_ac, sqrt_1mac

    def add_noise(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """q(x_t | x_0): sqrt(ac_t) x0 + sqrt(1 - ac_t) eps."""
        sqrt_ac, sqrt_1mac = self._gather_sqrt(timesteps, sample.ndim)
        return sqrt_ac * sample + sqrt_1mac * noise

    def velocity(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """v-prediction target: sqrt(ac_t) eps - sqrt(1 - ac_t) x0."""
        sqrt_ac, sqrt_1mac = self._gather_sqrt(timesteps, sample.ndim)
        return sqrt_ac * noise - sqrt_1mac * sample

    def snr(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        """Signal-to-noise ratio ac_t / (1 - ac_t) (diffusers compute_snr)."""
        ac = self.alphas_cumprod[timesteps]
        return ac / (1.0 - ac)

    def training_target(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        if self.prediction_type == EPSILON:
            return noise
        elif self.prediction_type == V_PREDICTION:
            return self.velocity(sample, noise, timesteps)
        raise ValueError(f"Unknown prediction type {self.prediction_type}")

    def pred_original_sample(
        self, model_output: jnp.ndarray, sample: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """Recover x0-hat from the model output at x_t."""
        sqrt_ac, sqrt_1mac = self._gather_sqrt(timesteps, sample.ndim)
        if self.prediction_type == EPSILON:
            return (sample - sqrt_1mac * model_output) / sqrt_ac
        elif self.prediction_type == V_PREDICTION:
            return sqrt_ac * sample - sqrt_1mac * model_output
        raise ValueError(f"Unknown prediction type {self.prediction_type}")


def snr_timestep_weights(schedule: NoiseSchedule) -> jnp.ndarray:
    """SNR-weighted timestep sampling distribution.

    Reference semantics (train_textboost.py:991-997):
        w_t = -log SNR(t) + max_t log SNR(t);   p_t = w_t / sum(w_t)
    Returns the normalized probability vector p over all train timesteps.
    """
    t = jnp.arange(schedule.num_train_timesteps)
    logsnr = jnp.log(schedule.snr(t))
    w = -logsnr + jnp.max(logsnr)
    return w / jnp.sum(w)


def sample_timesteps(
    rng: jax.Array,
    schedule: NoiseSchedule,
    batch_size: int,
    weighted: bool = False,
) -> jnp.ndarray:
    """Sample per-example timesteps, uniform by default (the reference's
    reachable default: train_textboost.py:406-411 disables weighting)."""
    if weighted:
        p = snr_timestep_weights(schedule)
        return jax.random.categorical(
            rng, jnp.log(p)[None, :].repeat(batch_size, 0), axis=-1
        )
    return jax.random.randint(rng, (batch_size,), 0, schedule.num_train_timesteps)
