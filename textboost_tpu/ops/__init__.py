from .schedule import (  # noqa: F401
    EPSILON,
    V_PREDICTION,
    NoiseSchedule,
    sample_timesteps,
    snr_timestep_weights,
)
