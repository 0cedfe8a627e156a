from .solvers import (  # noqa: F401
    SAMPLERS,
    ddim_sample,
    ddpm_sample,
    dpm_solver_sample,
    get_sampler,
    make_timesteps,
)
