from sd_tpu.core.schedules import (
    make_beta_schedule,
    betas_for_alpha_bar,
    make_ddim_timesteps,
    make_ddim_sampling_parameters,
    DiffusionSchedule,
    DDIMSchedule,
    extract,
)
from sd_tpu.core.distributions import DiagonalGaussian, normal_kl
from sd_tpu.core.ema import EmaState, ema_init, ema_update, ema_copy_to
