from sd_tpu.diffusion.ddpm import DDPMProcess
from sd_tpu.diffusion.ddim import DDIMSampler
from sd_tpu.diffusion.dpm_solver import DPMSolverSampler, DPMSolverSchedule
from sd_tpu.diffusion.plms import PLMSSampler
from sd_tpu.diffusion.unipc import UniPCSampler, UniPCSchedule
from sd_tpu.diffusion.k_samplers import KDiffusionSampler, KSchedule
from sd_tpu.diffusion.consistency import ConsistencyDistiller
from sd_tpu.diffusion.flow import FlowEulerSampler, FlowProcess, FlowSchedule
from sd_tpu.diffusion.latent import (
    LatentDiffusion,
    apply_conditioned,
    calibrate_scale_factor,
    patched_apply,
)
