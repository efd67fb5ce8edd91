from sd_tpu.diffusion.ddpm import DDPMProcess
from sd_tpu.diffusion.ddim import DDIMSampler
