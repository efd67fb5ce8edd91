"""sd_tpu — a TPU-native (JAX / Flax / Pallas / pjit) stable-diffusion framework.

Re-designed from scratch with the capabilities of the reference PyTorch repo
(ProgramerSalar/stable-diffusion-from-scratch, see /root/repo/SURVEY.md):

  1. unconditional pixel-space DDPM training + ancestral sampling
  2. DDIM deterministic sampling (uniform/quad striding, eta, CFG, inpaint, img2img)
  3. KL-VAE with LPIPS + KL + PatchGAN loss (two-optimizer GAN training)
  4. VQ-VAE with codebook quantization + VQ-LPIPS-GAN loss
  5. text-conditioned latent diffusion (CLIP text encoder + SD UNet + DDIM)

Design stance (TPU-first, not a port):
  * NHWC image layout everywhere (XLA/TPU-native), bf16 compute with fp32
    GroupNorm/softmax accumulation.
  * all samplers are `lax.scan` loops over precomputed on-device schedule tables;
    training steps are single jitted/pjitted functions.
  * flash attention is a Pallas kernel (the reference's only native dep is the
    flash_attn CUDA wheel — here it is a Mosaic/TPU kernel).
  * scaling is `jax.sharding.Mesh` + NamedSharding (data/tensor axes), not NCCL.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level API: keep `import sd_tpu` light (no data/PIL imports)
    if name == "Text2ImagePipeline":
        from sd_tpu.pipeline import Text2ImagePipeline

        return Text2ImagePipeline
    if name == "LatentDiffusion":
        from sd_tpu.diffusion.latent import LatentDiffusion

        return LatentDiffusion
    if name == "DDIMSampler":
        from sd_tpu.diffusion.ddim import DDIMSampler

        return DDIMSampler
    if name == "DDPMProcess":
        from sd_tpu.diffusion.ddpm import DDPMProcess

        return DDPMProcess
    if name == "DiffusionSchedule":
        from sd_tpu.core.schedules import DiffusionSchedule

        return DiffusionSchedule
    if name == "DPMSolverSampler":
        from sd_tpu.diffusion.dpm_solver import DPMSolverSampler

        return DPMSolverSampler
    if name == "PLMSSampler":
        from sd_tpu.diffusion.plms import PLMSSampler

        return PLMSSampler
    if name == "KDiffusionSampler":
        from sd_tpu.diffusion.k_samplers import KDiffusionSampler

        return KDiffusionSampler
    if name == "UniPCSampler":
        from sd_tpu.diffusion.unipc import UniPCSampler

        return UniPCSampler
    if name == "ConsistencyDistiller":
        from sd_tpu.diffusion.consistency import ConsistencyDistiller

        return ConsistencyDistiller
    if name in ("FlowProcess", "FlowSchedule", "FlowEulerSampler"):
        from sd_tpu.diffusion import flow

        return getattr(flow, name)
    raise AttributeError(f"module 'sd_tpu' has no attribute {name!r}")
