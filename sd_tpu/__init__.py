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
