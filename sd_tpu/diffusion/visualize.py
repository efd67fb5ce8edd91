"""Visual diagnostics: diffusion/denoise rows, progressive sampling grids,
inpaint/outpaint demos.

Capability parity with the reference's `log_images` surface
(reference: ldm/diffusion/ddpm.py:543-590 DDPM.log_images, :1829-1938
LatentDiffusion.log_images — inputs/reconstruction/conditioning/
diffusion_row/denoise_row/samples/inpainting/outpainting/progressive;
progressive_denoising :1663-1741). Host-side assembly on top of the pure
samplers; every device computation is one jitted call.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.diffusion.latent import LatentDiffusion
from sd_tpu.train.metrics import log_txt_as_img


def diffusion_row(ld: LatentDiffusion, z: jax.Array, rng: jax.Array,
                  n_steps: int = 8) -> jax.Array:
    """Forward-diffusion strip: q_sample(z, t) for t spread over [0, T)
    (reference: log_images diffusion_row). Returns [S, B, ...] latents."""
    T = ld.schedule.num_timesteps
    ts = jnp.linspace(0, T - 1, n_steps).astype(jnp.int32)

    def one(t):
        noise = jax.random.normal(jax.random.fold_in(rng, t), z.shape)
        tb = jnp.full((z.shape[0],), t, jnp.int32)
        return ld.schedule.q_sample(z, tb, noise)

    return jax.lax.map(one, ts)


def denoise_row(ld: LatentDiffusion, params: Any, rng: jax.Array,
                shape: tuple, cond: dict | None = None,
                num_steps: int = 50, n_keep: int = 8):
    """Reverse-pass strip of predicted x0 at evenly spaced sampler steps
    (reference: log_images denoise_row via progressive_denoising)."""
    from sd_tpu.diffusion.ddim import DDIMSampler

    sampler = DDIMSampler(ld.schedule,
                          parameterization=ld.process.parameterization)
    z, pred_x0s = sampler.sample(
        ld.model_fn(params), rng, shape, num_steps=num_steps, cond=cond,
        return_pred_x0=True,
    )
    idx = np.linspace(0, num_steps - 1, n_keep).astype(int)
    return z, pred_x0s[idx]


def log_images(
    ld: LatentDiffusion,
    params: Any,
    batch: dict,
    rng: jax.Array,
    n_rows: int = 4,
    sample_steps: int = 50,
    guidance_scale: float = 1.0,
    uncond: dict | None = None,
    inpaint: bool = True,
) -> dict[str, np.ndarray]:
    """Produce the reference's visual-log dictionary for a batch:
    inputs, reconstruction, conditioning (text rendered), diffusion_row,
    samples, denoise_row, inpainting/outpainting demos. All values are
    float NHWC in [-1, 1] on host."""
    out: dict[str, np.ndarray] = {}
    x = batch["image"][:n_rows]
    out["inputs"] = np.asarray(x)

    rng, r_enc, r_diff, r_samp, r_inp = jax.random.split(rng, 5)
    z = ld.get_first_stage_encoding(ld.encode_first_stage(x, r_enc))
    out["reconstruction"] = np.asarray(ld.decode_first_stage(z))

    if "txt_raw" in batch:
        texts = list(batch["txt_raw"][:n_rows])
        out["conditioning"] = log_txt_as_img((x.shape[1], x.shape[2]), texts)

    cond = None
    if ld.conditioning_key == "crossattn" and "txt_emb" in batch:
        cond = {"c_crossattn": [batch["txt_emb"][:n_rows]]}

    # forward-diffusion strip (decoded)
    drow = diffusion_row(ld, z, r_diff)
    out["diffusion_row"] = np.stack(
        [np.asarray(ld.decode_first_stage(d)) for d in drow]
    )

    # samples + denoise strip
    zs, pred_rows = denoise_row(ld, params, r_samp, z.shape, cond,
                                num_steps=sample_steps)
    out["samples"] = np.asarray(ld.decode_first_stage(zs))
    out["denoise_row"] = np.stack(
        [np.asarray(ld.decode_first_stage(p)) for p in pred_rows]
    )

    if inpaint:
        # mask demo: keep the left half, regenerate the right
        # (reference: log_images inpainting/outpainting blocks)
        from sd_tpu.diffusion.ddim import DDIMSampler

        mask = np.ones(z.shape, np.float32)
        mask[:, :, z.shape[2] // 2:, :] = 0.0  # regenerate right half
        mask = jnp.asarray(mask)
        sampler = DDIMSampler(ld.schedule,
                              parameterization=ld.process.parameterization)
        z_inp = sampler.sample(
            ld.model_fn(params), r_inp, z.shape, num_steps=sample_steps,
            cond=cond, uncond=uncond, guidance_scale=guidance_scale,
            mask=mask, x0=z,
        )
        out["inpainting"] = np.asarray(ld.decode_first_stage(z_inp))
        z_out = sampler.sample(
            ld.model_fn(params), r_inp, z.shape, num_steps=sample_steps,
            cond=cond, uncond=uncond, guidance_scale=guidance_scale,
            mask=1.0 - mask, x0=z,
        )
        out["outpainting"] = np.asarray(ld.decode_first_stage(z_out))
    return out


def progressive_denoising_grid(ld: LatentDiffusion, params: Any,
                               rng: jax.Array, shape: tuple,
                               cond: dict | None = None,
                               num_steps: int = 50, n_keep: int = 8):
    """Progressive-generation strip from pure noise (reference:
    progressive_denoising + `progressive_row`)."""
    _, rows = denoise_row(ld, params, rng, shape, cond, num_steps, n_keep)
    return np.stack([np.asarray(ld.decode_first_stage(r)) for r in rows])
