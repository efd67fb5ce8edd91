"""log_images / progressive denoising tests (reference: ldm log_images,
SURVEY.md §5.5)."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.diffusion.ddpm import DDPMProcess
from sd_tpu.diffusion.latent import LatentDiffusion
from sd_tpu.diffusion.visualize import (
    diffusion_row,
    log_images,
    progressive_denoising_grid,
)


def make_ld():
    sched = DiffusionSchedule.create(timesteps=20)
    return LatentDiffusion(
        process=DDPMProcess(sched),
        unet_apply=lambda p, x, t, ctx, y=None: p["w"] * x,
        encode_fn=lambda x, r: x[:, ::2, ::2],
        decode_fn=lambda z: jnp.repeat(jnp.repeat(z, 2, 1), 2, 2),
        cond_fn=None,
        conditioning_key="crossattn",
        scale_factor=1.0,
    )


PARAMS = {"w": jnp.asarray(0.1)}


def test_diffusion_row_shapes(rng):
    ld = make_ld()
    z = jnp.ones((2, 4, 4, 3))
    row = diffusion_row(ld, z, rng, n_steps=5)
    assert row.shape == (5, 2, 4, 4, 3)
    # later timesteps are noisier
    assert float(jnp.std(row[-1])) > float(jnp.std(row[0]))


def test_log_images_keys(rng):
    ld = make_ld()
    batch = {"image": jnp.ones((2, 8, 8, 3)),
             "txt_emb": jnp.zeros((2, 7, 16)),
             "txt_raw": ["a cat", "a dog"]}
    out = log_images(ld, PARAMS, batch, rng, n_rows=2, sample_steps=4)
    for key in ("inputs", "reconstruction", "conditioning", "diffusion_row",
                "samples", "denoise_row", "inpainting", "outpainting"):
        assert key in out, key
    assert out["samples"].shape == (2, 8, 8, 3)
    assert out["denoise_row"].shape[0] == 8
    assert out["conditioning"].shape == (2, 8, 8, 3)
    for k, v in out.items():
        assert np.isfinite(v).all(), k


def test_progressive_grid(rng):
    ld = make_ld()
    grid = progressive_denoising_grid(ld, PARAMS, rng, (1, 4, 4, 3),
                                      num_steps=4, n_keep=3)
    assert grid.shape == (3, 1, 8, 8, 3)
