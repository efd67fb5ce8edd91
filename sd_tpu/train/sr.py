"""Latent-diffusion super-resolution: concat-conditioned SR training.

Composes three capabilities the reference ships but never wires together
into a runnable SR trainer:
  * the BSRGAN degradation pipeline as SR training augmentation
    (reference: image_degradation/bsrgan.py:29-716 — present, unused by
    any trainer);
  * the DiffusionWrapper's 'concat' conditioning dispatch (reference:
    ldm/diffusion/ddpm.py:2004-2034, channel-cat of cond with x_t);
  * the frozen first stage + latent diffusion machinery
    (ldm/diffusion/ddpm.py:607-1983).

The composition is the latent-diffusion-repo SR recipe (LDM-SR x4): an f4
first stage so the LR image lives at exactly the latent resolution and is
channel-concatenated with z_t; the UNet is the SD UNetModel with
use_spatial_transformer=false (self-attention only — there is no text
context). When sf != first-stage factor the LR conditioning is bilinearly
resized to the latent grid on device (the reference's SpatialRescaler
role, clip_encoder/modules.py:168-209).

TPU notes: the degradation runs on host in the loader threads (pure
numpy/PIL — never inside jit); the train step is the same jitted
(optionally mesh-parallel) diffusion step as the text-to-image path.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.config import instantiate_from_config, load_yaml
from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.diffusion.ddpm import DDPMProcess
from sd_tpu.train.checkpoint import auto_resume
from sd_tpu.train.diffusion import (
    ddpm_optimizer,
    init_train_state,
)
from sd_tpu.train.metrics import count_params, psnr, ssim
from sd_tpu.train.runners import (
    _build_first_stage,
    _build_loader,
    _make_lr,
    _maybe_parallel_step,
    _run_loop,
    ema_eval_params,
    first_stage_factor,
)

COND_CHANNELS = 3  # the LR RGB image is the conditioning


def build_ldm_sr(cfg: dict, rng: jax.Array):
    """Assemble the SR LatentDiffusion stack from config.
    Returns (ld, unet, unet_params, vae, vae_params)."""
    from sd_tpu.diffusion.latent import LatentDiffusion

    lat = cfg["latent"]
    size, ch = lat["image_size"], lat["channels"]
    unet_params_cfg = cfg["unet"].get("params", {})
    want_in = ch + COND_CHANNELS
    if unet_params_cfg.get("in_channels", want_in) != want_in:
        raise ValueError(
            f"SR concat conditioning needs unet.in_channels = latent "
            f"channels + {COND_CHANNELS} = {want_in}, got "
            f"{unet_params_cfg['in_channels']}")
    unet = instantiate_from_config(cfg["unet"])

    r1, r2 = jax.random.split(rng)
    pix = size * first_stage_factor(cfg["first_stage"])
    vae, vparams, encode_fn, decode_fn = _build_first_stage(
        cfg["first_stage"], r1, pix)
    uparams = unet.init(
        r2, jnp.zeros((1, size, size, want_in)),
        jnp.zeros((1,), jnp.int32), None,
    )["params"]

    diff_cfg = dict(cfg.get("diffusion", {}))
    min_snr = diff_cfg.pop("min_snr_gamma", None)
    sched = DiffusionSchedule.create(**diff_cfg)
    process = DDPMProcess(
        sched, clip_denoised=False,
        parameterization=diff_cfg.get("parameterization", "eps"),
        min_snr_gamma=min_snr,
    )
    ld = LatentDiffusion(
        process=process,
        unet_apply=lambda p, x, t, ctx, y=None: unet.apply(
            {"params": p}, x, t, ctx, y),
        encode_fn=encode_fn,
        decode_fn=decode_fn,
        cond_fn=None,
        conditioning_key="concat",
        scale_factor=(1.0 if lat.get("scale_factor") == "auto"
                      else lat.get("scale_factor", 1.0)),
    )
    return ld, unet, uparams, vae, vparams


def _lr_to_latent(lr: jax.Array, size: int) -> jax.Array:
    """Resize the LR conditioning to the latent grid (no-op when the SR
    factor equals the first-stage factor — the LDM-SR x4 setup)."""
    lr = jnp.asarray(lr)
    if lr.shape[1] == size and lr.shape[2] == size:
        return lr
    return jax.image.resize(
        lr, (lr.shape[0], size, size, lr.shape[-1]), "bilinear")


def _sr_eval_sampler(cfg, data_dir, ld_holder):
    """Super-resolve a FIXED peek batch each eval and log PSNR/SSIM of the
    SR output against the ground-truth HR. The grid stacks three rows:
    nearest-upsampled LR input / SR output / HR target."""
    lat = cfg["latent"]
    steps = cfg.get("sample", {}).get("num_steps", 20)
    ref_holder: list = []

    def sampler(state, r):
        if not ref_holder:
            loader = _build_loader(data_dir, cfg, 4)
            ref_holder.append(next(iter(loader)))
        batch = ref_holder[0]
        hr = np.asarray(batch["image"], np.float32)
        lr = np.asarray(batch["lr"], np.float32)
        ld = ld_holder[0]
        params = ema_eval_params(state)
        cond = {"c_concat": [_lr_to_latent(lr, lat["image_size"])]}
        sr = ld.sample(
            params, r,
            (hr.shape[0], lat["image_size"], lat["image_size"],
             lat["channels"]),
            cond=cond, num_steps=steps, eta=0.0)
        sr = np.asarray(sr, np.float32)
        # nearest-upsample the LR input to HR size for the comparison row
        rep = hr.shape[1] // lr.shape[1]
        lr_up = np.repeat(np.repeat(lr, rep, axis=1), rep, axis=2)
        grid = np.concatenate([lr_up, sr, hr], axis=0)
        return grid, {"psnr": psnr(sr, hr), "ssim": ssim(sr, hr)}

    return sampler


def train_ldm_sr(config: dict | str, data_dir: str,
                 out_dir: str = "runs/ldm_sr",
                 max_steps: int | None = None) -> Any:
    """Train the concat-conditioned SR latent diffusion model.

    Config shape: like the ldm task but without a cond_stage block, plus a
    `data.sr` block selecting the degradation:

        data:
          sr: {sf: 4, degradation: bsrgan}   # bicubic | bsrgan |
                                             # bsrgan_light | bsrgan_variant
    """
    cfg = load_yaml(config) if isinstance(config, str) else config
    tc = cfg["train"]
    lat = cfg["latent"]
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    ld, unet, uparams, vae, vparams = build_ldm_sr(cfg, rng)
    print(f"[ldm_sr] unet params: {count_params(uparams)/1e6:.1f}M")

    if lat.get("scale_factor") == "auto":
        # std-rescaling on the first batch (reference scale_by_std,
        # ldm/diffusion/ddpm.py:621-660), persisted for sampling
        from sd_tpu.diffusion.latent import calibrate_scale_factor

        batch = next(iter(_build_loader(data_dir, cfg, 4)))
        z = ld.encode_fn(jnp.asarray(batch["image"]), jax.random.PRNGKey(0))
        ld = dataclasses.replace(ld, scale_factor=calibrate_scale_factor(z))
        print(f"[ldm_sr] scale_factor (std-rescale): {ld.scale_factor:.4f}")
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "calibration.json"), "w") as f:
            json.dump({"scale_factor": float(ld.scale_factor)}, f)

    opt = ddpm_optimizer(_make_lr(tc), tc.get("grad_clip", 1.0),
                         weight_decay=tc.get("weight_decay", 0.0))
    learn_logvar = tc.get("learn_logvar", False)

    def loss_fn(p, batch, rng, logvar):
        return ld.training_loss(p, batch, rng, learned_logvar=logvar)

    def batch_transform(batch):
        return {
            "image": jnp.asarray(batch["image"]),
            "concat_cond": _lr_to_latent(batch["lr"], lat["image_size"]),
        }

    state = init_train_state(
        uparams, opt, tc.get("ema_decay", 0.9999),
        num_timesteps=ld.schedule.num_timesteps, learn_logvar=learn_logvar,
    )
    state, start = auto_resume(os.path.join(out_dir, "ckpt"), state)
    step_fn, state = _maybe_parallel_step(cfg, loss_fn, opt, state,
                                          learn_logvar=learn_logvar,
                                          grad_accum=tc.get("grad_accum", 1))

    ld_holder = [ld]
    state = _run_loop(step_fn, state, cfg, data_dir, out_dir, rng, start,
                      max_steps=max_steps,
                      sampler=_sr_eval_sampler(cfg, data_dir, ld_holder),
                      batch_transform=batch_transform)
    return state


def super_resolve(ld, params, lr_images, rng, latent_cfg: dict,
                  num_steps: int = 50, eta: float = 0.0,
                  sampler: str = "ddim") -> np.ndarray:
    """Super-resolve a batch of LR images ([-1,1] NHWC) with a trained SR
    LDM: LR -> latent-grid conditioning -> sampler -> first-stage decode."""
    size, ch = latent_cfg["image_size"], latent_cfg["channels"]
    lr = jnp.asarray(lr_images)

    # params/cond as jit ARGUMENTS: closure weights embed into the scan
    # program as constants and can exceed remote-compile size limits
    @jax.jit
    def _run(p, c, r):
        return ld.sample(p, r, (lr.shape[0], size, size, ch), cond=c,
                         num_steps=num_steps, eta=eta, sampler=sampler)

    out = _run(params, {"c_concat": [_lr_to_latent(lr, size)]}, rng)
    return np.asarray(out, np.float32)
