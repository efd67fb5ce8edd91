"""Inpainting-specialized latent diffusion (the SD-inpainting recipe).

Beyond-reference capability: the reference's only inpainting is the
sampling-time mask blend inside DDIM (`DDIM/ddim.py:144-147` — keep-region
latents are re-noised and pasted back each step; the model never *sees*
the mask). Production SD inpainting instead trains a mask-CONDITIONED
model (runwayml/stable-diffusion-inpainting): the UNet input is

    [z_t | mask↓ | E(x · (1 − mask))]     → in_channels = 2·z + 1

i.e. the noisy latent channel-concatenated with the nearest-downsampled
hole mask and the encoded masked image, while the text prompt rides the
usual cross-attention — the reference's own 'hybrid' conditioning dispatch
(ldm/diffusion/ddpm.py:2004-2034) composed with its first-stage machinery,
plus host-side random mask synthesis for training.

Internally mask == 1 means HOLE (regenerate); the public pipeline surface
keeps this repo's established convention (white/1 = keep) and inverts at
the boundary.

TPU notes: masks are synthesized per step on host (numpy, in the loader
thread); the masked-image encode runs inside the same jitted train step as
the main encode, so there is still exactly one program per step. All
shapes static — the mask is a dense [B,H,W,1] float tensor, never a
dynamic-size index set.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.config import load_yaml
from sd_tpu.train.checkpoint import auto_resume
from sd_tpu.train.diffusion import ddpm_optimizer, init_train_state
from sd_tpu.train.metrics import count_params
from sd_tpu.train.runners import (
    _build_loader,
    _make_lr,
    _maybe_parallel_step,
    _peek_batch,
    _run_loop,
    build_ldm,
    ema_eval_params,
)


# -- host-side mask synthesis -------------------------------------------------

def random_inpaint_masks(
    rng: np.random.Generator,
    batch: int,
    height: int,
    width: int,
    full_prob: float = 0.1,
    max_rects: int = 3,
    max_strokes: int = 2,
) -> np.ndarray:
    """Synthesize training hole masks: [B, H, W, 1] float32 in {0, 1},
    1 = hole (regenerate). Mix of axis-aligned rectangles and thick
    random-walk brush strokes (the LaMa/SD-inpainting training menu), with
    probability `full_prob` the whole image (which teaches the model plain
    text-to-image — the mode the serving path relies on for fully-masked
    regions)."""
    masks = np.zeros((batch, height, width, 1), np.float32)
    for i in range(batch):
        if rng.random() < full_prob:
            masks[i] = 1.0
            continue
        for _ in range(int(rng.integers(1, max_rects + 1))):
            rh = int(rng.integers(max(1, height // 8), max(2, height // 2)))
            rw = int(rng.integers(max(1, width // 8), max(2, width // 2)))
            y0 = int(rng.integers(0, height - rh + 1))
            x0 = int(rng.integers(0, width - rw + 1))
            masks[i, y0:y0 + rh, x0:x0 + rw, 0] = 1.0
        for _ in range(int(rng.integers(0, max_strokes + 1))):
            # thick random-walk stroke: a sequence of stamped discs
            y = float(rng.integers(0, height))
            x = float(rng.integers(0, width))
            r = max(2, int(min(height, width) * float(rng.uniform(0.04, 0.1))))
            ang = float(rng.uniform(0, 2 * np.pi))
            yy, xx = np.mgrid[:height, :width]
            for _ in range(int(rng.integers(4, 12))):
                disc = (yy - y) ** 2 + (xx - x) ** 2 <= r * r
                masks[i, disc, 0] = 1.0
                ang += float(rng.uniform(-0.8, 0.8))
                step = r * float(rng.uniform(1.0, 2.5))
                y = float(np.clip(y + step * np.sin(ang), 0, height - 1))
                x = float(np.clip(x + step * np.cos(ang), 0, width - 1))
    return masks


def mask_to_latent(mask: jax.Array, lh: int, lw: int) -> jax.Array:
    """Nearest-downsample a pixel-space hole mask [B,H,W,1] to the latent
    grid (the SD-inpainting convention: F.interpolate(mask, nearest))."""
    if mask.shape[1] == lh and mask.shape[2] == lw:
        return mask
    return jax.image.resize(mask, (mask.shape[0], lh, lw, 1), "nearest")


def inpaint_concat_cond(ld, image: jax.Array, mask: jax.Array,
                        rng: jax.Array, lh: int, lw: int) -> jax.Array:
    """Build the [mask↓ | E(x·(1−mask))·scale] concat conditioning
    ([B, lh, lw, 1+z]). `mask` is pixel-resolution, 1 = hole."""
    masked = image * (1.0 - mask)
    mz = ld.get_first_stage_encoding(ld.encode_first_stage(masked, rng))
    mlat = mask_to_latent(mask, lh, lw).astype(mz.dtype)
    return jnp.concatenate([mlat, mz], axis=-1)


# -- trainer ------------------------------------------------------------------

def _check_inpaint_config(cfg: dict) -> None:
    lat = cfg["latent"]
    ch = lat["channels"]
    want_in = 2 * ch + 1
    got = cfg["unet"].get("params", {}).get("in_channels", ch)
    if got != want_in:
        raise ValueError(
            f"inpainting conditioning needs unet.in_channels = 2·latent "
            f"channels + 1 = {want_in}, got {got}")
    if lat.get("conditioning_key", "crossattn") != "hybrid":
        raise ValueError("ldm_inpaint needs latent.conditioning_key: hybrid")


def _inpaint_eval_sampler(cfg, data_dir, ld_holder, clip):
    """Inpaint a FIXED peek batch with fixed masks each eval; the grid
    stacks masked-input / inpainted / original rows."""
    lat = cfg["latent"]
    lh = lw = lat["image_size"]
    steps = cfg.get("sample", {}).get("num_steps", 20)
    gs = cfg.get("sample", {}).get("guidance_scale", 1.0)
    ref_holder: list = []

    def sampler(state, r):
        if not ref_holder:
            loader = _build_loader(data_dir, cfg, 4)
            batch = next(iter(loader))
            img = np.asarray(batch["image"], np.float32)
            m = random_inpaint_masks(
                np.random.default_rng(0x1A5C), img.shape[0],
                img.shape[1], img.shape[2], full_prob=0.0)
            texts = batch.get("txt_raw", [""] * len(img))
            ref_holder.append((img, m, clip(list(texts)), clip([""] * len(img))))
        img, m, emb, uemb = ref_holder[0]
        ld = ld_holder[0]
        params = ema_eval_params(state)
        x = jnp.asarray(img)
        mask = jnp.asarray(m)
        cc = inpaint_concat_cond(ld, x, mask, jax.random.PRNGKey(7), lh, lw)
        cond = {"c_crossattn": [emb], "c_concat": [cc]}
        uncond = {"c_crossattn": [uemb], "c_concat": [cc]}
        out = ld.sample(
            params, r, (img.shape[0], lh, lw, lat["channels"]),
            cond=cond, uncond=(uncond if gs > 1.0 else None),
            guidance_scale=gs, num_steps=steps, eta=0.0)
        out = np.asarray(out, np.float32)
        # composite the generated hole into the original (serving behavior)
        comp = out * m + img * (1.0 - m)
        masked_vis = img * (1.0 - m) + (-1.0) * m  # holes rendered black
        grid = np.concatenate([masked_vis, comp, img], axis=0)
        return grid

    return sampler


def train_ldm_inpaint(config: dict | str, data_dir: str,
                      out_dir: str = "runs/ldm_inpaint",
                      max_steps: int | None = None) -> Any:
    """Train the mask-conditioned inpainting LDM.

    Config shape: the ldm task with
        latent.conditioning_key: hybrid
        unet.params.in_channels: 2*latent.channels + 1
    plus an optional `data.inpaint` block:
        data:
          inpaint: {full_prob: 0.1, max_rects: 3, max_strokes: 2}
    """
    cfg = load_yaml(config) if isinstance(config, str) else config
    _check_inpaint_config(cfg)
    tc = cfg["train"]
    lat = cfg["latent"]
    lh = lw = lat["image_size"]
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    ld, unet, uparams, vae, vparams, clip = build_ldm(cfg, rng)
    print(f"[ldm_inpaint] unet params: {count_params(uparams)/1e6:.1f}M")

    if lat.get("scale_factor") == "auto":
        from sd_tpu.diffusion.latent import calibrate_scale_factor

        z = ld.encode_fn(_peek_batch(cfg, data_dir), jax.random.PRNGKey(0))
        ld = dataclasses.replace(ld, scale_factor=calibrate_scale_factor(z))
        print(f"[ldm_inpaint] scale_factor (std-rescale): "
              f"{ld.scale_factor:.4f}")
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "calibration.json"), "w") as f:
            json.dump({"scale_factor": float(ld.scale_factor)}, f)

    mk = dict(cfg.get("data", {}).get("inpaint", {}) or {})
    cond_dropout = float(tc.get("cond_dropout", 0.0))
    _host_rng = np.random.default_rng((cfg.get("seed", 0), 0x1A5C))

    def embed_batch(batch):
        img = np.asarray(batch["image"], np.float32)
        texts = list(batch.get("txt_raw", [""] * len(img)))
        if cond_dropout > 0.0:
            texts = ["" if _host_rng.random() < cond_dropout else t
                     for t in texts]
        mask = random_inpaint_masks(
            _host_rng, img.shape[0], img.shape[1], img.shape[2], **mk)
        return {"image": jnp.asarray(img), "txt_emb": clip(texts),
                "mask": jnp.asarray(mask)}

    opt = ddpm_optimizer(_make_lr(tc), tc.get("grad_clip", 1.0),
                         weight_decay=tc.get("weight_decay", 0.0))
    learn_logvar = tc.get("learn_logvar", False)

    def loss_fn(p, batch, rng, logvar):
        rng_m, rng_loss = jax.random.split(rng)
        cc = inpaint_concat_cond(
            ld, batch["image"], batch["mask"], rng_m, lh, lw)
        return ld.training_loss(
            p, {**batch, "concat_cond": cc}, rng_loss,
            learned_logvar=logvar)

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
                      sampler=_inpaint_eval_sampler(cfg, data_dir, ld_holder,
                                                    clip),
                      batch_transform=embed_batch)
    return state
