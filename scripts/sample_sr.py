#!/usr/bin/env python
"""Super-resolution sampling CLI: LR image(s) → concat-conditioned LDM →
VAE decode → side-by-side PNG.

Usage (after training configs/ldm_sr_catdog.yaml):
  python scripts/sample_sr.py --config configs/ldm_sr_catdog.yaml \
      --ckpt runs/ldmsr_catdog/ckpt --input some_dir_or_image \
      --out sr_samples.png

--input takes either pre-degraded LR images (matching the config's
train.image_size / sf grid) or full-size HR images, which are then
bicubic-degraded on host first (--degrade, default) so the output grid can
show LR / SR / ground-truth HR rows.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (else random init)")
    ap.add_argument("--input", required=True,
                    help="image file or directory")
    ap.add_argument("--n", type=int, default=4, help="max images")
    ap.add_argument("--degrade", default="bicubic",
                    choices=["bicubic", "bsrgan", "bsrgan_light",
                             "bsrgan_variant", "none"],
                    help="degradation applied to --input to produce the LR "
                         "conditioning; 'none' = input already IS the LR")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--sampler", default="ddim",
                    choices=["ddim", "dpm", "plms", "ddpm"])
    ap.add_argument("--eta", type=float, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="sr_samples.png")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from sd_tpu.core.config import load_yaml
    from sd_tpu.data import degradation as deg
    from sd_tpu.data.datasets import ImageFolderDataset, ImagePathsDataset
    from sd_tpu.train.checkpoint import restore_checkpoint
    from sd_tpu.train.diffusion import ddpm_optimizer, init_train_state
    from sd_tpu.train.metrics import psnr, save_image_grid, ssim
    from sd_tpu.train.runners import apply_calibration, ema_eval_params
    from sd_tpu.train.sr import build_ldm_sr, super_resolve

    cfg = load_yaml(args.config)
    lat = cfg["latent"]
    scfg = cfg.get("sample", {})
    steps = args.steps or scfg.get("num_steps", 50)
    eta = args.eta if args.eta is not None else scfg.get("eta", 0.0)
    sf = int(cfg.get("data", {}).get("sr", {}).get("sf", 4))
    hr_size = cfg["train"]["image_size"]

    rng = jax.random.PRNGKey(args.seed)
    ld, unet, uparams, vae, vparams = build_ldm_sr(cfg, rng)
    if args.ckpt:
        state = init_train_state(
            uparams, ddpm_optimizer(1e-4),
            ema_decay=cfg["train"].get("ema_decay", 0.9999),
            num_timesteps=ld.schedule.num_timesteps)
        state = restore_checkpoint(args.ckpt, state)
        uparams = ema_eval_params(state)
        print(f"[sample_sr] restored {args.ckpt} @ step {int(state.step)}")
    ld = apply_calibration(ld, cfg, args.ckpt)

    # -- load inputs ---------------------------------------------------------
    if os.path.isdir(args.input):
        ds = ImageFolderDataset(
            args.input,
            image_size=(hr_size if args.degrade != "none"
                        else hr_size // sf),
            random_flip=False)
        items = [ds[i]["image"] for i in range(min(args.n, len(ds)))]
    else:
        size = hr_size if args.degrade != "none" else hr_size // sf
        ds = ImagePathsDataset([args.input], image_size=size)
        items = [ds[0]["image"]]
    x = np.stack(items)

    hr = None
    if args.degrade == "none":
        lr = x
    else:
        hr = x
        rng_np = np.random.default_rng(args.seed)
        lrs = []
        for im in (x + 1.0) * 0.5:
            if args.degrade == "bicubic":
                lq = deg.bicubic_degradation(im, sf)
            elif args.degrade == "bsrgan":
                lq, _ = deg.degradation_bsrgan(im, sf, rng_np)
            elif args.degrade == "bsrgan_light":
                lq, _ = deg.degradation_bsrgan(im, sf, rng_np, light=True)
            else:
                lq, _ = deg.degradation_bsrgan_variant(im, sf, rng_np)
            lrs.append(np.clip(lq, 0, 1) * 2.0 - 1.0)
        lr = np.stack(lrs).astype(np.float32)

    sr = super_resolve(ld, uparams, lr, jax.random.fold_in(rng, 1), lat,
                       num_steps=steps, eta=eta, sampler=args.sampler)

    rep = hr_size // lr.shape[1]
    lr_up = np.repeat(np.repeat(lr, rep, axis=1), rep, axis=2)
    rows = [lr_up, sr] + ([hr] if hr is not None else [])
    save_image_grid(np.concatenate(rows, axis=0), args.out, rows=len(rows))
    msg = f"[done] {sr.shape[0]} images -> {args.out}"
    if hr is not None:
        msg += f"  psnr={psnr(sr, hr):.2f} ssim={ssim(sr, hr):.3f}"
    print(msg)


if __name__ == "__main__":
    main()
