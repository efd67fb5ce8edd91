#!/usr/bin/env python
"""img2img / inpainting CLI: init image (+optional mask) → latent →
stochastic_encode to strength·S → guided DDIM decode → PNG.

Covers the reference's img2img surface (reference: DDIM/ddim.py:206-241
stochastic_encode/decode; mask blend :144-147).

Usage:
  python scripts/img2img.py --config configs/sd_txt2img.yaml \
      --init-image in.png --prompt "oil painting" --strength 0.6 --out out.png
  # inpainting: white mask pixels are kept, black are regenerated
  python scripts/img2img.py ... --mask mask.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--init-image", required=True)
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--negative-prompt", default="")
    ap.add_argument("--mask", default=None, help="inpaint mask png (white=keep)")
    ap.add_argument("--strength", type=float, default=0.75,
                    help="0..1 fraction of the schedule to re-noise")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance-scale", type=float, default=7.5)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="img2img.png")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from sd_tpu.core.config import load_yaml
    from sd_tpu.diffusion.ddim import DDIMSampler
    from sd_tpu.train.metrics import save_image_grid
    from sd_tpu.train.runners import build_ldm

    cfg = load_yaml(args.config)
    rng = jax.random.PRNGKey(args.seed)
    ld, unet, uparams, vae, vparams, clip = build_ldm(cfg, rng)

    if args.ckpt:
        from sd_tpu.train.checkpoint import restore_checkpoint
        from sd_tpu.train.diffusion import ddpm_optimizer, init_train_state

        state = init_train_state(uparams, ddpm_optimizer(1e-4),
                                 num_timesteps=ld.schedule.num_timesteps)
        state = restore_checkpoint(args.ckpt, state)
        uparams = jax.tree.map(
            lambda s, p: s.astype(p.dtype),
            state.ema.shadow if state.ema is not None else state.params,
            state.params)

    from sd_tpu.train.runners import apply_calibration

    ld = apply_calibration(ld, cfg, args.ckpt)

    lat = cfg["latent"]
    size = lat["image_size"] * (cfg["train"].get("image_size", 512)
                                // lat["image_size"]
                                if "train" in cfg else 8)
    img = Image.open(args.init_image).convert("RGB").resize((size, size))
    x = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]

    rng, r_enc, r_noise, r_dec = jax.random.split(rng, 4)
    z = ld.get_first_stage_encoding(ld.encode_first_stage(x, r_enc))

    c = {"c_crossattn": [clip([args.prompt])]}
    uc = {"c_crossattn": [clip([args.negative_prompt])]}

    sampler = DDIMSampler(ld.schedule,
                          parameterization=ld.process.parameterization)
    dd = sampler.make_schedule(args.steps)
    t_start = max(1, min(int(args.strength * args.steps), args.steps))

    z_noisy = sampler.stochastic_encode(
        z, jnp.asarray(t_start - 1), r_noise, dd)

    # jit with params as an ARGUMENT: closure weights bake into the scan
    # program as constants and trip the tunneled remote compiler's
    # request-size limit at real model scale
    if args.mask:
        m = Image.open(args.mask).convert("L").resize(
            (z.shape[2], z.shape[1]), Image.NEAREST)
        mask = (jnp.asarray(np.asarray(m, np.float32) / 255.0)[None, ..., None]
                > 0.5).astype(jnp.float32)

        @jax.jit
        def _run(p, zt, r):
            return sampler.sample(
                ld.model_fn(p), r, z.shape, num_steps=args.steps,
                cond=c, uncond=uc, guidance_scale=args.guidance_scale,
                x_T=zt, mask=mask, x0=z, dd=dd,
            )
    else:
        @jax.jit
        def _run(p, zt, r):
            return sampler.decode(
                ld.model_fn(p), zt, t_start, r,
                cond=c, uncond=uc, guidance_scale=args.guidance_scale, dd=dd,
            )
    z_out = _run(uparams, z_noisy, r_dec)

    out = ld.decode_first_stage(z_out)
    save_image_grid(np.asarray(out), args.out)
    print(f"[done] wrote {args.out} (strength={args.strength}, "
          f"t_start={t_start}/{args.steps}, mask={'yes' if args.mask else 'no'})")


if __name__ == "__main__":
    main()
