#!/usr/bin/env python
"""Text-to-image sampling CLI: prompt → CLIP → DDIM(CFG) → VAE decode → PNG.

Usage:
  python scripts/sample.py --config configs/sd_txt2img.yaml \
      --prompt "a photograph of an astronaut riding a horse" \
      --ckpt runs/ldm/ckpt --out samples.png

Covers the reference's sampling surface (reference:
ldm/diffusion/ddpm.py:1742-1826 sample/sample_log + DDIM handoff,
DDIM/ddim.py:56-111) as a standalone pipeline.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--prompt", default=[""], nargs="+",
                    help="text prompt(s) (ldm task; ignored for task: ddpm)")
    ap.add_argument("--sampler", default=None,
                    choices=["ddpm", "ddim", "dpm", "dpm_sde", "unipc", "plms",
                             "euler", "euler_a", "heun", "lcm", "flow",
                             "flow_midpoint"],
                    help="ddpm task: ancestral (default) or ddim; ldm task: "
                         "ddim (default), dpm (DPM-Solver++(2M) — ~15 steps "
                         "for DDIM-50 quality), unipc (predictor-corrector, "
                         "best at 5-10 steps), plms, euler/euler_a/heun, "
                         "lcm (consistency-distilled students, 1-4 steps), "
                         "or flow/flow_midpoint (flow-matching models — "
                         "the default when diffusion.type: flow)")
    ap.add_argument("--negative-prompt", default="")
    ap.add_argument("--ckpt", default=None, help="checkpoint dir (else random init)")
    ap.add_argument("--out", default="samples.png")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--guidance-scale", type=float, default=None)
    ap.add_argument("--guidance-rescale", type=float, default=0.0,
                    help="CFG std-rescale (arXiv:2305.08891), 0=off, ~0.7 "
                         "fixes over-exposure at high guidance")
    ap.add_argument("--eta", type=float, default=None)
    ap.add_argument("--sag-scale", type=float, default=0.0,
                    help="Self-Attention Guidance strength (arXiv:2210.00939;"
                         " typical 0.5-0.75, ddim sampler only)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--controlnet", default=None,
                    help="ControlNet training-run dir (ldm task): run the "
                         "controlled UNet (arXiv:2302.05543)")
    ap.add_argument("--ip-adapter", default=None,
                    help="IP-Adapter training-run dir (ldm task): image-"
                         "prompt conditioning (arXiv:2308.06721); needs "
                         "--ip-image")
    ap.add_argument("--ip-image", default=None,
                    help="image prompt file for --ip-adapter")
    ap.add_argument("--ip-scale", type=float, default=1.0)
    ap.add_argument("--control-image", default=None,
                    help="conditioning image for --controlnet; by default "
                         "edge_hint() extracts edges from it first")
    ap.add_argument("--control-extract", default="canny",
                    choices=["canny", "none"],
                    help="hint extraction applied to --control-image "
                         "('none' = the file already IS the hint map)")
    ap.add_argument("--control-scale", type=float, default=1.0)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from sd_tpu.core.config import load_yaml
    from sd_tpu.train.metrics import save_image_grid
    from sd_tpu.train.runners import build_ldm

    cfg = load_yaml(args.config)
    rng = jax.random.PRNGKey(args.seed)

    if cfg.get("task") == "ddpm":
        # post-hoc sampling from a trained pixel-space DDPM run (the
        # reference bakes this into its train loop only, DDPM/train.py:109;
        # DDIM mode covers DDIM/ddim.py:56-111 on pixel models)
        _sample_ddpm(cfg, args, rng)
        return

    # honor the training memory policy: a bf16-params run samples in bf16
    # (2× HBM headroom + MXU rate; numerics identical to the train compute)
    pd = cfg.get("train", {}).get("param_dtype")
    ld, unet, uparams, vae, vparams, clip = build_ldm(
        cfg, rng, param_dtype=jnp.dtype(pd) if pd else None)

    if args.ckpt:
        from sd_tpu.train.checkpoint import restore_pytree

        # raw-pytree restore STAGED ON HOST: a full TrainState template +
        # on-device restore is ~24 GB at the 859M flagship shape (the
        # checkpoint alone is ~12 GB with Adam moments + EMA); only the
        # EMA/params subtree belongs in HBM (the reference's ema_scope)
        tree = restore_pytree(args.ckpt, device="cpu")
        ema_t = tree.get("ema") if isinstance(tree, dict) else None
        src = (ema_t["shadow"]
               if isinstance(ema_t, dict) and ema_t.get("shadow") is not None
               else tree["params"])
        uparams = jax.device_put(
            jax.tree.map(lambda s, p: s.astype(p.dtype), src, uparams),
            jax.devices()[0])
        del tree, src

    from sd_tpu.train.runners import apply_calibration

    lat = cfg["latent"]
    ld = apply_calibration(ld, cfg, args.ckpt)

    prompts = args.prompt
    b = args.batch or len(prompts)
    if len(prompts) == 1 and b > 1:
        prompts = prompts * b

    sc = cfg.get("sample", {})
    steps = args.steps or sc.get("num_steps", 50)
    gs = args.guidance_scale if args.guidance_scale is not None else sc.get(
        "guidance_scale", 7.5)
    eta = args.eta if args.eta is not None else sc.get("eta", 0.0)

    c = clip(prompts)
    uc = clip([args.negative_prompt] * len(prompts))
    shape = (len(prompts), lat["image_size"], lat["image_size"], lat["channels"])
    cond = {"c_crossattn": [c]}
    uncond = {"c_crossattn": [uc]}

    if args.controlnet:
        # controlled sampling: residuals from the trained branch steer both
        # CFG passes (models/controlnet.py; serving analog: pipeline
        # load_controlnet + generate(control_image=...))
        import dataclasses as _dc

        from PIL import Image

        from sd_tpu.models.controlnet import (
            controlled_apply_fn,
            controlnet_from_unet_config,
        )
        from sd_tpu.train.checkpoint import restore_pytree
        from sd_tpu.train.runners import first_stage_factor

        if not args.control_image:
            raise SystemExit("--controlnet needs --control-image")
        if args.sag_scale > 0.0:
            raise SystemExit("--sag-scale cannot combine with --controlnet "
                             "(the SAG probe pass has no control branch)")
        f_vae = first_stage_factor(cfg["first_stage"])
        pix = lat["image_size"] * f_vae
        im = Image.open(args.control_image).convert("RGB").resize((pix, pix))
        hint = np.asarray(im, np.float32) / 255.0
        if args.control_extract == "canny":
            from sd_tpu.data.hints import edge_hint

            hint = edge_hint(np.asarray(im))
        hint = jnp.asarray(np.broadcast_to(hint[None],
                                           (len(prompts),) + hint.shape))
        cn_dir = args.controlnet
        if os.path.isdir(os.path.join(cn_dir, "ckpt")):
            cn_dir = os.path.join(cn_dir, "ckpt")
        tree = restore_pytree(cn_dir)
        ema_t = tree.get("ema")
        cn_params = (ema_t["shadow"] if isinstance(ema_t, dict)
                     and ema_t.get("shadow") is not None else tree["params"])
        cn = controlnet_from_unet_config(
            cfg["unet"]["params"], hint_downsamples=f_vae.bit_length() - 1)
        ld = _dc.replace(ld, unet_apply=controlled_apply_fn(
            unet, cn, args.control_scale))
        uparams = {"unet": uparams, "controlnet": cn_params}
        cond["c_control"] = hint
        uncond["c_control"] = hint

    if args.ip_adapter:
        # IP-Adapter image prompting (models/ip_adapter.py): adapter from
        # its training run + the run's frozen image embedder; the CFG
        # uncond branch gets the zero embedding (the trained image-free
        # state)
        import dataclasses as _dc

        from PIL import Image

        from sd_tpu.models.conditioners import FrozenClipImageEmbedder
        from sd_tpu.models.ip_adapter import ip_apply_fn
        from sd_tpu.train.checkpoint import restore_pytree

        if not args.ip_image:
            raise SystemExit("--ip-adapter needs --ip-image")
        tree = restore_pytree(os.path.join(args.ip_adapter, "ckpt"))
        ema_t = tree.get("ema")
        ip_params = (ema_t["shadow"] if isinstance(ema_t, dict)
                     and ema_t.get("shadow") is not None else tree["params"])
        emb_params = restore_pytree(
            os.path.join(args.ip_adapter, "ip_embedder"))
        im = np.asarray(Image.open(args.ip_image).convert("RGB"),
                        np.float32) / 127.5 - 1.0
        emb = FrozenClipImageEmbedder().apply(
            {"params": emb_params}, jnp.asarray(im)[None])
        emb = jnp.broadcast_to(emb, (len(prompts),) + emb.shape[1:])
        ld = _dc.replace(ld, unet_apply=ip_apply_fn(unet, args.ip_scale))
        uparams = {"unet": uparams, "ip": ip_params}
        cond["c_ip"] = emb
        uncond["c_ip"] = jnp.zeros_like(emb)

    sampler = args.sampler or (
        "flow" if getattr(ld.process, "is_flow", False)
        else sc.get("sampler", "ddim"))

    # jit with params/cond as ARGUMENTS: an un-jitted ld.sample bakes the
    # closure weights into the scan program as constants, which trips the
    # tunneled remote compiler's request-size limit at real model scale
    @jax.jit
    def _sample(p, c, uc, r):
        return ld.sample(
            p, r, shape,
            cond=c, uncond=uc,
            guidance_scale=gs, num_steps=steps, sampler=sampler,
            guidance_rescale=args.guidance_rescale,
            sag_scale=args.sag_scale,
            **({"eta": eta} if sampler == "ddim" else {}),
        )

    img = _sample(uparams, cond, uncond, rng)
    save_image_grid(np.asarray(img), args.out)
    print(f"[done] wrote {args.out} ({shape[0]} images, {steps} steps, "
          f"cfg={gs}, sampler={sampler})")


def _sample_ddpm(cfg, args, rng):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sd_tpu.core.config import instantiate_from_config
    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.diffusion.ddpm import DDPMProcess
    from sd_tpu.train.checkpoint import restore_checkpoint
    from sd_tpu.train.diffusion import ddpm_optimizer, init_train_state
    from sd_tpu.train.metrics import save_image_grid
    from sd_tpu.train.runners import ema_eval_params

    model = instantiate_from_config(cfg["model"])
    sched = DiffusionSchedule.create(**cfg.get("diffusion", {}))
    process = DDPMProcess(
        sched, clip_denoised=True,
        parameterization=cfg.get("diffusion", {}).get("parameterization", "eps"),
    )
    size = cfg["train"].get("image_size", 256)
    params = model.init(
        rng, jnp.zeros((1, size, size, model.out_channels)),
        jnp.zeros((1,), jnp.int32))["params"]
    if args.ckpt:
        state = init_train_state(params, ddpm_optimizer(1e-4),
                                 ema_decay=cfg["train"].get("ema_decay",
                                                            0.9999))
        state = restore_checkpoint(args.ckpt, state)
        params = ema_eval_params(state)

    n = args.batch or cfg.get("sample", {}).get("num_images", 4)
    shape = (n, size, size, model.out_channels)

    # params as jit ARGUMENT (see the ldm path): closure weights embed as
    # scan-program constants and can exceed remote-compile size limits
    if args.sampler == "ddim":
        from sd_tpu.diffusion.ddim import DDIMSampler

        sampler = DDIMSampler(sched,
                              parameterization=process.parameterization)

        @jax.jit
        def _run(p, r):
            mf = lambda x, t, c: model.apply({"params": p}, x, t)
            return sampler.sample(mf, r, shape, num_steps=args.steps or 50,
                                  eta=(args.eta if args.eta is not None
                                       else 0.0))
    else:
        @jax.jit
        def _run(p, r):
            mf = lambda x, t, c: model.apply({"params": p}, x, t)
            return process.p_sample_loop(mf, r, shape)
    img = _run(params, rng)
    save_image_grid(np.asarray(img), args.out)
    print(f"[done] wrote {args.out} ({n} images, task=ddpm, "
          f"sampler={args.sampler or 'ddpm'})")


if __name__ == "__main__":
    main()
