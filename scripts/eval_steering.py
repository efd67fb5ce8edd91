#!/usr/bin/env python
"""Quantitative classifier-free-guidance evaluation of a trained
class-conditional LDM.

Trains a probe classifier (sd_tpu.eval.classifier) on the labeled real data,
samples the LDM at each requested guidance scale with per-class prompts, and
reports (a) the probe's accuracy/confidence on the requested class —
the steering score — and (b) the surrogate-CLIP Fréchet distance of each
sample batch to the real set. Guidance is demonstrated when steering
accuracy at cfg>1 clears both chance and the cfg=1 row.

The reference trains conditioning machinery but never measures that guidance
steers anything (no metric exists there at all; grids are eyeballed —
VAE/test/test.py:200-267). Usage:

  python scripts/eval_steering.py --config configs/ldm_32_catdog_cond.yaml \
      --ckpt runs/ldm32_catdog_cond/ckpt \
      --data /root/reference/Dataset/Data/train \
      --classes cat dog --guidance-scales 1.0 3.0 6.0 \
      --out runs/ldm32_catdog_cond/steering
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", required=True, help="labeled real-image root")
    ap.add_argument("--classes", nargs="+", default=["cat", "dog"])
    ap.add_argument("--guidance-scales", type=float, nargs="+",
                    default=[1.0, 3.0, 6.0])
    ap.add_argument("--per-class", type=int, default=8,
                    help="samples per class per guidance scale")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sampler", default="ddim",
                    choices=["ddim", "dpm", "plms"],
                    help="dpm = DPM-Solver++(2M); pair with --steps 15 to "
                    "test the few-step claim against the DDIM-50 rows; "
                    "plms = 4th-order pseudo linear multistep")
    ap.add_argument("--guidance-rescale", type=float, default=0.0,
                    help="CFG std-rescale (arXiv:2305.08891); measure at "
                    "high cfg where over-guidance degrades FID")
    ap.add_argument("--real-per-class", type=int, default=200,
                    help="real images per class for probe training")
    ap.add_argument("--probe-steps", type=int, default=400)
    ap.add_argument("--fid-batch", type=int, default=8)
    ap.add_argument("--no-fid", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="steering_eval")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from sd_tpu.core.config import load_yaml
    from sd_tpu.data.datasets import ClassCaptionDataset
    from sd_tpu.eval import (classifier_fn, extract_features,
                             fid_from_features, clip_feature_fn,
                             gaussian_stats, frechet_distance,
                             steering_score, train_image_classifier)
    from sd_tpu.train.checkpoint import restore_checkpoint
    from sd_tpu.train.diffusion import ddpm_optimizer, init_train_state
    from sd_tpu.train.metrics import save_image_grid
    from sd_tpu.train.runners import apply_calibration, build_ldm

    cfg = load_yaml(args.config)
    os.makedirs(args.out, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)
    pix = cfg["train"].get("image_size", 128)
    template = cfg.get("data", {}).get("template", "a photo of a {}")
    label_from = cfg.get("data", {}).get("label_from", "filename_prefix")

    # ---- real labeled set (probe train + FID reference) ----
    ds = ClassCaptionDataset(args.data, image_size=pix, random_flip=False,
                             label_from=label_from, template=template)
    by_class = {c: [] for c in args.classes}
    for i in range(len(ds)):
        lab = ds.label(i)
        if lab in by_class and len(by_class[lab]) < args.real_per_class:
            by_class[lab].append(i)
        if all(len(v) >= args.real_per_class for v in by_class.values()):
            break
    for c in args.classes:
        if not by_class[c]:
            raise SystemExit(f"no images labeled '{c}' under {args.data}")
    print({c: len(v) for c, v in by_class.items()}, "real images", flush=True)
    images, labels = [], []
    for ci, c in enumerate(args.classes):
        for i in by_class[c]:
            images.append(ds[i]["image"])
            labels.append(ci)
    images = np.stack(images).astype(np.float32)
    labels = np.asarray(labels, np.int32)

    # ---- probe ----
    t0 = time.time()
    probe, pout = train_image_classifier(
        images, labels, num_classes=len(args.classes),
        steps=args.probe_steps, seed=args.seed)
    pfn = classifier_fn(probe, pout["params"])
    # honest probe quality: holdout = the training set here is small; report
    # train accuracy and per-class accuracy so a degenerate probe is visible
    per_class_acc = {}
    for ci, c in enumerate(args.classes):
        per_class_acc[c] = steering_score(
            pfn, images[labels == ci], ci)["accuracy"]
    print(f"probe trained in {time.time()-t0:.0f}s: "
          f"final_acc={pout['final_acc']:.3f} per-class={per_class_acc}",
          flush=True)

    # ---- LDM ----
    ld, unet, uparams, vae, vparams, clip = build_ldm(cfg, rng)
    state = init_train_state(uparams, ddpm_optimizer(1e-4),
                             num_timesteps=ld.schedule.num_timesteps)
    state = restore_checkpoint(args.ckpt, state)
    uparams = (state.ema.shadow if state.ema is not None else state.params)
    uparams = jax.tree.map(lambda s, p: s.astype(p.dtype), uparams,
                           state.params)
    ld = apply_calibration(ld, cfg, args.ckpt)
    lat = cfg["latent"]

    prompts = [template.format(c) for c in args.classes
               for _ in range(args.per_class)]
    target = np.repeat(np.arange(len(args.classes)), args.per_class)
    c_emb = clip(prompts)
    uc_emb = clip([""] * len(prompts))
    shape = (len(prompts), lat["image_size"], lat["image_size"],
             lat["channels"])

    feat_fn = None if args.no_fid else clip_feature_fn(seed=0)
    real_stats = None
    if feat_fn is not None:
        rf = extract_features(feat_fn, images, args.fid_batch)
        real_stats = gaussian_stats(rf)

    results = []
    log_path = os.path.join(args.out, "steering.jsonl")
    with open(log_path, "a") as log:
        for gs in args.guidance_scales:
            t0 = time.time()
            img = ld.sample(
                uparams, jax.random.fold_in(rng, int(gs * 1000)), shape,
                cond={"c_crossattn": [c_emb]},
                uncond={"c_crossattn": [uc_emb]},
                guidance_scale=gs, num_steps=args.steps, eta=0.0,
                sampler=args.sampler,
                guidance_rescale=args.guidance_rescale,
            )
            img = np.asarray(img, np.float32)
            row = {"guidance_scale": gs, "steps": args.steps,
                   "sampler": args.sampler,
                   "guidance_rescale": args.guidance_rescale,
                   "sample_seconds": round(time.time() - t0, 1)}
            for ci, c in enumerate(args.classes):
                s = steering_score(pfn, img[target == ci], ci)
                row[f"acc_{c}"] = round(s["accuracy"], 4)
                row[f"conf_{c}"] = round(s["confidence"], 4)
            row["acc_mean"] = round(
                float(np.mean([row[f"acc_{c}"] for c in args.classes])), 4)
            if feat_fn is not None:
                gf = extract_features(feat_fn, img, args.fid_batch)
                row["fid_surrogate"] = round(
                    frechet_distance(*real_stats, *gaussian_stats(gf)), 3)
            tag = ("" if args.sampler == "ddim" and args.steps == 50
                   else f"_{args.sampler}{args.steps}")
            if args.guidance_rescale:
                tag += f"_gr{args.guidance_rescale:g}"
            grid = os.path.join(args.out, f"samples_cfg{gs:g}{tag}.png")
            save_image_grid(img, grid, rows=len(args.classes))
            row["grid"] = grid
            # raw samples (fp16) so grids/metrics can be recomputed without
            # re-sampling (CPU sampling costs minutes per scale)
            np.savez_compressed(
                os.path.join(args.out, f"samples_cfg{gs:g}{tag}.npz"),
                samples=img.astype(np.float16), target=target,
                classes=np.asarray(args.classes))
            print(row, flush=True)
            log.write(json.dumps(row) + "\n")
            log.flush()
            results.append(row)

    chance = 1.0 / len(args.classes)
    print(f"\nchance accuracy = {chance:.3f}")
    for row in results:
        print(f"  cfg={row['guidance_scale']:<4} acc_mean={row['acc_mean']}"
              + (f" fid={row['fid_surrogate']}" if "fid_surrogate" in row
                 else ""))
    print(f"[done] wrote {log_path}")


if __name__ == "__main__":
    main()
