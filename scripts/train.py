#!/usr/bin/env python
"""Train any capability config: ddpm | kl_vae | vq | ldm | ldm_sr.

Usage:
  python scripts/train.py --config configs/ddpm_256.yaml --data /path/to/images
  python scripts/train.py --config configs/sd_txt2img.yaml \
      --data /path/to/coco/images --annotations captions_train2017.json

The reference spreads these entry points over per-directory __main__ scripts
(reference: DDPM/train.py, VAE/autoencoder.py:430-479, vqvae/autoencoder.py,
Diffusion/main.py:20-129); here one CLI dispatches on the config's `task`.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--data", required=True, help="image directory")
    ap.add_argument("--annotations", default=None,
                    help="COCO captions json (ldm task)")
    ap.add_argument("--out", default=None, help="output/run directory")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--platform", default=None,
                    help="jax platform override (cpu for smoke tests)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # persistent compile cache: on the tunneled-TPU env every train-step
    # compile is a remote round trip (minutes at SD scale); cache hits make
    # relaunch/resume instant. Same default dir as __graft_entry__.py.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_compilation")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Multi-host bring-up (no-op single-process; autodetects TPU-pod env or
    # the JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID triple).
    from sd_tpu.parallel import multihost

    if multihost.initialize():
        print(f"[multihost] process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    from sd_tpu.core.config import load_yaml
    from sd_tpu.train import runners

    cfg = load_yaml(args.config)
    if args.annotations:
        cfg["annotation_file"] = args.annotations
    task = cfg.get("task")
    out = args.out or f"runs/{task}"

    run = {
        "ddpm": runners.train_ddpm,
        "kl_vae": runners.train_kl_vae,
        "vq": runners.train_vq,
        "ldm": runners.train_ldm,
    }.get(task)
    if run is None and task == "ldm_sr":
        from sd_tpu.train.sr import train_ldm_sr as run
    if run is None and task == "ldm_inpaint":
        from sd_tpu.train.inpaint import train_ldm_inpaint as run
    if run is None and task == "textual_inversion":
        from sd_tpu.train.textual_inversion import train_textual_inversion as run
    if run is None and task == "dreambooth":
        from sd_tpu.train.dreambooth import train_dreambooth as run
    if run is None and task == "distill":
        from sd_tpu.train.distill import distill_ldm as run
    if run is None:
        raise SystemExit(f"unknown task {task!r}")
    run(cfg, args.data, out_dir=out, max_steps=args.max_steps)
    print(f"[done] task={task} out={out}")


if __name__ == "__main__":
    main()
