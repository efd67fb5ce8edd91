"""DreamBooth fine-tuning: bind a subject to a rare token with a
prior-preservation loss (arXiv:2208.12242 — beyond the reference, which has
no personalization path; its trainers are from-scratch only,
Diffusion/main.py:20-129).

Recipe: fine-tune the full UNet on (instance image, instance prompt) pairs
while regularizing with (class image, class prompt) pairs so the class
prior survives — `loss = L_instance + w · L_prior`. Class images are
sampled from the FROZEN starting model before training begins (host-side,
through the ordinary sampler) unless a class image folder is provided.

TPU notes: each jitted step runs the LDM loss twice (instance and prior
half-batches) on the same params and combines — one program, static
shapes, no data-dependent branching; captions/ids are prepared host-side.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.config import load_yaml
from sd_tpu.train.checkpoint import auto_resume
from sd_tpu.train.diffusion import (
    ddpm_optimizer,
    init_train_state,
    make_diffusion_train_step,
)
from sd_tpu.train.metrics import count_params
from sd_tpu.train.runners import (
    _build_loader,
    _make_lr,
    _run_loop,
    build_ldm,
    ema_eval_params,
)


def _generate_class_images(ld, uparams, clip, lat, prompt: str, n: int,
                           out_dir: str, num_steps: int, rng) -> str:
    """Sample `n` class images from the frozen starting model into
    `out_dir` (the DreamBooth prior set). Returns out_dir."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    existing = [f for f in os.listdir(out_dir)
                if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    if len(existing) >= n:
        return out_dir
    emb = clip([prompt] * min(n, 4))
    done = len(existing)
    while done < n:
        b = min(4, n - done)
        z = ld.sample(
            uparams, jax.random.fold_in(rng, done),
            (b, lat["image_size"], lat["image_size"], lat["channels"]),
            cond={"c_crossattn": [emb[:b]]}, num_steps=num_steps,
            decode=False,
        )
        imgs = np.asarray(ld.decode_first_stage(z), np.float32)
        imgs = np.clip((imgs + 1.0) * 127.5, 0, 255).astype(np.uint8)
        for i in range(b):
            Image.fromarray(imgs[i]).save(
                os.path.join(out_dir, f"class_{done + i:04d}.png"))
        done += b
    return out_dir


def train_dreambooth(config: dict | str, data_dir: str,
                     out_dir: str = "runs/dreambooth",
                     max_steps: int | None = None) -> Any:
    """Fine-tune the UNet on instance images with prior preservation.

    Config block:
        dreambooth:
          instance_prompt: "a photo of sks dog"
          class_prompt: "a photo of a dog"
          prior_weight: 1.0
          num_class_images: 16
          class_data_dir: null     # optional: skip generation
          class_num_steps: 20      # sampler steps for generated priors
    `data_dir` holds the instance images; everything else is the LDM
    config (task: dreambooth)."""
    cfg = load_yaml(config) if isinstance(config, str) else config
    tc = cfg["train"]
    db = cfg["dreambooth"]
    prior_w = float(db.get("prior_weight", 1.0))
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    ld, unet, uparams, vae, vparams, clip = build_ldm(cfg, rng)
    if cfg["latent"].get("scale_factor") == "auto":
        raise ValueError("dreambooth needs a fixed scale_factor "
                         "(run the base LDM training first)")
    lat = cfg["latent"]
    print(f"[dreambooth] unet params: {count_params(uparams)/1e6:.1f}M, "
          f"prior_weight={prior_w}")

    class_dir = db.get("class_data_dir")
    if not class_dir:
        class_dir = _generate_class_images(
            ld, uparams, clip, lat, db["class_prompt"],
            int(db.get("num_class_images", 16)),
            os.path.join(out_dir, "class_images"),
            int(db.get("class_num_steps", 20)),
            jax.random.fold_in(rng, 0xDB))
        print(f"[dreambooth] class prior set generated at {class_dir}")

    # conditioning is fixed per side — precompute both embeddings once
    inst_emb = clip([db["instance_prompt"]])
    prior_emb = clip([db["class_prompt"]])

    def loss_fn(p, batch, step_rng, logvar):
        ri, rp = jax.random.split(step_rng)
        b_i = batch["instance"].shape[0]
        b_p = batch["prior"].shape[0]
        li, logs = ld.training_loss(
            p, {"image": batch["instance"],
                "txt_emb": jnp.tile(inst_emb, (b_i, 1, 1))},
            ri, learned_logvar=logvar)
        lp, _ = ld.training_loss(
            p, {"image": batch["prior"],
                "txt_emb": jnp.tile(prior_emb, (b_p, 1, 1))},
            rp, learned_logvar=logvar)
        logs = dict(logs)
        logs["prior_loss"] = lp
        logs["instance_loss"] = li
        return li + prior_w * lp, logs

    # two loaders, zipped host-side into one batch dict
    prior_loader = _build_loader(class_dir, cfg, tc.get("batch_size", 2))
    _prior_iter = [iter(prior_loader)]

    def embed_batch(batch):
        try:
            pb = next(_prior_iter[0])
        except StopIteration:
            _prior_iter[0] = iter(prior_loader)
            pb = next(_prior_iter[0])
        return {"instance": jnp.asarray(batch["image"]),
                "prior": jnp.asarray(pb["image"])}

    opt = ddpm_optimizer(_make_lr(tc), tc.get("grad_clip", 1.0),
                         weight_decay=tc.get("weight_decay", 0.0))
    state = init_train_state(uparams, opt, tc.get("ema_decay", 0.9999))
    state, start = auto_resume(os.path.join(out_dir, "ckpt"), state)
    step_fn = make_diffusion_train_step(loss_fn, opt)

    eval_prompts = db.get("eval_prompts", [db["instance_prompt"]] * 4)

    def sampler(st, s_rng):
        params = ema_eval_params(st)
        emb = clip(eval_prompts)
        z = ld.sample(
            params, s_rng,
            (len(eval_prompts), lat["image_size"], lat["image_size"],
             lat["channels"]),
            cond={"c_crossattn": [emb]},
            num_steps=cfg.get("sample", {}).get("num_steps", 20),
            decode=False,
        )
        return ld.decode_first_stage(z)

    state = _run_loop(step_fn, state, cfg, data_dir, out_dir, rng, start,
                      max_steps=max_steps, sampler=sampler,
                      batch_transform=embed_batch)
    return state
