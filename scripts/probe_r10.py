#!/usr/bin/env python
"""Round-2 probe #10: LDM train-step re-measurement after the fused-GEGLU
forward landed (round-1 production shape: SD UNet, bf16 params + fp32 Adam +
fp32 EMA, remat=dots, donated state, B4 latents 64²). BASELINE.md round-1
row: 236 ms/step.

Appends JSON lines to PROBE_R10.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("PROBE_R10.jsonl", "a", buffering=1)


def report(name, ms, **extra):
    rec = {"name": name, "ms": round(ms, 3), **extra}
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(key.normal(0, 1, s).astype(np.float32),
                                 jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.models.unet_sd import UNetModel
    from sd_tpu.train.diffusion import init_train_state, make_diffusion_train_step
    from sd_tpu.train.remat import remat_apply

    unet = UNetModel(in_channels=4, model_channels=320, out_channels=4,
                     num_res_blocks=2, attention_resolutions=(4, 2, 1),
                     channel_mult=(1, 2, 4, 4), num_heads=8,
                     context_dim=768, dtype=jnp.bfloat16)
    B = 4
    ctx = rnd(B, 77, 768)
    z0 = rnd(B, 64, 64, 4)
    t0 = jnp.zeros((B,), jnp.int32)
    params = unet.init(rng, z0, t0, ctx)["params"]
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    sched = DiffusionSchedule.create(timesteps=1000, beta_schedule="linear",
                                     linear_start=0.00085, linear_end=0.012)
    apply_r = remat_apply(
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c), "dots")

    def loss_fn(p, batch, r, logvar):
        rt, rn = jax.random.split(r)
        z, c = batch["z"], batch["ctx"]
        t = jax.random.randint(rt, (z.shape[0],), 0, 1000)
        noise = jax.random.normal(rn, z.shape, jnp.float32)
        z_t = sched.q_sample(z, t, noise)
        eps = apply_r(p, z_t.astype(jnp.bfloat16), t, c)
        loss = jnp.mean((eps.astype(jnp.float32) - noise) ** 2)
        return loss, {"train/loss": loss}

    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(1e-4))
    state = init_train_state(params, opt, ema_decay=0.9999)
    step = make_diffusion_train_step(loss_fn, opt)
    batch = {"z": z0, "ctx": ctx}

    try:
        t1 = time.perf_counter()
        state, logs = step(state, batch, jax.random.PRNGKey(1))
        l0 = float(logs["train/loss"])
        compile_s = time.perf_counter() - t1
        times = []
        for i in range(6):
            t1 = time.perf_counter()
            state, logs = step(state, batch, jax.random.PRNGKey(2 + i))
            l = float(logs["train/loss"])
            times.append(time.perf_counter() - t1)
        ms = float(np.median(times)) * 1e3
        report("ldm_train_step_B4_fusedff", ms, compile_s=round(compile_s, 1),
               img_per_s=round(B / (ms / 1e3), 2), loss0=round(l0, 4),
               loss_last=round(l, 4))
    except Exception as e:
        report("ldm_train_step_B4_fusedff", -1.0,
               error=f"{type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
