#!/usr/bin/env python
"""Round-2 probe #13: (1) GAN step after the inference-Pallas/training-XLA
VJP restructure (expect ≈ the 202 ms xlaconv arm of PROBE_R12, not 267);
(2) LDM train step re-measurement (BASELINE round-1 row: 236 ms);
(3) the parity-split-scratch pipelined flash variant vs serial.

Appends JSON lines to PROBE_R13.jsonl.
"""

from __future__ import annotations

import functools
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

OUT = open("PROBE_R13.jsonl", "a", buffering=1)
ITERS = 16
REPS = 3
_FLOOR_MS = 0.0


def report(name, ms, **extra):
    rec = {"name": name, "ms": round(ms, 3), **extra}
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def measure(name, fn, carry, iters=ITERS, **extra):
    global _FLOOR_MS

    @jax.jit
    def loop(c):
        c, _ = jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=iters)
        return c

    try:
        t0 = time.perf_counter()
        out = loop(carry)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = loop(carry)
            float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times)) / iters * 1e3
        if name != "floor":
            ms = max(ms - _FLOOR_MS, 0.0)
        report(name, ms, compile_s=round(compile_s, 1), **extra)
        return ms
    except Exception as e:
        report(name, -1.0, error=f"{type(e).__name__}: {e}"[:300], **extra)
        return -1.0


def chain_into(x, out):
    return x + (jnp.mean(out.astype(jnp.float32)) * 1e-6).astype(x.dtype)


def main():
    global _FLOOR_MS
    print(f"backend={jax.default_backend()}", flush=True)
    key = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(key.normal(0, 1, s).astype(np.float32),
                                 jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    _FLOOR_MS = measure("floor", lambda c: c * 1.000001 + 1e-6, rnd(8, 128))

    # ---- parity-split pipelined flash vs serial ---------------------------
    from sd_tpu.kernels import flash_attention as fa

    B, S, h, d = 8, 4096, 8, 40
    q = rnd(B, S, h, d)
    k = rnd(B, S, h, d)
    v = rnd(B, S, h, d)

    for tag, flag in (("serial", "0"), ("pipesplit", "1")):
        os.environ["SD_TPU_FLASH_PIPE"] = flag

        def attn(c):
            return (chain_into(c[0], fa.flash_attention(c[0], c[1], c[2])),) + c[1:]

        measure(f"flash_L0_{tag}", attn, (q, k, v), iters=8)
    os.environ["SD_TPU_FLASH_PIPE"] = "0"

    # ---- GAN step with the fixed VJP (Pallas conv dispatch ON) -------------
    from sd_tpu.losses.gan import GanLossConfig
    from sd_tpu.models.autoencoder import AutoencoderKL
    from sd_tpu.models.discriminator import NLayerDiscriminator
    from sd_tpu.train.gan import gan_adam, init_gan_state, make_kl_gan_train_step

    vae256 = AutoencoderKL(embed_dim=4, ch=128, ch_mult=(1, 2, 4, 4),
                           num_res_blocks=2, resolution=256, z_channels=4,
                           dtype=jnp.bfloat16)
    disc = NLayerDiscriminator(ndf=64, n_layers=3, use_actnorm=False,
                               dtype=jnp.bfloat16)
    Bc = 8
    dummy = jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
    vparams = vae256.init(rng, dummy, rng)["params"]
    dvars = disc.init(rng, dummy)
    cfg = GanLossConfig(disc_start=0, disc_weight=0.5, kl_weight=1e-6,
                        perceptual_weight=0.0, disc_loss="hinge")
    opt_g, opt_d = gan_adam(4.5e-6), gan_adam(4.5e-6)
    state = init_gan_state(vparams, dvars, opt_g, opt_d)
    ae_apply = lambda p, xx, r: vae256.apply({"params": p}, xx, r)
    step = make_kl_gan_train_step(ae_apply, disc, None, opt_g, opt_d, cfg)
    xg = rnd(Bc, 256, 256, 3)
    r = jax.random.PRNGKey(1)
    try:
        t1 = time.perf_counter()
        state, logs = step(state, xg, r)
        float(logs["train/total_loss"])
        compile_s = time.perf_counter() - t1
        times = []
        for i in range(4):
            t1 = time.perf_counter()
            state, logs = step(state, xg, r)
            float(logs["train/total_loss"])
            times.append(time.perf_counter() - t1)
        ms = float(np.median(times)) * 1e3
        report("kl_gan_step_256_B8_fixedvjp", ms,
               compile_s=round(compile_s, 1),
               img_per_s=round(Bc / (ms / 1e3), 2))
    except Exception as e:
        report("kl_gan_step_256_B8_fixedvjp", -1.0, error=str(e)[:300])

    # ---- LDM train step -----------------------------------------------------
    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.models.unet_sd import UNetModel
    from sd_tpu.train.diffusion import init_train_state, make_diffusion_train_step
    from sd_tpu.train.remat import remat_apply

    unet = UNetModel(in_channels=4, model_channels=320, out_channels=4,
                     num_res_blocks=2, attention_resolutions=(4, 2, 1),
                     channel_mult=(1, 2, 4, 4), num_heads=8,
                     context_dim=768, dtype=jnp.bfloat16)
    Bt = 4
    ctx = rnd(Bt, 77, 768)
    z0 = rnd(Bt, 64, 64, 4)
    t0 = jnp.zeros((Bt,), jnp.int32)
    params = unet.init(rng, z0, t0, ctx)["params"]
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    sched = DiffusionSchedule.create(timesteps=1000, beta_schedule="linear",
                                     linear_start=0.00085, linear_end=0.012)
    apply_r = remat_apply(
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c), "dots")

    def loss_fn(p, batch, rr, logvar):
        rt, rn = jax.random.split(rr)
        z, c = batch["z"], batch["ctx"]
        t = jax.random.randint(rt, (z.shape[0],), 0, 1000)
        noise = jax.random.normal(rn, z.shape, jnp.float32)
        z_t = sched.q_sample(z, t, noise)
        eps = apply_r(p, z_t.astype(jnp.bfloat16), t, c)
        loss = jnp.mean((eps.astype(jnp.float32) - noise) ** 2)
        return loss, {"train/loss": loss}

    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    tstate = init_train_state(params, opt, ema_decay=0.9999)
    tstep = make_diffusion_train_step(loss_fn, opt)
    batch = {"z": z0, "ctx": ctx}
    try:
        t1 = time.perf_counter()
        tstate, logs = tstep(tstate, batch, jax.random.PRNGKey(1))
        l0 = float(logs["train/loss"])
        compile_s = time.perf_counter() - t1
        times = []
        for i in range(6):
            t1 = time.perf_counter()
            tstate, logs = tstep(tstate, batch, jax.random.PRNGKey(2 + i))
            l = float(logs["train/loss"])
            times.append(time.perf_counter() - t1)
        ms = float(np.median(times)) * 1e3
        report("ldm_train_step_B4", ms, compile_s=round(compile_s, 1),
               img_per_s=round(Bt / (ms / 1e3), 2), loss0=round(l0, 4),
               loss_last=round(l, 4))
    except Exception as e:
        report("ldm_train_step_B4", -1.0, error=f"{type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
