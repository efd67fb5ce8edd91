#!/usr/bin/env python
"""Round-2 probe #12: (1) the software-pipelined flash forward (PV deferred
one kv tile — Mosaic overlaps MXU/VPU, PROBE_R11) at the SD L0 shape and in
the full UNet; (2) GAN-step A/B on the Pallas conv dispatch (is the Conv3x3
custom VJP part of the 267 ms regression, or was it all the GN fusion?);
(3) decode after the GN-fusion revert.

Appends JSON lines to PROBE_R12.jsonl.
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("PROBE_R12.jsonl", "a", buffering=1)
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

    from sd_tpu.kernels import flash_attention as fa

    # ---- L0 micro: serial vs pipelined ------------------------------------
    B, S, h, d = 8, 4096, 8, 40
    q = rnd(B, S, h, d)
    k = rnd(B, S, h, d)
    v = rnd(B, S, h, d)

    os.environ["SD_TPU_FLASH_PIPE"] = "0"

    def attn_serial(c):
        return (chain_into(c[0], fa.flash_attention(c[0], c[1], c[2])),) + c[1:]

    measure("flash_L0_serial", attn_serial, (q, k, v), iters=8)

    os.environ["SD_TPU_FLASH_PIPE"] = "1"

    def attn_pipe(c):
        return (chain_into(c[0], fa.flash_attention(c[0], c[1], c[2])),) + c[1:]

    measure("flash_L0_pipelined", attn_pipe, (q, k, v), iters=8)

    # on-device parity
    try:
        os.environ["SD_TPU_FLASH_PIPE"] = "0"
        want = jax.jit(lambda q, k, v: fa.flash_attention(q, k, v))(q, k, v)
        os.environ["SD_TPU_FLASH_PIPE"] = "1"
        got = jax.jit(lambda q, k, v: fa.flash_attention(q[:, :, :1], k[:, :, :1], v[:, :, :1]))(q, k, v)
        want1 = want[:, :, :1]
        dmax = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                     want1.astype(jnp.float32))))
        report("flash_pipe_tpu_maxdiff", dmax,
               scale=float(jnp.max(jnp.abs(want1.astype(jnp.float32)))))
    except Exception as e:
        report("flash_pipe_tpu_maxdiff", -1.0, error=str(e)[:300])

    # ---- UNet fwd with pipelined flash ------------------------------------
    from sd_tpu.models.unet_sd import UNetModel

    ctx = rnd(8, 77, 768)
    unet = UNetModel(in_channels=4, model_channels=320, out_channels=4,
                     num_res_blocks=2, attention_resolutions=(4, 2, 1),
                     channel_mult=(1, 2, 4, 4), num_heads=8,
                     context_dim=768, dtype=jnp.bfloat16)
    x = rnd(8, 64, 64, 4)
    t = jnp.full((8,), 500, jnp.int32)
    up = unet.init(rng, x, t, ctx)
    up = jax.device_put(jax.tree.map(lambda a: a.astype(jnp.bfloat16), up))

    for tag, pipe in (("pipe", "1"), ("serial", "0")):
        os.environ["SD_TPU_FLASH_PIPE"] = pipe

        @jax.jit
        def unet_loop(p, c):
            c, _ = jax.lax.scan(
                lambda c, _: (chain_into(c, unet.apply(p, c, t, ctx)), None),
                c, None, length=8)
            return c

        try:
            t1 = time.perf_counter()
            float(jnp.sum(unet_loop(up, x).astype(jnp.float32)))
            compile_s = time.perf_counter() - t1
            times = []
            for _ in range(REPS):
                t1 = time.perf_counter()
                float(jnp.sum(unet_loop(up, x).astype(jnp.float32)))
                times.append(time.perf_counter() - t1)
            report(f"unet_fwd_B8_{tag}",
                   float(np.median(times)) / 8 * 1e3 - _FLOOR_MS,
                   compile_s=round(compile_s, 1))
        except Exception as e:
            report(f"unet_fwd_B8_{tag}", -1.0, error=str(e)[:300])
    os.environ["SD_TPU_FLASH_PIPE"] = "1"

    # ---- GAN step A/B on the Pallas conv dispatch --------------------------
    from sd_tpu.losses.gan import GanLossConfig
    from sd_tpu.models.autoencoder import AutoencoderKL
    from sd_tpu.models.discriminator import NLayerDiscriminator
    from sd_tpu.train.gan import gan_adam, init_gan_state, make_kl_gan_train_step

    for tag, flag in (("pallasconv", "1"), ("xlaconv", "0")):
        os.environ["SD_TPU_PALLAS_CONV"] = flag
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
            report(f"kl_gan_step_256_B8_{tag}", ms,
                   compile_s=round(compile_s, 1),
                   img_per_s=round(Bc / (ms / 1e3), 2))
        except Exception as e:
            report(f"kl_gan_step_256_B8_{tag}", -1.0, error=str(e)[:300])
    os.environ["SD_TPU_PALLAS_CONV"] = "1"

    # ---- decode after the GN-fusion revert ---------------------------------
    vae = AutoencoderKL(embed_dim=4, ch=128, ch_mult=(1, 2, 4, 4),
                        num_res_blocks=2, resolution=512, z_channels=4,
                        dtype=jnp.bfloat16)
    z = rnd(4, 64, 64, 4)
    dummy = jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
    vp = vae.init(rng, dummy, rng)["params"]
    vp = jax.device_put(jax.tree.map(lambda a: a.astype(jnp.bfloat16), vp))

    @jax.jit
    def dec_loop(p, c):
        c, _ = jax.lax.scan(
            lambda c, _: (chain_into(c, vae.apply({"params": p}, c,
                                                  method=vae.decode)), None),
            c, None, length=4)
        return c

    try:
        t1 = time.perf_counter()
        float(jnp.sum(dec_loop(vp, z).astype(jnp.float32)))
        compile_s = time.perf_counter() - t1
        times = []
        for _ in range(REPS):
            t1 = time.perf_counter()
            float(jnp.sum(dec_loop(vp, z).astype(jnp.float32)))
            times.append(time.perf_counter() - t1)
        report("vae_decode_B4_postrevert",
               float(np.median(times)) / 4 * 1e3 - _FLOOR_MS,
               compile_s=round(compile_s, 1))
    except Exception as e:
        report("vae_decode_B4_postrevert", -1.0, error=str(e)[:300])


if __name__ == "__main__":
    main()
