#!/usr/bin/env python
"""Round-2 probe #3: Pallas conv3x3 vs XLA at the codec hot shapes, and the
first TPU measurement of the two-optimizer GAN train step (KL-VAE 256²,
real discriminator, vjp adaptive weight, random-VGG LPIPS).

Appends JSON lines to PROBE_R4.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from sd_tpu.kernels.conv2d import conv3x3_same

OUT = open("PROBE_R4.jsonl", "a", buffering=1)
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
    t0 = time.time()

    _FLOOR_MS = measure("floor", lambda c: c * 1.000001 + 1e-6, rnd(8, 128))

    # ---- conv3x3: pallas vs xla at the decoder hot shapes -----------------
    shapes = [
        ("512sq_128to128", 4, 512, 512, 128, 128),
        ("512sq_256to128", 4, 512, 512, 256, 128),
        ("256sq_256to256", 4, 256, 256, 256, 256),
        ("256sq_512to512", 4, 256, 256, 512, 512),
        ("128sq_512to512", 4, 128, 128, 512, 512),
    ]
    for tag, B, H, W, C, O in shapes:
        x = rnd(B, H, W, C)
        w = rnd(3, 3, C, O)
        bb = rnd(O)

        def xla_conv(c):
            y = jax.lax.conv_general_dilated(
                c[0], c[1], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return (chain_into(c[0], y), c[1], c[2])

        def pl_conv(c):
            y = conv3x3_same(c[0], c[1], c[2])
            return (chain_into(c[0], y), c[1], c[2])

        measure(f"conv_xla_{tag}", xla_conv, (x, w, bb), iters=8)
        measure(f"conv_pallas_{tag}", pl_conv, (x, w, bb), iters=8)

    # numeric check at one shape on-device
    try:
        x = rnd(1, 64, 256, 128)
        w = rnd(3, 3, 128, 128)
        bb = rnd(128)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        ref = (ref + bb.astype(jnp.float32)).astype(jnp.bfloat16)
        got = jax.jit(conv3x3_same)(x, w, bb)
        d = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                  got.astype(jnp.float32))))
        report("conv_pallas_tpu_maxdiff", d,
               scale=float(jnp.max(jnp.abs(ref.astype(jnp.float32)))))
    except Exception as e:
        report("conv_pallas_tpu_maxdiff", -1.0, error=str(e)[:300])

    print(f"--- conv done at {time.time()-t0:.0f}s ---", flush=True)

    # ---- GAN two-optimizer step on TPU (KL-VAE 256²) -----------------------
    from sd_tpu.losses.gan import GanLossConfig
    from sd_tpu.models.autoencoder import AutoencoderKL
    from sd_tpu.models.discriminator import NLayerDiscriminator
    from sd_tpu.models.lpips import make_lpips_fn
    from sd_tpu.train.gan import gan_adam, init_gan_state, make_kl_gan_train_step

    for tag, perceptual in (("pix", None), ("lpips", "random")):
        vae = AutoencoderKL(embed_dim=4, ch=128, ch_mult=(1, 2, 4, 4),
                            num_res_blocks=2, resolution=256, z_channels=4,
                            dtype=jnp.bfloat16)
        disc = NLayerDiscriminator(ndf=64, n_layers=3, use_actnorm=False,
                                   dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        B = 8
        dummy = jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
        vparams = vae.init(rng, dummy, rng)["params"]
        dvars = disc.init(rng, dummy)
        lpips_fn = (make_lpips_fn(mode="random", image_size=64,
                                  dtype=jnp.bfloat16)
                    if perceptual else None)
        cfg = GanLossConfig(disc_start=0, disc_weight=0.5, kl_weight=1e-6,
                            perceptual_weight=1.0 if perceptual else 0.0,
                            disc_loss="hinge")
        opt_g, opt_d = gan_adam(4.5e-6), gan_adam(4.5e-6)
        state = init_gan_state(vparams, dvars, opt_g, opt_d)
        ae_apply = lambda p, x, r: vae.apply({"params": p}, x, r)
        step = make_kl_gan_train_step(ae_apply, disc, lpips_fn, opt_g, opt_d,
                                      cfg)
        x = rnd(B, 256, 256, 3)
        r = jax.random.PRNGKey(1)
        try:
            t1 = time.perf_counter()
            state, logs = step(state, x, r)
            float(logs["train/total_loss"])
            compile_s = time.perf_counter() - t1
            times = []
            for i in range(4):
                t1 = time.perf_counter()
                state, logs = step(state, x, r)
                float(logs["train/total_loss"])
                times.append(time.perf_counter() - t1)
            ms = float(np.median(times)) * 1e3
            report(f"kl_gan_step_256_B{B}_{tag}", ms,
                   compile_s=round(compile_s, 1),
                   img_per_s=round(B / (ms / 1e3), 2),
                   loss=float(logs["train/total_loss"]))
        except Exception as e:
            report(f"kl_gan_step_256_B{B}_{tag}", -1.0, error=str(e)[:300])

    print(f"--- all done at {time.time()-t0:.0f}s ---", flush=True)


if __name__ == "__main__":
    main()
