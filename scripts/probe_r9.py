#!/usr/bin/env python
"""Round-2 probe #9: effect of the packed-attention layout and the d=512
flash mid-block on the UNet step and the VAE decode.

Appends JSON lines to PROBE_R9.jsonl.
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("PROBE_R9.jsonl", "a", buffering=1)
REPS = 3


def report(name, ms, **extra):
    rec = {"name": name, "ms": round(ms, 3), **extra}
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def timed_loop(name, loop, args, iters, floor=0.0):
    try:
        t1 = time.perf_counter()
        float(jnp.sum(loop(*args).astype(jnp.float32)))
        compile_s = time.perf_counter() - t1
        times = []
        for _ in range(REPS):
            t1 = time.perf_counter()
            float(jnp.sum(loop(*args).astype(jnp.float32)))
            times.append(time.perf_counter() - t1)
        ms = float(np.median(times)) / iters * 1e3 - floor
        report(name, ms, compile_s=round(compile_s, 1))
        return ms
    except Exception as e:
        report(name, -1.0, error=f"{type(e).__name__}: {e}"[:300])
        return -1.0


def chain_into(x, out):
    return x + (jnp.mean(out.astype(jnp.float32)) * 1e-6).astype(x.dtype)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(key.normal(0, 1, s).astype(np.float32),
                                 jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

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

    @jax.jit
    def unet_loop(p, c):
        c, _ = jax.lax.scan(
            lambda c, _: (chain_into(c, unet.apply(p, c, t, ctx)), None),
            c, None, length=8)
        return c

    timed_loop("unet_fwd_B8_packed_attn", unet_loop, (up, x), 8)

    from sd_tpu.models.autoencoder import AutoencoderKL

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

    timed_loop("vae_decode_B4_flashmid", dec_loop, (vp, z), 4)


if __name__ == "__main__":
    main()
