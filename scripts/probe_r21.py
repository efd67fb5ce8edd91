#!/usr/bin/env python
"""Round-4 probe #21: (a) VMEM-halo Pallas conv decode (no XLA pads) vs the
XLA conv decode, (b) the fused small-KV cross-attention kernel
(kernels/cross_attention.py) isolated and in-model — interleaved same-probe
A/Bs per the drift discipline (VERDICT r3 next #1/#4).

Appends JSON lines to PROBE_R21.jsonl.
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

OUT = open("PROBE_R21.jsonl", "a", buffering=1)
REPS = 5


def report(name, ms, **extra):
    rec = {"name": name, "ms": round(ms, 3), **extra}
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def fence(out):
    return float(jnp.sum(out.astype(jnp.float32)))


def chain_into(x, out):
    return x + (jnp.mean(out.astype(jnp.float32)) * 1e-6).astype(x.dtype)


def interleaved(arms: dict, iters: int):
    for name, (fn, args) in arms.items():
        t0 = time.perf_counter()
        fence(fn(*args))
        print(f"  compiled {name} in {time.perf_counter()-t0:.1f}s",
              flush=True)
    times = {n: [] for n in arms}
    for _ in range(REPS):
        for name, (fn, args) in arms.items():
            t0 = time.perf_counter()
            fence(fn(*args))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        report(name, float(np.median(ts)) / iters * 1e3,
               spread=round((max(ts) - min(ts)) / np.median(ts), 3))


def with_env(**env):
    class _Ctx:
        def __enter__(self):
            self.prev = {k: os.environ.get(k) for k in env}
            for k, v in env.items():
                os.environ[k] = v

        def __exit__(self, *a):
            for k, v in self.prev.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    return _Ctx()


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(key.normal(0, 1, s).astype(np.float32),
                                 jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    which = set(sys.argv[1:]) or {"xattn_iso", "xattn_model", "decode"}

    # ---- isolated fused cross-attn at the SD levels ----------------------
    if "xattn_iso" in which:
        from sd_tpu.kernels.cross_attention import (crossattn_kv,
                                                    crossattn_kv_xla)
        for (B, N, C, h) in [(8, 4096, 320, 8), (8, 1024, 640, 8),
                             (8, 256, 1280, 8)]:
            d = C // h
            x = rnd(B, N, C)
            wq, wo = rnd(C, C), rnd(C, C)
            k, v = rnd(B, 77, C), rnd(B, 77, C)
            bo = rnd(C)

            def loop(fn):
                @jax.jit
                def f(x):
                    def body(c, _):
                        return chain_into(c, fn(c, wq, k, v, wo, bo, h)), None
                    c, _ = jax.lax.scan(body, x, None, length=256)
                    return c
                return f

            interleaved({
                f"xattn_xla_{N}x{C}": (loop(crossattn_kv_xla), (x,)),
                f"xattn_pallas_{N}x{C}": (loop(crossattn_kv), (x,)),
            }, 256)

    # ---- in-model: UNet fwd B8 -------------------------------------------
    if "xattn_model" in which:
        from sd_tpu.models.unet_sd import UNetModel
        ctx = rnd(8, 77, 768)
        unet = UNetModel(in_channels=4, model_channels=320, out_channels=4,
                         num_res_blocks=2, attention_resolutions=(4, 2, 1),
                         channel_mult=(1, 2, 4, 4), num_heads=8,
                         context_dim=768, dtype=jnp.bfloat16)
        x = rnd(8, 64, 64, 4)
        t = jnp.full((8,), 500, jnp.int32)
        up = unet.init(rng, x, t, ctx)
        up = jax.device_put(jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), up))

        def unet_loop():
            @jax.jit
            def f(p, c):
                c, _ = jax.lax.scan(
                    lambda c, _: (chain_into(c, unet.apply(p, c, t, ctx)),
                                  None),
                    c, None, length=8)
                return c
            return f

        arms = {}
        for tag, flag in [("xla", "0"), ("pallas", "1")]:
            with with_env(SD_TPU_PALLAS_XATTN=flag):
                f = unet_loop()
                t0 = time.perf_counter()
                fence(f(up, x))
                print(f"  compiled unet xattn_{tag} in "
                      f"{time.perf_counter()-t0:.1f}s", flush=True)
                arms[f"unet_fwd_B8_xattn_{tag}"] = (f, (up, x))
        interleaved(arms, 8)

    # ---- decode: VMEM-halo pallas conv vs XLA conv ------------------------
    if "decode" in which:
        from sd_tpu.models.autoencoder import AutoencoderKL
        vae = AutoencoderKL(embed_dim=4, ch=128, ch_mult=(1, 2, 4, 4),
                            num_res_blocks=2, resolution=512, z_channels=4,
                            dtype=jnp.bfloat16)
        vp = vae.init(rng, jnp.zeros((1, 512, 512, 3), jnp.bfloat16),
                      rng)["params"]
        vp = jax.device_put(jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, vp))
        z = rnd(4, 64, 64, 4)

        arms = {}
        for tag, flag in [("xla", "0"), ("pallas_halo", "1")]:
            with with_env(SD_TPU_PALLAS_CONV=flag):
                @jax.jit
                def dec(vp, z):
                    return vae.apply({"params": vp}, z,
                                     method=AutoencoderKL.decode)
                t0 = time.perf_counter()
                fence(dec(vp, z))
                print(f"  compiled decode conv_{tag} in "
                      f"{time.perf_counter()-t0:.1f}s", flush=True)
                arms[f"decode_B4_conv_{tag}"] = (dec, (vp, z))
        interleaved(arms, 1)


if __name__ == "__main__":
    main()
