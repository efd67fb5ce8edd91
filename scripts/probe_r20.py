#!/usr/bin/env python
"""Round-4 probe #20: the Pallas fused GroupNorm (kernels/groupnorm.py)
vs XLA's convert_reduce_fusion lowering — isolated at the SD UNet's norm
shapes and in-model (UNet fwd B8), as INTERLEAVED same-probe A/Bs per the
drift discipline. PROBE_R19 attributed ~10-15 ms of the 55.6 ms device
step to these norms (1.26 ms for a [8,64,64,320] GN, ~60 µs floor).

Appends JSON lines to PROBE_R20.jsonl.
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

OUT = open("PROBE_R20.jsonl", "a", buffering=1)
REPS = 5


def report(name, ms, **extra):
    rec = {"name": name, "ms": round(ms, 3), **extra}
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def fence(out):
    return float(jnp.sum(out.astype(jnp.float32)))


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


def chain_into(x, out):
    return x + (jnp.mean(out.astype(jnp.float32)) * 1e-6).astype(x.dtype)


def with_env(**env):
    class _Ctx:
        def __enter__(self):
            self.prev = {k: os.environ.get(k) for k in env}
            for k, v in env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
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

    from sd_tpu.kernels.groupnorm import group_norm, group_norm_xla

    # ---- isolated GN at the UNet's three norm shapes ---------------------
    for (B, S, C) in [(8, 4096, 320), (8, 1024, 640), (8, 256, 1280)]:
        x = rnd(B, S, C)
        s = jnp.ones((C,), jnp.float32)
        b = jnp.zeros((C,), jnp.float32)

        # 256 chained iterations: the tunnel's fixed ~27 ms round-trip
        # swamped the first attempt's 16-iteration scans (every arm measured
        # "2 ms/iter" = 32 ms/call ≈ the round-trip floor)
        def loop(fn):
            @jax.jit
            def f(x):
                def body(c, _):
                    return chain_into(c, fn(c, s, b)), None
                c, _ = jax.lax.scan(body, x, None, length=256)
                return c
            return f

        interleaved({
            f"gn_xla_{S}x{C}": (
                loop(lambda x, s, b: group_norm_xla(
                    x, s, b, groups=32, eps=1e-5)), (x,)),
            f"gn_pallas_{S}x{C}": (
                loop(lambda x, s, b: group_norm(
                    x, s, b, groups=32, eps=1e-5)), (x,)),
            f"gn_pallas_silu_{S}x{C}": (
                loop(lambda x, s, b: group_norm(
                    x, s, b, groups=32, eps=1e-5, act="silu")), (x,)),
        }, 256)

    # ---- in-model: UNet fwd B8 -------------------------------------------
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

    def unet_loop():
        @jax.jit
        def f(p, c):
            c, _ = jax.lax.scan(
                lambda c, _: (chain_into(c, unet.apply(p, c, t, ctx)), None),
                c, None, length=8)
            return c
        return f

    arms = {}
    with with_env(SD_TPU_PALLAS_GN="0"):
        f = unet_loop()
        fence(f(up, x))
        arms["unet_fwd_B8_gn_xla"] = (f, (up, x))
    with with_env(SD_TPU_PALLAS_GN="1"):
        f = unet_loop()
        fence(f(up, x))
        arms["unet_fwd_B8_gn_pallas"] = (f, (up, x))
    interleaved(arms, 8)


if __name__ == "__main__":
    main()
