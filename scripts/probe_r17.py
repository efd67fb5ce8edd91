#!/usr/bin/env python
"""Round-3 probe #17: the in-kernel head-packed flash variant
(SD_TPU_ATTN_HPACKED) and the int8 PV contraction (SD_TPU_FLASH_PV), both
isolated (L0 kernel shape) and in-model (UNet fwd B8), as INTERLEAVED
same-probe A/Bs per the drift discipline (BASELINE.md wave-5).

Appends JSON lines to PROBE_R17.jsonl.
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

OUT = open("PROBE_R17.jsonl", "a", buffering=1)
REPS = 5


def report(name, ms, **extra):
    rec = {"name": name, "ms": round(ms, 3), **extra}
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def fence(out):
    return float(jnp.sum(out.astype(jnp.float32)))


def interleaved(arms: dict, iters: int):
    """arms: name -> (callable, args). Compile all, then time round-robin."""
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
    """Trace-time env: set vars, jit-trace inside, restore."""
    class _Ctx:
        def __enter__(self):
            self.prev = {k: os.environ.get(k) for k in env}
            os.environ.update({k: v for k, v in env.items() if v is not None})
            for k, v in env.items():
                if v is None:
                    os.environ.pop(k, None)

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

    # ---- isolated kernel at the SD L0 shape ------------------------------
    from sd_tpu.kernels.flash_attention import (flash_attention,
                                                flash_attention_hpacked)

    B, S, H, D = 8, 4096, 8, 40
    q4 = rnd(B, S, H, D)
    k4, v4 = rnd(B, S, H, D), rnd(B, S, H, D)
    qp = q4.reshape(B, S, H * D)
    kp, vp = k4.reshape(B, S, H * D), v4.reshape(B, S, H * D)

    def loop_bhsd(q, pv_quant="none"):
        @jax.jit
        def f(q):
            def body(c, _):
                o = flash_attention(c, k4, v4, pv_quant=pv_quant)
                return chain_into(c, o), None
            c, _ = jax.lax.scan(body, q, None, length=8)
            return c
        return f

    def loop_hp(pv="none"):
        @jax.jit
        def f(q):
            def body(c, _):
                o = flash_attention_hpacked(c, kp, vp, H)
                return chain_into(c, o), None
            c, _ = jax.lax.scan(body, q, None, length=8)
            return c
        return f

    interleaved({
        "flash_L0_bhsd": (loop_bhsd(q4), (q4,)),
        "flash_L0_hpacked": (loop_hp(), (qp,)),
        "flash_L0_bhsd_int8pv": (loop_bhsd(q4, "int8"), (q4,)),
    }, 8)

    # ---- in-model: UNet fwd B8 (the 59.6 ms headline step) ---------------
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
    with with_env(SD_TPU_ATTN_HPACKED=None, SD_TPU_FLASH_PV=None):
        f = unet_loop()
        fence(f(up, x))  # trace under baseline env NOW
        arms["unet_fwd_B8_base"] = (f, (up, x))
    with with_env(SD_TPU_ATTN_HPACKED="1", SD_TPU_FLASH_PV=None):
        f = unet_loop()
        fence(f(up, x))
        arms["unet_fwd_B8_hpacked"] = (f, (up, x))
    with with_env(SD_TPU_ATTN_HPACKED=None, SD_TPU_FLASH_PV="int8"):
        f = unet_loop()
        fence(f(up, x))
        arms["unet_fwd_B8_int8pv"] = (f, (up, x))
    with with_env(SD_TPU_ATTN_HPACKED="1", SD_TPU_FLASH_PV="int8"):
        f = unet_loop()
        fence(f(up, x))
        arms["unet_fwd_B8_hpacked_int8pv"] = (f, (up, x))
    interleaved(arms, 8)


if __name__ == "__main__":
    main()
