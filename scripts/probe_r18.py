#!/usr/bin/env python
"""Round-3 probe #18: ToMe token merging (nn/tome.py, arXiv:2303.17604)
in-model — SD UNet fwd B8 at the 512² latent with tome_ratio 0 / 0.3 / 0.5,
as interleaved same-probe A/Bs per the drift discipline (BASELINE.md).

The hypothesis: at ratio 0.5 the L0 self-attention drops 4096→2048 tokens
(4× less attention FLOPs, 2× fewer attn1 projection tokens) and L1
1024→512; matching overhead is one [Ns,Nd] cosine matmul + top_k per
block. Expected UNet-step win if it holds: ~6-10 ms of the 59 ms step.

Appends JSON lines to PROBE_R18.jsonl.
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

OUT = open("PROBE_R18.jsonl", "a", buffering=1)
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


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    from sd_tpu.models.unet_sd import UNetModel

    key = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(key.normal(0, 1, s).astype(np.float32),
                                 jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ctx = rnd(8, 77, 768)
    x = rnd(8, 64, 64, 4)
    t = jnp.full((8,), 500, jnp.int32)

    kw = dict(in_channels=4, model_channels=320, out_channels=4,
              num_res_blocks=2, attention_resolutions=(4, 2, 1),
              channel_mult=(1, 2, 4, 4), num_heads=8,
              context_dim=768, dtype=jnp.bfloat16)
    base = UNetModel(**kw)
    up = base.init(rng, x, t, ctx)
    up = jax.device_put(jax.tree.map(lambda a: a.astype(jnp.bfloat16), up))

    def loop(model):
        # params as a jit ARGUMENT: closure weights embed into the lowered
        # module as constants and trip the remote compiler's request-size
        # limit (HTTP 413 / broken pipe) at SD scale
        @jax.jit
        def f(p, x):
            def body(c, _):
                o = model.apply(p, c, t, ctx)
                return chain_into(c, o), None
            c, _ = jax.lax.scan(body, x, None, length=4)
            return c
        return f

    arms = {
        "unet_fwd_B8_tome0": (loop(base), (up, x)),
        "unet_fwd_B8_tome30": (
            loop(UNetModel(**kw, tome_ratio=0.3)), (up, x)),
        "unet_fwd_B8_tome50": (
            loop(UNetModel(**kw, tome_ratio=0.5)), (up, x)),
    }
    interleaved(arms, 4)

    # numerical sanity on-device: tome output stays near baseline.
    # De-zero the zero-init convs first (out_conv + every SpatialTransformer
    # proj_out) — at random init they hide the transformer blocks entirely,
    # so the deviation of anything inside them reads as exactly 0.
    kr = [jax.random.fold_in(rng, 99)]

    def dezero(v):
        kr[0], sub = jax.random.split(kr[0])
        return jnp.where(jnp.all(v == 0),
                         jax.random.normal(sub, v.shape).astype(v.dtype)
                         * 0.05, v)

    up_dz = jax.tree.map(dezero, up)
    o0 = base.apply(up_dz, x, t, ctx).astype(jnp.float32)
    o5 = UNetModel(**kw, tome_ratio=0.5).apply(up_dz, x, t,
                                               ctx).astype(jnp.float32)
    rel = float(jnp.linalg.norm(o5 - o0) / (jnp.linalg.norm(o0) + 1e-8))
    report("tome50_rel_dev_vs_exact", 0.0, rel=round(rel, 4))


if __name__ == "__main__":
    main()
