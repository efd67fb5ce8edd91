#!/usr/bin/env python
"""Round-2 probe #15: decode A/B — Pallas conv dispatch ON vs OFF,
interleaved (the kernel wins 8-12% standalone, but the in-model benefit has
never been isolated; training measurably loses with it ON, so this decides
the default).

Appends JSON lines to PROBE_R15.jsonl.
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

OUT = open("PROBE_R15.jsonl", "a", buffering=1)


def report(name, ms, **extra):
    rec = {"name": name, "ms": round(ms, 3), **extra}
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def chain_into(x, out):
    return x + (jnp.mean(out.astype(jnp.float32)) * 1e-6).astype(x.dtype)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(key.normal(0, 1, s).astype(np.float32),
                                 jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    from sd_tpu.models.autoencoder import AutoencoderKL

    z = rnd(4, 64, 64, 4)
    results = {}
    loops = {}
    for _round in range(2):
        for tag, flag in (("on", "1"), ("off", "0")):
            os.environ["SD_TPU_PALLAS_CONV"] = flag
            if tag not in loops:
                vae = AutoencoderKL(embed_dim=4, ch=128, ch_mult=(1, 2, 4, 4),
                                    num_res_blocks=2, resolution=512,
                                    z_channels=4, dtype=jnp.bfloat16)
                dummy = jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
                vp = vae.init(rng, dummy, rng)["params"]
                vp = jax.device_put(
                    jax.tree.map(lambda a: a.astype(jnp.bfloat16), vp))

                @jax.jit
                def dec_loop(p, c, _vae=vae):
                    c, _ = jax.lax.scan(
                        lambda c, _: (chain_into(c, _vae.apply(
                            {"params": p}, c, method=_vae.decode)), None),
                        c, None, length=4)
                    return c

                loops[tag] = (dec_loop, vp)
            dec_loop, vp = loops[tag]
            try:
                t1 = time.perf_counter()
                float(jnp.sum(dec_loop(vp, z).astype(jnp.float32)))
                compile_s = time.perf_counter() - t1
                times = []
                for _ in range(3):
                    t1 = time.perf_counter()
                    float(jnp.sum(dec_loop(vp, z).astype(jnp.float32)))
                    times.append(time.perf_counter() - t1)
                ms = float(np.median(times)) / 4 * 1e3
                results.setdefault(tag, []).append(ms)
                report(f"decode_ab_round{_round}_{tag}", ms,
                       compile_s=round(compile_s, 1))
            except Exception as e:
                report(f"decode_ab_round{_round}_{tag}", -1.0,
                       error=str(e)[:300])
    for tag, vals in results.items():
        report(f"decode_ab_median_{tag}", float(np.median(vals)))


if __name__ == "__main__":
    main()
