#!/usr/bin/env python
"""Round-2 probe #7: decompose the end-to-end bench (1.237 img/s) into stage
times. 50×59.6 ms UNet + 103 ms decode predicts 1.30 img/s — where do the
other ~150 ms go? Times each jitted stage separately: CLIP ×2, the full
50-step DDIM scan (no decode), decode, and a scan-overhead floor with an
identity model.

Appends JSON lines to PROBE_R7.jsonl.
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

OUT = open("PROBE_R7.jsonl", "a", buffering=1)
REPS = 3


def report(name, ms, **extra):
    rec = {"name": name, "ms": round(ms, 3), **extra}
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def timeit(name, fn, *args, **extra):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(*args)
            float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times)) * 1e3
        report(name, ms, compile_s=round(compile_s, 1), **extra)
        return ms
    except Exception as e:
        report(name, -1.0, error=f"{type(e).__name__}: {e}"[:300], **extra)
        return -1.0


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    import bench as benchmod

    pipeline, params, clip_cfg, lat = benchmod.build(False)
    cparams, uparams, vparams = params

    from sd_tpu.core.schedules import DDIMSchedule, DiffusionSchedule
    from sd_tpu.diffusion.ddim import DDIMSampler
    from sd_tpu.models.autoencoder import AutoencoderKL
    from sd_tpu.models.clip_text import ClipTextConfig, ClipTextTransformer, SimpleHashTokenizer
    from sd_tpu.models.unet_sd import UNetModel

    clip = ClipTextTransformer(clip_cfg, dtype=jnp.bfloat16)
    unet = UNetModel(in_channels=4, model_channels=320, out_channels=4,
                     num_res_blocks=2, attention_resolutions=(4, 2, 1),
                     channel_mult=(1, 2, 4, 4), num_heads=8,
                     context_dim=768, dtype=jnp.bfloat16)
    vae = AutoencoderKL(embed_dim=4, ch=128, ch_mult=(1, 2, 4, 4),
                        num_res_blocks=2, resolution=512, z_channels=4,
                        dtype=jnp.bfloat16)

    tok = SimpleHashTokenizer(clip_cfg.max_length, clip_cfg.vocab_size)
    B = 4
    ids = jnp.asarray(tok(["a photograph of an astronaut riding a horse"] * B))
    neg = jnp.asarray(tok([""] * B))
    rng = jax.random.PRNGKey(0)

    sched = DiffusionSchedule.create(timesteps=1000, beta_schedule="linear",
                                     linear_start=0.00085, linear_end=0.012)
    sampler = DDIMSampler(sched)
    dd = DDIMSchedule.create(sched, 50)

    # 1) CLIP ×2
    @jax.jit
    def clip2(cp, i, n):
        return (clip.apply({"params": cp}, i).astype(jnp.bfloat16),
                clip.apply({"params": cp}, n).astype(jnp.bfloat16))

    c, uc = clip2(cparams, ids, neg)
    timeit("clip_x2_B4", clip2, cparams, ids, neg)

    # 2) 50-step DDIM scan alone (no decode)
    @jax.jit
    def sample_only(up, c, uc, r):
        model_fn = lambda x, t, ctx: unet.apply(
            {"params": up}, x.astype(jnp.bfloat16), t, ctx)
        return sampler.sample(model_fn, r, (B, lat, lat, 4), cond=c,
                              uncond=uc, guidance_scale=7.5, dd=dd)

    z = sample_only(uparams, c, uc, rng)
    ms = timeit("ddim50_scan_B4", sample_only, uparams, c, uc, rng)
    if ms > 0:
        report("ddim50_per_step", ms / 50.0)

    # 3) decode alone
    @jax.jit
    def dec(vp, z):
        return vae.apply({"params": vp}, (z / 0.18215).astype(jnp.bfloat16),
                         method=AutoencoderKL.decode)

    timeit("vae_decode_B4", dec, vparams, z)

    # 4) scan floor with identity model (sampler body overhead)
    @jax.jit
    def sample_identity(c, uc, r):
        model_fn = lambda x, t, ctx: x * 0.999
        return sampler.sample(model_fn, r, (B, lat, lat, 4), cond=c,
                              uncond=uc, guidance_scale=7.5, dd=dd)

    timeit("ddim50_identity_model", sample_identity, c, uc, rng)

    # 5) full pipeline (bench parity check with scalar readback)
    jp = jax.jit(pipeline)
    timeit("full_pipeline_B4", jp, cparams, uparams, vparams, ids, neg, rng)


if __name__ == "__main__":
    main()
