#!/usr/bin/env python
"""Round-2 probe #11: (1) VAE decode + KL-GAN step after the fused
GN→SiLU→conv ResnetBlock landed; (2) does Mosaic overlap MXU matmuls with
independent VPU exp chains inside one kernel? (decides whether software-
pipelining the flash kernel's softmax against the next block's QK matmul is
worth building — the kernel currently measures exactly MXU+VPU serial).

Appends JSON lines to PROBE_R11.jsonl.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("PROBE_R11.jsonl", "a", buffering=1)
REPS = 3


def report(name, ms, **extra):
    rec = {"name": name, "ms": round(ms, 3), **extra}
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def timed_loop(name, loop, args, iters):
    try:
        t1 = time.perf_counter()
        float(jnp.sum(jax.tree.leaves(loop(*args))[0].astype(jnp.float32)))
        compile_s = time.perf_counter() - t1
        times = []
        for _ in range(REPS):
            t1 = time.perf_counter()
            float(jnp.sum(jax.tree.leaves(loop(*args))[0].astype(jnp.float32)))
            times.append(time.perf_counter() - t1)
        ms = float(np.median(times)) / iters * 1e3
        report(name, ms, compile_s=round(compile_s, 1))
        return ms
    except Exception as e:
        report(name, -1.0, error=f"{type(e).__name__}: {e}"[:300])
        return -1.0


def chain_into(x, out):
    return x + (jnp.mean(out.astype(jnp.float32)) * 1e-6).astype(x.dtype)


# ---- MXU/VPU overlap micro-kernels ----------------------------------------

def _mm_only_kernel(a_ref, b_ref, ei_ref, o_ref, e_ref, *, do_mm, do_exp):
    if do_mm:
        acc = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)
    else:
        o_ref[...] = jnp.zeros_like(o_ref)
    if do_exp:
        # independent VPU chain: if Mosaic overlaps MXU and VPU, mm+exp
        # should cost ~max(t_mm, t_exp), not the sum
        e = ei_ref[...]
        e = jnp.exp2(e * 0.999)
        e_ref[...] = e
    else:
        e_ref[...] = ei_ref[...]


def overlap_micro(do_mm, do_exp, M=1024, K=512, N=1024, E=2048):
    a = jnp.ones((M, K), jnp.bfloat16)
    b = jnp.ones((K, N), jnp.bfloat16)
    e0 = jnp.ones((M, E), jnp.float32) * 0.01

    f = pl.pallas_call(
        functools.partial(_mm_only_kernel, do_mm=do_mm, do_exp=do_exp),
        grid=(16,),
        in_specs=[pl.BlockSpec((M, K), lambda i: (0, 0)),
                  pl.BlockSpec((K, N), lambda i: (0, 0)),
                  pl.BlockSpec((M, E), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((M, N), lambda i: (0, 0)),
                   pl.BlockSpec((M, E), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                   jax.ShapeDtypeStruct((M, E), jnp.float32)],
    )

    @jax.jit
    def loop(a, b, e):
        def body(c, _):
            o_prev, e_prev = c
            bb = b + o_prev[:K, :N] * jnp.asarray(1e-6, jnp.bfloat16)
            o, e2 = f(a, bb, e_prev)
            return (o, e2), None
        (o, e2), _ = jax.lax.scan(
            body, (jnp.zeros((M, N), jnp.bfloat16), e0), None, length=4)
        return o, e2

    return loop, (a, b, e0)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(key.normal(0, 1, s).astype(np.float32),
                                 jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    for name, do_mm, do_exp in (("mm_only", True, False),
                                ("exp_only", False, True),
                                ("mm_plus_exp", True, True)):
        try:
            loop, args = overlap_micro(do_mm, do_exp)
            timed_loop(f"overlap_{name}", loop, args, 4 * 16)
        except Exception as e:
            report(f"overlap_{name}", -1.0, error=str(e)[:300])

    # ---- decode after the fused GN→silu→conv ResnetBlock ------------------
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

    timed_loop("vae_decode_B4_fused_gnconv", dec_loop, (vp, z), 4)

    # on-device sanity: fused decode output is finite
    try:
        got = jax.jit(lambda p, c: vae.apply({"params": p}, c,
                                             method=vae.decode))(vp, z)
        report("vae_decode_fused_finite", 0.0,
               finite=bool(jnp.all(jnp.isfinite(got.astype(jnp.float32)))))
    except Exception as e:
        report("vae_decode_fused_finite", -1.0, error=str(e)[:300])

    # ---- KL-GAN step after the fusion --------------------------------------
    from sd_tpu.losses.gan import GanLossConfig
    from sd_tpu.models.discriminator import NLayerDiscriminator
    from sd_tpu.train.gan import gan_adam, init_gan_state, make_kl_gan_train_step

    vae256 = AutoencoderKL(embed_dim=4, ch=128, ch_mult=(1, 2, 4, 4),
                           num_res_blocks=2, resolution=256, z_channels=4,
                           dtype=jnp.bfloat16)
    disc = NLayerDiscriminator(ndf=64, n_layers=3, use_actnorm=False,
                               dtype=jnp.bfloat16)
    B = 8
    dummy = jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
    vparams = vae256.init(rng, dummy, rng)["params"]
    dvars = disc.init(rng, dummy)
    cfg = GanLossConfig(disc_start=0, disc_weight=0.5, kl_weight=1e-6,
                        perceptual_weight=0.0, disc_loss="hinge")
    opt_g, opt_d = gan_adam(4.5e-6), gan_adam(4.5e-6)
    state = init_gan_state(vparams, dvars, opt_g, opt_d)
    ae_apply = lambda p, x, r: vae256.apply({"params": p}, x, r)
    step = make_kl_gan_train_step(ae_apply, disc, None, opt_g, opt_d, cfg)
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
        report("kl_gan_step_256_B8_fused", ms, compile_s=round(compile_s, 1),
               img_per_s=round(B / (ms / 1e3), 2))
    except Exception as e:
        report("kl_gan_step_256_B8_fused", -1.0, error=str(e)[:300])


if __name__ == "__main__":
    main()
