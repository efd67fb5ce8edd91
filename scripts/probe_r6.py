#!/usr/bin/env python
"""Round-2 probe #6: effect of the fused GEGLU kernel and the Pallas conv
wiring on the UNet step and the VAE decode, plus geglu micro numbers.

Appends JSON lines to PROBE_R6.jsonl.
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

OUT = open("PROBE_R6.jsonl", "a", buffering=1)
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
    rng = jax.random.PRNGKey(0)

    _FLOOR_MS = measure("floor", lambda c: c * 1.000001 + 1e-6, rnd(8, 128))

    # ---- geglu micro: fused kernel vs XLA at the SD FF shapes -------------
    from sd_tpu.kernels.geglu import _geglu_xla, geglu_ff

    for tag, N, C in (("L0", 8 * 4096, 320), ("L1", 8 * 1024, 640)):
        inner = 4 * C
        x = rnd(N, C)
        w1 = rnd(C, 2 * inner)
        b1 = jnp.zeros((2 * inner,), jnp.float32)
        w2 = rnd(inner, C)
        b2 = jnp.zeros((C,), jnp.float32)
        measure(f"geglu_xla_{tag}",
                lambda c: chain_into(c, _geglu_xla(c, w1, b1, w2, b2)), x)
        measure(f"geglu_pallas_{tag}",
                lambda c: chain_into(c, geglu_ff(c, w1, b1, w2, b2)), x)
        # correctness on-device
        try:
            got = jax.jit(geglu_ff)(x[:2048], w1, b1, w2, b2)
            want = jax.jit(_geglu_xla)(x[:2048], w1, b1, w2, b2)
            d = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                      want.astype(jnp.float32))))
            report(f"geglu_maxdiff_{tag}", d,
                   scale=float(jnp.max(jnp.abs(want.astype(jnp.float32)))))
        except Exception as e:
            report(f"geglu_maxdiff_{tag}", -1.0, error=str(e)[:300])

    # ---- full UNet fwd with fused FF --------------------------------------
    # params go in as jit ARGUMENTS (bf16) — closing over the fp32 tree ships
    # 3.4 GB of constants through the remote-compile tunnel (probe_r5 stall).
    from sd_tpu.models.unet_sd import UNetModel

    ctx = rnd(8, 77, 768)
    unet = UNetModel(in_channels=4, model_channels=320, out_channels=4,
                     num_res_blocks=2, attention_resolutions=(4, 2, 1),
                     channel_mult=(1, 2, 4, 4), num_heads=8,
                     transformer_depth=1, context_dim=768, dtype=jnp.bfloat16)
    x = rnd(8, 64, 64, 4)
    t = jnp.full((8,), 500, jnp.int32)
    up = unet.init(rng, x, t, ctx)
    up = jax.tree.map(lambda a: a.astype(jnp.bfloat16), up)
    up = jax.device_put(up)

    def unet_loop_body(c, p):
        return chain_into(c, unet.apply(p, c, t, ctx))

    @jax.jit
    def unet_loop(p, c):
        c, _ = jax.lax.scan(lambda c, _: (unet_loop_body(c, p), None),
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
        ms = float(np.median(times)) / 8 * 1e3 - _FLOOR_MS
        report("unet_fwd_B8_fusedff", ms, compile_s=round(compile_s, 1))
    except Exception as e:
        report("unet_fwd_B8_fusedff", -1.0, error=str(e)[:300])

    # ---- VAE decode with Pallas convs in the ResnetBlocks ------------------
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

    try:
        t1 = time.perf_counter()
        float(jnp.sum(dec_loop(vp, z).astype(jnp.float32)))
        compile_s = time.perf_counter() - t1
        times = []
        for _ in range(REPS):
            t1 = time.perf_counter()
            float(jnp.sum(dec_loop(vp, z).astype(jnp.float32)))
            times.append(time.perf_counter() - t1)
        ms = float(np.median(times)) / 4 * 1e3 - _FLOOR_MS
        report("vae_decode_B4_pallasconv", ms, compile_s=round(compile_s, 1))
    except Exception as e:
        report("vae_decode_B4_pallasconv", -1.0, error=str(e)[:300])

    # ---- im2col conv variant (carried over from the stalled probe_r5) ------
    from sd_tpu.kernels.conv2d import conv3x3_same

    shapes = [
        ("512sq_128to128", 4, 512, 512, 128, 128),
        ("512sq_256to128", 4, 512, 512, 256, 128),
        ("256sq_256to256", 4, 256, 256, 256, 256),
        ("256sq_512to512", 4, 256, 256, 512, 512),
        ("128sq_512to512", 4, 128, 128, 512, 512),
    ]
    for tag, B, H, W, C, O in shapes:
        xc = rnd(B, H, W, C)
        w = rnd(3, 3, C, O)
        bb = rnd(O)

        def pl_conv(c):
            y = conv3x3_same(c[0], c[1], c[2], im2col=True)
            return (chain_into(c[0], y), c[1], c[2])

        measure(f"conv_im2col_{tag}", pl_conv, (xc, w, bb), iters=8)

    try:
        xc = rnd(1, 64, 256, 128)
        w = rnd(3, 3, 128, 128)
        bb = rnd(128)
        ref = jax.lax.conv_general_dilated(
            xc, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        ref = (ref + bb.astype(jnp.float32)).astype(jnp.bfloat16)
        got = jax.jit(functools.partial(conv3x3_same, im2col=True))(xc, w, bb)
        d = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                  got.astype(jnp.float32))))
        report("conv_im2col_tpu_maxdiff", d,
               scale=float(jnp.max(jnp.abs(ref.astype(jnp.float32)))))
    except Exception as e:
        report("conv_im2col_tpu_maxdiff", -1.0, error=str(e)[:300])

    # ---- decoder GN after the per-channel-first stats rewrite --------------
    from sd_tpu.nn.layers import GroupNorm32

    xd = rnd(4, 512, 512, 128)
    gn = GroupNorm32(32, epsilon=1e-6)
    gnp = gn.init(rng, xd)
    measure("gn32_dec512_128_chfirst",
            lambda c, m=gn, p=gnp: chain_into(c, m.apply(p, c)), xd)

    print(f"--- all done at {time.time()-t0:.0f}s ---", flush=True)


if __name__ == "__main__":
    main()
