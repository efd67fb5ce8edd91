#!/usr/bin/env python
"""Round-2 probe #5: decompose the 65 ms SD-UNet forward step into component
costs at the real level shapes, to locate the glue above the padded-matmul
roofline (BASELINE.md puts the attention+conv floor at ~55 ms; what is the
other ~10 ms?). Also measures the im2col variant of the Pallas conv3x3.

Appends JSON lines to PROBE_R5.jsonl.
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

OUT = open("PROBE_R5.jsonl", "a", buffering=1)
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

    from flax import linen as nn

    from sd_tpu.nn.attention import (BasicTransformerBlock, CrossAttention,
                                     FeedForwardGEGLU, LayerNorm32,
                                     SpatialTransformer)
    from sd_tpu.nn.layers import GroupNorm32
    from sd_tpu.nn.resnet import ResBlockSD

    rng = jax.random.PRNGKey(0)
    ctx = rnd(8, 77, 768)
    temb = rnd(8, 1280)

    # level shapes: (tag, tokens_shape, spatial_shape, heads, dim_head)
    levels = [
        ("L0", (8, 4096, 320), (8, 64, 64, 320), 8, 40),
        ("L1", (8, 1024, 640), (8, 32, 32, 640), 8, 80),
        ("L2", (8, 256, 1280), (8, 16, 16, 1280), 8, 160),
    ]

    # ---- norms ------------------------------------------------------------
    for tag, tok_s, sp_s, heads, dh in levels:
        xt = rnd(*tok_s)
        xs = rnd(*sp_s)

        ln = LayerNorm32()
        lnp = ln.init(rng, xt)
        measure(f"ln32_{tag}", lambda c, m=ln, p=lnp: chain_into(c, m.apply(p, c)), xt)

        lnb = nn.LayerNorm(dtype=jnp.bfloat16)
        lnbp = lnb.init(rng, xt)
        measure(f"ln_bf16_{tag}", lambda c, m=lnb, p=lnbp: chain_into(c, m.apply(p, c)), xt)

        gn = GroupNorm32(32, epsilon=1e-5)
        gnp = gn.init(rng, xs)
        measure(f"gn32_{tag}", lambda c, m=gn, p=gnp: chain_into(c, m.apply(p, c)), xs)

    # decoder-shape GN
    xd = rnd(4, 512, 512, 128)
    gn = GroupNorm32(32, epsilon=1e-6)
    gnp = gn.init(rng, xd)
    measure("gn32_dec512_128", lambda c, m=gn, p=gnp: chain_into(c, m.apply(p, c)), xd)

    # ---- per-level transformer components --------------------------------
    for tag, tok_s, sp_s, heads, dh in levels:
        xt = rnd(*tok_s)
        xs = rnd(*sp_s)

        # self-attention e2e through the CrossAttention module (projections +
        # reshapes + kernel) — bare-kernel numbers are in PROBE_R2/R3.
        ca = CrossAttention(heads=heads, dim_head=dh, dtype=jnp.bfloat16)
        cap = ca.init(rng, xt)
        measure(f"selfattn_e2e_{tag}",
                lambda c, m=ca, p=cap: chain_into(c, m.apply(p, c)), xt)

        # cross-attention e2e (77-token context)
        cap2 = ca.init(rng, xt, ctx)
        measure(f"xattn_e2e_{tag}",
                lambda c, m=ca, p=cap2: chain_into(c, m.apply(p, c, ctx)), xt)

        ff = FeedForwardGEGLU(dtype=jnp.bfloat16)
        ffp = ff.init(rng, xt)
        measure(f"ff_geglu_{tag}",
                lambda c, m=ff, p=ffp: chain_into(c, m.apply(p, c)), xt)

        btb = BasicTransformerBlock(heads, dh, dtype=jnp.bfloat16)
        btbp = btb.init(rng, xt, ctx)
        measure(f"btb_{tag}",
                lambda c, m=btb, p=btbp: chain_into(c, m.apply(p, c, ctx)), xt)

        st = SpatialTransformer(heads, dh, depth=1, dtype=jnp.bfloat16)
        stp = st.init(rng, xs, ctx)
        measure(f"spatial_transformer_{tag}",
                lambda c, m=st, p=stp: chain_into(c, m.apply(p, c, ctx)), xs)

        rb = ResBlockSD(dtype=jnp.bfloat16)
        rbp = rb.init(rng, xs, temb)
        measure(f"resblock_{tag}",
                lambda c, m=rb, p=rbp: chain_into(c, m.apply(p, c, temb)), xs)

    print(f"--- components done at {time.time()-t0:.0f}s ---", flush=True)

    # ---- full UNet fwd re-baseline ----------------------------------------
    # NOTE: params must be bf16 jit ARGUMENTS — closing over the fp32 tree
    # ships 3.4 GB of constants through the remote-compile tunnel and stalls
    # (this is how the original run of this probe died; probe_r6 measured the
    # UNet with the args-passing form instead).
    from sd_tpu.models.unet_sd import UNetModel

    unet = UNetModel(in_channels=4, model_channels=320, out_channels=4,
                     num_res_blocks=2, attention_resolutions=(4, 2, 1),
                     channel_mult=(1, 2, 4, 4), num_heads=8,
                     transformer_depth=1, context_dim=768, dtype=jnp.bfloat16)
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

    try:
        t1 = time.perf_counter()
        float(jnp.sum(unet_loop(up, x).astype(jnp.float32)))
        compile_s = time.perf_counter() - t1
        times = []
        for _ in range(REPS):
            t1 = time.perf_counter()
            float(jnp.sum(unet_loop(up, x).astype(jnp.float32)))
            times.append(time.perf_counter() - t1)
        report("unet_fwd_B8", float(np.median(times)) / 8 * 1e3 - _FLOOR_MS,
               compile_s=round(compile_s, 1))
    except Exception as e:
        report("unet_fwd_B8", -1.0, error=str(e)[:300])

    # ---- im2col conv variant ----------------------------------------------
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

    # correctness of the im2col path on-device
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

    # ---- profiler attempt (may not work over the axon tunnel) -------------
    try:
        os.makedirs("/tmp/jaxtrace", exist_ok=True)
        f = jax.jit(lambda c: unet.apply(up, c, t, ctx))
        f(x).block_until_ready()
        with jax.profiler.trace("/tmp/jaxtrace"):
            for _ in range(3):
                f(x).block_until_ready()
        n = sum(len(fs) for _, _, fs in os.walk("/tmp/jaxtrace"))
        report("profiler_trace", 0.0, files=n)
    except Exception as e:
        report("profiler_trace", -1.0, error=str(e)[:200])

    print(f"--- all done at {time.time()-t0:.0f}s ---", flush=True)


if __name__ == "__main__":
    main()
