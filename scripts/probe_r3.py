#!/usr/bin/env python
"""Round-2 perf probe #2: kernel exp precision, dispatch crossovers, the
subpixel decoder, conv layouts at 512^2, and full-model step times.

Same harness as probe_r2 (chained-scan, scalar readback, floor-subtracted).
Appends JSON lines to PROBE_R3.jsonl.
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

from flax import linen as nn

from sd_tpu.kernels.attention import _xla_attention, dot_product_attention
from sd_tpu.kernels.flash_attention import flash_attention

OUT = open("PROBE_R3.jsonl", "a", buffering=1)
ITERS = 16
REPS = 3
_FLOOR_MS = 0.0


def report(name: str, ms: float, **extra):
    rec = {"name": name, "ms": round(ms, 3), **extra}
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def measure(name: str, fn, carry, iters: int = ITERS, **extra):
    global _FLOOR_MS

    @jax.jit
    def loop(c):
        c, _ = jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=iters)
        return c

    try:
        t0 = time.perf_counter()
        out = loop(carry)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = loop(carry)
            float(jnp.sum(jax.tree.leaves(out)[0]))
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times)) / iters * 1e3
        if name != "floor":
            ms = max(ms - _FLOOR_MS, 0.0)
        report(name, ms, compile_s=round(compile_s, 1), **extra)
        return ms
    except Exception as e:
        report(name, -1.0, error=f"{type(e).__name__}: {e}"[:300], **extra)
        return -1.0


def bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def np_params_like(module, *args, seed=0, **kwargs):
    shapes = jax.eval_shape(
        functools.partial(module.init, **kwargs), jax.random.PRNGKey(0), *args)
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree.flatten(shapes)
    vals = [
        jnp.asarray(rng.normal(0, 0.02, l.shape).astype(np.float32), l.dtype)
        for l in leaves
    ]
    return jax.tree.unflatten(treedef, vals)


def chain_into(x, out):
    return x + (jnp.mean(out.astype(jnp.float32)) * 1e-6).astype(x.dtype)


def main():
    global _FLOOR_MS
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    key = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(key.normal(0, 1, s).astype(np.float32),
                                 jnp.bfloat16)
    t_start = time.time()

    x0 = rnd(8, 128)
    _FLOOR_MS = measure("floor", lambda c: c * 1.000001 + 1e-6, x0)

    # ---- flash kernel: exp dtype + block variants at the L0 hot shape -----
    q, k, v = rnd(8, 4096, 8, 40), rnd(8, 4096, 8, 40), rnd(8, 4096, 8, 40)
    for tag, kw in (
        ("fp32exp_q2048k1024", dict()),
        ("bf16exp_q2048k1024", dict(softmax_dtype=jnp.bfloat16)),
        ("bf16exp_q2048k2048", dict(softmax_dtype=jnp.bfloat16, block_k=2048)),
        ("fp32exp_q2048k2048", dict(block_k=2048)),
        ("bf16exp_q4096k1024", dict(softmax_dtype=jnp.bfloat16, block_q=4096)),
    ):
        measure(f"flash_S4096_d40_{tag}",
                lambda c, kw=kw: (flash_attention(
                    c[0], c[1], c[2], scale=40**-0.5, **kw),) + c[1:],
                (q, k, v))

    # accuracy of bf16 exp at the hot shape
    try:
        f32 = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale=40**-0.5))(q, k, v)
        b16 = jax.jit(lambda q, k, v: flash_attention(
            q, k, v, scale=40**-0.5, softmax_dtype=jnp.bfloat16))(q, k, v)
        d = float(jnp.max(jnp.abs(f32.astype(jnp.float32) - b16.astype(jnp.float32))))
        report("bf16exp_max_abs_diff", d, out_scale=float(jnp.max(jnp.abs(f32.astype(jnp.float32)))))
    except Exception as e:
        report("bf16exp_max_abs_diff", -1.0, error=str(e)[:200])

    # L1 shape with bf16 exp
    q1, k1, v1 = rnd(8, 1024, 8, 80), rnd(8, 1024, 8, 80), rnd(8, 1024, 8, 80)
    measure("flash_S1024_d80_bf16exp",
            lambda c: (flash_attention(c[0], c[1], c[2], scale=80**-0.5,
                                       softmax_dtype=jnp.bfloat16),) + c[1:],
            (q1, k1, v1))

    # ---- cross-attn crossovers at L1/L2 (confirm the new dispatch) --------
    for (S, d) in ((1024, 80), (256, 160)):
        qc = rnd(8, S, 8, d)
        kc, vc = rnd(8, 77, 8, d), rnd(8, 77, 8, d)
        measure(f"xla_cross_S{S}_kv77_d{d}",
                lambda c: (_xla_attention(c[0], c[1], c[2], d**-0.5),) + c[1:],
                (qc, kc, vc))
        measure(f"flash_cross_S{S}_kv77_d{d}",
                lambda c: (flash_attention(c[0], c[1], c[2],
                                           scale=d**-0.5),) + c[1:],
                (qc, kc, vc))

    print(f"--- kernels done at {time.time()-t_start:.0f}s ---", flush=True)

    # ---- full SD UNet forward at the real config ---------------------------
    from sd_tpu.models.unet_sd import UNetModel
    unet = UNetModel(
        in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4),
        num_heads=8, transformer_depth=1, context_dim=768,
        dtype=jnp.bfloat16,
    )
    xl = rnd(8, 64, 64, 4)
    tt = jnp.full((8,), 500, jnp.int32)
    ctx = rnd(8, 77, 768)
    uparams = bf16(np_params_like(unet, xl, tt, ctx))

    def unet_step(c):
        x, t, cc, p = c
        out = unet.apply(p, x, t, cc)
        return (chain_into(x, out), t, cc, p)

    measure("unet_fwd_B8_newdispatch", unet_step, (xl, tt, ctx, uparams),
            iters=8)
    os.environ["SD_TPU_FLASH_EXP"] = "bf16"
    measure("unet_fwd_B8_newdispatch_bf16exp", unet_step,
            (xl, tt, ctx, uparams), iters=8)
    del os.environ["SD_TPU_FLASH_EXP"]

    print(f"--- unet done at {time.time()-t_start:.0f}s ---", flush=True)

    # ---- VAE decode with the subpixel Upsample -----------------------------
    from sd_tpu.models.autoencoder import AutoencoderKL
    vae = AutoencoderKL(embed_dim=4, ch=128, ch_mult=(1, 2, 4, 4),
                        num_res_blocks=2, resolution=512, z_channels=4,
                        dtype=jnp.bfloat16)
    z = rnd(4, 64, 64, 4)
    vparams = bf16(np_params_like(vae, jnp.zeros((1, 512, 512, 3),
                                                 jnp.bfloat16),
                                  jax.random.PRNGKey(0)))
    measure("vae_decode_full_B4_512_subpixel",
            lambda c: (chain_into(c[0], vae.apply(
                c[1], c[0], method=AutoencoderKL.decode)), c[1]),
            (z, vparams), iters=4)

    # ---- conv experiments at 512^2 -----------------------------------------
    x512 = rnd(4, 512, 512, 128)
    wc = rnd(3, 3, 128, 128)

    def conv_pref(c, pref):
        y = jax.lax.conv_general_dilated(
            c[0], c[1], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pref)
        return (y.astype(jnp.bfloat16), c[1])

    measure("conv3x3_128_512sq_pref_f32",
            lambda c: conv_pref(c, jnp.float32), (x512, wc))
    measure("conv3x3_128_512sq_pref_bf16",
            lambda c: conv_pref(c, jnp.bfloat16), (x512, wc))

    def conv_shift9(c):
        x, w = c
        B, H, W, C = x.shape
        O = w.shape[-1]
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
        acc = jnp.zeros((B, H, W, O), jnp.float32)
        for u in range(3):
            for vv in range(3):
                acc = acc + jnp.einsum(
                    "bhwc,co->bhwo", xp[:, u:u + H, vv:vv + W, :], w[u, vv],
                    preferred_element_type=jnp.float32)
        return (acc.astype(jnp.bfloat16), w)

    measure("conv3x3_128_512sq_shift9", conv_shift9, (x512, wc))

    # batch-merged view (B*H as rows)
    x256c = rnd(4, 256, 256, 256)
    wc256 = rnd(3, 3, 256, 256)
    measure("conv3x3_256_256sq_pref_f32",
            lambda c: conv_pref(c, jnp.float32), (x256c, wc256))
    measure("conv3x3_256_256sq_shift9", conv_shift9, (x256c, wc256))

    print(f"--- all done at {time.time()-t_start:.0f}s ---", flush=True)


if __name__ == "__main__":
    main()
