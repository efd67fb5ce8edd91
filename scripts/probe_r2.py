#!/usr/bin/env python
"""Round-2 perf probe: where do the UNet step and the VAE decode spend time,
and do the candidate optimizations pay?

Runs on the tunneled TPU. Every measurement is a chained-scan loop (the carry
feeds the next iteration so LICM cannot hoist the body) with a scalar
readback (block_until_ready is unreliable on the axon platform). Results are
appended as JSON lines to stdout and PROBE_R2.jsonl.

Measurements:
  unet side:  flash/xla self+cross kernels at the three SD shapes,
              SpatialTransformer per level, fused-qkv self-attention variant
  vae side:   full KL-f8 decode @B4->512, per-stage decoder sections,
              conv/GN microbenches at 512^2, nearest-upsample+conv vs
              subpixel (4x 2x2 phase convs) vs embedded-3x3 variants
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

from sd_tpu.kernels.attention import _xla_attention
from sd_tpu.kernels.flash_attention import flash_attention
from sd_tpu.nn.attention import (BasicTransformerBlock, CrossAttention,
                                 LayerNorm32, SpatialTransformer, AttnBlock)
from sd_tpu.nn.layers import GroupNorm32
from sd_tpu.nn.resnet import ResnetBlock
from sd_tpu.nn.updown import Upsample, nearest_upsample_2x

OUT = open("PROBE_R2.jsonl", "a", buffering=1)
ITERS = 16
REPS = 3
_FLOOR_MS = 0.0


def report(name: str, ms: float, **extra):
    rec = {"name": name, "ms": round(ms, 3), **extra}
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def measure(name: str, fn, carry, iters: int = ITERS, **extra):
    """fn: carry -> carry (same treedef/shapes). Returns ms per call."""
    global _FLOOR_MS

    @jax.jit
    def loop(c):
        c, _ = jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=iters)
        return c

    try:
        t0 = time.perf_counter()
        out = loop(carry)
        float(jnp.sum(jax.tree.leaves(out)[0]))  # force full completion
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
    except Exception as e:  # keep the batch alive
        report(name, -1.0, error=f"{type(e).__name__}: {e}"[:300], **extra)
        return -1.0


def bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def np_params_like(module, *args, seed=0, **kwargs):
    """Init-free parameters: eval_shape the init (no device compute), fill
    with host numpy randoms. Avoids one remote XLA compile per module init."""
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
    """Mix a (possibly differently-shaped) output back into the carry."""
    return x + (jnp.mean(out.astype(jnp.float32)) * 1e-6).astype(x.dtype)


# ---------------------------------------------------------------------------
# subpixel upsample+conv variants (candidate decoder optimization)
# ---------------------------------------------------------------------------


def naive_up_conv(x, w, b):
    u = nearest_upsample_2x(x)
    y = jax.lax.conv_general_dilated(
        u, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return y + b.astype(x.dtype)


def subpixel_up_conv(x, w, b):
    """nearest 2x + SAME conv3x3 as four 2x2 phase convs + interleave.
    2.25x fewer MACs and no 4x-materialized upsampled tensor."""
    r0 = jnp.stack([w[0], w[1] + w[2]])          # rows (i-1, i)   [2,3,C,O]
    r1 = jnp.stack([w[0] + w[1], w[2]])          # rows (i, i+1)
    phases = []
    for di, rk in ((0, r0), (1, r1)):
        for dj in (0, 1):
            if dj == 0:
                k2 = jnp.stack([rk[:, 0], rk[:, 1] + rk[:, 2]], axis=1)
            else:
                k2 = jnp.stack([rk[:, 0] + rk[:, 1], rk[:, 2]], axis=1)
            pad_r = (1, 0) if di == 0 else (0, 1)
            pad_c = (1, 0) if dj == 0 else (0, 1)
            y = jax.lax.conv_general_dilated(
                x, k2.astype(x.dtype), (1, 1), [pad_r, pad_c],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(x.dtype)
            phases.append(y + b.astype(x.dtype))
    p = jnp.stack(phases, axis=3)                # [B,H,W,4,O]
    B, H, W, _, O = p.shape
    p = p.reshape(B, H, W, 2, 2, O).transpose(0, 1, 3, 2, 4, 5)
    return p.reshape(B, 2 * H, 2 * W, O)


def embedded_up_conv(x, w, b):
    """Single SAME 3x3 conv producing all 4 phases (4*O channels) followed by
    depth-to-space. Same MACs as naive but input read once at low res and no
    upsampled intermediate."""
    C, O = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 3, C, 4, O), w.dtype)
    # 3x3 SAME conv: output i reads padded rows i-1,i,i+1 -> kernel rows 0,1,2
    r0 = jnp.stack([w[0], w[1] + w[2]])          # taps at (i-1, i)
    r1 = jnp.stack([w[0] + w[1], w[2]])          # taps at (i, i+1)
    for ph, (di, dj) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        rk = (r0, r1)[di]
        if dj == 0:
            k2 = jnp.stack([rk[:, 0], rk[:, 1] + rk[:, 2]], axis=1)
        else:
            k2 = jnp.stack([rk[:, 0] + rk[:, 1], rk[:, 2]], axis=1)
        rs, cs = (0 if di == 0 else 1), (0 if dj == 0 else 1)
        k = k.at[rs:rs + 2, cs:cs + 2, :, ph, :].set(k2)
    k = k.reshape(3, 3, C, 4 * O)
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    B, H, W, _ = y.shape
    y = y.reshape(B, H, W, 2, 2, O).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 2 * H, 2 * W, O) + b.astype(x.dtype)


# ---------------------------------------------------------------------------
# fused-qkv self-attention variant
# ---------------------------------------------------------------------------


class FusedQKVSelfAttention(nn.Module):
    heads: int
    dim_head: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Dense(3 * inner, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = flash_attention(q, k, v, scale=self.dim_head**-0.5)
        return nn.Dense(C, dtype=self.dtype, name="to_out")(
            out.reshape(B, N, inner))


def main():
    global _FLOOR_MS
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    key = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(key.normal(0, 1, s).astype(np.float32),
                                 jnp.bfloat16)

    t_start = time.time()

    # ---- floor -----------------------------------------------------------
    x0 = rnd(8, 128)
    _FLOOR_MS = measure("floor", lambda c: c * 1.000001 + 1e-6, x0)

    # ---- attention kernels ------------------------------------------------
    for (S, d) in ((4096, 40), (1024, 80), (256, 160)):
        q, k, v = rnd(8, S, 8, d), rnd(8, S, 8, d), rnd(8, S, 8, d)
        measure(f"flash_self_S{S}_d{d}",
                lambda c: (flash_attention(c[0], c[1], c[2],
                                           scale=d**-0.5),) + c[1:],
                (q, k, v), shape=f"B8 S{S} h8 d{d}")
        if S <= 1024:
            measure(f"xla_self_S{S}_d{d}",
                    lambda c: (_xla_attention(c[0], c[1], c[2],
                                              d**-0.5),) + c[1:],
                    (q, k, v), shape=f"B8 S{S} h8 d{d}")
    # cross attention, 77-token kv
    q = rnd(8, 4096, 8, 40)
    k77, v77 = rnd(8, 77, 8, 40), rnd(8, 77, 8, 40)
    measure("flash_cross_S4096_kv77_d40",
            lambda c: (flash_attention(c[0], c[1], c[2],
                                       scale=40**-0.5),) + c[1:],
            (q, k77, v77))
    measure("xla_cross_S4096_kv77_d40",
            lambda c: (_xla_attention(c[0], c[1], c[2], 40**-0.5),) + c[1:],
            (q, k77, v77))

    # ---- SpatialTransformer per level -------------------------------------
    ctx = rnd(8, 77, 768)
    for (hw, C, d) in ((64, 320, 40), (32, 640, 80), (16, 1280, 160)):
        st = SpatialTransformer(heads=8, dim_head=d, dtype=jnp.bfloat16)
        x = rnd(8, hw, hw, C)
        params = bf16(np_params_like(st, x, ctx))
        measure(f"spatial_transformer_{hw}x{hw}_C{C}",
                lambda c, st=st: (st.apply(c[2], c[0], c[1]), c[1], c[2]),
                (x, ctx, params), shape=f"B8 {hw}x{hw} C{C} d{d}")

    # ---- self-attention sublayer: current vs fused qkv ---------------------
    xseq = rnd(8, 4096, 320)
    cur = CrossAttention(heads=8, dim_head=40, dtype=jnp.bfloat16)
    pcur = bf16(np_params_like(cur, xseq))
    measure("self_attn_sublayer_current_S4096_C320",
            lambda c: (cur.apply(c[1], c[0]), c[1]), (xseq, pcur))
    fus = FusedQKVSelfAttention(heads=8, dim_head=40, dtype=jnp.bfloat16)
    pfus = bf16(np_params_like(fus, xseq))
    measure("self_attn_sublayer_fusedqkv_S4096_C320",
            lambda c: (fus.apply(c[1], c[0]), c[1]), (xseq, pfus))

    print(f"--- unet side done at {time.time()-t_start:.0f}s ---", flush=True)

    # ---- VAE decode: full -------------------------------------------------
    from sd_tpu.models.autoencoder import AutoencoderKL
    vae = AutoencoderKL(embed_dim=4, ch=128, ch_mult=(1, 2, 4, 4),
                        num_res_blocks=2, resolution=512, z_channels=4,
                        dtype=jnp.bfloat16)
    z = rnd(4, 64, 64, 4)
    vparams = bf16(np_params_like(vae, jnp.zeros((1, 512, 512, 3),
                                                 jnp.bfloat16),
                                  jax.random.PRNGKey(0)))
    measure("vae_decode_full_B4_512",
            lambda c: (chain_into(c[0], vae.apply(
                c[1], c[0], method=AutoencoderKL.decode)), c[1]),
            (z, vparams), iters=4)

    # ---- decoder stages ----------------------------------------------------
    class MidStage(nn.Module):
        @nn.compact
        def __call__(self, z):
            h = nn.Conv(512, (3, 3), padding=1, dtype=jnp.bfloat16,
                        name="conv_in")(z)
            h = ResnetBlock(dtype=jnp.bfloat16, name="b1")(h, None)
            h = AttnBlock(dtype=jnp.bfloat16, name="attn")(h)
            return ResnetBlock(dtype=jnp.bfloat16, name="b2")(h, None)

    class UpStage(nn.Module):
        out_ch: int
        up: bool = True

        @nn.compact
        def __call__(self, h):
            for i in range(3):
                h = ResnetBlock(out_channels=self.out_ch, dtype=jnp.bfloat16,
                                name=f"b{i}")(h, None)
            if self.up:
                h = Upsample(dtype=jnp.bfloat16, name="up")(h)
            return h

    class OutStage(nn.Module):
        @nn.compact
        def __call__(self, h):
            for i in range(3):
                h = ResnetBlock(out_channels=128, dtype=jnp.bfloat16,
                                name=f"b{i}")(h, None)
            h = GroupNorm32(32, epsilon=1e-6, name="norm_out")(h)
            h = nn.silu(h)
            return nn.Conv(3, (3, 3), padding=1, dtype=jnp.bfloat16,
                           name="conv_out")(h)

    stages = [
        ("dec_mid_64", MidStage(), rnd(4, 64, 64, 4)),
        ("dec_level3_64to128", UpStage(512), rnd(4, 64, 64, 512)),
        ("dec_level2_128to256", UpStage(512), rnd(4, 128, 128, 512)),
        ("dec_level1_256to512", UpStage(256), rnd(4, 256, 256, 512)),
        ("dec_level0_512", OutStage(), rnd(4, 512, 512, 256)),
    ]
    for name, mod, xin in stages:
        p = bf16(np_params_like(mod, xin))
        measure(name,
                lambda c, mod=mod: (chain_into(c[0], mod.apply(c[1], c[0])),
                                    c[1]),
                (xin, p), iters=8)

    # ---- microbenches at 512^2 ---------------------------------------------
    x512 = rnd(4, 512, 512, 128)
    wc = rnd(3, 3, 128, 128)
    bc = rnd(128)
    measure("conv3x3_128_512sq",
            lambda c: (jax.lax.conv_general_dilated(
                c[0], c[1], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16),
                c[1]),
            (x512, wc))
    gn = GroupNorm32(32, epsilon=1e-6)
    pgn = np_params_like(gn, x512)
    measure("groupnorm_128_512sq",
            lambda c: (gn.apply(c[1], c[0]), c[1]), (x512, pgn))

    # ---- upsample+conv variants at the 256->512 shape ----------------------
    x256 = rnd(4, 256, 256, 256)
    wu = rnd(3, 3, 256, 256)
    bu = rnd(256)
    for name, fn in (("upconv_naive_256to512", naive_up_conv),
                     ("upconv_subpixel_256to512", subpixel_up_conv),
                     ("upconv_embedded_256to512", embedded_up_conv)):
        measure(name,
                lambda c, fn=fn: (chain_into(c[0], fn(c[0], c[1], c[2])),
                                  c[1], c[2]),
                (x256, wu, bu), iters=8)
    measure("nearest_up_alone_256to512",
            lambda c: (chain_into(c[0], nearest_upsample_2x(c[0])), c[1]),
            (x256, wu), iters=8)

    # same at the 128->256 / 512ch shape (levels 3/2)
    x128 = rnd(4, 128, 128, 512)
    wu2, bu2 = rnd(3, 3, 512, 512), rnd(512)
    for name, fn in (("upconv_naive_128to256", naive_up_conv),
                     ("upconv_subpixel_128to256", subpixel_up_conv)):
        measure(name,
                lambda c, fn=fn: (chain_into(c[0], fn(c[0], c[1], c[2])),
                                  c[1], c[2]),
                (x128, wu2, bu2), iters=8)

    print(f"--- all done at {time.time()-t_start:.0f}s ---", flush=True)


if __name__ == "__main__":
    main()
