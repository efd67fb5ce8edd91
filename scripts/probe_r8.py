#!/usr/bin/env python
"""Round-2 probe #8: (1) can the 0.55 ms/block of attention projection+layout
glue at L0 be cut by emitting the projections directly in [B,H,S,D] (einsum
with a 3-D weight) so the flash front-end skips its transposes? (2) is the
flash kernel viable at d=512 for the codec mid-block single-head attention
(XLA materializes a [B,1,4096,4096] fp32 logits tensor there)? (3) one
batched B8 CLIP call vs two B4 calls.

Appends JSON lines to PROBE_R8.jsonl.
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("PROBE_R8.jsonl", "a", buffering=1)
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
    rnd = lambda *s: jnp.asarray(key.normal(0, 0.02, s).astype(np.float32),
                                 jnp.bfloat16)
    t0 = time.time()

    _FLOOR_MS = measure("floor", lambda c: c * 1.000001 + 1e-6, rnd(8, 128))

    from sd_tpu.kernels.flash_attention import flash_attention

    B, S, h, d = 8, 4096, 8, 40
    C = h * d
    x = rnd(B, S, C)
    wq, wk, wv, wo = rnd(C, C), rnd(C, C), rnd(C, C), rnd(C, C)

    # (a) current layout: Dense → reshape [B,S,h,d] → kernel (transposes
    # inside the front-end) → reshape back → Dense
    def attn_current(c):
        q = (c @ wq).reshape(B, S, h, d)
        k = (c @ wk).reshape(B, S, h, d)
        v = (c @ wv).reshape(B, S, h, d)
        o = flash_attention(q, k, v)
        o = o.reshape(B, S, C) @ wo
        return chain_into(c, o)

    measure("selfattn_L0_dense_reshape", attn_current, x)

    # (b) einsum projections straight to [B,h,S,d]; kernel core consumes
    # [B*h, S, d] without the front-end transpose; out proj contracts (h,d)
    wq3 = wq.reshape(C, h, d)
    wk3 = wk.reshape(C, h, d)
    wv3 = wv.reshape(C, h, d)
    wo3 = wo.reshape(h, d, C)

    from sd_tpu.kernels.flash_attention import _flash_attention_core

    def attn_bhsd(c):
        q = jnp.einsum("bsc,chd->bhsd", c, wq3)
        k = jnp.einsum("bsc,chd->bhsd", c, wk3)
        v = jnp.einsum("bsc,chd->bhsd", c, wv3)
        # feed the kernel with H folded into batch — the front-end's
        # transpose(0,2,1,3) on [B*h, S, 1, d] is then a pure reshape
        o = flash_attention(
            q.reshape(B * h, S, 1, d), k.reshape(B * h, S, 1, d),
            v.reshape(B * h, S, 1, d))
        o = o.reshape(B, h, S, d)
        out = jnp.einsum("bhsd,hdc->bsc", o, wo3)
        return chain_into(c, out)

    measure("selfattn_L0_einsum_bhsd", attn_bhsd, x)

    # parity of the two expressions
    try:
        a = jax.jit(lambda c: (c @ wq).reshape(B, S, h, d))(x)
        b = jax.jit(lambda c: jnp.einsum("bsc,chd->bhsd", c, wq3))(x)
        b = b.transpose(0, 2, 1, 3)
        dmax = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                     b.astype(jnp.float32))))
        report("proj_layout_maxdiff", dmax)
    except Exception as e:
        report("proj_layout_maxdiff", -1.0, error=str(e)[:200])

    # (2) codec mid-block single-head attention at d=512, S=4096
    Bm, Sm, dm = 4, 4096, 512
    q = rnd(Bm, Sm, 1, dm)
    k = rnd(Bm, Sm, 1, dm)
    v = rnd(Bm, Sm, 1, dm)

    def xla_attn(c):
        from sd_tpu.kernels.attention import _xla_attention
        return (chain_into(c[0], _xla_attention(c[0], c[1], c[2],
                                                dm ** -0.5)),) + c[1:]

    measure("midattn_d512_xla", xla_attn, (q, k, v), iters=8)

    for bq, bk in ((1024, 512), (512, 512)):
        def pl_attn(c, bq=bq, bk=bk):
            o = flash_attention(c[0], c[1], c[2], block_q=bq, block_k=bk)
            return (chain_into(c[0], o),) + c[1:]

        measure(f"midattn_d512_flash_q{bq}k{bk}", pl_attn, (q, k, v), iters=8)

    try:
        from sd_tpu.kernels.attention import _xla_attention
        want = jax.jit(lambda q, k, v: _xla_attention(q, k, v, dm ** -0.5))(q, k, v)
        got = jax.jit(lambda q, k, v: flash_attention(q, k, v, block_q=512,
                                                      block_k=512))(q, k, v)
        dmax = float(jnp.max(jnp.abs(want.astype(jnp.float32) -
                                     got.astype(jnp.float32))))
        report("midattn_d512_maxdiff", dmax,
               scale=float(jnp.max(jnp.abs(want.astype(jnp.float32)))))
    except Exception as e:
        report("midattn_d512_maxdiff", -1.0, error=str(e)[:300])

    # (3) CLIP: one B8 call vs two B4 calls
    from sd_tpu.models.clip_text import ClipTextConfig, ClipTextTransformer, SimpleHashTokenizer

    cfg = ClipTextConfig()
    clip = ClipTextTransformer(cfg, dtype=jnp.bfloat16)
    tok = SimpleHashTokenizer(cfg.max_length, cfg.vocab_size)
    ids8 = jnp.asarray(tok(["a photograph of an astronaut"] * 8))
    rng = jax.random.PRNGKey(0)
    cp = clip.init(rng, ids8[:1])["params"]
    cp = jax.device_put(jax.tree.map(lambda a: a.astype(jnp.bfloat16), cp))

    @jax.jit
    def clip_b8(cp, i):
        return clip.apply({"params": cp}, i)

    try:
        t1 = time.perf_counter()
        float(jnp.sum(clip_b8(cp, ids8).astype(jnp.float32)))
        compile_s = time.perf_counter() - t1
        times = []
        for _ in range(REPS):
            t1 = time.perf_counter()
            float(jnp.sum(clip_b8(cp, ids8).astype(jnp.float32)))
            times.append(time.perf_counter() - t1)
        report("clip_b8_single_call", float(np.median(times)) * 1e3,
               compile_s=round(compile_s, 1))
    except Exception as e:
        report("clip_b8_single_call", -1.0, error=str(e)[:300])

    print(f"--- all done at {time.time()-t0:.0f}s ---", flush=True)


if __name__ == "__main__":
    main()
