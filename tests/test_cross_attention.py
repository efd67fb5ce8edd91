"""Fused small-KV cross-attention kernel: equivalence vs the XLA reference
and vs the CrossAttention module math (interpret mode on CPU — the same
kernel Mosaic compiles on TPU). Reference op being replaced:
openai_model/attention.py:24-117 (context path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.kernels.cross_attention import (crossattn_kv, crossattn_kv_xla,
                                            crossattn_kv_trainable,
                                            crossattn_kv_wants_pallas)


def _mk(B, N, M, heads, d, C, seed=0, dtype=jnp.float32):
    r = np.random.default_rng(seed)
    HD = heads * d
    f = lambda *s: jnp.asarray(r.normal(0, 0.5, s).astype(np.float32), dtype)
    return (f(B, N, C), f(C, HD), f(B, M, HD), f(B, M, HD), f(HD, C),
            f(C))


@pytest.mark.parametrize(
    "B,N,M,heads,d,C",
    [(2, 256, 77, 8, 40, 320),    # SD level 0 (d=40, M=77 → padded 80)
     (1, 512, 77, 8, 80, 640),
     (2, 256, 16, 4, 32, 128),    # M already 8-aligned
     (1, 384, 77, 8, 160, 1280)])
def test_crossattn_kernel_matches_xla(B, N, M, heads, d, C):
    x, wq, k, v, wo, bo = _mk(B, N, M, heads, d, C)
    ref = crossattn_kv_xla(x, wq, k, v, wo, bo, heads)
    got = crossattn_kv(x, wq, k, v, wo, bo, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_crossattn_matches_module_math():
    """The XLA reference (and hence the kernel) must reproduce the
    CrossAttention module's fallback cross-attention branch exactly."""
    from sd_tpu.nn.attention import CrossAttention

    B, N, M, heads, d, C = 2, 64, 12, 4, 16, 64
    r = np.random.default_rng(3)
    x = jnp.asarray(r.normal(0, 0.5, (B, N, C)).astype(np.float32))
    ctx = jnp.asarray(r.normal(0, 0.5, (B, M, C)).astype(np.float32))
    mod = CrossAttention(heads=heads, dim_head=d)
    params = mod.init(jax.random.PRNGKey(0), x, ctx)
    p = params["params"]
    ref = mod.apply(params, x, ctx)
    k = ctx @ p["to_k"]["kernel"]
    v = ctx @ p["to_v"]["kernel"]
    got = crossattn_kv_xla(x, p["to_q"]["kernel"], k, v,
                           p["to_out"]["kernel"], p["to_out"]["bias"], heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_crossattn_trainable_grad_matches_xla():
    B, N, M, heads, d, C = 1, 64, 11, 2, 16, 32
    x, wq, k, v, wo, bo = _mk(B, N, M, heads, d, C, seed=5)

    def loss_kernel(x, wq, k, v, wo, bo):
        return jnp.sum(crossattn_kv_trainable(
            x, wq, k, v, wo, bo, heads, None, True) ** 2)

    def loss_ref(x, wq, k, v, wo, bo):
        return jnp.sum(crossattn_kv_xla(x, wq, k, v, wo, bo, heads) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5))(x, wq, k, v, wo, bo)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(x, wq, k, v, wo, bo)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_gate_is_off_on_cpu():
    assert crossattn_kv_wants_pallas(4096, 77, 8, 40, 320,
                                     jnp.bfloat16) is False
