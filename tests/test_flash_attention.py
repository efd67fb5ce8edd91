"""Pallas flash attention vs XLA einsum-softmax oracle (interpret mode on CPU).

The kernel is the TPU-native equivalent of the reference's flash_attn CUDA
dependency (reference: openai_model/attention.py:99-117)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.kernels.attention import _xla_attention
from sd_tpu.kernels.flash_attention import flash_attention


def rand_qkv(key, b, sq, skv, h, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), dtype)
    k = jax.random.normal(kk, (b, skv, h, d), dtype)
    v = jax.random.normal(kv, (b, skv, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "b,sq,skv,h,d",
    [
        (1, 128, 128, 2, 64),     # aligned self-attn
        (2, 256, 256, 4, 40),     # SD head_dim 40 (needs depth padding)
        (1, 1024, 1024, 2, 80),   # SD mid-res self-attn
        (2, 256, 77, 4, 64),      # cross-attn with CLIP 77-token KV (ragged)
        (1, 100, 130, 2, 32),     # both seqs ragged
    ],
)
def test_flash_matches_xla(rng, b, sq, skv, h, d):
    q, k, v = rand_qkv(rng, b, sq, skv, h, d)
    ref = _xla_attention(q, k, v, d**-0.5)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_grad_matches_xla(rng):
    q, k, v = rand_qkv(rng, 1, 128, 128, 2, 64)

    def loss_flash(q, k, v):
        return flash_attention(q, k, v, interpret=True).sum()

    def loss_ref(q, k, v):
        return _xla_attention(q, k, v, 64**-0.5).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_flash_bf16(rng):
    q, k, v = rand_qkv(rng, 1, 256, 256, 2, 64, dtype=jnp.bfloat16)
    ref = _xla_attention(q, k, v, 64**-0.5)
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32), atol=3e-2
    )


def test_flash_backward_matches_xla(rng):
    """Chunked-recompute backward == dense XLA attention gradients."""
    import numpy as np
    from sd_tpu.kernels.flash_attention import _xla_ref, flash_attention

    k1, k2, k3, k4 = jax.random.split(rng, 4)
    q = jax.random.normal(k1, (2, 256, 2, 16))
    k = jax.random.normal(k2, (2, 256, 2, 16))
    v = jax.random.normal(k3, (2, 256, 2, 16))
    g = jax.random.normal(k4, (2, 256, 2, 16))
    scale = 16 ** -0.5

    # interpret=True runs the pallas fwd on CPU; VJP path is pure JAX
    _, vjp = jax.vjp(
        lambda q, k, v: flash_attention(q, k, v, scale=scale, block_q=64,
                                        interpret=True), q, k, v)
    dq, dk, dv = vjp(g)
    _, vjp_ref = jax.vjp(lambda q, k, v: _xla_ref(q, k, v, scale), q, k, v)
    dq_r, dk_r, dv_r = vjp_ref(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r), atol=2e-4, rtol=1e-3)


def test_flash_backward_odd_length_fallback(rng):
    """Non-divisible seq lengths take the dense fallback and still match."""
    import numpy as np
    from sd_tpu.kernels.flash_attention import _xla_ref, flash_attention

    q = jax.random.normal(rng, (1, 77, 2, 16))
    g = jnp.ones((1, 77, 2, 16))
    scale = 16 ** -0.5
    _, vjp = jax.vjp(
        lambda q: flash_attention(q, q, q, scale=scale, block_q=64,
                                  interpret=True), q)
    (dq,) = vjp(g)
    _, vjp_ref = jax.vjp(lambda q: _xla_ref(q, q, q, scale), q)
    (dq_r,) = vjp_ref(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r), atol=2e-4,
                               rtol=1e-3)
