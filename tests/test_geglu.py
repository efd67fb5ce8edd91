"""Fused GEGLU kernel: interpret-mode parity vs the XLA reference, gradient
parity of the custom VJP, and module-level equivalence of FeedForwardGEGLU's
fused vs unfused paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.kernels.geglu import _geglu_xla, geglu_ff, geglu_ff_trainable


def _make(rng, N, C, mult=4, dtype=jnp.float32):
    ks = jax.random.split(rng, 5)
    inner = C * mult
    x = jax.random.normal(ks[0], (N, C), dtype)
    w1 = jax.random.normal(ks[1], (C, 2 * inner), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (2 * inner,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (inner, C), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (C,), jnp.float32) * 0.1
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("N,C", [(512, 64), (384, 128), (1024, 320)])
def test_geglu_kernel_matches_xla(N, C):
    x, w1, b1, w2, b2 = _make(jax.random.PRNGKey(0), N, C)
    got = geglu_ff(x, w1, b1, w2, b2, token_tile=256, interpret=True)
    want = _geglu_xla(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_geglu_kernel_bf16_matches_xla():
    x, w1, b1, w2, b2 = _make(jax.random.PRNGKey(1), 512, 128,
                              dtype=jnp.bfloat16)
    got = geglu_ff(x, w1, b1, w2, b2, token_tile=256, interpret=True)
    want = _geglu_xla(x, w1.astype(jnp.bfloat16), b1,
                      w2.astype(jnp.bfloat16), b2)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_geglu_batched_shape():
    x, w1, b1, w2, b2 = _make(jax.random.PRNGKey(2), 256, 64)
    xb = x.reshape(4, 64, 64)
    got = geglu_ff(xb, w1, b1, w2, b2, token_tile=128, interpret=True)
    assert got.shape == xb.shape
    want = geglu_ff(x, w1, b1, w2, b2, token_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got).reshape(256, 64),
                               np.asarray(want), rtol=1e-6, atol=1e-6)


def test_geglu_grad_matches_xla():
    x, w1, b1, w2, b2 = _make(jax.random.PRNGKey(3), 256, 64)

    def loss_pl(args):
        return jnp.sum(geglu_ff_trainable(*args, True) ** 2)

    def loss_xla(args):
        return jnp.sum(_geglu_xla(*args) ** 2)

    gp = jax.grad(loss_pl)((x, w1, b1, w2, b2))
    gx = jax.grad(loss_xla)((x, w1, b1, w2, b2))
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_feedforward_module_param_tree_unchanged():
    """The fused FeedForwardGEGLU must keep the Dense-compatible param tree
    (checkpoints + SD weight import depend on it)."""
    from sd_tpu.nn.attention import FeedForwardGEGLU

    ff = FeedForwardGEGLU(dtype=jnp.float32)
    x = jnp.ones((2, 8, 32))
    params = ff.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params) == {"proj_in", "proj_out"}
    assert params["proj_in"]["kernel"].shape == (32, 2 * 4 * 32)
    assert params["proj_in"]["bias"].shape == (2 * 4 * 32,)
    assert params["proj_out"]["kernel"].shape == (4 * 32, 32)
    assert params["proj_out"]["bias"].shape == (32,)


def test_feedforward_dropout_path_matches_deterministic_at_p0():
    """With dropout=0 the training path and the fused/XLA path agree."""
    from sd_tpu.nn.attention import FeedForwardGEGLU

    ff = FeedForwardGEGLU(dropout=0.5, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    params = ff.init(jax.random.PRNGKey(0), x)
    det = ff.apply(params, x, deterministic=True)
    # deterministic=False exercises the unfused-with-dropout branch
    nondet = ff.apply(params, x, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert det.shape == nondet.shape == x.shape
    ff0 = FeedForwardGEGLU(dropout=0.0, dtype=jnp.float32)
    out0 = ff0.apply(params, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(out0), np.asarray(det),
                               rtol=1e-6, atol=1e-6)
