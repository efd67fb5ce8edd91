"""Pallas fused 3×3 SAME conv: equivalence vs lax.conv (interpret mode on
CPU — the same kernel Mosaic compiles on TPU). Reference op being
accelerated: the Conv2d(3,3,pad=1) stacks of the codec
(ldm/modules/diffusionmodules/model.py:370-574)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.kernels.conv2d import conv3x3_same, conv3x3_wants_pallas


@pytest.mark.parametrize(
    "shape",
    [(2, 16, 128, 128, 128),   # decoder level0-ish (downscaled)
     (1, 8, 256, 128, 256),    # channel-expanding
     (1, 24, 128, 256, 128)],  # channel-contracting, th not dividing evenly
)
def test_conv3x3_same_matches_xla(shape):
    B, H, W, C, O = shape
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(B, H, W, C)).astype(np.float32))
    w = jnp.asarray(r.normal(0, 0.05, size=(3, 3, C, O)).astype(np.float32))
    b = jnp.asarray(r.normal(size=(O,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = conv3x3_same(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_no_bias_and_row_tile():
    r = np.random.default_rng(1)
    x = jnp.asarray(r.normal(size=(1, 12, 128, 128)).astype(np.float32))
    w = jnp.asarray(r.normal(0, 0.05, size=(3, 3, 128, 128)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3_same(x, w, None, row_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_heuristic_gate():
    # off-TPU the dispatcher never selects the kernel
    assert conv3x3_wants_pallas((4, 512, 512), 128, 128) is False


class TestGnSiluConv:
    """Fused GroupNorm→SiLU→conv3x3 (interpret mode) vs the XLA reference."""

    def _mk(self, key, B, H, W, C, O, dtype=jnp.float32):
        ks = jax.random.split(key, 5)
        x = jax.random.normal(ks[0], (B, H, W, C), dtype)
        s = 1.0 + 0.1 * jax.random.normal(ks[1], (C,), jnp.float32)
        b = 0.1 * jax.random.normal(ks[2], (C,), jnp.float32)
        w = jax.random.normal(ks[3], (3, 3, C, O), jnp.float32) * 0.05
        cb = jax.random.normal(ks[4], (O,), jnp.float32) * 0.1
        return x, s, b, w, cb

    @pytest.mark.parametrize("B,H,W,C,O,tile", [
        (2, 16, 16, 32, 32, None),     # single row-tile per batch
        (1, 32, 24, 32, 64, 8),        # multi-tile: exercises halo masking
    ])
    def test_matches_xla_reference(self, B, H, W, C, O, tile):
        from sd_tpu.kernels.conv2d import _gn_silu_conv_xla, gn_silu_conv3x3

        x, s, b, w, cb = self._mk(jax.random.PRNGKey(0), B, H, W, C, O)
        got = gn_silu_conv3x3(x, s, b, w, cb, groups=8, eps=1e-6,
                              row_tile=tile, interpret=True)
        want = _gn_silu_conv_xla(x, s, b, w, cb, 8, 1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_matches_unfused_module_semantics(self):
        """Against GroupNorm32+silu+conv (the module fallback) — silu runs in
        fp32 in the fused kernel vs module dtype in the fallback, so compare
        at fp32 where they must agree tightly."""
        from sd_tpu.kernels.conv2d import gn_silu_conv3x3
        from sd_tpu.nn.layers import GroupNorm32

        x, s, b, w, cb = self._mk(jax.random.PRNGKey(1), 2, 16, 16, 32, 32)
        gn = GroupNorm32(8, epsilon=1e-6)
        params = {"params": {"GroupNorm_0": {"scale": s, "bias": b}}}
        h = gn.apply(params, x)
        h = jax.nn.silu(h)
        want = jax.lax.conv_general_dilated(
            h, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + cb
        got = gn_silu_conv3x3(x, s, b, w, cb, groups=8, eps=1e-6,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_grad_matches_xla(self):
        from sd_tpu.kernels.conv2d import (_gn_silu_conv_xla,
                                           gn_silu_conv3x3_trainable)

        x, s, b, w, cb = self._mk(jax.random.PRNGKey(2), 1, 16, 16, 32, 32)

        def loss_pl(args):
            return jnp.sum(
                gn_silu_conv3x3_trainable(*args, 8, 1e-6, True) ** 2)

        def loss_ref(args):
            return jnp.sum(_gn_silu_conv_xla(*args, 8, 1e-6) ** 2)

        gp = jax.grad(loss_pl)((x, s, b, w, cb))
        gx = jax.grad(loss_ref)((x, s, b, w, cb))
        for a_, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       atol=5e-4, rtol=5e-4)


def test_training_trace_disables_pallas_dispatch(monkeypatch):
    """Inside a training_trace() the conv dispatch must refuse Pallas even
    for shapes/dtypes that qualify at inference (PROBE_R14/R15 economics)."""
    from sd_tpu.kernels import conv2d

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    shape = (4, 512, 512, 128)
    assert conv2d.conv3x3_wants_pallas(shape, 128, 128, jnp.bfloat16)
    with conv2d.training_trace():
        assert not conv2d.conv3x3_wants_pallas(shape, 128, 128, jnp.bfloat16)
        with conv2d.training_trace():  # re-entrant
            assert not conv2d.conv3x3_wants_pallas(shape, 128, 128,
                                                   jnp.bfloat16)
        assert not conv2d.conv3x3_wants_pallas(shape, 128, 128, jnp.bfloat16)
    assert conv2d.conv3x3_wants_pallas(shape, 128, 128, jnp.bfloat16)
    # fp32 never dispatches (kernel geometry is 2-byte-tuned)
    assert not conv2d.conv3x3_wants_pallas(shape, 128, 128, jnp.float32)
