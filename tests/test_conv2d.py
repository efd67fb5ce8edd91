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
