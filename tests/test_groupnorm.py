"""Pallas fused GroupNorm: equivalence vs flax nn.GroupNorm (interpret mode
on CPU — the same kernel Mosaic compiles on TPU). Reference op being
accelerated: GroupNorm32/normalization (openai_model/utils.py:15-22)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.kernels.groupnorm import (group_norm, group_norm_wants_pallas,
                                      group_norm_xla)
from sd_tpu.nn.layers import GroupNorm32


def _flax_ref(x, scale, bias, groups, eps):
    mod = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32,
                       param_dtype=jnp.float32)
    params = {"params": {"scale": scale, "bias": bias}}
    return mod.apply(params, x.astype(jnp.float32)).astype(x.dtype)


@pytest.mark.parametrize(
    "shape,groups",
    [((2, 4096, 320), 32),    # SD UNet level 0 (cg=10, unaligned lanes)
     ((3, 1024, 640), 32),
     ((2, 64, 1280), 32),
     ((1, 256, 128), 32),
     ((2, 96, 256), 16)])     # chunk not a power of two
def test_group_norm_matches_flax(shape, groups):
    r = np.random.default_rng(0)
    x = jnp.asarray(3 * r.normal(size=shape).astype(np.float32) + 0.5)
    C = shape[-1]
    scale = jnp.asarray(1 + 0.2 * r.normal(size=(C,)).astype(np.float32))
    bias = jnp.asarray(0.3 * r.normal(size=(C,)).astype(np.float32))
    ref = _flax_ref(x, scale, bias, groups, 1e-5)
    got = group_norm(x, scale, bias, groups=groups, eps=1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_group_norm_silu_epilogue():
    r = np.random.default_rng(1)
    x = jnp.asarray(r.normal(size=(2, 256, 128)).astype(np.float32))
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    ref = _flax_ref(x, scale, bias, 32, 1e-6)
    ref = ref * jax.nn.sigmoid(ref)
    got = group_norm(x, scale, bias, groups=32, eps=1e-6, act="silu",
                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_group_norm_xla_reference_matches_flax():
    r = np.random.default_rng(2)
    x = jnp.asarray(r.normal(size=(2, 512, 320)).astype(np.float32))
    scale = jnp.asarray(1 + 0.1 * r.normal(size=(320,)).astype(np.float32))
    bias = jnp.asarray(0.1 * r.normal(size=(320,)).astype(np.float32))
    ref = _flax_ref(x, scale, bias, 32, 1e-5)
    got = group_norm_xla(x, scale, bias, groups=32, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_groupnorm32_param_path_unchanged():
    """The refactored GroupNorm32 must keep the GroupNorm_0/{scale,bias}
    param path (checkpoints + torch importers depend on it) and match the
    flax module it replaced."""
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 8, 8, 64)).astype(np.float32))
    mod = GroupNorm32(32, epsilon=1e-6)
    params = mod.init(jax.random.PRNGKey(0), x)
    inner = params["params"]["GroupNorm_0"]
    assert set(inner.keys()) == {"scale", "bias"}
    assert inner["scale"].shape == (64,)
    y = mod.apply(params, x)
    ref = _flax_ref(x, inner["scale"], inner["bias"], 32, 1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_gate_is_off_on_cpu():
    assert group_norm_wants_pallas((8, 64, 64, 320), 32, jnp.bfloat16) is False
