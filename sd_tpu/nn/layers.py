"""Shared low-level blocks: fp32-accumulated GroupNorm, timestep embeddings,
zero-init convs.

Capability parity with the reference's GroupNorm32 / timestep_embedding /
zero_module utilities (reference: DDIM/diffusion_modules.py:151-248,
openai_model/utils.py:7-244, Unet/unet.py:9-40), designed for NHWC layout and
a bf16 compute policy: norms always accumulate in fp32 and cast back — the
reference's numerics contract (SURVEY.md §5.9).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class GroupNorm32(nn.Module):
    """GroupNorm over the channel (last) axis, computed in fp32.

    Matches torch GroupNorm semantics: `num_groups` groups, per-channel affine.
    The codec stack uses eps=1e-6 (reference: Unet/unet.py:9-12), the SD UNet
    eps=1e-5 (torch default via openai_model/utils.py:15-22).
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        # When C is divisible by num_groups, use EXACTLY num_groups — torch
        # semantics, including the C == num_groups case where each group is a
        # single channel (per-channel instance norm). That case is real: a
        # ch=32 codec's last up level and norm_out hit it, and clamping there
        # diverged 0.2 from the reference decoder (round-3 pipeline-parity
        # bisection). Only for C NOT divisible (tiny test configs torch's
        # GroupNorm would reject outright) fall back to the largest divisor
        # of C that keeps >=2 channels per group.
        channels = x.shape[-1]
        if channels % self.num_groups == 0:
            groups = self.num_groups
        else:
            groups = min(self.num_groups, max(channels // 2, 1))
            while channels % groups != 0:
                groups -= 1

        # The inner module carries the params under the same path flax's
        # nn.GroupNorm child used ("GroupNorm_0/{scale,bias}") so checkpoints
        # and the torch importers are unchanged. The Pallas GN kernel
        # (kernels/groupnorm.py) is OPT-IN only (SD_TPU_PALLAS_GN=1): the
        # in-model A/B measured it a 1.6 ms/step regression — the XLA GN
        # fusion's apparent 1.26 ms (PROBE_R19) is layout glue for the
        # neighboring convs, not reduction cost (PROBE_R20).
        del orig_dtype
        return _GroupNormCore(
            num_groups=groups, epsilon=self.epsilon, name="GroupNorm_0"
        )(x)


class _GroupNormCore(nn.Module):
    """GroupNorm core with flax param naming and a Pallas fast path.

    The XLA fallback reproduces nn.GroupNorm(dtype=f32, param_dtype=f32)
    math exactly (fp32 fast-variance stats over the [spatial, C/g] group
    reshape). (A per-channel-first stats rewrite of the fallback was probed
    and REVERTED: 2.03 ms vs flax's 1.76 ms at [4,512,512,128] on v5e,
    PROBE_R6 `gn32_dec512_128_chfirst`.)
    """

    num_groups: int
    epsilon: float

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from sd_tpu.kernels.groupnorm import (group_norm_trainable,
                                              group_norm_wants_pallas)

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        if group_norm_wants_pallas(x.shape, self.num_groups, x.dtype):
            B = x.shape[0]
            y = group_norm_trainable(
                x.reshape(B, -1, C), scale, bias, self.num_groups,
                float(self.epsilon))
            return y.reshape(x.shape)

        orig_dtype = x.dtype
        g = self.num_groups
        cg = C // g
        x32 = x.astype(jnp.float32)
        xr = x32.reshape(x.shape[:-1] + (g, cg))
        red = tuple(range(1, xr.ndim - 2)) + (xr.ndim - 1,)
        mu = jnp.mean(xr, axis=red, keepdims=True)
        var = jnp.mean(jnp.square(xr), axis=red, keepdims=True) - mu * mu
        y = (xr - mu) * jax.lax.rsqrt(var + self.epsilon)
        y = y.reshape(x.shape) * scale + bias
        return y.astype(orig_dtype)


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
) -> jax.Array:
    """Sinusoidal timestep embeddings [N, dim], computed in fp32.

    `flip_sin_to_cos=True` gives the guided-diffusion layout cat([cos, sin])
    (reference: DDIM/diffusion_modules.py:151-171); False gives cat([sin, cos])
    (reference: Unet/unet.py get_timestep_embedding).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    if flip_sin_to_cos:
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    else:
        emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def zeros_init_conv(
    features: int,
    kernel_size: tuple[int, ...] = (3, 3),
    padding: str | int = 1,
    dtype=None,
    name: str | None = None,
) -> nn.Conv:
    """Conv whose kernel AND bias start at zero (the reference's zero_module
    pattern for output projections, DDIM/diffusion_modules.py:174-179)."""
    pad = padding if isinstance(padding, str) else [(padding, padding)] * len(kernel_size)
    return nn.Conv(
        features,
        kernel_size,
        padding=pad,
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


def apply_conv3x3(x: jax.Array, k: jax.Array, b: jax.Array,
                  dtype=None) -> jax.Array:
    """Functional 3×3 SAME conv with the Pallas-vs-XLA backend dispatch and
    nn.Conv dtype semantics (shared by Conv3x3 and the Upsample conv):
    dtype=None promotes with the fp32 params, exactly like nn.Conv."""
    from sd_tpu.kernels.conv2d import (conv3x3_same_trainable,
                                       conv3x3_wants_pallas)

    C = x.shape[-1]
    O = k.shape[-1]
    cdt = dtype or jnp.result_type(x.dtype, k.dtype)
    if conv3x3_wants_pallas(x.shape, C, O, cdt):
        return conv3x3_same_trainable(x.astype(cdt), k.astype(cdt),
                                      b.astype(cdt))
    y = jax.lax.conv_general_dilated(
        x.astype(cdt), k.astype(cdt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(cdt)


class Conv3x3(nn.Module):
    """Drop-in for nn.Conv(features, (3,3), padding=1) that dispatches
    big-spatial stride-1 SAME convs to the Pallas fused conv on TPU
    (kernels/conv2d.py — XLA's im2col materialization runs the 512² codec
    levels at 26% MFU, BASELINE.md). Same param tree ({kernel, bias}) and
    nn.Conv dtype semantics, so checkpoints/importers are unchanged."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return apply_conv3x3(x, k, b, self.dtype)


def mean_flat(x: jax.Array) -> jax.Array:
    """Mean over all non-batch dims (reference: DDIM/diffusion_modules.py:190-196)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def torch_conv_init(scale: float = 1.0) -> tuple[Callable, Callable]:
    """(kernel_init, bias_init) reproducing torch's default Conv/Linear init
    (kaiming-uniform a=sqrt(5) → U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
    kernel and bias). Keeps init-variance parity with the reference stack."""

    def kernel_init(key, shape, dtype=jnp.float32):
        # HWIO layout: fan_in = prod(spatial) * in_features
        fan_in = 1
        for s in shape[:-1]:
            fan_in *= s
        bound = scale / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    def bias_init_factory(fan_in):
        def bias_init(key, shape, dtype=jnp.float32):
            bound = scale / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return bias_init

    return kernel_init, bias_init_factory
