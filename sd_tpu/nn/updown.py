"""Spatial up/down-sampling blocks (NHWC).

Capability parity with the reference's Upsample/Downsample pairs
(reference: Unet/unet.py Upsample/Downsample — nearest×2 + conv, asymmetric-pad
stride-2 conv; openai_model/model.py:71-131 — symmetric pad, optional avg-pool).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2× upsample in NHWC via repeat (exact, fusion-friendly)."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def upsample_conv_2x(x: jax.Array, w: jax.Array, b: jax.Array | None,
                     dtype=None) -> jax.Array:
    """nearest-2× upsample followed by SAME 3×3 conv, computed as four 2×2
    phase convolutions at LOW resolution + pixel interleave.

    Weight-exact transform: output pixel (2i+a, 2j+b) of conv3x3(nearest_up(x))
    reads a 3×3 window of the upsampled grid whose rows/cols collapse onto a
    2×2 window of low-res pixels; the 3×3 taps that land on the same low-res
    pixel are pre-summed. 2.25× fewer MACs and no 4×-materialized upsampled
    intermediate — measured 15.4→11.3 ms (256→512, 256ch) and 12.5→7.2 ms
    (128→256, 512ch) at B4 bf16 on v5e (PROBE_R2.jsonl).

    w: [3, 3, C, O] HWIO kernel of the *logical* 3×3 conv; b: [O] or None.
    """
    # dtype=None promotes with the fp32 params, exactly like nn.Conv
    cdt = dtype or jnp.result_type(x.dtype, w.dtype)
    # rows of the upsampled grid (2i+a-1, 2i+a, 2i+a+1) collapse to low-res
    # rows: a=0 → (i-1, i, i) ; a=1 → (i, i, i+1)
    r0 = jnp.stack([w[0], w[1] + w[2]])          # phase a=0: taps (i-1, i)
    r1 = jnp.stack([w[0] + w[1], w[2]])          # phase a=1: taps (i, i+1)
    phases = []
    for di, rk in ((0, r0), (1, r1)):
        for dj in (0, 1):
            if dj == 0:
                k2 = jnp.stack([rk[:, 0], rk[:, 1] + rk[:, 2]], axis=1)
            else:
                k2 = jnp.stack([rk[:, 0] + rk[:, 1], rk[:, 2]], axis=1)
            pad_r = (1, 0) if di == 0 else (0, 1)
            pad_c = (1, 0) if dj == 0 else (0, 1)
            # nn.Conv dtype semantics: operands cast to cdt, output in cdt.
            # (No preferred_element_type=fp32 here — it breaks the conv
            # TRANSPOSE rule under grad: fp32 cotangent × bf16 kernel. The
            # MXU still accumulates fp32 internally for bf16 inputs.)
            y = jax.lax.conv_general_dilated(
                x.astype(cdt), k2.astype(cdt), (1, 1), [pad_r, pad_c],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if b is not None:
                y = y + b.astype(cdt)
            phases.append(y)
    p = jnp.stack(phases, axis=3)                # [B, H, W, 4, O]
    B, H, W, _, O = p.shape
    p = p.reshape(B, H, W, 2, 2, O).transpose(0, 1, 3, 2, 4, 5)
    return p.reshape(B, 2 * H, 2 * W, O)


class Upsample(nn.Module):
    """2× nearest upsample, optionally followed by a 3×3 conv.

    The conv path runs as four 2×2 phase convs at low resolution
    (`upsample_conv_2x`, weight-exact) — the parameter tree keeps the
    logical [3,3,C,O] kernel so checkpoints/weight import are unchanged.
    """

    out_channels: int | None = None
    with_conv: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if not self.with_conv:
            return nearest_upsample_2x(x)
        ch = self.out_channels or x.shape[-1]
        w, b = _Conv3x3Params(ch, x.shape[-1], name="conv")()
        return upsample_conv_2x(x, w, b, dtype=self.dtype)


class _Conv3x3Params(nn.Module):
    """Parameter holder matching nn.Conv's tree ({kernel, bias}) and default
    initializers, so checkpoints and weight import see an ordinary conv."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class Downsample(nn.Module):
    """2× downsample: stride-2 conv (asymmetric (0,1) padding when
    `asymmetric_padding` — the codec convention) or 2×2 average pool."""

    out_channels: int | None = None
    with_conv: bool = True
    asymmetric_padding: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = self.out_channels or x.shape[-1]
        if self.with_conv:
            pad = [(0, 1), (0, 1)] if self.asymmetric_padding else [(1, 1), (1, 1)]
            return nn.Conv(
                ch, (3, 3), strides=(2, 2), padding=pad, dtype=self.dtype, name="conv"
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))
