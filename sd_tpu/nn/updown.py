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


class Upsample(nn.Module):
    """2× nearest upsample, optionally followed by a 3×3 conv."""

    out_channels: int | None = None
    with_conv: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nearest_upsample_2x(x)
        if self.with_conv:
            ch = self.out_channels or x.shape[-1]
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        return x


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
