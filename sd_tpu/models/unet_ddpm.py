"""Small pixel-space DDPM UNet (capability config #1).

Capability parity with the reference's tutorial UNet
(reference: DDPM/models/unet.py:11-81, DDPM/models/layers.py:6-339):
sinusoidal time embedding → MLP, initial conv to `base_channels`, a down path
with optional self-attention, attention bottleneck, and a skip-concat up path.

Redesigned rather than translated: NHWC, channel multipliers as a config
tuple, resolution-indexed attention, fp32 GroupNorm, and attention routed
through the shared flash-attention front-end.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sd_tpu.nn.attention import AttnBlock
from sd_tpu.nn.layers import GroupNorm32, timestep_embedding
from sd_tpu.nn.resnet import ResnetBlock
from sd_tpu.nn.updown import Downsample, Upsample


class UNetDDPM(nn.Module):
    """UNet epsilon-model for pixel-space DDPM.

    Default config mirrors the reference's 256×256 net
    (initial 128ch; down channels 128/128/256/256+attn/512; attn bottleneck)
    expressed as ch_mult=(1, 1, 2, 2, 4) with attention at the 4th level.
    """

    base_channels: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    attn_levels: Sequence[int] = (3,)
    num_res_blocks: int = 2
    out_channels: int = 3
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self, x: jax.Array, t: jax.Array, *, deterministic: bool = True
    ) -> jax.Array:
        base = self.base_channels
        temb_ch = base * 4

        # time embedding MLP (reference: DDPM/models/layers.py TransformerPositionalEmbedding + MLP)
        temb = timestep_embedding(t, base)
        temb = nn.Dense(temb_ch, dtype=self.dtype, name="time_mlp1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(temb_ch, dtype=self.dtype, name="time_mlp2")(temb)

        h = nn.Conv(base, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        skips = [h]

        # down path
        for level, mult in enumerate(self.ch_mult):
            ch = base * mult
            for i in range(self.num_res_blocks):
                h = ResnetBlock(
                    out_channels=ch, dropout=self.dropout, dtype=self.dtype,
                    name=f"down_{level}_res_{i}",
                )(h, temb, deterministic=deterministic)
                if level in self.attn_levels:
                    h = AttnBlock(dtype=self.dtype, name=f"down_{level}_attn_{i}")(h)
                skips.append(h)
            if level != len(self.ch_mult) - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{level}_downsample")(h)
                skips.append(h)

        # bottleneck with attention
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_res1")(
            h, temb, deterministic=deterministic
        )
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_res2")(
            h, temb, deterministic=deterministic
        )

        # up path with skip concat
        for level, mult in reversed(list(enumerate(self.ch_mult))):
            ch = base * mult
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock(
                    out_channels=ch, dropout=self.dropout, dtype=self.dtype,
                    name=f"up_{level}_res_{i}",
                )(h, temb, deterministic=deterministic)
                if level in self.attn_levels:
                    h = AttnBlock(dtype=self.dtype, name=f"up_{level}_attn_{i}")(h)
            if level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{level}_upsample")(h)

        h = GroupNorm32(32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_out",
        )(h)
        return h
