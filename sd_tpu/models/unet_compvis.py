"""CompVis codec-style diffusion UNet ("Model"): the third UNet family of the
reference, built from codec blocks with timestep conditioning.

Capability parity with the reference's time-conditioned Model
(reference: Unet/unet.py:9-319 — get_timestep_embedding with the
cat([sin, cos]) layout, temb MLP, per-level ResnetBlocks with temb injection,
attention at `attn_resolutions`, asymmetric-pad Downsample, skip-concat up
path with num_res_blocks+1 blocks). NHWC; attention via the shared
flash-attention front-end; fp32 GroupNorm.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sd_tpu.nn.attention import make_attn
from sd_tpu.nn.layers import GroupNorm32, timestep_embedding
from sd_tpu.nn.resnet import ResnetBlock
from sd_tpu.nn.updown import Downsample, Upsample


class UNetCompVis(nn.Module):
    """Time-conditioned codec UNet (reference: Unet/unet.py Model)."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 256
    use_timestep: bool = True
    attn_type: str = "vanilla"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array | None = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        num_levels = len(self.ch_mult)
        temb = None
        if self.use_timestep:
            assert t is not None
            # reference layout: cat([sin, cos]) (Unet/unet.py get_timestep_embedding)
            temb = timestep_embedding(t, self.ch, flip_sin_to_cos=False)
            temb = nn.Dense(self.ch * 4, dtype=self.dtype, name="temb_dense0")(temb)
            temb = nn.silu(temb)
            temb = nn.Dense(self.ch * 4, dtype=self.dtype, name="temb_dense1")(temb)

        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        hs = [h]
        curr_res = self.resolution
        for lvl, mult in enumerate(self.ch_mult):
            ch = self.ch * mult
            for i in range(self.num_res_blocks):
                h = ResnetBlock(
                    out_channels=ch, dropout=self.dropout,
                    temb_channels=self.ch * 4, dtype=self.dtype,
                    name=f"down_{lvl}_block_{i}",
                )(h, temb, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = make_attn(self.attn_type, dtype=self.dtype)(h)
                hs.append(h)
            if lvl != num_levels - 1:
                h = Downsample(
                    with_conv=self.resamp_with_conv, asymmetric_padding=True,
                    dtype=self.dtype, name=f"down_{lvl}_downsample",
                )(h)
                hs.append(h)
                curr_res //= 2

        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_1")(h, temb, deterministic=deterministic)
        h = make_attn(self.attn_type, dtype=self.dtype)(h)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_2")(h, temb, deterministic=deterministic)

        for lvl in reversed(range(num_levels)):
            ch = self.ch * self.ch_mult[lvl]
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResnetBlock(
                    out_channels=ch, dropout=self.dropout, dtype=self.dtype,
                    name=f"up_{lvl}_block_{i}",
                )(h, temb, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = make_attn(self.attn_type, dtype=self.dtype)(h)
            if lvl != 0:
                h = Upsample(with_conv=self.resamp_with_conv, dtype=self.dtype,
                             name=f"up_{lvl}_upsample")(h)
                curr_res *= 2

        h = GroupNorm32(32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)
