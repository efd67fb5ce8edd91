"""First-stage codec: CompVis-style Encoder/Decoder plus the auxiliary codec
heads (SimpleDecoder, UpsampleDecoder, LatentRescaler, merged rescalers,
Upsampler, Resize, FirstStagePostProcessor).

Capability parity with the reference codec stack
(reference: Encoder_Decoder/encoder.py:8-210,
ldm/modules/diffusionmodules/model.py:370-840), re-designed TPU-first:
NHWC layout, fp32 GroupNorm, attention routed through the shared
flash-attention front-end, static per-level Python loops (unrolled at trace
time — XLA sees one flat graph with no dynamic control flow).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sd_tpu.nn.attention import make_attn
from sd_tpu.nn.layers import GroupNorm32
from sd_tpu.nn.resnet import ResnetBlock
from sd_tpu.nn.updown import Downsample, Upsample, nearest_upsample_2x


class Encoder(nn.Module):
    """conv_in → per-level [ResnetBlock ×N (+attn)] → Downsample → mid
    (res-attn-res) → GN/swish/conv_out to `2*z_channels` if `double_z`
    (reference: Encoder_Decoder/encoder.py:8-103,
    ldm/modules/diffusionmodules/model.py:370-465)."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True
    attn_type: str = "vanilla"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        num_levels = len(self.ch_mult)
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)

        curr_res = self.resolution
        for level, mult in enumerate(self.ch_mult):
            ch = self.ch * mult
            for i in range(self.num_res_blocks):
                h = ResnetBlock(
                    out_channels=ch, dropout=self.dropout, dtype=self.dtype,
                    name=f"down_{level}_block_{i}",
                )(h, None, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = make_attn(self.attn_type, dtype=self.dtype)(h)
            if level != num_levels - 1:
                h = Downsample(
                    with_conv=self.resamp_with_conv, asymmetric_padding=True,
                    dtype=self.dtype, name=f"down_{level}_downsample",
                )(h)
                curr_res //= 2

        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_block_1")(
            h, None, deterministic=deterministic
        )
        h = make_attn(self.attn_type, dtype=self.dtype)(h)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_block_2")(
            h, None, deterministic=deterministic
        )

        h = GroupNorm32(32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    """conv_in(z) → mid(res-attn-res) → per-level [ResnetBlock ×(N+1) (+attn)]
    → Upsample → GN/swish/conv_out (optional tanh)
    (reference: Encoder_Decoder/encoder.py:106-210,
    ldm/modules/diffusionmodules/model.py:468-574)."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 256
    z_channels: int = 4
    give_pre_end: bool = False
    tanh_out: bool = False
    attn_type: str = "vanilla"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, z: jax.Array, *, deterministic: bool = True) -> jax.Array:
        num_levels = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_levels - 1)

        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)

        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_block_1")(
            h, None, deterministic=deterministic
        )
        h = make_attn(self.attn_type, dtype=self.dtype)(h)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype, name="mid_block_2")(
            h, None, deterministic=deterministic
        )

        for level in reversed(range(num_levels)):
            ch = self.ch * self.ch_mult[level]
            for i in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    out_channels=ch, dropout=self.dropout, dtype=self.dtype,
                    name=f"up_{level}_block_{i}",
                )(h, None, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = make_attn(self.attn_type, dtype=self.dtype)(h)
            if level != 0:
                h = Upsample(
                    with_conv=self.resamp_with_conv, dtype=self.dtype,
                    name=f"up_{level}_upsample",
                )(h)
                curr_res *= 2

        if self.give_pre_end:
            return h
        h = GroupNorm32(32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h


# ---------------------------------------------------------------------------
# Auxiliary codec heads (reference: ldm/modules/diffusionmodules/model.py:577-840)
# ---------------------------------------------------------------------------


class SimpleDecoder(nn.Module):
    """1×1 conv → resblock → 2× nearest upsample → GN/swish/conv_out
    (reference: ldm/modules/diffusionmodules/model.py:577-610)."""

    out_channels: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        in_ch = x.shape[-1]
        h = nn.Conv(in_ch, (1, 1), dtype=self.dtype, name="conv_in")(x)
        h = ResnetBlock(
            out_channels=2 * in_ch, dtype=self.dtype, name="res1"
        )(h, None, deterministic=deterministic)
        h = ResnetBlock(
            out_channels=4 * in_ch, dtype=self.dtype, name="res2"
        )(h, None, deterministic=deterministic)
        h = ResnetBlock(
            out_channels=2 * in_ch, dtype=self.dtype, name="res3"
        )(h, None, deterministic=deterministic)
        h = nn.Conv(in_ch, (1, 1), dtype=self.dtype, name="conv_mid")(h)
        h = nearest_upsample_2x(h)
        h = GroupNorm32(32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)


class UpsampleDecoder(nn.Module):
    """Stack of resblocks + nearest upsamples to blow a latent up 2^N times
    (reference: ldm/modules/diffusionmodules/model.py:613-658)."""

    out_channels: int = 3
    ch: int = 128
    num_res_blocks: int = 2
    ch_mult: Sequence[int] = (2, 2)
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        h = x
        for level, mult in enumerate(self.ch_mult):
            ch = self.ch * mult
            for i in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    out_channels=ch, dropout=self.dropout, dtype=self.dtype,
                    name=f"level_{level}_block_{i}",
                )(h, None, deterministic=deterministic)
            if level != len(self.ch_mult) - 1:
                h = nearest_upsample_2x(h)
        h = GroupNorm32(32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)


class LatentRescaler(nn.Module):
    """Bilinear-resize a latent by `factor` between resblock stacks
    (reference: ldm/modules/diffusionmodules/model.py:661-695)."""

    factor: float
    mid_channels: int
    out_channels: int
    depth: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        h = nn.Conv(self.mid_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i in range(self.depth):
            h = ResnetBlock(dtype=self.dtype, name=f"res_before_{i}")(
                h, None, deterministic=deterministic
            )
        B, H, W, C = h.shape
        new_hw = (max(1, round(H * self.factor)), max(1, round(W * self.factor)))
        h = jax.image.resize(h, (B, *new_hw, C), method="bilinear")
        from sd_tpu.nn.attention import AttnBlock

        h = AttnBlock(dtype=self.dtype, name="attn")(h)
        for i in range(self.depth):
            h = ResnetBlock(dtype=self.dtype, name=f"res_after_{i}")(
                h, None, deterministic=deterministic
            )
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_out")(h)


class MergedRescaleEncoder(nn.Module):
    """Encoder followed by a LatentRescaler
    (reference: ldm/modules/diffusionmodules/model.py:698-714)."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    intermediate_chn_mult: int = 2
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    out_ch: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        inter = self.ch * self.intermediate_chn_mult
        h = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            z_channels=inter, double_z=False, dtype=self.dtype, name="encoder",
        )(x, deterministic=deterministic)
        return LatentRescaler(
            factor=self.rescale_factor, mid_channels=inter,
            out_channels=self.out_ch, depth=self.rescale_module_depth,
            dtype=self.dtype, name="rescaler",
        )(h, deterministic=deterministic)


class MergedRescaleDecoder(nn.Module):
    """LatentRescaler followed by a Decoder
    (reference: ldm/modules/diffusionmodules/model.py:717-731)."""

    z_channels: int = 4
    out_ch: int = 3
    resolution: int = 256
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, z: jax.Array, *, deterministic: bool = True) -> jax.Array:
        tmp_ch = self.z_channels * self.ch_mult[-1]
        h = LatentRescaler(
            factor=self.rescale_factor, mid_channels=tmp_ch, out_channels=tmp_ch,
            depth=self.rescale_module_depth, dtype=self.dtype, name="rescaler",
        )(z, deterministic=deterministic)
        return Decoder(
            ch=self.ch, out_ch=self.out_ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            z_channels=tmp_ch, dtype=self.dtype, name="decoder",
        )(h, deterministic=deterministic)


class Upsampler(nn.Module):
    """Rescale by `out_size/in_size` then decode 2× per extra octave
    (reference: ldm/modules/diffusionmodules/model.py:734-750)."""

    in_size: int
    out_size: int
    in_channels: int
    out_channels: int
    ch_mult: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        import math

        assert self.out_size >= self.in_size
        num_blocks = int(math.log2(self.out_size // self.in_size)) + 1
        factor = self.out_size / (self.in_size / 2)
        h = LatentRescaler(
            factor=factor, mid_channels=2 * self.in_channels,
            out_channels=self.in_channels, depth=1, dtype=self.dtype, name="rescaler",
        )(x, deterministic=deterministic)
        return Decoder(
            ch=self.in_channels, out_ch=self.out_channels,
            ch_mult=[self.ch_mult for _ in range(num_blocks)],
            num_res_blocks=2, attn_resolutions=(), resolution=self.out_size,
            z_channels=self.in_channels, dtype=self.dtype, name="decoder",
        )(h, deterministic=deterministic)


class Resize(nn.Module):
    """Bilinear resize by a static factor, optional learned 3×3 pre-conv
    (reference: ldm/modules/diffusionmodules/model.py:753-774)."""

    scale_factor: float = 1.0
    with_conv: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.with_conv:
            x = nn.Conv(
                x.shape[-1], (3, 3), strides=(2, 2), padding=1,
                dtype=self.dtype, name="conv",
            )(x)
        if self.scale_factor == 1.0:
            return x
        B, H, W, C = x.shape
        new_hw = (round(H * self.scale_factor), round(W * self.scale_factor))
        return jax.image.resize(x, (B, *new_hw, C), method="bilinear")


class FirstStagePostProcessor(nn.Module):
    """Project first-stage latents through a small resblock stack, e.g. to feed
    a downstream model at a different channel count
    (reference: ldm/modules/diffusionmodules/model.py:776-840). The first-stage
    encode itself happens outside (frozen params, pure fn)."""

    ch_mult: Sequence[int] = (1, 2)
    in_channels: int = 4
    proj_channels: int | None = None
    dropout: float = 0.0
    pretrained_out_channels: int | None = None
    reshape_to_sequence: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, z: jax.Array, *, deterministic: bool = True) -> jax.Array:
        proj = self.proj_channels or self.in_channels
        h = GroupNorm32(num_groups=min(32, z.shape[-1]), name="proj_norm")(z)
        h = nn.Conv(proj, (3, 3), padding=1, dtype=self.dtype, name="proj")(h)
        h = nn.silu(h)
        for i, mult in enumerate(self.ch_mult):
            h = ResnetBlock(
                out_channels=proj * mult, dropout=self.dropout,
                dtype=self.dtype, name=f"block_{i}",
            )(h, None, deterministic=deterministic)
            h = Downsample(with_conv=False, name=f"down_{i}")(h)
        if self.reshape_to_sequence:
            B, H, W, C = h.shape
            h = h.reshape(B, H * W, C)
        return h
