"""Residual blocks: the codec (CompVis) variant and the SD-UNet (guided
diffusion) variant with scale-shift conditioning.

Capability parity with the reference's ResnetBlock (reference: Unet/unet.py
ResnetBlock, Encoder_Decoder/encoder.py usage) and ResBlock
(reference: openai_model/model.py:139-252). NHWC layout; norms in fp32;
output convs of the SD variant are zero-initialized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from sd_tpu.nn.layers import Conv3x3, GroupNorm32, zeros_init_conv
from sd_tpu.nn.updown import Downsample, Upsample


class ResnetBlock(nn.Module):
    """Codec-style resblock: GN(eps 1e-6)→swish→conv ×2 with optional timestep
    embedding injected between the two convs; 1×1 (`nin`) or 3×3 shortcut.

    (A fully-fused GN→silu→conv Pallas pass exists — kernels/conv2d.py
    gn_silu_conv3x3 — but wiring it here measured NEUTRAL for decode
    (103.8 vs 103.0 ms) and a 100 ms REGRESSION for the GAN train step
    (267 vs 168 ms: the custom-VJP recompute backward defeats XLA's own
    fusion), so the block keeps the module path: PROBE_R11.)"""

    out_channels: int | None = None
    use_conv_shortcut: bool = False
    dropout: float = 0.0
    temb_channels: int = 512
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        temb: jax.Array | None = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch

        h = GroupNorm32(32, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        # Conv3x3 = nn.Conv-compatible wrapper that dispatches the big-spatial
        # codec levels to the Pallas fused conv on TPU (kernels/conv2d.py)
        h = Conv3x3(out_ch, dtype=self.dtype, name="conv1")(h)

        if temb is not None:
            t = nn.Dense(out_ch, dtype=self.dtype, name="temb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]

        h = GroupNorm32(32, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = Conv3x3(out_ch, dtype=self.dtype, name="conv2")(h)

        if in_ch != out_ch:
            if self.use_conv_shortcut:
                x = Conv3x3(out_ch, dtype=self.dtype, name="conv_shortcut")(x)
            else:
                x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class ResBlockSD(nn.Module):
    """SD-UNet resblock: optional scale-shift ("AdaGN") conditioning, optional
    built-in up/down-sampling, zero-init output conv."""

    out_channels: int | None = None
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        emb: jax.Array,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch

        h = GroupNorm32(32, name="in_norm")(x)
        h = nn.silu(h)
        if self.up:
            h = Upsample(with_conv=False)(h)
            x = Upsample(with_conv=False)(x)
        elif self.down:
            h = Downsample(with_conv=False)(h)
            x = Downsample(with_conv=False)(x)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(h)

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype,
            name="emb_proj",
        )(nn.silu(emb))

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
            h = GroupNorm32(32, name="out_norm")(h) * (1 + scale) + shift
            h = nn.silu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = zeros_init_conv(out_ch, dtype=self.dtype, name="out_conv")(h)
        else:
            h = h + emb_out[:, None, None, :]
            h = GroupNorm32(32, name="out_norm")(h)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = zeros_init_conv(out_ch, dtype=self.dtype, name="out_conv")(h)

        if in_ch != out_ch:
            if self.use_conv_skip:
                x = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="skip")(x)
            else:
                x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h
