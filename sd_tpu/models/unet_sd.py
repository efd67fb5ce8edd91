"""SD UNet — the guided-diffusion UNetModel that is the ε-model of the
text-to-image config (capability config #5).

Capability parity with the reference (reference: openai_model/model.py:259-595
UNetModel / ResBlock / TimestepEmbedSequential / Upsample / Downsample,
openai_model/attention.py:303-363 SpatialTransformer, :539-597 AttentionBlock,
:439-488 AttentionPool2d), re-designed TPU-first:

  * NHWC + bf16-friendly: fp32 GroupNorm/softmax, zero-init output convs;
  * attention (self over latent tokens, cross over 77-token text context)
    routes through the shared front-end → Pallas flash kernel on TPU;
  * the block graph is built with static Python loops at trace time — the
    reference's TimestepEmbedSequential dispatch becomes plain function
    composition, and XLA sees one flat graph;
  * skip connections are a Python list of tracers (static topology), so
    no dynamic shapes ever reach the compiler.

SD-v1 config (Diffusion/config.yaml:12-44): model_channels=320,
channel_mult=(1,2,4,4), num_res_blocks=2, attention at ds ∈ {4,2,1} →
attention_resolutions=(4,2,1), num_heads=8, context_dim=768,
transformer_depth=1.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sd_tpu.kernels.attention import dot_product_attention
from sd_tpu.nn.attention import SpatialTransformer
from sd_tpu.nn.layers import GroupNorm32, timestep_embedding, zeros_init_conv
from sd_tpu.nn.resnet import ResBlockSD
from sd_tpu.nn.updown import Downsample, Upsample


def _fourier_filter(x: jax.Array, threshold: int, scale: float) -> jax.Array:
    """Scale the low-frequency (DC-centered) band of the spatial spectrum
    (FreeU, arXiv:2309.11497 eq. 6; XLA lowers jnp.fft natively)."""
    B, H, W, C = x.shape
    f = jnp.fft.fftshift(jnp.fft.fftn(x.astype(jnp.complex64), axes=(1, 2)),
                         axes=(1, 2))
    ch, cw = H // 2, W // 2
    mask = jnp.ones((1, H, W, 1), jnp.float32)
    mask = mask.at[:, max(ch - threshold, 0): ch + threshold,
                   max(cw - threshold, 0): cw + threshold].set(scale)
    f = jnp.fft.ifftn(jnp.fft.ifftshift(f * mask, axes=(1, 2)), axes=(1, 2))
    return f.real.astype(x.dtype)


def _apply_freeu(h: jax.Array, skip: jax.Array, mc: int,
                 freeu: tuple[float, float, float, float]):
    """FreeU at the two deepest decoder widths: amplify the backbone's
    first-half channels, low-pass-attenuate the skip (the paper's recipe —
    backbone features carry denoising semantics, skips re-inject
    high-frequency noise)."""
    b1, b2, s1, s2 = freeu
    C = h.shape[-1]
    if C == mc * 4:
        h = h.at[..., : C // 2].multiply(b1)
        skip = _fourier_filter(skip, 1, s1)
    elif C == mc * 2:
        h = h.at[..., : C // 2].multiply(b2)
        skip = _fourier_filter(skip, 1, s2)
    return h, skip


class SelfAttentionBlock2D(nn.Module):
    """Pure self-attention block used when use_spatial_transformer=False:
    GN → qkv 1×1 → multi-head attention → zero-init 1×1 proj → residual
    (reference: openai_model/attention.py:539-597 AttentionBlock with
    QKVAttentionLegacy/FlashAttention)."""

    num_heads: int = 1
    num_head_channels: int = -1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        heads = (
            C // self.num_head_channels
            if self.num_head_channels != -1
            else self.num_heads
        )
        h = GroupNorm32(32, name="norm")(x)
        qkv = nn.Conv(3 * C, (1, 1), dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(B, H * W, 3, heads, C // heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = dot_product_attention(q, k, v).reshape(B, H, W, C)
        out = nn.Conv(
            C, (1, 1), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="proj_out",
        )(out)
        return x + out


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling over spatial positions: learned positional
    embedding, mean token as query (reference: openai_model/attention.py:439-488)."""

    num_heads: int
    output_dim: int | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        n = H * W
        tokens = x.reshape(B, n, C)
        mean_tok = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # [B, n+1, C]
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(1.0 / C**0.5),
            (n + 1, C),
        )
        tokens = tokens + pos[None]
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv_proj")(tokens)
        qkv = qkv.reshape(B, n + 1, 3, self.num_heads, C // self.num_heads)
        q, k, v = qkv[:, :1, 0], qkv[:, :, 1], qkv[:, :, 2]  # q = mean token only
        out = dot_product_attention(q, k, v).reshape(B, 1, C)
        out = nn.Dense(self.output_dim or C, dtype=self.dtype, name="c_proj")(out)
        return out[:, 0]


class UNetModel(nn.Module):
    """The SD/guided-diffusion UNet (reference: openai_model/model.py:259-595)."""

    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    dropout: float = 0.0
    conv_resample: bool = True
    num_heads: int = 8
    num_head_channels: int = -1
    use_spatial_transformer: bool = True
    transformer_depth: int = 1
    context_dim: int | None = 768
    num_classes: int | None = None
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    n_embed: int | None = None  # optional codebook-id prediction head
    tome_ratio: float = 0.0     # ToMe serving accel (nn/tome.py); 0 = off
    tome_min_tokens: int = 1024
    # FreeU (arXiv:2309.11497, parameter-free sampling-quality knob):
    # (b1, b2, s1, s2) — amplify the backbone's first-half channels (b) and
    # low-pass-attenuate the skip features (s) at the two deepest decoder
    # widths (4·mc and 2·mc). SD-v1 paper setting: (1.2, 1.4, 0.9, 0.2).
    freeu: tuple[float, float, float, float] | None = None
    dtype: jnp.dtype | None = None

    def _attn(self, h, context, ds, name, deterministic, ip=None):
        ch = h.shape[-1]
        if self.num_head_channels == -1:
            heads, dim_head = self.num_heads, ch // self.num_heads
        else:
            heads, dim_head = ch // self.num_head_channels, self.num_head_channels
        if self.use_spatial_transformer:
            ip_entry = None
            if ip is not None and name in ip["layers"]:
                ip_entry = (ip["layers"][name], ip["tokens"], ip["scale"])
            return SpatialTransformer(
                heads=heads, dim_head=dim_head, depth=self.transformer_depth,
                dropout=self.dropout, tome_ratio=self.tome_ratio,
                tome_min_tokens=self.tome_min_tokens,
                dtype=self.dtype, name=name,
            )(h, context, ip=ip_entry, deterministic=deterministic)
        return SelfAttentionBlock2D(
            num_heads=heads, num_head_channels=self.num_head_channels,
            dtype=self.dtype, name=name,
        )(h)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                      # [B, H, W, C_in] latent
        timesteps: jax.Array,              # [B] int32/float32
        context: jax.Array | None = None,  # [B, 77, context_dim] text embedding
        y: jax.Array | None = None,        # [B] class labels (adm conditioning)
        *,
        control: Sequence[jax.Array] | None = None,
        ip: dict | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """`control`: ControlNet residuals (models/controlnet.py) — one per
        input-block output in order plus a final middle-block residual
        (len == len(hs) + 1); added to the skip connections and the middle
        activation (Zhang et al., arXiv:2302.05543).

        `ip`: IP-Adapter payload (models/ip_adapter.py) —
        {"layers": {attn_name: {block_name: {to_k_ip, to_v_ip}}},
        "tokens": [B, n, Cc], "scale": float}; routed into each
        cross-attention as a decoupled image read (arXiv:2308.06721)."""
        mc = self.model_channels
        time_embed_dim = mc * 4

        emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(emb)

        if self.num_classes is not None:
            assert y is not None, "class-conditional model needs labels"
            emb = emb + nn.Embed(
                self.num_classes, time_embed_dim, dtype=self.dtype, name="label_emb"
            )(y)

        def res(h, out_ch, name, up=False, down=False):
            return ResBlockSD(
                out_channels=out_ch, dropout=self.dropout,
                use_scale_shift_norm=self.use_scale_shift_norm,
                up=up, down=down, dtype=self.dtype, name=name,
            )(h, emb, deterministic=deterministic)

        # ---- input blocks -------------------------------------------------
        h = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype, name="input_conv")(x)
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = res(h, mult * mc, f"in_{level}_{i}_res")
                if ds in self.attention_resolutions:
                    h = self._attn(h, context, ds, f"in_{level}_{i}_attn", deterministic, ip)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(h, h.shape[-1], f"in_{level}_down", down=True)
                else:
                    h = Downsample(
                        with_conv=self.conv_resample, dtype=self.dtype,
                        name=f"in_{level}_down",
                    )(h)
                hs.append(h)
                ds *= 2

        # ---- middle -------------------------------------------------------
        h = res(h, h.shape[-1], "mid_res1")
        h = self._attn(h, context, ds, "mid_attn", deterministic, ip)
        h = res(h, h.shape[-1], "mid_res2")

        ctrl = list(control) if control is not None else None
        if ctrl is not None:
            if len(ctrl) != len(hs) + 1:
                raise ValueError(
                    f"control expects {len(hs) + 1} residuals, got {len(ctrl)}")
            h = h + ctrl.pop()

        # ---- output blocks (skip concat) ----------------------------------
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                if ctrl is not None:
                    skip = skip + ctrl.pop()
                if self.freeu is not None:
                    h, skip = _apply_freeu(h, skip, mc, self.freeu)
                h = jnp.concatenate([h, skip], axis=-1)
                h = res(h, mult * mc, f"out_{level}_{i}_res")
                if ds in self.attention_resolutions:
                    h = self._attn(h, context, ds, f"out_{level}_{i}_attn", deterministic, ip)
                if level != 0 and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res(h, h.shape[-1], f"out_{level}_up", up=True)
                    else:
                        h = Upsample(
                            with_conv=self.conv_resample, dtype=self.dtype,
                            name=f"out_{level}_up",
                        )(h)
                    ds //= 2

        # ---- head ---------------------------------------------------------
        if self.n_embed is not None:
            # codebook-id prediction head (reference: openai_model/model.py id_predictor)
            h = GroupNorm32(32, name="id_norm")(h)
            return nn.Conv(self.n_embed, (1, 1), dtype=self.dtype, name="id_out")(h)
        h = GroupNorm32(32, name="out_norm")(h)
        h = nn.silu(h)
        return zeros_init_conv(
            self.out_channels, dtype=self.dtype, name="out_conv"
        )(h)
