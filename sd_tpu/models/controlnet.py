"""ControlNet — spatially-conditioned control of a frozen SD UNet
(Zhang, Rao & Agrawala, "Adding Conditional Control to Text-to-Image
Diffusion Models", arXiv:2302.05543).

Beyond-reference capability (the reference has no adapter/control surface;
its only conditioning paths are the DiffusionWrapper keys,
ldm/diffusion/ddpm.py:1992-2034). This is the standard production mechanism
for structure-guided generation (edges / depth / pose → image), built
TPU-first:

  * the control branch is a trainable COPY of the UNet's encoder + middle
    (identical module names, so `init_controlnet_from_unet` is a plain
    subtree copy of the trained weights — the paper's initialisation);
  * a hint encoder maps the pixel-space control image down to the latent
    grid with stride-2 convs (ending in a zero conv, so training starts
    as an exact no-op);
  * every emitted residual passes through a zero-init 1×1 conv — with
    fresh parameters the controlled forward is bitwise the base forward;
  * the residuals are plain tensors added to the base UNet's skip
    connections (models/unet_sd.py `control=`), so the whole controlled
    step is one flat XLA graph — no module surgery, no dynamic dispatch.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sd_tpu.models.unet_sd import UNetModel
from sd_tpu.nn.layers import timestep_embedding, zeros_init_conv
from sd_tpu.nn.resnet import ResBlockSD
from sd_tpu.nn.updown import Downsample

PyTree = Any


class ControlNet(nn.Module):
    """The control branch: UNet encoder + middle, a pixel-space hint
    encoder, and zero-init 1×1 projections producing one residual per
    base-UNet skip connection plus one for the middle block.

    Field semantics match `UNetModel`; encoder submodule NAMES match too,
    so a trained UNet's encoder weights copy straight in
    (`init_controlnet_from_unet`)."""

    in_channels: int = 4
    model_channels: int = 320
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
    hint_channels: int = 3
    # stride-2 stages mapping the pixel-space hint to the latent grid:
    # log2(first-stage downsampling factor) — 3 for SD-v1 f8, 2 for f4.
    hint_downsamples: int = 3
    dtype: jnp.dtype | None = None

    def _attn(self, h, context, name, deterministic):
        from sd_tpu.models.unet_sd import SelfAttentionBlock2D
        from sd_tpu.nn.attention import SpatialTransformer

        ch = h.shape[-1]
        if self.num_head_channels == -1:
            heads, dim_head = self.num_heads, ch // self.num_heads
        else:
            heads, dim_head = ch // self.num_head_channels, self.num_head_channels
        if self.use_spatial_transformer:
            return SpatialTransformer(
                heads=heads, dim_head=dim_head, depth=self.transformer_depth,
                dropout=self.dropout, dtype=self.dtype, name=name,
            )(h, context, deterministic=deterministic)
        return SelfAttentionBlock2D(
            num_heads=heads, num_head_channels=self.num_head_channels,
            dtype=self.dtype, name=name,
        )(h)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                      # [B, h, w, C_in] latent
        hint: jax.Array,                   # [B, H, W, hint_channels] pixels
        timesteps: jax.Array,              # [B]
        context: jax.Array | None = None,  # [B, 77, context_dim]
        y: jax.Array | None = None,
        *,
        deterministic: bool = True,
    ) -> tuple[jax.Array, ...]:
        mc = self.model_channels
        time_embed_dim = mc * 4

        emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(emb)
        if self.num_classes is not None:
            assert y is not None, "class-conditional model needs labels"
            emb = emb + nn.Embed(
                self.num_classes, time_embed_dim, dtype=self.dtype,
                name="label_emb")(y)

        # hint encoder: pixel-space control image → latent grid, ending in
        # a zero conv (arXiv:2302.05543 §3.3 "tiny network" E(·))
        g = hint
        g = nn.Conv(16, (3, 3), padding=1, dtype=self.dtype,
                    name="hint_in")(g)
        g = nn.silu(g)
        ladder = (16, 32, 96, 256)
        for i in range(self.hint_downsamples):
            ch = ladder[min(i, len(ladder) - 1)]
            g = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                        name=f"hint_{i}_a")(g)
            g = nn.silu(g)
            ch2 = ladder[min(i + 1, len(ladder) - 1)]
            g = nn.Conv(ch2, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name=f"hint_{i}_down")(g)
            g = nn.silu(g)
        guided = zeros_init_conv(mc, dtype=self.dtype, name="hint_zero")(g)

        def res(h, out_ch, name, down=False):
            return ResBlockSD(
                out_channels=out_ch, dropout=self.dropout,
                use_scale_shift_norm=self.use_scale_shift_norm,
                down=down, dtype=self.dtype, name=name,
            )(h, emb, deterministic=deterministic)

        def zero_proj(h, name):
            return zeros_init_conv(h.shape[-1], kernel_size=(1, 1),
                                   padding=0, dtype=self.dtype, name=name)(h)

        # encoder — same topology/names as UNetModel's input blocks
        h = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype,
                    name="input_conv")(x)
        h = h + guided
        outs = [zero_proj(h, "zero_conv_0")]
        ds, k = 1, 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = res(h, mult * mc, f"in_{level}_{i}_res")
                if ds in self.attention_resolutions:
                    h = self._attn(h, context, f"in_{level}_{i}_attn",
                                   deterministic)
                outs.append(zero_proj(h, f"zero_conv_{k}")); k += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(with_conv=self.conv_resample, dtype=self.dtype,
                               name=f"in_{level}_down")(h)
                outs.append(zero_proj(h, f"zero_conv_{k}")); k += 1
                ds *= 2

        h = res(h, h.shape[-1], "mid_res1")
        h = self._attn(h, context, "mid_attn", deterministic)
        h = res(h, h.shape[-1], "mid_res2")
        outs.append(zero_proj(h, "mid_zero_conv"))
        return tuple(outs)


def controlnet_from_unet_config(unet_cfg: dict, hint_channels: int = 3,
                                hint_downsamples: int = 3,
                                dtype=None) -> ControlNet:
    """Build the control branch mirroring a UNet config dict
    (the `unet.params` block of a capability config)."""
    keys = ("in_channels", "model_channels", "num_res_blocks",
            "attention_resolutions", "channel_mult", "dropout",
            "conv_resample", "num_heads", "num_head_channels",
            "use_spatial_transformer", "transformer_depth", "context_dim",
            "num_classes", "use_scale_shift_norm")
    kw = {k: unet_cfg[k] for k in keys if k in unet_cfg and unet_cfg[k] is not None}
    for t in ("attention_resolutions", "channel_mult"):
        if t in kw:
            kw[t] = tuple(kw[t])
    return ControlNet(hint_channels=hint_channels,
                      hint_downsamples=hint_downsamples, dtype=dtype, **kw)


def init_controlnet_from_unet(cn_params: PyTree, unet_params: PyTree) -> PyTree:
    """Copy the trained UNet's encoder/middle/time-embed weights into the
    freshly-initialised control branch (the paper's init: the control
    branch starts as the trained encoder; hint encoder and zero convs stay
    at their fresh/zero init). Matching is by module name — the branches
    share names by construction."""
    out = dict(cn_params)
    for name, sub in unet_params.items():
        if name in out and (
            name.startswith(("in_", "mid_", "time_embed", "label_emb"))
            or name == "input_conv"
        ):
            # materialize COPIES: the control branch becomes the (donated)
            # optimizer state while the base stays a frozen closure
            # constant — sharing buffers would let the donated train step
            # delete the base's arrays out from under the jitted loss
            out[name] = jax.tree.map(lambda a: jnp.array(a), sub)
    return out


def controlled_apply_fn(unet: UNetModel, controlnet: ControlNet,
                        control_scale: float = 1.0):
    """Build the controlled `unet_apply` closure for LatentDiffusion:
    params = {"unet": ..., "controlnet": ...}; the control image arrives
    through the conditioning dict as cond["c_control"] (threaded by
    diffusion/latent.py apply_conditioned into the `control=` kwarg)."""

    def apply_fn(p, x, t, ctx, y=None, control=None):
        if control is None:
            return unet.apply({"params": p["unet"]}, x, t, ctx, y)
        res = controlnet.apply({"params": p["controlnet"]}, x, control, t,
                               ctx, y)
        if control_scale != 1.0:
            res = tuple(r * control_scale for r in res)
        return unet.apply({"params": p["unet"]}, x, t, ctx, y, control=res)

    return apply_fn
