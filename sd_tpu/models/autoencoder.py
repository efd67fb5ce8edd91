"""First-stage autoencoders: KL-regularised VAE, VQ model, and the identity
pass-through stage.

Capability parity with the reference autoencoders
(reference: VAE/autoencoder.py:32-236 AutoEncoderKL,
ldm/models/autoencoder.py:292-430; vqvae/autoencoder.py:23-478 VQModel +
VQModelInterface :435-468; IdentityFirstStage VAE/autoencoder.py:349-376).

The Lightning training orchestration of the reference lives in
`sd_tpu.train.gan` here (functional two-optimizer GAN steps); these modules
are pure forward graphs, so a frozen first stage is just `model.apply` with
stop_gradient — no `.eval()/.train()` mode state.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sd_tpu.core.distributions import DiagonalGaussian
from sd_tpu.models.codec import Decoder, Encoder
from sd_tpu.models.quantize import (
    EMAVectorQuantizer,
    GumbelQuantize,
    VectorQuantizer,
)


class AutoencoderKL(nn.Module):
    """encoder → quant_conv (2z→2emb) → DiagonalGaussian → sample/mode →
    post_quant_conv → decoder (reference: VAE/autoencoder.py:32-236,
    ldm/models/autoencoder.py:292-430)."""

    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    z_channels: int = 4
    out_ch: int = 3
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            z_channels=self.z_channels, double_z=True, dropout=self.dropout,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch, out_ch=self.out_ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            z_channels=self.embed_dim, dropout=self.dropout, dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype)

    def encode(self, x: jax.Array, *, deterministic: bool = True) -> DiagonalGaussian:
        h = self.encoder(x, deterministic=deterministic)
        moments = self.quant_conv(h)
        return DiagonalGaussian.from_moments(moments, axis=-1)

    def decode(self, z: jax.Array, *, deterministic: bool = True) -> jax.Array:
        z = self.post_quant_conv(z)
        return self.decoder(z, deterministic=deterministic)

    def __call__(
        self,
        x: jax.Array,
        rng: jax.Array | None = None,
        sample_posterior: bool = True,
        *,
        deterministic: bool = True,
    ) -> tuple[jax.Array, DiagonalGaussian]:
        posterior = self.encode(x, deterministic=deterministic)
        if sample_posterior and rng is not None:
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        return self.decode(z, deterministic=deterministic), posterior


class VQModel(nn.Module):
    """encoder → quant_conv → VectorQuantizer → post_quant_conv → decoder
    (reference: vqvae/autoencoder.py:23-478, ldm/models/autoencoder.py:19-289)."""

    n_embed: int = 8192
    embed_dim: int = 3
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    z_channels: int = 3
    out_ch: int = 3
    dropout: float = 0.0
    beta: float = 0.25
    legacy: bool = True
    remap: str | Sequence[int] | None = None
    sane_index_shape: bool = False
    # quantizer family: "vq" (argmin codebook), "gumbel" (GumbelQuantize —
    # reference ldm/tamming/quantize.py:110-210), or "ema" (EMA codebook —
    # reference :331-446). gumbel takes rng/temp at train time; ema updates
    # its codebook through the mutable 'codebook' collection.
    quantizer_type: str = "vq"
    kl_weight: float = 5e-4      # gumbel only
    temp_init: float = 1.0       # gumbel only
    ema_decay: float = 0.99      # ema only
    dtype: jnp.dtype | None = None

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            z_channels=self.z_channels, double_z=False, dropout=self.dropout,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch, out_ch=self.out_ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            z_channels=self.embed_dim, dropout=self.dropout, dtype=self.dtype,
        )
        if self.quantizer_type == "gumbel":
            self.quantize = GumbelQuantize(
                n_e=self.n_embed, e_dim=self.embed_dim,
                kl_weight=self.kl_weight, temp_init=self.temp_init,
                remap=self.remap,
            )
        elif self.quantizer_type == "ema":
            self.quantize = EMAVectorQuantizer(
                n_e=self.n_embed, e_dim=self.embed_dim, beta=self.beta,
                decay=self.ema_decay,
            )
        else:
            self.quantize = VectorQuantizer(
                n_e=self.n_embed, e_dim=self.embed_dim, beta=self.beta,
                legacy=self.legacy, remap=self.remap,
                sane_index_shape=self.sane_index_shape,
            )
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype)

    def _quantize(self, h, *, rng=None, temp=None, update=False,
                  deterministic=True):
        """Family-dispatch: normalize the three quantizers' signatures."""
        if self.quantizer_type == "gumbel":
            return self.quantize(h, rng=rng, temp=temp,
                                 deterministic=deterministic)
        if self.quantizer_type == "ema":
            return self.quantize(h, update=update)
        return self.quantize(h)

    def encode(self, x: jax.Array, *, rng=None, temp=None, update=False,
               deterministic: bool = True):
        """Returns (z_q, emb_loss, (perplexity, _, indices))."""
        h = self.encoder(x, deterministic=deterministic)
        h = self.quant_conv(h)
        return self._quantize(h, rng=rng, temp=temp, update=update,
                              deterministic=deterministic)

    def encode_pre_quant(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        """Encode WITHOUT quantization — the VQModelInterface.encode path used
        by latent diffusion (reference: vqvae/autoencoder.py:435-448)."""
        h = self.encoder(x, deterministic=deterministic)
        return self.quant_conv(h)

    def decode(self, z_q: jax.Array, *, deterministic: bool = True) -> jax.Array:
        z = self.post_quant_conv(z_q)
        return self.decoder(z, deterministic=deterministic)

    def decode_with_quantize(self, z: jax.Array, *, deterministic: bool = True):
        """Quantize a continuous latent then decode — the
        VQModelInterface.decode(force_not_quantize=False) path
        (reference: vqvae/autoencoder.py:450-468)."""
        z_q, _, _ = self._quantize(z, deterministic=True)
        return self.decode(z_q, deterministic=deterministic)

    def decode_code(self, code_b: jax.Array, shape: tuple) -> jax.Array:
        z_q = self.quantize.get_codebook_entry(code_b, shape)
        return self.decode(z_q)

    def __call__(self, x: jax.Array, *, rng=None, temp=None, update=False,
                 deterministic: bool = True):
        z_q, diff, info = self.encode(
            x, rng=rng, temp=temp, update=update, deterministic=deterministic)
        dec = self.decode(z_q, deterministic=deterministic)
        return dec, diff, info


class IdentityFirstStage(nn.Module):
    """Pass-through first stage for pixel-space latent diffusion
    (reference: VAE/autoencoder.py:349-376, ldm/models/autoencoder.py:433-450)."""

    vq_interface: bool = False

    def encode(self, x, *args, **kwargs):
        return x

    def decode(self, x, *args, **kwargs):
        return x

    def quantize(self, x, *args, **kwargs):
        if self.vq_interface:
            return x, None, [None, None, None]
        return x

    def __call__(self, x, *args, **kwargs):
        return x
