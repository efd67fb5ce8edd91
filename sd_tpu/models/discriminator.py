"""PatchGAN discriminator, ActNorm, and the auxiliary UNet GAN generator.

Capability parity with the reference (reference:
Discriminator/discriminator.py:239-289 NLayerDiscriminator + weights_init,
:7-124 ActNorm; Discriminator/gan.py:4-59 UNetGenerator/ResidualBlock).

TPU-first notes: NHWC; BatchNorm is the torch-parity default but GAN training
steps here run it in batch-stat mode (no running-average state threaded
through the jitted step); ActNorm is the flow-style alternative with
data-dependent init exposed as an explicit `actnorm_ddi` initializer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _normal_init(std: float = 0.02):
    """DCGAN-style N(0, 0.02) conv init (reference: weights_init)."""
    return nn.initializers.normal(stddev=std)


class ActNorm(nn.Module):
    """Per-channel affine with optional logdet, flow-style
    (reference: Discriminator/discriminator.py:7-124).

    Data-dependent init: call `actnorm_ddi(params, batch)` once on real data
    to set loc/scale to normalize the first batch (the torch version does this
    lazily inside forward; in JAX init is explicit)."""

    logdet: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, reverse: bool = False):
        C = x.shape[-1]
        loc = self.param("loc", nn.initializers.zeros, (C,))
        scale = self.param("scale", nn.initializers.ones, (C,))
        if reverse:
            return x / (scale + 1e-6) - loc
        h = scale * (x + loc)
        if self.logdet:
            log_abs = jnp.log(jnp.abs(scale) + 1e-6)
            ld = jnp.sum(log_abs) * x.shape[1] * x.shape[2]
            return h, ld * jnp.ones(x.shape[0], x.dtype)
        return h


def actnorm_ddi(params: dict, batch: jax.Array) -> dict:
    """Return params with loc/scale set so `scale*(x+loc)` has zero mean, unit
    std over the given batch (per channel)."""
    mean = jnp.mean(batch, axis=(0, 1, 2))
    std = jnp.std(batch, axis=(0, 1, 2))
    out = dict(params)
    out["loc"] = -mean
    out["scale"] = 1.0 / (std + 1e-6)
    return out


class NLayerDiscriminator(nn.Module):
    """Pix2Pix PatchGAN: 4×4 stride-2 conv stack → 1-channel logit map
    (reference: Discriminator/discriminator.py:239-289)."""

    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        def norm(h, name):
            if self.use_actnorm:
                return ActNorm(name=name)(h)
            # train=True: batch-stat mode (running stats updated when applied
            # with mutable=["batch_stats"] — the jitted GAN step does this);
            # train=False: eval mode on the carried running stats, matching
            # torch BatchNorm2d defaults (momentum 0.1 torch == 0.9 flax;
            # reference: Discriminator/discriminator.py:239-289).
            return nn.BatchNorm(
                use_running_average=not train, use_bias=True, use_scale=True,
                momentum=0.9, dtype=jnp.float32, name=name,
            )(h)

        kw, pad = (4, 4), [(1, 1), (1, 1)]
        h = nn.Conv(self.ndf, kw, strides=(2, 2), padding=pad,
                    kernel_init=_normal_init(), dtype=self.dtype, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)

        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2**n, 8)
            h = nn.Conv(self.ndf * nf, kw, strides=(2, 2), padding=pad,
                        use_bias=self.use_actnorm,
                        kernel_init=_normal_init(), dtype=self.dtype,
                        name=f"conv{n}")(h)
            h = norm(h, f"norm{n}")
            h = nn.leaky_relu(h, 0.2)

        nf = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, kw, strides=(1, 1), padding=pad,
                    use_bias=self.use_actnorm,
                    kernel_init=_normal_init(), dtype=self.dtype,
                    name=f"conv{self.n_layers}")(h)
        h = norm(h, f"norm{self.n_layers}")
        h = nn.leaky_relu(h, 0.2)

        return nn.Conv(1, kw, strides=(1, 1), padding=pad,
                       kernel_init=_normal_init(), dtype=self.dtype,
                       name="conv_out")(h)


class ResidualBlock(nn.Module):
    """Reflection-pad conv residual block (reference: Discriminator/gan.py:4-21)."""

    channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def refl_conv(h, name):
            h = jnp.pad(h, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
            return nn.Conv(self.channels, (3, 3), padding="VALID",
                           dtype=self.dtype, name=name)(h)

        h = nn.relu(refl_conv(x, "conv1"))
        h = refl_conv(h, "conv2")
        return x + h


class UNetGenerator(nn.Module):
    """Small GAN generator: reflection-pad stem, strided down convs, residual
    blocks, transposed-conv upsampling, tanh output
    (reference: Discriminator/gan.py:24-59)."""

    ngf: int = 64
    n_res_blocks: int = 6
    out_channels: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = jnp.pad(x, [(0, 0), (3, 3), (3, 3), (0, 0)], mode="reflect")
        h = nn.Conv(self.ngf, (7, 7), padding="VALID", dtype=self.dtype, name="stem")(h)
        h = nn.relu(h)
        h = nn.relu(nn.Conv(self.ngf * 2, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name="down1")(h))
        h = nn.relu(nn.Conv(self.ngf * 4, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name="down2")(h))
        for i in range(self.n_res_blocks):
            h = ResidualBlock(self.ngf * 4, dtype=self.dtype, name=f"res{i}")(h)
        h = nn.relu(nn.ConvTranspose(self.ngf * 2, (3, 3), strides=(2, 2),
                                     padding="SAME", dtype=self.dtype, name="up1")(h))
        h = nn.relu(nn.ConvTranspose(self.ngf, (3, 3), strides=(2, 2),
                                     padding="SAME", dtype=self.dtype, name="up2")(h))
        h = jnp.pad(h, [(0, 0), (3, 3), (3, 3), (0, 0)], mode="reflect")
        h = nn.Conv(self.out_channels, (7, 7), padding="VALID",
                    dtype=self.dtype, name="head")(h)
        return jnp.tanh(h)
