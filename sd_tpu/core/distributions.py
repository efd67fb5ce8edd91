"""Latent distributions for first-stage codecs.

Capability parity with the reference's DiagonalGaussianDistribution / normal_kl
/ DiracDistribution (reference: Distribution/distribution.py:32-120,
ldm/modules/distributions/distributions.py), re-done as an immutable pytree
with explicit PRNG keys (JAX has no implicit RNG state).

Layout note: moments are split on the LAST axis (NHWC channels), whereas the
reference chunks dim=1 (NCHW).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiagonalGaussian:
    """Diagonal Gaussian posterior parameterized by concatenated [mean, logvar].

    logvar is clamped to [-30, 20] as in the reference
    (Distribution/distribution.py:37).
    """

    mean: jax.Array
    logvar: jax.Array

    @classmethod
    def from_moments(cls, parameters: jax.Array, axis: int = -1) -> "DiagonalGaussian":
        mean, logvar = jnp.split(parameters, 2, axis=axis)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return cls(mean=mean, logvar=logvar)

    @property
    def std(self) -> jax.Array:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> jax.Array:
        return jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jax.Array:
        noise = jax.random.normal(rng, self.mean.shape, dtype=jnp.float32)
        return (self.mean + self.std * noise).astype(self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: "DiagonalGaussian | None" = None) -> jax.Array:
        """KL divergence to `other` (or to N(0, I)), summed over non-batch dims."""
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jax.Array, axes: tuple[int, ...] | None = None) -> jax.Array:
        """Negative log-likelihood of `sample`, summed over non-batch dims."""
        if axes is None:
            axes = tuple(range(1, self.mean.ndim))
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=axes,
        )


def normal_kl(mean1, logvar1, mean2, logvar2):
    """Elementwise KL between two diagonal Gaussians (shapes broadcast)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Dirac:
    """Deterministic 'distribution' — used by codecs with no stochastic latent."""

    value: jax.Array

    def sample(self, rng: jax.Array | None = None) -> jax.Array:
        return self.value

    def mode(self) -> jax.Array:
        return self.value

    def kl(self, other=None) -> jax.Array:
        return jnp.zeros(self.value.shape[0], dtype=jnp.float32)
