"""GAN loss pieces shared by the KL-VAE and VQ-VAE trainers.

Capability parity with the reference losses (reference: VAE/loss.py:7-162
LPIPSWithDiscriminator — hinge/vanilla d-loss, adopt_weight warm-up gate,
adaptive discriminator weight ‖∇nll‖/‖∇g‖ at the decoder's last layer;
vqvae/vqlpips.py:32-183 VQLPIPSWithDiscriminator), expressed as pure
functions. The last-layer gradients feeding `calculate_adaptive_weight` are
produced with `jax.vjp` in `sd_tpu.train.gan` (one forward, two cotangent
pulls — the JAX equivalent of the reference's two `autograd.grad` calls).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    """0.5·(E[relu(1−D(x))] + E[relu(1+D(x̂))]) (reference: VAE/loss.py hinge_d_loss)."""
    loss_real = jnp.mean(jnp.maximum(1.0 - logits_real, 0.0))
    loss_fake = jnp.mean(jnp.maximum(1.0 + logits_fake, 0.0))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    """0.5·(E[softplus(−D(x))] + E[softplus(D(x̂))]) (reference: vanilla_d_loss)."""
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def adopt_weight(
    weight: float, global_step: jax.Array, threshold: int = 0, value: float = 0.0
) -> jax.Array:
    """Gate a loss weight until `global_step` reaches `threshold`
    (reference: VAE/loss.py adopt_weight). Branchless for jit."""
    return jnp.where(global_step < threshold, value, weight)


def calculate_adaptive_weight(
    nll_grad: jax.Array,
    g_grad: jax.Array,
    discriminator_weight: float = 1.0,
    max_weight: float = 1e4,
) -> jax.Array:
    """d_weight = clamp(‖∇_last nll‖ / ‖∇_last g‖, 0, 1e4) · disc_weight,
    detached (reference: VAE/loss.py:65-76 calculate_adaptive_weight)."""
    w = jnp.linalg.norm(nll_grad) / (jnp.linalg.norm(g_grad) + 1e-4)
    w = jnp.clip(w, 0.0, max_weight) * discriminator_weight
    return jax.lax.stop_gradient(w)


@dataclasses.dataclass(frozen=True)
class GanLossConfig:
    """Weights/gates of LPIPSWithDiscriminator / VQLPIPSWithDiscriminator
    (reference defaults: VAE/loss.py:7-30, vqvae/vqlpips.py:32-60,
    config/vae_config/kl-f4.yaml, vqvae/config.yaml)."""

    disc_start: int = 50001
    kl_weight: float = 1e-6
    disc_weight: float = 0.5
    perceptual_weight: float = 1.0
    pixelloss_weight: float = 1.0
    disc_factor: float = 1.0
    logvar_init: float = 0.0
    disc_loss: str = "hinge"           # "hinge" | "vanilla"
    codebook_weight: float = 1.0       # VQ only
    disc_conditional: bool = False
    use_adaptive_weight: bool = True

    def d_loss_fn(self):
        return hinge_d_loss if self.disc_loss == "hinge" else vanilla_d_loss


def reconstruction_nll(
    x: jax.Array,
    recon: jax.Array,
    logvar: jax.Array,
    perceptual: jax.Array | None,
    cfg: GanLossConfig,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(nll_loss, rec_loss_mean, weighted_nll) — L1 + LPIPS under a learned
    global logvar (reference: VAE/loss.py:86-102). `perceptual` is the LPIPS
    map [B,1,1,1] or None."""
    x32 = x.astype(jnp.float32)
    r32 = recon.astype(jnp.float32)
    rec = cfg.pixelloss_weight * jnp.abs(x32 - r32)
    if perceptual is not None and cfg.perceptual_weight > 0:
        rec = rec + cfg.perceptual_weight * perceptual.astype(jnp.float32)
    nll = rec / jnp.exp(logvar) + logvar
    b = x.shape[0]
    nll_loss = jnp.sum(nll) / b
    return nll_loss, jnp.mean(rec), nll_loss
