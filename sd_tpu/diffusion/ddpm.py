"""DDPM process: q/p machinery, training losses and the ancestral sampler.

Capability parity with the reference's DDPM pipelines
(reference: DDPM/ddpm.py:17-89 DDPMPipeline, ldm/diffusion/ddpm.py:34-604
q_sample/q_posterior/p_mean_variance/p_sample_loop/p_losses), re-designed as a
stateless process object over a `DiffusionSchedule` pytree: every sampler is a
single `lax.scan` over on-device tables (one compiled program, zero host sync
per step), and the loss is a pure function ready to jit/pjit.

Paper-correct Algorithm-2: x_{t-1} = 1/√α_t (x_t − β_t/√(1−ᾱ_t)·ε̂) + σ_t z.
The reference's DDPM/ddpm.py:84-86 uses ᾱ_{t-1} in the denominator — recorded
in COMPAT.md.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import DiffusionSchedule, extract
from sd_tpu.nn.layers import mean_flat

# model_fn(x, t, cond) -> prediction (eps or x0 depending on parameterization)
ModelFn = Callable[[jax.Array, jax.Array, Any], jax.Array]


def draw_training_noise(rng: jax.Array, shape: tuple[int, ...],
                        offset: float = 0.0) -> jax.Array:
    """Training noise ε, optionally with a per-(sample, channel) DC offset
    (beyond-reference: the "noise offset" fine-tuning trick, crosslabs 2023
    / SDXL recipe §2.5-adjacent). offset=0 is plain iid N(0,1): with iid
    noise every ε has near-zero spatial mean, so q_sample never moves an
    image's overall brightness and the model can't learn to either;
    offset·ε_c (ε_c per sample+channel) restores that degree of freedom.
    Typical offset: 0.05-0.15."""
    r1, r2 = jax.random.split(rng)
    noise = jax.random.normal(r1, shape, jnp.float32)
    if offset > 0.0:
        dc_shape = (shape[0],) + (1,) * (len(shape) - 2) + (shape[-1],)
        noise = noise + offset * jax.random.normal(r2, dc_shape, jnp.float32)
    return noise


@dataclasses.dataclass(frozen=True)
class DDPMProcess:
    """Bundles a schedule with a parameterization and loss configuration."""

    schedule: DiffusionSchedule
    parameterization: str = "eps"          # "eps" | "x0" | "v"
    loss_type: str = "l2"                  # "l2" | "l1"
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0
    clip_denoised: bool = True
    # min-SNR-γ loss weighting (Hang et al., arXiv:2303.09556 —
    # beyond-reference): clamps the effective per-timestep weight at
    # SNR=γ so easy low-noise steps stop dominating the gradient;
    # γ=5 is the paper's recommendation (~3× faster convergence).
    # Applied to the simple loss only; None disables.
    min_snr_gamma: float | None = None

    # -- training --------------------------------------------------------

    def p_losses(
        self,
        model_fn: ModelFn,
        x_start: jax.Array,
        t: jax.Array,
        noise: jax.Array,
        cond: Any = None,
        learned_logvar: jax.Array | None = None,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """Simple + VLB-weighted diffusion loss
        (reference: ldm/diffusion/ddpm.py:439-470, 1483-1524)."""
        sched = self.schedule
        x_noisy = sched.q_sample(x_start, t, noise)
        model_out = model_fn(x_noisy, t, cond)

        if self.parameterization == "eps":
            target = noise
        elif self.parameterization == "v":
            # v-prediction target (Salimans & Ho, arXiv:2202.00512 —
            # beyond-reference; the SD 2.x training mode)
            target = sched.get_v(x_start, noise, t)
        else:
            target = x_start
        err = (model_out.astype(jnp.float32) - target.astype(jnp.float32))
        if self.loss_type == "l2":
            loss_raw = mean_flat(err**2)
        elif self.loss_type == "l1":
            loss_raw = mean_flat(jnp.abs(err))
        else:
            raise ValueError(f"unknown loss_type {self.loss_type!r}")

        logs = {}
        loss_weighted = loss_raw
        if self.min_snr_gamma is not None:
            abar_t = jnp.take(sched.alphas_cumprod, t).astype(jnp.float32)
            snr = abar_t / jnp.maximum(1.0 - abar_t, 1e-12)
            g = self.min_snr_gamma
            if self.parameterization == "eps":
                w = jnp.minimum(snr, g) / jnp.maximum(snr, 1e-12)
            elif self.parameterization == "v":
                w = jnp.minimum(snr, g) / (snr + 1.0)
            else:  # x0: the loss already carries a 1/SNR factor vs ε-space
                w = jnp.minimum(snr, g)
            loss_weighted = loss_raw * w
        loss_simple = loss_weighted.mean()
        logs["loss_simple"] = loss_simple

        if learned_logvar is not None:
            # per-timestep learned logvar (reference: ldm/diffusion/ddpm.py:1504-1510)
            logvar_t = jnp.take(learned_logvar, t)
            loss = (loss_weighted / jnp.exp(logvar_t) + logvar_t).mean()
            logs["loss_gamma"] = loss
        else:
            loss = loss_simple
        loss = self.l_simple_weight * loss

        loss_vlb = (jnp.take(sched.lvlb_weights, t) * loss_raw).mean()
        logs["loss_vlb"] = loss_vlb
        loss = loss + self.original_elbo_weight * loss_vlb
        logs["loss"] = loss
        return loss, logs

    # -- reverse process ---------------------------------------------------

    def model_eps_and_x0(self, model_fn, x, t, cond):
        out = model_fn(x, t, cond)
        if self.parameterization == "eps":
            eps = out
            x0 = self.schedule.predict_start_from_noise(x, t, eps)
        elif self.parameterization == "v":
            eps = self.schedule.predict_eps_from_v(x, t, out)
            x0 = self.schedule.predict_start_from_v(x, t, out)
        else:
            x0 = out
            eps = self.schedule.predict_eps_from_start(x, t, x0)
        if self.clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return eps, x0

    def p_mean_variance(self, model_fn, x, t, cond=None):
        _, x0 = self.model_eps_and_x0(model_fn, x, t, cond)
        return self.schedule.q_posterior(x0, x, t)

    def p_sample(self, model_fn, x, t, rng, cond=None, temperature: float = 1.0):
        """One ancestral reverse step; no noise is added at t == 0."""
        mean, _, log_var = self.p_mean_variance(model_fn, x, t, cond)
        noise = jax.random.normal(rng, x.shape, dtype=jnp.float32)
        nonzero = (t > 0).astype(jnp.float32).reshape(-1, *([1] * (x.ndim - 1)))
        return (
            mean + nonzero * jnp.exp(0.5 * log_var) * noise * temperature
        ).astype(x.dtype)

    def p_sample_loop(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        shape: tuple[int, ...],
        cond: Any = None,
        x_T: jax.Array | None = None,
        return_intermediates: bool = False,
        log_every_t: int = 100,
        temperature: float = 1.0,
    ):
        """Full T-step ancestral sampling as one `lax.scan`
        (reference loop: DDPM/ddpm.py:54-89, ldm/diffusion/ddpm.py:367-390).
        `temperature` scales the per-step noise (reference LatentDiffusion
        p_sample_loop exposes the same knob, ldm/diffusion/ddpm.py:1745);
        0.0 gives the deterministic posterior-mean trajectory used by the
        composed-ancestral parity oracle."""
        sched = self.schedule
        T = sched.num_timesteps
        rng, init_rng = jax.random.split(rng)
        img = x_T if x_T is not None else jax.random.normal(init_rng, shape)
        b = shape[0]

        def step(carry, t_scalar):
            img, rng = carry
            rng, step_rng = jax.random.split(rng)
            t = jnp.full((b,), t_scalar, dtype=jnp.int32)
            img = self.p_sample(model_fn, img, t, step_rng, cond,
                                temperature=temperature)
            out = img if return_intermediates else None
            return (img, rng), out

        ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
        (img, _), inters = jax.lax.scan(step, (img, rng), ts)
        if return_intermediates:
            return img, inters[::log_every_t]
        return img
