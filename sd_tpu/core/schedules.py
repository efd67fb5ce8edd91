"""Diffusion noise schedules and DDIM sub-schedule math.

Capability parity with the reference's schedule utilities
(reference: DDIM/diffusion_modules.py:21-99, DDPM/ddpm.py:17-28,
ldm/diffusion/ddpm.py:176-243), built as pure NumPy/JAX table constructors.

All tables are computed once in float64 on host (schedule precision matters for
long-T products) and stored as float32 device arrays inside frozen dataclasses
that are registered as JAX pytrees, so a whole schedule can be closed over by a
jitted `lax.scan` sampler with zero host↔device traffic per step.

Where the reference code diverges from the papers we implement the
paper-correct math; divergences are recorded in COMPAT.md.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# beta schedules (reference: DDIM/diffusion_modules.py:21-43)
# ---------------------------------------------------------------------------


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Return float64 betas[T] for the named schedule.

    Schedules: "linear" (sqrt-space interpolation, the SD-v1 default),
    "cosine" (Nichol & Dhariwal), "sqrt_linear" (plain linear), "sqrt".
    """
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        steps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(steps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"unknown beta schedule {schedule!r}")
    return betas


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the terminal SNR is exactly zero
    (Lin et al., arXiv:2305.08891 Algorithm 1 — beyond-reference).

    Standard schedules leave ᾱ_T > 0, so the model never sees pure noise in
    training yet sampling starts from pure noise — the cause of the
    medium-brightness bias. Shifts/scales sqrt(ᾱ) so sqrt(ᾱ_T)=0, keeping
    sqrt(ᾱ_1) fixed. REQUIRES v-prediction (or x0): the ε-parameterization
    is undefined at ᾱ=0 (DiffusionSchedule.create enforces this).
    """
    betas = np.asarray(betas, dtype=np.float64)
    abar_sqrt = np.sqrt(np.cumprod(1.0 - betas))
    s_0, s_T = abar_sqrt[0], abar_sqrt[-1]
    abar_sqrt = (abar_sqrt - s_T) * s_0 / (s_0 - s_T)
    abar = abar_sqrt**2
    alphas = np.concatenate([abar[:1], abar[1:] / abar[:-1]])
    return 1.0 - alphas


def betas_for_alpha_bar(
    num_diffusion_timesteps: int,
    alpha_bar: Callable[[float], float],
    max_beta: float = 0.999,
) -> np.ndarray:
    """Discretize a continuous alpha-bar function into betas
    (reference: DDIM/diffusion_modules.py:77-93)."""
    t = np.arange(num_diffusion_timesteps, dtype=np.float64)
    t1 = t / num_diffusion_timesteps
    t2 = (t + 1) / num_diffusion_timesteps
    ab = np.vectorize(alpha_bar)
    return np.minimum(1.0 - ab(t2) / ab(t1), max_beta)


# ---------------------------------------------------------------------------
# DDIM timestep striding + sigma tables (reference: DDIM/diffusion_modules.py:46-74)
# ---------------------------------------------------------------------------


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """Strided DDPM timesteps for a DDIM sub-schedule (int64, ascending).

    'uniform': range(0, T, T//S) + 1; 'quad': quadratic spacing over [0, 0.8T].
    The +1 shift matches the reference so the final step scales to data.
    """
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.arange(0, num_ddpm_timesteps, c)
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, math.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    elif ddim_discr_method == "trailing":
        # arXiv:2305.08891 §2.2 (beyond-reference): include the FINAL step
        # t=T-1 so sampling truly starts at the schedule's terminal noise
        # level; "uniform"/"quad" (the reference lineage's "leading"
        # spacing) stop T/S short of it. Pairs with zero-terminal-SNR.
        ts = np.round(
            np.arange(num_ddpm_timesteps, 0,
                      -num_ddpm_timesteps / num_ddim_timesteps)
        ).astype(int) - 1
        return np.unique(ts)  # ascending; no +1 shift — t=0 is the data end
    else:
        raise NotImplementedError(f"unknown ddim discretization {ddim_discr_method!r}")
    return ddim_timesteps + 1


def make_karras_timesteps(
    alphas_cumprod: np.ndarray, num_timesteps: int, rho: float = 7.0
) -> np.ndarray:
    """Karras ρ-spaced timesteps (arXiv:2206.00364 eq.5) on the discrete
    DDPM lattice (int64, ascending, strictly increasing).

    Beyond-reference striding (the reference ships only uniform/quad,
    DDIM/diffusion_modules.py:46-60): space the sub-schedule evenly in
    σ^(1/ρ) where σ(t) = sqrt((1-ᾱ_t)/ᾱ_t) is the VP noise scale, which
    concentrates model calls at low noise where few-step samplers lose the
    most detail. Each continuous σ target maps to the nearest discrete t;
    collisions (only possible at the dense low-t end when S approaches T)
    are pushed up to keep the schedule strictly increasing.
    """
    abar = np.asarray(alphas_cumprod, dtype=np.float64)
    sig = np.sqrt((1.0 - abar) / abar)  # monotone increasing in t
    # mirror the +1 shift of make_ddim_timesteps: the lowest node sits at
    # t=1 so the final update scales toward data, not the t=0 fixed point
    s_min, s_max = sig[1], sig[-1]
    i = np.arange(num_timesteps, dtype=np.float64)
    frac = i / max(num_timesteps - 1, 1)
    sigmas = (
        s_max ** (1.0 / rho) + frac * (s_min ** (1.0 / rho) - s_max ** (1.0 / rho))
    ) ** rho  # descending: s_max → s_min
    ts = np.abs(sig[None, :] - sigmas[:, None]).argmin(axis=1)
    ts = np.sort(ts)
    ts = np.maximum(ts, 1)
    for k in range(1, len(ts)):
        if ts[k] <= ts[k - 1]:
            ts[k] = ts[k - 1] + 1
    if ts[-1] >= len(abar):
        raise ValueError(
            f"karras striding needs num_timesteps ({num_timesteps}) well below "
            f"the DDPM T ({len(abar)})"
        )
    return ts


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sigmas, alphas, alphas_prev) for the DDIM update rule (eq.16 of
    arXiv:2010.02502). alphas here are cumulative-product alpha-bars."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.concatenate([alphacums[:1], alphacums[ddim_timesteps[:-1]]])
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return sigmas, alphas, alphas_prev


# ---------------------------------------------------------------------------
# gather helper (reference: DDIM/diffusion_modules.py:96-99)
# ---------------------------------------------------------------------------


def extract(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """table[t] reshaped to [B, 1, 1, ...] with `ndim` dims for broadcasting."""
    out = jnp.take(table, t, axis=-1)
    return out.reshape(out.shape + (1,) * (ndim - 1)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Full DDPM schedule (reference: ldm/diffusion/ddpm.py:176-243 register_schedule)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All precomputed per-timestep tables for a DDPM process, as one pytree.

    Includes q(x_t|x_0) coefficients, the posterior q(x_{t-1}|x_t,x_0)
    coefficients, and VLB weights; everything a trainer or ancestral sampler
    needs lives on device in this object.
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    lvlb_weights: jax.Array
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))
    v_posterior: float = dataclasses.field(metadata=dict(static=True), default=0.0)

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        given_betas: np.ndarray | None = None,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
        l_simple_weight: float = 1.0,
        zero_terminal_snr: bool = False,
    ) -> "DiffusionSchedule":
        if given_betas is not None:
            betas = np.asarray(given_betas, dtype=np.float64)
        else:
            betas = make_beta_schedule(
                beta_schedule, timesteps, linear_start, linear_end, cosine_s
            )
        if zero_terminal_snr:
            # arXiv:2305.08891 Algorithm 1; ᾱ_T becomes exactly 0, so the
            # ε-parameterization (x0 = (x−σε)/√ᾱ) is undefined at t=T-1
            if parameterization == "eps":
                raise ValueError(
                    "zero_terminal_snr requires parameterization='v' (or "
                    "'x0'); eps is undefined at the zero-SNR terminal step")
            betas = rescale_zero_terminal_snr(betas)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        T = betas.shape[0]

        posterior_variance = (1 - v_posterior) * betas * (
            1.0 - alphas_cumprod_prev
        ) / (1.0 - alphas_cumprod) + v_posterior * betas
        posterior_log_variance_clipped = np.log(np.maximum(posterior_variance, 1e-20))
        posterior_mean_coef1 = (
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        # paper-correct coef2 (Ho et al. eq.7); the reference has a paren bug
        # at ldm/diffusion/ddpm.py:226 — see COMPAT.md.
        posterior_mean_coef2 = (
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        )

        if parameterization == "eps":
            with np.errstate(divide="ignore"):
                lvlb_weights = betas**2 / (
                    2 * posterior_variance * alphas * (1 - alphas_cumprod)
                )
            # t=0 term is singular; the reference copies lvlb_weights[1].
            lvlb_weights[0] = lvlb_weights[1]
        elif parameterization == "x0":
            lvlb_weights = (
                0.5 * np.sqrt(alphas_cumprod) / (2.0 * (1 - alphas_cumprod))
            )
        elif parameterization == "v":
            # v-prediction (Salimans & Ho, arXiv:2202.00512): the v-space MSE
            # is already SNR+1-weighted, so the VLB reweighting is identity
            # (the convention the SD 2.x lineage uses for this mode).
            lvlb_weights = np.ones_like(betas)
        else:
            raise ValueError(f"unknown parameterization {parameterization!r}")
        assert not np.isnan(lvlb_weights).any()

        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        with np.errstate(divide="ignore"):
            # inf at a zero-SNR terminal step — those tables belong to the
            # ε-parameterization, which the zero_terminal_snr guard excludes
            sqrt_recip = np.sqrt(1.0 / alphas_cumprod)
            sqrt_recipm1 = np.sqrt(1.0 / alphas_cumprod - 1.0)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(sqrt_recip),
            sqrt_recipm1_alphas_cumprod=f32(sqrt_recipm1),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
            posterior_mean_coef1=f32(posterior_mean_coef1),
            posterior_mean_coef2=f32(posterior_mean_coef2),
            lvlb_weights=f32(lvlb_weights),
            num_timesteps=T,
            v_posterior=v_posterior,
        )

    # -- q process -----------------------------------------------------------

    def q_sample(self, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """Forward diffusion q(x_t | x_0) (DDPM eq.4/14)."""
        nd = x_start.ndim
        return (
            extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        ).astype(x_start.dtype)

    def q_mean_variance(self, x_start, t):
        nd = x_start.ndim
        mean = extract(self.sqrt_alphas_cumprod, t, nd) * x_start
        variance = extract(1.0 - self.alphas_cumprod, t, nd)
        log_variance = extract(self.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def predict_start_from_noise(self, x_t, t, noise):
        nd = x_t.ndim
        return (
            extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )

    def predict_eps_from_start(self, x_t, t, x0):
        nd = x_t.ndim
        return (
            extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
        ) / extract(self.sqrt_recipm1_alphas_cumprod, t, nd)

    # v-prediction coordinate changes (Salimans & Ho, arXiv:2202.00512 §2.4;
    # beyond-reference: the reference supports eps/x0 only). With
    # α=sqrt(ᾱ_t), σ=sqrt(1-ᾱ_t) and x_t = α·x0 + σ·ε, define v = α·ε − σ·x0;
    # then x0 = α·x_t − σ·v and ε = σ·x_t + α·v.

    def get_v(self, x_start, noise, t):
        """Training target for parameterization="v"."""
        nd = x_start.ndim
        return (
            extract(self.sqrt_alphas_cumprod, t, nd) * noise
            - extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
        )

    def predict_start_from_v(self, x_t, t, v):
        nd = x_t.ndim
        return (
            extract(self.sqrt_alphas_cumprod, t, nd) * x_t
            - extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * v
        )

    def predict_eps_from_v(self, x_t, t, v):
        nd = x_t.ndim
        return (
            extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * x_t
            + extract(self.sqrt_alphas_cumprod, t, nd) * v
        )

    def q_posterior(self, x_start, x_t, t):
        """Mean/variance of q(x_{t-1} | x_t, x_0) (DDPM eq.6/7)."""
        nd = x_t.ndim
        mean = (
            extract(self.posterior_mean_coef1, t, nd) * x_start
            + extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        variance = extract(self.posterior_variance, t, nd)
        log_variance = extract(self.posterior_log_variance_clipped, t, nd)
        return mean, variance, log_variance


# ---------------------------------------------------------------------------
# DDIM sub-schedule pytree
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Precomputed tables for an S-step DDIM reverse pass, scan-ready.

    `timesteps` are the DDPM t values fed to the model, index 0 = earliest
    (closest to data). The sampler scans indices S-1 .. 0.
    """

    timesteps: jax.Array          # int32 [S]
    alphas: jax.Array             # alpha-bar at each step   [S]
    alphas_prev: jax.Array        # alpha-bar of prev step   [S]
    sqrt_one_minus_alphas: jax.Array  # [S]
    sigmas: jax.Array             # [S]
    num_steps: int = dataclasses.field(metadata=dict(static=True))
    eta: float = dataclasses.field(metadata=dict(static=True), default=0.0)

    @classmethod
    def create(
        cls,
        base: DiffusionSchedule,
        num_steps: int,
        eta: float = 0.0,
        method: str = "uniform",
    ) -> "DDIMSchedule":
        alphacums = np.asarray(base.alphas_cumprod, dtype=np.float64)
        if method == "karras":
            ts = make_karras_timesteps(alphacums, num_steps)
        else:
            ts = make_ddim_timesteps(method, num_steps, base.num_timesteps)
        sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(alphacums, ts, eta)
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            alphas=f32(alphas),
            alphas_prev=f32(alphas_prev),
            sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
            sigmas=f32(sigmas),
            num_steps=int(ts.shape[0]),
            eta=float(eta),
        )
