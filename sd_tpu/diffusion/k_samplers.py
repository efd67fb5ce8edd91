"""k-diffusion sampler family: Euler, Euler-ancestral, Heun.

Beyond-reference capability (the reference ships ancestral DDPM and DDIM —
DDIM/ddim.py): these are the samplers of Karras et al., "Elucidating the
Design Space of Diffusion-Based Generative Models" (arXiv:2206.00364,
Algorithms 1-2), as popularized for SD by k-diffusion — the most widely used
sampler family in production SD frontends. Completing them means a user of
the reference (or of any SD distribution) finds every standard sampler here:
ddpm, ddim, plms/pndm, dpm-solver++(2M), euler, euler_a, heun.

TPU-first shape, same as diffusion/dpm_solver.py: all per-node coefficients
are precomputed fp64 on host into [S(+1)]-tables; the whole reverse pass is
ONE `lax.scan` whose body is branchless (the Heun last-step Euler fallback
is a `jnp.where` on σ_next==0), so one compiled program serves any S.

Math: the probability-flow ODE in Karras' σ-space. With the VP forward
x_t = √ᾱ_t·x0 + √(1-ᾱ_t)·ε, substitute x_k = x_t/√ᾱ_t and
σ(t) = √((1-ᾱ_t)/ᾱ_t):  x_k = x0 + σ·ε, and the ODE becomes
dx_k/dσ = (x_k - x0(x_k, σ))/σ — the exact-integration form Euler/Heun
discretize. The carry lives in k-space; each model call rescales to the
model's x_t convention (x_in = x_k·√ᾱ_t). At the terminal node σ=0 the
k-space state IS x0, already in data scale (same terminal as the DDIM
tables, core/schedules.py make_ddim_sampling_parameters).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import (
    DiffusionSchedule,
    extract,
    make_ddim_timesteps,
    make_karras_timesteps,
)
from sd_tpu.diffusion.guidance import apply_cfg

ModelFn = Callable[[jax.Array, jax.Array, Any], jax.Array]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KSchedule:
    """Precomputed σ-space tables for an S-step Euler/Heun reverse pass.

    Index i is scan order (i=0 noisiest). The path visits S+1 nodes; node S
    is the data terminal σ=0 / t=0 / α=1. `timesteps`/`alpha` carry all S+1
    nodes so Heun's second model call (at node i+1) indexes the same tables.
    """

    timesteps: jax.Array  # int32 [S+1] — DDPM t at node i (t[S]=0)
    sigma: jax.Array      # fp32 [S+1] — k-space σ at node i (σ[S]=0)
    alpha: jax.Array      # fp32 [S+1] — √ᾱ at node i (model-input scale)
    num_steps: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        base: DiffusionSchedule,
        num_steps: int,
        method: str = "uniform",
    ) -> "KSchedule":
        abar = np.asarray(base.alphas_cumprod, dtype=np.float64)
        if method == "karras":
            ts = make_karras_timesteps(abar, num_steps)
        else:
            ts = make_ddim_timesteps(method, num_steps, base.num_timesteps)
        tsd = ts[::-1].copy()  # descending, noisiest first
        nodes = abar[tsd]
        # terminal node: σ=0 exactly (NOT ᾱ[0] — Euler's last step then
        # lands on x0 itself, matching the DDIM terminal convention)
        alpha = np.concatenate([np.sqrt(nodes), [1.0]])
        sigma = np.concatenate([np.sqrt((1.0 - nodes) / nodes), [0.0]])
        t_nodes = np.concatenate([tsd, [0]])
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            timesteps=jnp.asarray(t_nodes, dtype=jnp.int32),
            sigma=f32(sigma),
            alpha=f32(alpha),
            num_steps=int(len(tsd)),
        )


@dataclasses.dataclass(frozen=True)
class KDiffusionSampler:
    """Stateless Euler / Euler-ancestral / Heun sampler over a base DDPM
    schedule. Same surface as DDIMSampler/DPMSolverSampler (diffusion/
    {ddim,dpm_solver}.py); `order` selects the rule:

    * "euler"   — Algorithm 1 deterministic Euler, S model calls.
    * "heun"    — Algorithm 2 second-order (trapezoidal correction),
                  2S model calls (the last step's correction is discarded
                  branchlessly — σ_next=0 forces the Euler fallback).
    * "euler_a" — Euler-ancestral: the Euler step to σ_down plus fresh
                  noise at σ_up per step (k-diffusion's split that keeps
                  the marginal variance exact); stochastic, uses `rng`.
    """

    schedule: DiffusionSchedule
    order: str = "euler"
    parameterization: str = "eps"
    clip_denoised: bool = False
    quantize_fn: Callable[[jax.Array], jax.Array] | None = None

    def make_schedule(self, num_steps: int,
                      method: str = "uniform") -> KSchedule:
        return KSchedule.create(self.schedule, num_steps, method=method)

    def _pred_x0(self, xk32, out32, index, ks) -> jax.Array:
        """Model output at node `index` → x0, in k-space coordinates."""
        nd = xk32.ndim
        a = extract(ks.alpha, index[None], nd)
        s = extract(ks.sigma, index[None], nd)
        if self.parameterization == "x0":
            x0 = out32
        elif self.parameterization == "v":
            # x0 = √ᾱ·x_t − √(1-ᾱ)·v with x_t = α·x_k and √(1-ᾱ) = α·σ
            x0 = a * (a * xk32) - (a * s) * out32
        else:
            x0 = xk32 - s * out32
        if self.clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        if self.quantize_fn is not None:
            x0 = self.quantize_fn(x0).astype(x0.dtype)
        return x0

    def sample(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        shape: tuple[int, ...],
        num_steps: int = 30,
        cond: Any = None,
        uncond: Any = None,
        guidance_scale: float = 1.0,
        method: str = "uniform",
        x_T: jax.Array | None = None,
        ks: KSchedule | None = None,
        guidance_rescale: float = 0.0,
    ) -> jax.Array:
        """S-node Euler/Heun/Euler-a sampling as one scan.

        `x_T` follows the VP convention of the other samplers (standard
        normal at t_max); it is lifted to k-space internally. CFG matches
        the DDIM sampler: batched [uncond; cond] model call, combine on the
        raw model output (reference CFG form, DDIM/ddim.py:171-178).
        """
        if ks is None:
            ks = self.make_schedule(num_steps, method=method)
        b = shape[0]
        noise_rng, init_rng = jax.random.split(rng)
        x_t = x_T if x_T is not None else jax.random.normal(init_rng, shape)
        # lift to k-space: x_k = x_t / √ᾱ(t_max)
        xk = x_t.astype(jnp.float32) / ks.alpha[0]

        cond_batched = None
        if uncond is not None and guidance_scale != 1.0:
            cond_batched = jax.tree.map(
                lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond)

        def model_out(xk32, index):
            """Model call at node `index` on a k-space state."""
            nd = xk32.ndim
            a = extract(ks.alpha, index[None], nd)
            x_in = (a * xk32).astype(
                x_t.dtype if x_T is not None else jnp.float32)
            t = jnp.full((b,), ks.timesteps[index], dtype=jnp.int32)
            if uncond is None or guidance_scale == 1.0:
                out = model_fn(x_in, t, cond)
            else:
                x2 = jnp.concatenate([x_in, x_in], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                o_u, o_c = jnp.split(model_fn(x2, t2, cond_batched), 2,
                                     axis=0)
                out = apply_cfg(o_u, o_c, guidance_scale, guidance_rescale)
            return out.astype(jnp.float32)

        eps_div = 1e-12

        def deriv(xk32, index):
            """dx/dσ = (x − x0)/σ at node `index`."""
            x0 = self._pred_x0(xk32, model_out(xk32, index), index, ks)
            nd = xk32.ndim
            s = extract(ks.sigma, index[None], nd)
            return (xk32 - x0) / jnp.maximum(s, eps_div)

        def euler_step(xk32, index):
            nd = xk32.ndim
            s_cur = extract(ks.sigma, index[None], nd)
            s_next = extract(ks.sigma, (index + 1)[None], nd)
            d = deriv(xk32, index)
            return xk32 + (s_next - s_cur) * d, d, s_cur, s_next

        if self.order == "heun":

            def step(xk32, index):
                x_e, d, s_cur, s_next = euler_step(xk32, index)
                # 2nd-order correction at node i+1; at the terminal node
                # σ_next=0 the model is still called (t=0 is valid) but the
                # where() discards the correction → plain Euler last step
                d2 = deriv(x_e, index + 1)
                x_h = xk32 + (s_next - s_cur) * 0.5 * (d + d2)
                return jnp.where(s_next > 0, x_h, x_e), None

        elif self.order == "euler_a":

            def step(xk32, index):
                nd = xk32.ndim
                s_cur = extract(ks.sigma, index[None], nd)
                s_next = extract(ks.sigma, (index + 1)[None], nd)
                # k-diffusion's ancestral split: exact for Gaussian
                # transitions — Var(σ_down·ODE-dir) + σ_up² = σ_next²
                var_up = (s_next**2 * (s_cur**2 - s_next**2)
                          / jnp.maximum(s_cur**2, eps_div))
                s_up = jnp.sqrt(jnp.maximum(var_up, 0.0))
                s_down = jnp.sqrt(jnp.maximum(s_next**2 - s_up**2, 0.0))
                d = deriv(xk32, index)
                x = xk32 + (s_down - s_cur) * d
                z = jax.random.normal(jax.random.fold_in(noise_rng, index),
                                      xk32.shape, jnp.float32)
                return x + s_up * z, None

        else:  # euler

            def step(xk32, index):
                x_e, *_ = euler_step(xk32, index)
                return x_e, None

        def body(carry, index):
            return step(carry, index)

        indices = jnp.arange(ks.num_steps, dtype=jnp.int32)
        xk, _ = jax.lax.scan(body, xk, indices)
        # terminal node is σ=0: k-space state == x0 == data-scale x
        return xk.astype(x_t.dtype)
