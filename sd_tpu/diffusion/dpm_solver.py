"""DPM-Solver++(2M): second-order multistep ODE sampler.

Beyond-reference capability (the reference ships only ancestral DDPM and
DDIM — DDIM/ddim.py; DDIM is the first-order special case of this solver):
DPM-Solver++ integrates the same probability-flow ODE in log-SNR (λ) space
with a second-order linear multistep rule on the *data prediction* x0(x,t),
reaching DDIM-50 quality in ~10-20 model calls. Fewer UNet calls is the one
lever that beats kernel work for serving throughput — the UNet is >95% of
step cost (BASELINE.md), so 50→15 steps is a >3× pipeline speedup at
matched sample quality.

TPU-first shape: all per-step coefficients (λ gaps, σ ratios, expm1 terms,
multistep ratio r) are precomputed fp64 on host into an [S]-table pytree;
the whole reverse pass is ONE `lax.scan` whose carry holds (x, previous x0)
— the first-step/second-order switch is a branchless `jnp.where` on the
step index, so a single compiled program serves any S.

Reference for the math: Lu et al., "DPM-Solver++" (arXiv:2211.01095),
Algorithm 2 (multistep, data-prediction variant used by every production SD
deployment).
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
class DPMSolverSchedule:
    """Precomputed tables for an S-call DPM-Solver++(2M) reverse pass.

    Index i is scan order (i=0 starts at the noisiest node); the path visits
    S+1 log-SNR nodes — node S is ᾱ at t=0 (the same terminal the DDIM
    tables use, core/schedules.py make_ddim_sampling_parameters).
    """

    timesteps: jax.Array    # int32 [S] — DDPM t fed to the model at step i
    alpha_cur: jax.Array    # sqrt(ᾱ) at node i                [S]
    sigma_cur: jax.Array    # sqrt(1-ᾱ) at node i              [S]
    sigma_ratio: jax.Array  # σ_{i+1}/σ_i                      [S]
    alpha_next: jax.Array   # sqrt(ᾱ) at node i+1              [S]
    em1: jax.Array          # expm1(-h_i), h_i = λ_{i+1}-λ_i    [S]
    r: jax.Array            # h_{i-1}/h_i (r[0] unused)         [S]
    num_steps: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        base: DiffusionSchedule,
        num_steps: int,
        method: str = "uniform",
    ) -> "DPMSolverSchedule":
        abar = np.asarray(base.alphas_cumprod, dtype=np.float64)
        if method == "karras":
            # ρ-spaced σ nodes (core/schedules.py make_karras_timesteps):
            # concentrates the few calls at low noise — the standard pairing
            # with multistep DPM solvers (arXiv:2206.00364 §3).
            ts = make_karras_timesteps(abar, num_steps)
        else:
            ts = make_ddim_timesteps(method, num_steps, base.num_timesteps)
        tsd = ts[::-1].copy()  # descending: noisiest first
        # S+1 nodes: ᾱ along the path, terminating at ᾱ(t=0)
        nodes = np.concatenate([abar[tsd], abar[:1]])
        alpha = np.sqrt(nodes)
        sigma = np.sqrt(1.0 - nodes)
        lam = np.log(alpha) - np.log(sigma)
        h = np.diff(lam)  # [S], positive (λ rises as noise falls)
        r = np.ones_like(h)
        r[1:] = h[:-1] / h[1:]
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            timesteps=jnp.asarray(tsd, dtype=jnp.int32),
            alpha_cur=f32(alpha[:-1]),
            sigma_cur=f32(sigma[:-1]),
            sigma_ratio=f32(sigma[1:] / sigma[:-1]),
            alpha_next=f32(alpha[1:]),
            em1=f32(np.expm1(-h)),
            r=f32(r),
            num_steps=int(len(tsd)),
        )


@dataclasses.dataclass(frozen=True)
class DPMSolverSampler:
    """Stateless DPM-Solver++(2M) sampler over a base DDPM schedule.

    Same surface as DDIMSampler (diffusion/ddim.py). With `sde=False`
    (default) this is the deterministic ODE solver; `sde=True` integrates
    the reverse-time SDE instead with the same exponential integrator and
    second-order data-prediction multistep — "DPM++ 2M SDE", the stochastic
    production sampler (arXiv:2211.01095 SDE variant; the coefficients are
    the sde-dpmsolver++ form: e^{-h} decay on x, (1-e^{-2h}) on the data
    estimate, σ_t·sqrt(1-e^{-2h}) fresh noise per step). Stochastic
    sampling re-injects noise each step, which erases accumulated solver
    error at low step counts and trades reproducibility-of-trajectory for
    sample diversity at fixed x_T.
    """

    schedule: DiffusionSchedule
    parameterization: str = "eps"
    clip_denoised: bool = False
    quantize_fn: Callable[[jax.Array], jax.Array] | None = None
    sde: bool = False

    def make_schedule(self, num_steps: int,
                      method: str = "uniform") -> DPMSolverSchedule:
        return DPMSolverSchedule.create(self.schedule, num_steps, method=method)

    def _pred_x0(self, x32, out32, index, dp) -> jax.Array:
        nd = x32.ndim
        if self.parameterization == "x0":
            x0 = out32
        elif self.parameterization == "v":
            # x0 = α·x − σ·v (core/schedules.py v-coordinate changes)
            a = extract(dp.alpha_cur, index[None], nd)
            s = extract(dp.sigma_cur, index[None], nd)
            x0 = a * x32 - s * out32
        else:
            a = extract(dp.alpha_cur, index[None], nd)
            s = extract(dp.sigma_cur, index[None], nd)
            x0 = (x32 - s * out32) / a
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
        num_steps: int = 15,
        cond: Any = None,
        uncond: Any = None,
        guidance_scale: float = 1.0,
        method: str = "uniform",
        x_T: jax.Array | None = None,
        dp: DPMSolverSchedule | None = None,
        guidance_rescale: float = 0.0,
    ) -> jax.Array:
        """S-call DPM-Solver++(2M) sampling as one scan.

        CFG matches the DDIM sampler: batched [uncond; cond] model call,
        combine on the raw model output (reference CFG form,
        DDIM/ddim.py:171-178), then interpret as ε/x0.
        """
        if dp is None:
            dp = self.make_schedule(num_steps, method=method)
        b = shape[0]
        rng_init, rng_steps = jax.random.split(rng)
        img = x_T if x_T is not None else jax.random.normal(rng_init, shape)

        cond_batched = None
        if uncond is not None and guidance_scale != 1.0:
            cond_batched = jax.tree.map(
                lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond)

        def model_out(x, t):
            if uncond is None or guidance_scale == 1.0:
                return model_fn(x, t, cond)
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
            o_u, o_c = jnp.split(model_fn(x_in, t_in, cond_batched), 2, axis=0)
            return apply_cfg(o_u, o_c, guidance_scale, guidance_rescale)

        def step(carry, index):
            img, prev_x0 = carry
            t = jnp.full((b,), dp.timesteps[index], dtype=jnp.int32)
            out32 = model_out(img, t).astype(jnp.float32)
            x32 = img.astype(jnp.float32)
            x0 = self._pred_x0(x32, out32, index, dp)

            nd = x32.ndim
            rr = extract(dp.r, index[None], nd)
            # 2nd-order multistep correction; first step (index 0) has no
            # history → first-order (DDIM) via the branchless where
            d2 = (1.0 + 1.0 / (2.0 * rr)) * x0 - (1.0 / (2.0 * rr)) * prev_x0
            d = jnp.where(index == 0, x0, d2)

            sr = extract(dp.sigma_ratio, index[None], nd)
            an = extract(dp.alpha_next, index[None], nd)
            em1 = extract(dp.em1, index[None], nd)
            if self.sde:
                # exponential SDE integrator (exact for constant x0):
                #   x_t = (σ_t/σ_s)e^{-h}·x + α_t(1-e^{-2h})·D
                #       + σ_t·sqrt(1-e^{-2h})·ε
                # derived from the stored expm1(-h) table so the small-h
                # regime keeps its fp64-host precision:
                #   e^{-h} = 1+em1,  1-e^{-2h} = -em1·(2+em1)
                exp_mh = 1.0 + em1
                om_e2h = -em1 * (2.0 + em1)
                sig_next = sr * extract(dp.sigma_cur, index[None], nd)
                noise = jax.random.normal(
                    jax.random.fold_in(rng_steps, index), x32.shape)
                img_next = (sr * exp_mh * x32 + an * om_e2h * d
                            + sig_next * jnp.sqrt(om_e2h) * noise)
            else:
                img_next = sr * x32 - an * em1 * d
            return (img_next.astype(img.dtype), x0), None

        init = (img, jnp.zeros(shape, jnp.float32))
        indices = jnp.arange(dp.num_steps, dtype=jnp.int32)
        (img, _), _ = jax.lax.scan(step, init, indices)
        return img
