"""UniPC: unified predictor-corrector ODE sampler (order 2, bh1/bh2).

Beyond-reference capability (the reference ships ancestral DDPM and DDIM
only — DDIM/ddim.py): UniPC (Zhao et al., arXiv:2302.04867) integrates the
probability-flow ODE in log-SNR space like DPM-Solver++(2M)
(diffusion/dpm_solver.py) but adds a *corrector* that re-uses each step's
single model call to refine the previous transition before predicting the
next one — order p+1 accuracy from the same p-order history, i.e. better
quality at the same number of UNet calls. This is the default sampler in
several production SD stacks at 5-10 steps.

TPU-first shape: identical to the other samplers here — every per-transition
coefficient (φ₁ = expm1(-h), B(h), the UniC ρ-coefficients from the 2×2
solve, multistep ratios) is precomputed fp64 on host into [S]-tables, and
the whole reverse pass is ONE `lax.scan` whose carry holds
(x, last_x, m_prev, m_prev2). First-step / order-ramp / final-step-order-1
switches are branchless `jnp.where` on the step index, so a single compiled
program serves any S.

Math follows the multistep data-prediction variant (UniPC-2, B(h)=expm1(h)
"bh2" by default) as deployed in production schedulers: the predictor uses
ρ_p = 1/2 (the small-h limit), the corrector solves the exact 2×2 system
[[1,1],[r₀,1]]ρ = [b₁,b₂] on host.
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
class UniPCSchedule:
    """Precomputed tables for an S-call UniPC-2 reverse pass.

    Transition i moves node i → i+1 along S+1 log-SNR nodes (node S is ᾱ at
    t=0, the same terminal as the DDIM/DPM tables). Corrector tables at
    index i carry the coefficients for *re-correcting transition i* when the
    next step's model output arrives.
    """

    timesteps: jax.Array    # int32 [S] — DDPM t fed to the model at step i
    alpha_cur: jax.Array    # sqrt(ᾱ) at node i                 [S]
    sigma_cur: jax.Array    # sqrt(1-ᾱ) at node i               [S]
    sigma_ratio: jax.Array  # σ_{i+1}/σ_i                       [S]
    alpha_next: jax.Array   # sqrt(ᾱ) at node i+1               [S]
    phi1: jax.Array         # expm1(-h_i)                        [S]
    bh: jax.Array           # B(h): expm1(-h) (bh2) or -h (bh1)  [S]
    r0: jax.Array           # (λ_{i-1}-λ_i)/h_i, <0 (r0[0]:=1)   [S]
    rho_p: jax.Array        # predictor D1 weight (0 at edges)   [S]
    rho_c0: jax.Array       # corrector weight on history D1     [S]
    rho_c1: jax.Array       # corrector weight on D1_t           [S]
    num_steps: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        base: DiffusionSchedule,
        num_steps: int,
        method: str = "uniform",
        variant: str = "bh2",
    ) -> "UniPCSchedule":
        abar = np.asarray(base.alphas_cumprod, dtype=np.float64)
        if method == "karras":
            ts = make_karras_timesteps(abar, num_steps)
        else:
            ts = make_ddim_timesteps(method, num_steps, base.num_timesteps)
        tsd = ts[::-1].copy()  # descending: noisiest first
        nodes = np.concatenate([abar[tsd], abar[:1]])
        alpha = np.sqrt(nodes)
        sigma = np.sqrt(1.0 - nodes)
        lam = np.log(alpha) - np.log(sigma)
        h = np.diff(lam)            # [S] > 0
        hh = -h                     # data-prediction sign convention
        phi1 = np.expm1(hh)
        if variant == "bh1":
            bh = hh
        elif variant == "bh2":
            bh = np.expm1(hh)
        else:
            raise ValueError(f"unknown UniPC variant: {variant!r}")
        # UniC system right-hand side: b_k = k!·(φ_{k+1-ish} terms)/B(h)
        b1 = (phi1 / hh - 1.0) / bh
        b2 = ((phi1 / hh - 1.0) / hh - 0.5) * 2.0 / bh

        S = len(tsd)
        r0 = np.ones(S)
        if S > 1:
            r0[1:] = (lam[:-1][:-1] - lam[1:-1]) / h[1:]  # (λ_{i-1}-λ_i)/h_i

        # Predictor order per transition: 2 when history exists AND it is
        # not the final transition (production order-ramp: this_order =
        # min(solver_order, S - i), warmup min(·, i+1)); ρ_p = 1/2 for
        # order 2, 0 drops the D1 term for order 1.
        order2 = np.zeros(S, bool)
        if S > 2:
            order2[1:S - 1] = True
        rho_p = np.where(order2, 0.5, 0.0)

        # Corrector coefficients for transition i = those of the order used
        # by transition i's predictor. Order 1: ρ = [0, 1/2]; order 2:
        # solve [[1,1],[r0,1]]ρ = [b1,b2].
        denom = np.where(order2, 1.0 - r0, 1.0)
        rho_c0 = np.where(order2, (b1 - b2) / denom, 0.0)
        rho_c1 = np.where(order2, (b2 - r0 * b1) / denom, 0.5)

        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            timesteps=jnp.asarray(tsd, dtype=jnp.int32),
            alpha_cur=f32(alpha[:-1]),
            sigma_cur=f32(sigma[:-1]),
            sigma_ratio=f32(sigma[1:] / sigma[:-1]),
            alpha_next=f32(alpha[1:]),
            phi1=f32(phi1),
            bh=f32(bh),
            r0=f32(r0),
            rho_p=f32(rho_p),
            rho_c0=f32(rho_c0),
            rho_c1=f32(rho_c1),
            num_steps=int(S),
        )


@dataclasses.dataclass(frozen=True)
class UniPCSampler:
    """Stateless UniPC-2 sampler over a base DDPM schedule.

    Same surface as DPMSolverSampler (diffusion/dpm_solver.py);
    `use_corrector=False` degrades to the pure predictor (UniP).
    """

    schedule: DiffusionSchedule
    parameterization: str = "eps"
    clip_denoised: bool = False
    quantize_fn: Callable[[jax.Array], jax.Array] | None = None
    variant: str = "bh2"
    use_corrector: bool = True

    def make_schedule(self, num_steps: int,
                      method: str = "uniform") -> UniPCSchedule:
        return UniPCSchedule.create(self.schedule, num_steps, method=method,
                                    variant=self.variant)

    def _pred_x0(self, x32, out32, index, up) -> jax.Array:
        nd = x32.ndim
        if self.parameterization == "x0":
            x0 = out32
        elif self.parameterization == "v":
            a = extract(up.alpha_cur, index[None], nd)
            s = extract(up.sigma_cur, index[None], nd)
            x0 = a * x32 - s * out32
        else:
            a = extract(up.alpha_cur, index[None], nd)
            s = extract(up.sigma_cur, index[None], nd)
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
        num_steps: int = 10,
        cond: Any = None,
        uncond: Any = None,
        guidance_scale: float = 1.0,
        method: str = "uniform",
        x_T: jax.Array | None = None,
        up: UniPCSchedule | None = None,
        guidance_rescale: float = 0.0,
    ) -> jax.Array:
        """S-call UniPC sampling as one scan.

        Per step i: one model call at node i → (a) correct the PREVIOUS
        transition with this fresh information (UniC), (b) predict node i+1
        from the corrected state (UniP). CFG matches the DDIM sampler
        (reference form, DDIM/ddim.py:171-178).
        """
        if up is None:
            up = self.make_schedule(num_steps, method=method)
        b = shape[0]
        img = x_T if x_T is not None else jax.random.normal(rng, shape)

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
            img, last_x, m_prev, m_prev2 = carry
            t = jnp.full((b,), up.timesteps[index], dtype=jnp.int32)
            out32 = model_out(img, t).astype(jnp.float32)
            x32 = img.astype(jnp.float32)
            m = self._pred_x0(x32, out32, index, up)
            nd = x32.ndim

            if self.use_corrector:
                # UniC: redo transition j = i-1 from last_x using m as the
                # corrector sample. All j-tables are gathered at i-1
                # (clamped; the i==0 case is masked out by the where).
                j = jnp.maximum(index - 1, 0)
                sr_j = extract(up.sigma_ratio, j[None], nd)
                an_j = extract(up.alpha_next, j[None], nd)
                p1_j = extract(up.phi1, j[None], nd)
                bh_j = extract(up.bh, j[None], nd)
                r0_j = extract(up.r0, j[None], nd)
                c0_j = extract(up.rho_c0, j[None], nd)
                c1_j = extract(up.rho_c1, j[None], nd)
                d1_hist = (m_prev2 - m_prev) / r0_j   # masked by c0[0]=0
                d1_t = m - m_prev
                corrected = (sr_j * last_x - an_j * p1_j * m_prev
                             - an_j * bh_j * (c0_j * d1_hist + c1_j * d1_t))
                x_work = jnp.where(index == 0, x32, corrected)
            else:
                x_work = x32

            # UniP: transition i from the corrected state.
            sr = extract(up.sigma_ratio, index[None], nd)
            an = extract(up.alpha_next, index[None], nd)
            p1 = extract(up.phi1, index[None], nd)
            bh = extract(up.bh, index[None], nd)
            r0 = extract(up.r0, index[None], nd)
            rp = extract(up.rho_p, index[None], nd)
            d1 = (m_prev - m) / r0                    # masked by rho_p[0]=0
            img_next = sr * x_work - an * p1 * m - an * bh * rp * d1
            return (img_next.astype(img.dtype), x_work, m, m_prev), None

        zeros = jnp.zeros(shape, jnp.float32)
        init = (img, zeros, zeros, zeros)
        indices = jnp.arange(up.num_steps, dtype=jnp.int32)
        (img, _, _, _), _ = jax.lax.scan(step, init, indices)
        return img
