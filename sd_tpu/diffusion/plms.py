"""PLMS / PNDM sampler: 4th-order pseudo linear multistep on the ε-prediction.

Beyond-reference capability (the reference ships ancestral DDPM and DDIM only
— DDIM/ddim.py; PLMS is the sampler the CompVis stable-diffusion lineage the
reference descends from shipped alongside DDIM): Liu et al., "Pseudo Numerical
Methods for Diffusion Models" (arXiv:2202.09778) replace the per-step ε with
an Adams–Bashforth linear combination of the last ≤4 ε-evaluations, then apply
the standard DDIM(η=0) transfer — second- to fourth-order accuracy at one
model call per step.

TPU-first shape: the whole reverse pass is ONE `lax.scan`; the carry holds
(x, ε-history[4]) and the warm-up order selection (1→2→3→4 over the first
four steps) is a branchless gather from a static [4,4] coefficient matrix, so
a single compiled program serves any step count.

Divergence from the torch lineage (recorded in COMPAT.md): CompVis PLMS primes
the history with a 2-model-call pseudo improved-Euler on the first step; we
use the PNDM lower-order warm-up (1st/2nd/3rd-order Adams–Bashforth for steps
0/1/2) instead, which keeps the scan body uniform (exactly one model call per
step). The two differ only in the first three updates and converge to the
same trajectory.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import DDIMSchedule, DiffusionSchedule, extract
from sd_tpu.diffusion.guidance import apply_cfg

ModelFn = Callable[[jax.Array, jax.Array, Any], jax.Array]

# Adams–Bashforth coefficients, newest ε first; row k = order k+1
# (arXiv:2202.09778 eqs. 22-25).
_AB_COEFFS = (
    (1.0, 0.0, 0.0, 0.0),
    (3.0 / 2.0, -1.0 / 2.0, 0.0, 0.0),
    (23.0 / 12.0, -16.0 / 12.0, 5.0 / 12.0, 0.0),
    (55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0),
)


@dataclasses.dataclass(frozen=True)
class PLMSSampler:
    """Stateless PLMS sampler over a base DDPM schedule.

    Same surface as DDIMSampler (diffusion/ddim.py) minus the stochastic
    knobs — PLMS is defined on the η=0 (deterministic) transfer.
    """

    schedule: DiffusionSchedule
    parameterization: str = "eps"          # "eps" | "x0" | "v"
    clip_denoised: bool = False
    quantize_fn: Callable[[jax.Array], jax.Array] | None = None

    def make_schedule(self, num_steps: int,
                      method: str = "uniform") -> DDIMSchedule:
        return DDIMSchedule.create(self.schedule, num_steps, eta=0.0,
                                   method=method)

    def sample(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        shape: tuple[int, ...],
        num_steps: int = 50,
        cond: Any = None,
        uncond: Any = None,
        guidance_scale: float = 1.0,
        method: str = "uniform",
        x_T: jax.Array | None = None,
        dd: DDIMSchedule | None = None,
        guidance_rescale: float = 0.0,
    ) -> jax.Array:
        """S-step PLMS sampling as one scan.

        CFG matches the DDIM sampler (reference CFG form DDIM/ddim.py:171-178):
        batched [uncond; cond] model call, combined on the raw output before
        the ε-coordinate conversion.
        """
        if dd is None:
            dd = self.make_schedule(num_steps, method=method)
        b = shape[0]
        img = x_T if x_T is not None else jax.random.normal(rng, shape)

        cond_batched = None
        if uncond is not None and guidance_scale != 1.0:
            cond_batched = jax.tree.map(
                lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond)

        def model_eps(x, t):
            if uncond is None or guidance_scale == 1.0:
                out = model_fn(x, t, cond)
            else:
                x_in = jnp.concatenate([x, x], axis=0)
                t_in = jnp.concatenate([t, t], axis=0)
                o_u, o_c = jnp.split(model_fn(x_in, t_in, cond_batched),
                                     2, axis=0)
                out = apply_cfg(o_u, o_c, guidance_scale, guidance_rescale)
            if self.parameterization == "x0":
                out = self.schedule.predict_eps_from_start(x, t, out)
            elif self.parameterization == "v":
                out = self.schedule.predict_eps_from_v(x, t, out)
            return out.astype(jnp.float32)

        coeffs = jnp.asarray(_AB_COEFFS, dtype=jnp.float32)  # [4, 4]

        def transfer(x32, e_prime, index):
            """DDIM(η=0) update using the multistep ε (reference update form:
            DDIM/ddim.py:194-203 with σ=0)."""
            nd = x32.ndim
            a_t = extract(dd.alphas, index[None], nd)
            a_prev = extract(dd.alphas_prev, index[None], nd)
            sqrt_1m_at = extract(dd.sqrt_one_minus_alphas, index[None], nd)
            pred_x0 = (x32 - sqrt_1m_at * e_prime) / jnp.sqrt(a_t)
            if self.clip_denoised:
                pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
            if self.quantize_fn is not None:
                pred_x0 = self.quantize_fn(pred_x0).astype(pred_x0.dtype)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * e_prime
            return jnp.sqrt(a_prev) * pred_x0 + dir_xt

        def step(carry, scan_i):
            img, hist = carry                      # hist: [4, B, ...] newest first
            index = dd.num_steps - 1 - scan_i      # DDIM table index, descending
            t = jnp.full((b,), dd.timesteps[index], dtype=jnp.int32)
            e_t = model_eps(img, t)
            hist = jnp.concatenate([e_t[None], hist[:-1]], axis=0)
            order = jnp.minimum(scan_i, 3)         # warm-up: 1st→4th order
            w = jnp.take(coeffs, order, axis=0)    # [4]
            e_prime = jnp.tensordot(w, hist, axes=1)
            img = transfer(img.astype(jnp.float32), e_prime, index)
            return (img.astype(hist.dtype), hist), None

        hist0 = jnp.zeros((4,) + shape, dtype=jnp.float32)
        scan_is = jnp.arange(dd.num_steps, dtype=jnp.int32)
        (img, _), _ = jax.lax.scan(step, (img.astype(jnp.float32), hist0),
                                   scan_is)
        return img
