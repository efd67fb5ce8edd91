"""Latent consistency distillation: few-step sampling distilled from a
trained diffusion teacher (beyond-reference — the reference serves only
iterative samplers, DDIM/ddim.py:56-163; its cheapest path is ~50 model
calls. Consistency distillation (Song et al. arXiv:2303.01469; LCM, Luo et
al. arXiv:2310.04378) trains a student whose single forward maps any point
of the probability-flow ODE trajectory straight to its endpoint, giving
1-4-step generation).

Design (TPU-first):
  * the consistency function f(z, t) = c_skip(t)·z + c_out(t)·x̂0_θ(z, t)
    wraps the SAME UNet architecture as the teacher (student initialized
    from teacher weights) — no new modules, the boundary scalings live
    outside the network;
  * training pairs (t_hi → t_lo) ride a static boundary grid; the teacher's
    one DDIM step and both student/target forwards are a single jitted
    graph, with the target network = the TrainState's own EMA shadow
    (decay ~0.95) — no extra state container;
  * multistep consistency sampling is one `lax.scan` over the chosen
    boundary subset (predict x0, re-noise to the next boundary).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.schedules import DiffusionSchedule, extract
from sd_tpu.diffusion.guidance import apply_cfg

ModelFn = Callable[[jax.Array, jax.Array, Any], jax.Array]


# ---------------------------------------------------------------------------
# boundary scalings (Song et al. §3 adapted to discrete timesteps; the LCM
# discrete form: c_skip(0)=1, c_out(0)=0 anchors f(z, 0) = z = x0 exactly)
# ---------------------------------------------------------------------------


def boundary_scalings(
    t: jax.Array,
    sigma_data: float = 0.5,
    timestep_scaling: float = 10.0,
) -> tuple[jax.Array, jax.Array]:
    """(c_skip, c_out) at integer timesteps `t` (float32).

    s = t·timestep_scaling;  c_skip = σ_d²/(s²+σ_d²),  c_out = s/√(s²+σ_d²).
    At t=0 this is exactly (1, 0) — the consistency boundary condition."""
    s = t.astype(jnp.float32) * timestep_scaling
    denom = s**2 + sigma_data**2
    return sigma_data**2 / denom, s / jnp.sqrt(denom)


def boundary_timesteps(num_timesteps: int, num_boundaries: int = 50) -> np.ndarray:
    """Ascending int32 grid of N+1 boundary timesteps [0 … T-1] (static).

    Training pairs are adjacent entries (t_lo=ts[i-1], t_hi=ts[i]); the
    sampler walks a descending subset. Includes BOTH endpoints so the
    teacher solver covers the whole trajectory and sampling starts from
    the terminal noise level (the "trailing" lesson, arXiv:2305.08891)."""
    return np.round(
        np.linspace(0, num_timesteps - 1, num_boundaries + 1)
    ).astype(np.int32)


# ---------------------------------------------------------------------------
# shared coordinate changes
# ---------------------------------------------------------------------------


def model_out_to_eps_x0(
    schedule: DiffusionSchedule,
    out: jax.Array,
    z: jax.Array,
    t: jax.Array,
    parameterization: str,
) -> tuple[jax.Array, jax.Array]:
    """(ε, x̂0) implied by a model output under the given parameterization
    (the same coordinate change the samplers use, diffusion/ddim.py:87-99)."""
    nd = z.ndim
    a = extract(schedule.sqrt_alphas_cumprod, t, nd)
    s = extract(schedule.sqrt_one_minus_alphas_cumprod, t, nd)
    z32, o32 = z.astype(jnp.float32), out.astype(jnp.float32)
    if parameterization == "v":
        x0 = a * z32 - s * o32
        eps = s * z32 + a * o32
    elif parameterization == "x0":
        x0 = o32
        eps = (z32 - a * x0) / s
    else:
        eps = o32
        x0 = (z32 - s * eps) / a
    return eps, x0


def ddim_step_to(
    schedule: DiffusionSchedule,
    z: jax.Array,
    eps: jax.Array,
    t_from: jax.Array,
    t_to: jax.Array,
) -> jax.Array:
    """One deterministic (η=0) DDIM update t_from → t_to on the BASE
    schedule's ᾱ tables — the teacher solver of the distillation loop
    (same update as diffusion/ddim.py:104-105 with σ=0, but between two
    arbitrary timesteps so the boundary grid needs no DDIMSchedule)."""
    nd = z.ndim
    a_from = extract(schedule.sqrt_alphas_cumprod, t_from, nd)
    s_from = extract(schedule.sqrt_one_minus_alphas_cumprod, t_from, nd)
    a_to = extract(schedule.sqrt_alphas_cumprod, t_to, nd)
    s_to = extract(schedule.sqrt_one_minus_alphas_cumprod, t_to, nd)
    z32, e32 = z.astype(jnp.float32), eps.astype(jnp.float32)
    x0 = (z32 - s_from * e32) / a_from
    return (a_to * x0 + s_to * e32).astype(z.dtype)


def pseudo_huber(a: jax.Array, b: jax.Array, c: float | None = None) -> jax.Array:
    """Mean pseudo-Huber distance √(‖a−b‖² + c²) − c per sample (improved
    consistency training, Song & Dhariwal arXiv:2310.14189 — smoother than
    L2 near zero, linear in the tails). c defaults to 0.00054·√dim."""
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    dim = np.prod(d.shape[1:])
    if c is None:
        c = 0.00054 * float(np.sqrt(dim))
    sq = jnp.sum(d.reshape(d.shape[0], -1) ** 2, axis=-1)
    return jnp.mean(jnp.sqrt(sq + c**2) - c)


# ---------------------------------------------------------------------------
# the distiller
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConsistencyDistiller:
    """Consistency-distillation loss + few-step sampler over one schedule.

    teacher/student share the base `schedule` and output parameterization;
    `sigma_data`/`timestep_scaling` shape the boundary scalings. The
    teacher may be CFG-augmented (`guidance_scale` > 1 with an `uncond`
    tree) — the student then bakes that guidance in (guided distillation,
    Meng et al. arXiv:2210.03142)."""

    schedule: DiffusionSchedule
    parameterization: str = "eps"
    sigma_data: float = 0.5
    timestep_scaling: float = 10.0
    num_boundaries: int = 50
    huber_c: float | None = None

    @property
    def boundaries(self) -> np.ndarray:
        return boundary_timesteps(self.schedule.num_timesteps,
                                  self.num_boundaries)

    # -- the consistency function f ------------------------------------------

    def consistency_fn(
        self,
        model_fn: ModelFn,
        z: jax.Array,
        t: jax.Array,
        cond: Any = None,
    ) -> jax.Array:
        """f(z, t) = c_skip·z + c_out·x̂0_θ(z, t) — one model call."""
        out = model_fn(z, t, cond)
        _, x0 = model_out_to_eps_x0(self.schedule, out, z, t,
                                    self.parameterization)
        c_skip, c_out = boundary_scalings(t, self.sigma_data,
                                          self.timestep_scaling)
        nd = z.ndim
        c_skip = c_skip.reshape(c_skip.shape + (1,) * (nd - 1))
        c_out = c_out.reshape(c_out.shape + (1,) * (nd - 1))
        return (c_skip * z.astype(jnp.float32) + c_out * x0).astype(z.dtype)

    # -- teacher solver step ---------------------------------------------------

    def teacher_step(
        self,
        teacher_fn: ModelFn,
        z: jax.Array,
        t_from: jax.Array,
        t_to: jax.Array,
        cond: Any = None,
        uncond: Any = None,
        guidance_scale: float = 1.0,
    ) -> jax.Array:
        """One deterministic teacher DDIM step t_from → t_to, with optional
        CFG folded into ε (the guidance the student will inherit)."""
        if uncond is None or guidance_scale == 1.0:
            out = teacher_fn(z, t_from, cond)
            eps, _ = model_out_to_eps_x0(self.schedule, out, z, t_from,
                                         self.parameterization)
        else:
            z_in = jnp.concatenate([z, z], axis=0)
            t_in = jnp.concatenate([t_from, t_from], axis=0)
            c_in = jax.tree.map(
                lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond)
            out = teacher_fn(z_in, t_in, c_in)
            e_all, _ = model_out_to_eps_x0(
                self.schedule, out, z_in, t_in, self.parameterization)
            e_u, e_c = jnp.split(e_all, 2, axis=0)
            eps = apply_cfg(e_u, e_c, guidance_scale)
        return ddim_step_to(self.schedule, z, eps, t_from, t_to)

    # -- training loss ---------------------------------------------------------

    def draw_pair(
        self,
        teacher_fn: ModelFn,
        z0: jax.Array,
        rng: jax.Array,
        cond: Any = None,
        uncond: Any = None,
        guidance_scale: float = 1.0,
    ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """The gradient-free half of the distillation step: draw a boundary
        pair, noise z0 to z_{t_hi}, run the teacher one solver step down.
        Returns (z_hi, z_lo, t_hi, t_lo) — all stop-gradient.

        Split out so the teacher's forward can compile as its OWN program:
        the combined teacher+student+target+backward graph can exceed a
        remote compiler's program-size limits (seen as HTTP 413 on the
        tunneled-TPU environment)."""
        b = z0.shape[0]
        ts = jnp.asarray(self.boundaries)
        rng_i, rng_n = jax.random.split(rng)
        i = jax.random.randint(rng_i, (b,), 1, ts.shape[0])
        t_hi, t_lo = ts[i], ts[i - 1]
        noise = jax.random.normal(rng_n, z0.shape, jnp.float32)
        z_hi = self.schedule.q_sample(z0, t_hi, noise)
        z_lo = self.teacher_step(teacher_fn, z_hi, t_hi, t_lo, cond=cond,
                                 uncond=uncond,
                                 guidance_scale=guidance_scale)
        return (jax.lax.stop_gradient(z_hi), jax.lax.stop_gradient(z_lo),
                t_hi, t_lo)

    def student_loss(
        self,
        student_fn: ModelFn,
        target_fn: ModelFn,
        z_hi: jax.Array,
        z_lo: jax.Array,
        t_hi: jax.Array,
        t_lo: jax.Array,
        cond: Any = None,
    ) -> tuple[jax.Array, dict]:
        """The gradient-carrying half: pull f_θ(z_hi, t_hi) toward the
        frozen target's f⁻(z_lo, t_lo)."""
        f_student = self.consistency_fn(student_fn, z_hi, t_hi, cond)
        f_target = jax.lax.stop_gradient(
            self.consistency_fn(target_fn, z_lo, t_lo, cond))
        loss = pseudo_huber(f_student, f_target, self.huber_c)
        logs = {
            "loss": loss,
            "t_hi_mean": jnp.mean(t_hi.astype(jnp.float32)),
            "f_gap": jnp.mean(jnp.abs(
                f_student.astype(jnp.float32)
                - f_target.astype(jnp.float32))),
        }
        return loss, logs

    def distill_loss(
        self,
        student_fn: ModelFn,
        target_fn: ModelFn,
        teacher_fn: ModelFn,
        z0: jax.Array,
        rng: jax.Array,
        cond: Any = None,
        uncond: Any = None,
        guidance_scale: float = 1.0,
    ) -> tuple[jax.Array, dict]:
        """One consistency-distillation loss evaluation.

        Draw a boundary pair (t_lo, t_hi), noise z0 to z_{t_hi}, run the
        teacher one solver step down to ẑ_{t_lo}, and pull the student's
        f(z_{t_hi}, t_hi) toward the FROZEN target network's
        f⁻(ẑ_{t_lo}, t_lo) (LCM Algorithm 1). One-graph composition of
        draw_pair + student_loss (the trainer compiles the halves
        separately — see draw_pair)."""
        z_hi, z_lo, t_hi, t_lo = self.draw_pair(
            teacher_fn, z0, rng, cond=cond, uncond=uncond,
            guidance_scale=guidance_scale)
        return self.student_loss(student_fn, target_fn, z_hi, z_lo,
                                 t_hi, t_lo, cond)

    # -- few-step sampling -------------------------------------------------------

    def sample(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        shape: tuple[int, ...],
        num_steps: int = 4,
        cond: Any = None,
        x_T: jax.Array | None = None,
    ) -> jax.Array:
        """Multistep consistency sampling (LCM §4.3): f predicts x0 from the
        current boundary, then re-noise to the next lower boundary with
        FRESH noise; `num_steps` model calls total, one lax.scan."""
        ts_all = self.boundaries  # ascending, [N+1]
        # descending subset: always start at the terminal boundary
        sel = np.unique(
            np.round(np.linspace(0, len(ts_all) - 1, num_steps + 1))
        ).astype(int)[::-1]  # e.g. N=50, steps=4 → indices [50, 37, 25, 12, 0]
        taus = jnp.asarray(ts_all[sel])  # descending, taus[0]=T-1 … taus[-1]=0
        b = shape[0]

        rng, init_rng = jax.random.split(rng)
        z = x_T if x_T is not None else jax.random.normal(init_rng, shape)

        def step(carry, k):
            z, rng = carry
            t = jnp.full((b,), taus[k], jnp.int32)
            x0 = self.consistency_fn(model_fn, z, t, cond)
            # re-noise to the NEXT boundary unless this was the last call
            rng, nrng = jax.random.split(rng)
            t_next = jnp.full((b,), taus[k + 1], jnp.int32)
            noise = jax.random.normal(nrng, x0.shape, jnp.float32)
            z_next = self.schedule.q_sample(x0, t_next, noise)
            is_last = (k == taus.shape[0] - 2)
            z = jnp.where(is_last, x0, z_next)
            return (z, rng), None

        n_calls = int(len(sel) - 1)
        (z, _), _ = jax.lax.scan(step, (z, rng), jnp.arange(n_calls))
        return z
