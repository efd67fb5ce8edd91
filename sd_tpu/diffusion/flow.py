"""Rectified flow / flow matching: linear-interpolation noising with a
velocity-prediction objective and an ODE sampler (beyond-reference — the
reference implements only the DDPM/DDIM family; this is the SD3-era
formulation: flow matching Lipman et al. arXiv:2210.02747, rectified flow
Liu et al. arXiv:2209.03003, the SD3 recipe Esser et al. arXiv:2403.03206).

Design (TPU-first, drop-in with the LatentDiffusion stack):
  * the forward process is the straight path z_t = (1−t)·x0 + t·ε on a
    discrete T-lattice (t_cont = t/(T−1)), so the SAME integer-timestep
    UNet conditioning, trainers, and `LatentDiffusion.training_loss`
    t-draw work unchanged — `FlowProcess` mirrors `DDPMProcess.p_losses`;
  * the SD3 logit-normal timestep density is applied as an importance
    WEIGHT over the uniform integer draw (identical in expectation to
    sampling t from the density, but keeps the one shared t-draw code
    path and static shapes);
  * sampling is deterministic Euler (or midpoint) ODE integration as one
    `lax.scan`, CFG batched-2× inside the body like the DDIM sampler
    (diffusion/ddim.py:67-78).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.diffusion.guidance import apply_cfg
from sd_tpu.nn.layers import mean_flat

ModelFn = Callable[[jax.Array, jax.Array, Any], jax.Array]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlowSchedule:
    """The (schedule-free) flow lattice: t_cont = shift-warped t/(T−1).

    `shift` is the SD3 resolution-dependent timestep shift (§5.3.2 of
    arXiv:2403.03206): t' = shift·t / (1 + (shift−1)·t), pushing training
    and sampling toward the high-noise end for large images (shift=1 is
    the identity; SD3 uses 3.0 at 1024²)."""

    num_timesteps: int = dataclasses.field(metadata=dict(static=True),
                                           default=1000)
    shift: float = dataclasses.field(metadata=dict(static=True), default=1.0)

    def t_cont(self, t: jax.Array) -> jax.Array:
        """Integer lattice step -> continuous time in [0, 1]."""
        u = t.astype(jnp.float32) / (self.num_timesteps - 1)
        if self.shift != 1.0:
            u = self.shift * u / (1.0 + (self.shift - 1.0) * u)
        return u

    def q_sample(self, x_start: jax.Array, t: jax.Array,
                 noise: jax.Array) -> jax.Array:
        """z_t = (1−t)·x0 + t·ε — the straight interpolation path (exactly
        x0 at t=0 and exactly ε at t=T−1; contrast the DDPM ᾱ path,
        core/schedules.py:317-323)."""
        u = self.t_cont(t)
        u = u.reshape(u.shape + (1,) * (x_start.ndim - 1))
        return ((1.0 - u) * x_start.astype(jnp.float32)
                + u * noise.astype(jnp.float32)).astype(x_start.dtype)


@dataclasses.dataclass(frozen=True)
class FlowProcess:
    """Flow-matching training process — the `DDPMProcess` counterpart
    (diffusion/ddpm.py:48-150) for the rectified-flow objective.

    The model predicts the velocity v = ε − x0 (dz/dt of the straight
    path); loss is MSE against it, optionally importance-weighted by the
    SD3 logit-normal timestep density (timestep_density="logit_normal")."""

    schedule: FlowSchedule
    parameterization: str = "flow"        # marker for the sampler dispatch
    loss_type: str = "l2"
    timestep_density: str = "uniform"      # "uniform" | "logit_normal"
    logit_mean: float = 0.0                # SD3 defaults m=0, s=1
    logit_std: float = 1.0
    is_flow: bool = True

    def p_losses(
        self,
        model_fn: ModelFn,
        x_start: jax.Array,
        t: jax.Array,
        noise: jax.Array,
        cond: Any = None,
        learned_logvar: jax.Array | None = None,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """Velocity-matching loss (same signature as DDPMProcess.p_losses
        so LatentDiffusion.training_loss and every trainer work as-is;
        learned_logvar is accepted for interface parity but unused — the
        flow objective has no per-timestep variance head)."""
        sched = self.schedule
        z_t = sched.q_sample(x_start, t, noise)
        model_out = model_fn(z_t, t, cond)

        target = noise.astype(jnp.float32) - x_start.astype(jnp.float32)
        err = model_out.astype(jnp.float32) - target
        if self.loss_type == "l2":
            loss_raw = mean_flat(err**2)
        elif self.loss_type == "l1":
            loss_raw = mean_flat(jnp.abs(err))
        else:
            raise ValueError(f"unknown loss_type {self.loss_type!r}")

        if self.timestep_density == "logit_normal":
            # importance weight: logit-normal density over uniform. E_t[w]=1
            # up to lattice discretization, so the loss scale is preserved.
            u = jnp.clip(sched.t_cont(t), 1e-5, 1.0 - 1e-5)
            logit = jnp.log(u / (1.0 - u))
            m, s = self.logit_mean, self.logit_std
            dens = jnp.exp(-((logit - m) ** 2) / (2 * s**2)) / (
                s * np.sqrt(2 * np.pi) * u * (1.0 - u))
            loss_raw = loss_raw * dens
        elif self.timestep_density != "uniform":
            raise ValueError(
                f"unknown timestep_density {self.timestep_density!r}")

        loss = loss_raw.mean()
        return loss, {"loss": loss, "loss_simple": loss}


@dataclasses.dataclass(frozen=True)
class FlowEulerSampler:
    """Deterministic ODE sampling of a velocity model: integrate
    dz/dt = v_θ(z, t) from t=1 (noise) to t=0 (data) as one lax.scan.

    method: "euler" (1 call/step) or "midpoint" (2 calls/step, 2nd order —
    the flow analog of Heun; better at small step counts)."""

    schedule: FlowSchedule
    method: str = "euler"

    def _timesteps(self, num_steps: int) -> np.ndarray:
        """Descending integer lattice steps, T−1 → 0 inclusive."""
        T = self.schedule.num_timesteps
        return np.round(np.linspace(T - 1, 0, num_steps + 1)).astype(np.int32)

    def sample(
        self,
        model_fn: ModelFn,
        rng: jax.Array,
        shape: tuple[int, ...],
        num_steps: int = 28,
        cond: Any = None,
        uncond: Any = None,
        guidance_scale: float = 1.0,
        x_T: jax.Array | None = None,
    ) -> jax.Array:
        ts = jnp.asarray(self._timesteps(num_steps))       # [S+1] descending
        u_grid = self.schedule.t_cont(ts)                  # continuous times
        b = shape[0]
        rng, init_rng = jax.random.split(rng)
        z = x_T if x_T is not None else jax.random.normal(init_rng, shape)

        cond_batched = None
        if uncond is not None and guidance_scale != 1.0:
            cond_batched = jax.tree.map(
                lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond)

        def velocity(z, t_int):
            t_vec = jnp.full((b,), t_int, jnp.int32)
            if cond_batched is None:
                return model_fn(z, t_vec, cond).astype(jnp.float32)
            z_in = jnp.concatenate([z, z], axis=0)
            t_in = jnp.concatenate([t_vec, t_vec], axis=0)
            v_u, v_c = jnp.split(model_fn(z_in, t_in, cond_batched), 2,
                                 axis=0)
            return apply_cfg(v_u.astype(jnp.float32),
                             v_c.astype(jnp.float32), guidance_scale)

        def step(z, k):
            du = u_grid[k + 1] - u_grid[k]                 # negative
            v = velocity(z, ts[k])
            if self.method == "midpoint":
                z_mid = (z.astype(jnp.float32) + 0.5 * du * v).astype(z.dtype)
                t_mid = ((ts[k] + ts[k + 1]) // 2).astype(jnp.int32)
                v = velocity(z_mid, t_mid)
            elif self.method != "euler":
                raise ValueError(f"unknown method {self.method!r}")
            z = (z.astype(jnp.float32) + du * v).astype(z.dtype)
            return z, None

        z, _ = jax.lax.scan(step, z, jnp.arange(num_steps))
        return z
