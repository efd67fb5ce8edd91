"""LR schedules as optax-compatible scalar functions.

Capability parity with the reference's lambda-LR factories
(reference: Diffusion/lr_scheduler.py:4-97 LambdaWarmUpCosineScheduler(2) and
LambdaLinearScheduler; DDPM/train.py:51-57 CosineAnnealingLR) — returned as
`step -> multiplier` callables usable with `optax.scale_by_schedule` or as
`learning_rate` schedules when multiplied by a base LR.

All are built on jnp so they trace cleanly inside jitted steps.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def lambda_warmup_cosine_schedule(
    warm_up_steps: int,
    lr_min: float,
    lr_max: float,
    lr_start: float,
    max_decay_steps: int,
):
    """Linear warmup lr_start→lr_max then cosine decay to lr_min
    (reference: Diffusion/lr_scheduler.py LambdaWarmUpCosineScheduler)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) * step / max(warm_up_steps, 1)
        t = (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1)
        t = jnp.clip(t, 0.0, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule


def _cycle_index(step, cum_cycles):
    """Index of the interval containing `step` (static cycle boundaries)."""
    cum = jnp.asarray(cum_cycles)
    return jnp.clip(jnp.searchsorted(cum, step, side="right") - 1, 0, len(cum) - 2)


def lambda_warmup_cosine_schedule_v2(
    warm_up_steps: Sequence[int],
    f_min: Sequence[float],
    f_max: Sequence[float],
    f_start: Sequence[float],
    cycle_lengths: Sequence[int],
):
    """Multi-cycle warmup+cosine (reference: LambdaWarmUpCosineScheduler2)."""
    cum = np.concatenate([[0], np.cumsum(cycle_lengths)])
    wu = jnp.asarray(warm_up_steps, jnp.float32)
    fmin = jnp.asarray(f_min, jnp.float32)
    fmax = jnp.asarray(f_max, jnp.float32)
    fstart = jnp.asarray(f_start, jnp.float32)
    lengths = jnp.asarray(cycle_lengths, jnp.float32)
    cum_j = jnp.asarray(cum, jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        c = _cycle_index(step, cum)
        n = step - cum_j[c]
        warm = fstart[c] + (fmax[c] - fstart[c]) * n / jnp.maximum(wu[c], 1.0)
        t = (n - wu[c]) / jnp.maximum(lengths[c] - wu[c], 1.0)
        t = jnp.clip(t, 0.0, 1.0)
        cos = fmin[c] + 0.5 * (fmax[c] - fmin[c]) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < wu[c], warm, cos)

    return schedule


def lambda_linear_schedule(
    warm_up_steps: Sequence[int],
    f_min: Sequence[float],
    f_max: Sequence[float],
    f_start: Sequence[float],
    cycle_lengths: Sequence[int],
):
    """Multi-cycle warmup+linear decay (reference: LambdaLinearScheduler —
    the SD-v1 recipe uses one 10k-warmup cycle, Diffusion/config.yaml)."""
    cum = np.concatenate([[0], np.cumsum(cycle_lengths)])
    wu = jnp.asarray(warm_up_steps, jnp.float32)
    fmin = jnp.asarray(f_min, jnp.float32)
    fmax = jnp.asarray(f_max, jnp.float32)
    fstart = jnp.asarray(f_start, jnp.float32)
    lengths = jnp.asarray(cycle_lengths, jnp.float32)
    cum_j = jnp.asarray(cum, jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        c = _cycle_index(step, cum)
        n = step - cum_j[c]
        warm = fstart[c] + (fmax[c] - fstart[c]) * n / jnp.maximum(wu[c], 1.0)
        lin = fmin[c] + (fmax[c] - fmin[c]) * (lengths[c] - n) / jnp.maximum(
            lengths[c], 1.0
        )
        return jnp.where(n < wu[c], warm, lin)

    return schedule


def reduce_on_plateau(
    factor: float = 0.5,
    patience: int = 10,
    rtol: float = 1e-4,
    cooldown: int = 0,
    min_scale: float = 0.0,
):
    """optax ReduceLROnPlateau transform (reference: vqvae/autoencoder.py
    configure_optimizers uses torch ReduceLROnPlateau). Chain after the
    optimizer and feed the monitored loss via
    `opt.update(..., value=loss)`."""
    from optax import contrib

    return contrib.reduce_on_plateau(
        factor=factor, patience=patience, rtol=rtol,
        cooldown=cooldown, min_scale=min_scale,
    )


def cosine_annealing(base_lr: float, total_steps: int, eta_min: float = 0.0):
    """torch CosineAnnealingLR equivalent (reference: DDPM/train.py:51-57)."""

    def schedule(step):
        t = jnp.clip(jnp.asarray(step, jnp.float32) / max(total_steps, 1), 0.0, 1.0)
        return eta_min + 0.5 * (base_lr - eta_min) * (1 + jnp.cos(t * jnp.pi))

    return schedule
