"""Diffusion training: jitted/pjit-ready train steps with EMA, grad clipping,
learned per-timestep logvar, and LR scheduling.

Capability parity with the reference trainers
(reference: DDPM/train.py:13-149 — Adam + CosineAnnealingLR + clip-grad 1.0 +
periodic eval/checkpoint; ldm/diffusion/ddpm.py:495-530,1942-1972 — AdamW,
optional cond-stage and logvar params in the optimizer, EMA on_train_batch_end),
re-designed as ONE pure function per step: (state, batch, rng) -> (state, logs),
jit- or pjit-compiled by the caller (sd_tpu.parallel for the multi-chip path).

The reference's paper-divergent details (dataloader re-iteration inside the
step loop, wrong running-mean formula, DDPM/train.py:82,105) are NOT
reproduced — see COMPAT.md.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from sd_tpu.core.ema import EmaState, ema_init, ema_update

PyTree = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Parameters + optimizer + EMA + step for a diffusion model."""

    params: PyTree
    opt_state: PyTree
    ema: EmaState | None
    step: jax.Array  # int32
    logvar: jax.Array | None = None  # learned per-timestep logvar [T] or None


def init_train_state(
    params: PyTree,
    optimizer: optax.GradientTransformation,
    ema_decay: float | None = 0.9999,
    num_timesteps: int | None = None,
    logvar_init: float = 0.0,
    learn_logvar: bool = False,
) -> TrainState:
    logvar = None
    if num_timesteps is not None:
        logvar = jnp.full((num_timesteps,), logvar_init, jnp.float32)
    opt_params = {"model": params}
    if learn_logvar and logvar is not None:
        opt_params["logvar"] = logvar
    return TrainState(
        params=params,
        opt_state=optimizer.init(opt_params if learn_logvar else params),
        ema=ema_init(params, ema_decay) if ema_decay is not None else None,
        step=jnp.asarray(0, jnp.int32),
        logvar=logvar,
    )


def make_diffusion_train_step(
    loss_fn: Callable[[PyTree, dict, jax.Array, jax.Array | None], tuple],
    optimizer: optax.GradientTransformation,
    learn_logvar: bool = False,
    jit: bool = True,
    grad_accum: int = 1,
):
    """Build the train step.

    loss_fn(params, batch, rng, logvar) -> (loss, logs) — e.g.
    `LatentDiffusion.training_loss` or a closure over `DDPMProcess.p_losses`.

    grad_accum > 1 splits the batch into that many microbatches, averages
    their gradients, and applies ONE optimizer + EMA update — the effective
    batch is the full batch at the activation memory of one microbatch
    (the chunks are data-independent, so XLA frees each chunk's activations
    before the next). The batch's leading dim must divide evenly.
    """

    def _accum_grads(lf, opt_params, batch, rng):
        """Mean (loss, logs), grads over `grad_accum` microbatches."""
        if grad_accum <= 1:
            return jax.value_and_grad(lf, has_aux=True)(opt_params, batch, rng)

        def split(x):
            assert x.shape[0] % grad_accum == 0, (
                f"batch dim {x.shape[0]} not divisible by "
                f"grad_accum={grad_accum}")
            return x.reshape(
                (grad_accum, x.shape[0] // grad_accum) + x.shape[1:])

        micro = jax.tree.map(split, batch)
        mrngs = jax.random.split(rng, grad_accum)
        out = None
        for i in range(grad_accum):
            mb = jax.tree.map(lambda x: x[i], micro)
            res = jax.value_and_grad(lf, has_aux=True)(opt_params, mb,
                                                       mrngs[i])
            out = res if out is None else jax.tree.map(jnp.add, out, res)
        return jax.tree.map(lambda x: x / grad_accum, out)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        if learn_logvar:
            def wrapped(opt_params, b, r):
                return loss_fn(opt_params["model"], b, r,
                               opt_params["logvar"])

            opt_params = {"model": state.params, "logvar": state.logvar}
            (loss, logs), grads = _accum_grads(wrapped, opt_params, batch, rng)
            updates, opt_state = optimizer.update(grads, state.opt_state, opt_params)
            new = optax.apply_updates(opt_params, updates)
            params, logvar = new["model"], new["logvar"]
        else:
            def wrapped(params, b, r):
                return loss_fn(params, b, r, state.logvar)

            (loss, logs), grads = _accum_grads(wrapped, state.params, batch,
                                               rng)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            logvar = state.logvar

        ema = ema_update(state.ema, params) if state.ema is not None else None
        logs = dict(logs)
        logs["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            params=params, opt_state=opt_state, ema=ema,
            step=state.step + 1, logvar=logvar,
        )
        return new_state, logs

    # donate the state: params/opt/EMA buffers are updated in place instead
    # of double-buffered — halves peak HBM for the optimizer state.
    def traced_step(*args, **kw):
        from sd_tpu.kernels.conv2d import training_trace

        with training_trace():
            return train_step(*args, **kw)

    return jax.jit(traced_step, donate_argnums=(0,)) if jit else traced_step


def ddpm_optimizer(
    lr: float | Callable = 2e-5, grad_clip: float = 1.0, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    """Adam(W) + global-norm clipping — the DDPM/LDM recipe
    (reference: DDPM/train.py:51-57 Adam+clip 1.0; ldm AdamW :593-603)."""
    opt = (optax.adamw(lr, weight_decay=weight_decay) if weight_decay > 0
           else optax.adam(lr))
    if grad_clip is not None and grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt
