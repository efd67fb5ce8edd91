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


def cast_floating(tree: PyTree, dtype) -> PyTree:
    """Cast floating-point leaves to `dtype`, leaving ints/bools alone."""
    if dtype is None:
        return tree
    dtype = jnp.dtype(dtype)
    return jax.tree.map(
        lambda p: p.astype(dtype)
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating) else p,
        tree,
    )


def float32_moments(opt: optax.GradientTransformation) -> optax.GradientTransformation:
    """Keep an optimizer's internal state in fp32 under low-precision params.

    The production training shape on a 16 GB chip is bf16 params + fp32 Adam
    moments + fp32 EMA (BASELINE.md round-1 probe: fits 859M-param SD UNet
    training state in HBM with the loss trajectory matching fp32 params to
    3 decimals). optax's scale_by_adam would otherwise keep mu/nu in the
    grads' dtype; this wrapper runs the inner transform entirely in fp32 and
    casts the final updates back to the grads' dtype. Under jit the casts
    fuse into the update computation — no standalone fp32 param copy is
    materialized except transiently for weight decay.
    """

    def init(params):
        return opt.init(cast_floating(params, jnp.float32))

    def update(grads, state, params=None):
        g32 = cast_floating(grads, jnp.float32)
        p32 = None if params is None else cast_floating(params, jnp.float32)
        up32, new_state = opt.update(g32, state, p32)
        up = jax.tree.map(lambda u, g: u.astype(jnp.asarray(g).dtype),
                          up32, grads)
        return up, new_state

    return optax.GradientTransformation(init, update)


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
    param_dtype=None,
    ema_dtype=jnp.float32,
) -> TrainState:
    """Build the training state. With `param_dtype` (e.g. "bfloat16") the
    params are cast to that dtype and the whole state — cast, optimizer
    moments, fp32 EMA shadow — is built inside ONE jitted, donated call.

    The jit matters at flagship scale: building the state eagerly first
    materializes the fp32 Adam moments and THEN an extra eager fp32 EMA
    copy on top of the fp32 params (the allocation spike that OOM'd the
    859M-param run — runs/sd512_catdog/train_oom1.log). Inside jit, XLA
    sees the whole allocation at once: the donated fp32 input buffer is
    reused for the same-shaped fp32 shadow, and no transient copy spikes.
    """

    # Under jit, a shadow with the SAME dtype as the params would CSE with
    # the params cast into one XLA value — the output tuple could then
    # alias params and shadow to one buffer, which the train step's
    # donation discipline would double-donate. Build such a shadow eagerly
    # (jnp.array copy=True guarantees a distinct buffer outside jit).
    ema_in_jit = (ema_decay is not None and param_dtype is not None
                  and jnp.dtype(ema_dtype) != jnp.dtype(param_dtype))

    def _build(p):
        p = cast_floating(p, param_dtype)
        logvar = None
        if num_timesteps is not None:
            logvar = jnp.full((num_timesteps,), logvar_init, jnp.float32)
        opt_params = {"model": p}
        if learn_logvar and logvar is not None:
            opt_params["logvar"] = logvar
        return TrainState(
            params=p,
            opt_state=optimizer.init(opt_params if learn_logvar else p),
            ema=(ema_init(p, ema_decay, dtype=ema_dtype)
                 if ema_decay is not None and ema_in_jit else None),
            step=jnp.asarray(0, jnp.int32),
            logvar=logvar,
        )

    if param_dtype is not None and jnp.dtype(param_dtype) != jnp.float32:
        state = jax.jit(_build, donate_argnums=0)(params)
    else:
        state = _build(params)
    if ema_decay is not None and not ema_in_jit:
        state = dataclasses.replace(
            state, ema=ema_init(state.params, ema_decay, dtype=ema_dtype))
    return state


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
        """Mean (loss, logs), grads over `grad_accum` microbatches.

        lax.scan, NOT an unrolled Python loop: the carry dependency forces
        XLA to run the microbatches strictly sequentially, so only ONE
        microbatch's backward temps are ever live. The unrolled form lets
        the latency-hiding scheduler interleave all the chunks' rematted
        backwards — measured at the 859M/512² flagship shape, the total
        HLO temp stayed ~5G whether the microbatch was 4 or 1
        (runs/sd512_catdog/train.log compile reports 15:10 vs 15:35), so
        unrolled grad accumulation saves nothing."""
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
        vag = jax.value_and_grad(lf, has_aux=True)
        zero = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(vag, opt_params,
                           jax.tree.map(lambda x: x[0], micro), mrngs[0]))

        def body(acc, xs):
            mb, r = xs
            res = vag(opt_params, mb, r)
            return jax.tree.map(jnp.add, acc, res), None

        out, _ = jax.lax.scan(body, zero, (micro, mrngs))
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
        # fp32 accumulation: under the bf16 param policy the grads are bf16
        # and a same-dtype sum-of-squares over 10⁸ leaves loses the norm
        logs["grad_norm"] = optax.global_norm(
            jax.tree.map(lambda g: g.astype(jnp.float32), grads))
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
