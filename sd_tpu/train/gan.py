"""Two-optimizer GAN training steps for the KL-VAE and VQ-VAE.

Capability parity with the reference's GAN trainers
(reference: VAE/autoencoder.py:176-236 training_step/configure_optimizers,
ldm/models/autoencoder.py:358-402 dual-optimizer AutoencoderKL,
vqvae/autoencoder.py:158-214 manual two-optimizer VQModel), re-designed as ONE
jitted function per batch that does both phases sequentially (generator update,
then discriminator update against the updated generator — Lightning's
sequential optimizer semantics).

The adaptive discriminator weight needs ∂nll/∂(last decoder kernel) and
∂g/∂(last decoder kernel) (reference: VAE/loss.py:105-141 via two
autograd.grad calls): here one `jax.vjp` of a (nll, g)-valued function of the
last kernel gives both cotangent pulls from a single forward.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from sd_tpu.losses.gan import (
    GanLossConfig,
    adopt_weight,
    calculate_adaptive_weight,
    reconstruction_nll,
)

PyTree = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GanTrainState:
    """Generator + discriminator params/opt-states plus the global step."""

    params_g: PyTree          # {"model": <ae params>, "logvar": scalar}
    params_d: PyTree          # discriminator params
    batch_stats_d: PyTree     # discriminator BatchNorm stats ({} for actnorm)
    opt_state_g: PyTree
    opt_state_d: PyTree
    step: jax.Array           # int32 scalar
    # non-gradient generator state (e.g. the EMA-VQ 'codebook' collection —
    # reference ldm/tamming/quantize.py:331-446 keeps these as torch buffers);
    # {} for models without mutable collections.
    model_state: PyTree = dataclasses.field(default_factory=dict)


def _get_path(tree: PyTree, path: Sequence[str]):
    for k in path:
        tree = tree[k]
    return tree


def _set_path(tree: PyTree, path: Sequence[str], value):
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _set_path(tree[path[0]], path[1:], value)
    return out


def init_gan_state(
    model_params: PyTree,
    disc_variables: PyTree,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    logvar_init: float = 0.0,
    model_state: PyTree | None = None,
    param_dtype=None,
) -> GanTrainState:
    """`param_dtype` (e.g. "bfloat16") stores generator AND discriminator
    params in that dtype — the same mixed-precision policy as the diffusion
    TrainState (train/diffusion.py); pair it with float32_moments-wrapped
    optimizers. The learned logvar and any batch stats stay fp32."""
    if param_dtype is not None:
        from sd_tpu.train.diffusion import cast_floating

        model_params = cast_floating(model_params, param_dtype)
        disc_variables = dict(disc_variables)
        disc_variables["params"] = cast_floating(disc_variables["params"],
                                                 param_dtype)
    params_g = {
        "model": model_params,
        "logvar": jnp.asarray(logvar_init, jnp.float32),
    }
    params_d = disc_variables["params"]
    batch_stats_d = disc_variables.get("batch_stats", {})
    return GanTrainState(
        params_g=params_g,
        params_d=params_d,
        batch_stats_d=batch_stats_d,
        opt_state_g=opt_g.init(params_g),
        opt_state_d=opt_d.init(params_d),
        step=jnp.asarray(0, jnp.int32),
        model_state=model_state if model_state is not None else {},
    )


def _disc_apply(disc, params_d, batch_stats_d, x):
    """Run the discriminator in batch-stat mode; returns (logits, new_stats)."""
    variables = {"params": params_d}
    if batch_stats_d:
        variables["batch_stats"] = batch_stats_d
        logits, mut = disc.apply(variables, x, mutable=["batch_stats"])
        return logits, mut["batch_stats"]
    return disc.apply(variables, x), batch_stats_d


def make_kl_gan_train_step(
    ae_apply: Callable[[PyTree, jax.Array, jax.Array], tuple],
    disc,
    lpips_fn: Callable[[jax.Array, jax.Array], jax.Array] | None,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    cfg: GanLossConfig,
    last_layer_path: Sequence[str] = ("decoder", "conv_out", "kernel"),
    jit: bool = True,
):
    """Build the jitted KL-VAE GAN step.

    ae_apply(model_params, x, rng) -> (recon, posterior)  — pure fn over the
    AutoencoderKL (sample_posterior=True inside).
    lpips_fn(x, y) -> [B,1,1,1] perceptual distance (frozen), or None.
    """
    d_loss_fn = cfg.d_loss_fn()

    def losses_from_recon(x, recon, posterior, logvar, params_d, batch_stats_d):
        perceptual = lpips_fn(x, recon) if lpips_fn is not None else None
        nll_loss, rec_mean, _ = reconstruction_nll(x, recon, logvar, perceptual, cfg)
        kl_loss = jnp.sum(posterior.kl()) / x.shape[0]
        logits_fake, _ = _disc_apply(disc, params_d, batch_stats_d, recon)
        g_loss = -jnp.mean(logits_fake.astype(jnp.float32))
        return nll_loss, kl_loss, g_loss, rec_mean

    def train_step(state: GanTrainState, x: jax.Array, rng: jax.Array):
        rng_sample = jax.random.fold_in(rng, state.step)

        # ---- adaptive discriminator weight (one fwd, two cotangent pulls) --
        if cfg.use_adaptive_weight:
            model_params = state.params_g["model"]
            last_kernel = _get_path(model_params, last_layer_path)

            def nll_and_g(k):
                p = _set_path(model_params, last_layer_path, k)
                recon, posterior = ae_apply(p, x, rng_sample)
                nll, _, g, _ = losses_from_recon(
                    x, recon, posterior, state.params_g["logvar"],
                    state.params_d, state.batch_stats_d,
                )
                return nll, g

            _, vjp = jax.vjp(nll_and_g, last_kernel)
            (nll_grad,) = vjp((jnp.float32(1.0), jnp.float32(0.0)))
            (g_grad,) = vjp((jnp.float32(0.0), jnp.float32(1.0)))
            d_weight = calculate_adaptive_weight(nll_grad, g_grad, cfg.disc_weight)
        else:
            d_weight = jnp.asarray(cfg.disc_weight, jnp.float32)

        disc_factor = adopt_weight(cfg.disc_factor, state.step, cfg.disc_start)

        # ---- generator update ---------------------------------------------
        def g_loss_total(params_g):
            recon, posterior = ae_apply(params_g["model"], x, rng_sample)
            nll, kl, g, rec = losses_from_recon(
                x, recon, posterior, params_g["logvar"],
                state.params_d, state.batch_stats_d,
            )
            loss = nll + cfg.kl_weight * kl + d_weight * disc_factor * g
            aux = dict(total_loss=loss, nll_loss=nll, kl_loss=kl, g_loss=g,
                       rec_loss=rec, d_weight=d_weight, disc_factor=disc_factor,
                       logvar=params_g["logvar"], recon=recon)
            return loss, aux

        (_, aux), grads_g = jax.value_and_grad(g_loss_total, has_aux=True)(
            state.params_g
        )
        updates_g, opt_state_g = opt_g.update(grads_g, state.opt_state_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)
        recon = jax.lax.stop_gradient(aux.pop("recon"))

        # ---- discriminator update (against the updated generator) ---------
        def d_loss_total(params_d):
            logits_real, stats = _disc_apply(disc, params_d, state.batch_stats_d, x)
            logits_fake, stats = _disc_apply(disc, params_d, stats, recon)
            loss = disc_factor * d_loss_fn(
                logits_real.astype(jnp.float32), logits_fake.astype(jnp.float32)
            )
            return loss, (logits_real, logits_fake, stats)

        (d_loss, (lr_, lf_, stats)), grads_d = jax.value_and_grad(
            d_loss_total, has_aux=True
        )(state.params_d)
        updates_d, opt_state_d = opt_d.update(grads_d, state.opt_state_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates_d)

        logs = {f"train/{k}": v for k, v in aux.items()}
        logs.update({
            "train/disc_loss": d_loss,
            "train/logits_real": jnp.mean(lr_),
            "train/logits_fake": jnp.mean(lf_),
        })
        new_state = GanTrainState(
            params_g=params_g, params_d=params_d, batch_stats_d=stats,
            opt_state_g=opt_state_g, opt_state_d=opt_state_d,
            step=state.step + 1,
        )
        return new_state, logs

    def traced_step(*args, **kw):
        # trace-time flag: Pallas convs dispatch to XLA inside training
        # graphs (PROBE_R14/R15 — inference-only win, training regression)
        from sd_tpu.kernels.conv2d import training_trace

        with training_trace():
            return train_step(*args, **kw)

    return jax.jit(traced_step) if jit else traced_step


def make_vq_gan_train_step(
    vq_apply: Callable[[PyTree, jax.Array], tuple],
    disc,
    lpips_fn: Callable[[jax.Array, jax.Array], jax.Array] | None,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    cfg: GanLossConfig,
    last_layer_path: Sequence[str] = ("decoder", "conv_out", "kernel"),
    stateful: bool = False,
    temp_fn: Callable[[jax.Array], jax.Array] | None = None,
    jit: bool = True,
):
    """Build the jitted VQ-VAE GAN step
    (reference: vqvae/autoencoder.py:158-214 + vqvae/vqlpips.py:96-183).

    vq_apply(model_params, x) -> (recon, codebook_loss, info), or with
    `stateful=True` the extended contract for Gumbel/EMA quantizers:
    vq_apply(model_params, model_state, x, rng, temp, update)
        -> (recon, codebook_loss, info, new_model_state)
    where `update=True` only in the generator pass (the EMA codebook update
    runs once per step, never inside the adaptive-weight vjp), `rng` drives
    the gumbel noise, and `temp` comes from `temp_fn(step)` (the taming
    temperature scheduler).

    VQ nll is the MEAN of the rec map (the taming convention), and the
    codebook loss enters as `codebook_weight * codebook_loss`.
    """
    d_loss_fn = cfg.d_loss_fn()

    if stateful:
        canon_apply = vq_apply
    else:
        def canon_apply(p, model_state, x, rng, temp, update):
            recon, cb_loss, info = vq_apply(p, x)
            return recon, cb_loss, info, model_state

    def losses_from_recon(x, recon, logvar, params_d, batch_stats_d):
        perceptual = lpips_fn(x, recon) if lpips_fn is not None else None
        x32, r32 = x.astype(jnp.float32), recon.astype(jnp.float32)
        rec = cfg.pixelloss_weight * jnp.abs(x32 - r32)
        if perceptual is not None and cfg.perceptual_weight > 0:
            rec = rec + cfg.perceptual_weight * perceptual.astype(jnp.float32)
        nll_loss = jnp.mean(rec / jnp.exp(logvar) + logvar)
        logits_fake, _ = _disc_apply(disc, params_d, batch_stats_d, recon)
        g_loss = -jnp.mean(logits_fake.astype(jnp.float32))
        return nll_loss, g_loss, jnp.mean(rec)

    def train_step(state: GanTrainState, x: jax.Array, rng: jax.Array):
        rng_q = jax.random.fold_in(rng, state.step)  # gumbel noise (if any)
        temp = temp_fn(state.step) if temp_fn is not None else None

        if cfg.use_adaptive_weight:
            model_params = state.params_g["model"]
            last_kernel = _get_path(model_params, last_layer_path)

            def nll_and_g(k):
                p = _set_path(model_params, last_layer_path, k)
                recon, _, _, _ = canon_apply(
                    p, state.model_state, x, rng_q, temp, False)
                nll, g, _ = losses_from_recon(
                    x, recon, state.params_g["logvar"],
                    state.params_d, state.batch_stats_d,
                )
                return nll, g

            _, vjp = jax.vjp(nll_and_g, last_kernel)
            (nll_grad,) = vjp((jnp.float32(1.0), jnp.float32(0.0)))
            (g_grad,) = vjp((jnp.float32(0.0), jnp.float32(1.0)))
            d_weight = calculate_adaptive_weight(nll_grad, g_grad, cfg.disc_weight)
        else:
            d_weight = jnp.asarray(cfg.disc_weight, jnp.float32)

        disc_factor = adopt_weight(cfg.disc_factor, state.step, cfg.disc_start)

        def g_loss_total(params_g):
            recon, codebook_loss, info, new_mstate = canon_apply(
                params_g["model"], state.model_state, x, rng_q, temp, True)
            nll, g, rec = losses_from_recon(
                x, recon, params_g["logvar"], state.params_d, state.batch_stats_d
            )
            loss = (
                nll
                + d_weight * disc_factor * g
                + cfg.codebook_weight * codebook_loss
            )
            aux = dict(total_loss=loss, nll_loss=nll, quant_loss=codebook_loss,
                       g_loss=g, rec_loss=rec, d_weight=d_weight,
                       disc_factor=disc_factor, perplexity=info[0], recon=recon,
                       model_state=new_mstate)
            return loss, aux

        (_, aux), grads_g = jax.value_and_grad(g_loss_total, has_aux=True)(
            state.params_g
        )
        updates_g, opt_state_g = opt_g.update(grads_g, state.opt_state_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)
        recon = jax.lax.stop_gradient(aux.pop("recon"))
        model_state = jax.lax.stop_gradient(aux.pop("model_state"))

        def d_loss_total(params_d):
            logits_real, stats = _disc_apply(disc, params_d, state.batch_stats_d, x)
            logits_fake, stats = _disc_apply(disc, params_d, stats, recon)
            loss = disc_factor * d_loss_fn(
                logits_real.astype(jnp.float32), logits_fake.astype(jnp.float32)
            )
            return loss, (logits_real, logits_fake, stats)

        (d_loss, (lr_, lf_, stats)), grads_d = jax.value_and_grad(
            d_loss_total, has_aux=True
        )(state.params_d)
        updates_d, opt_state_d = opt_d.update(grads_d, state.opt_state_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates_d)

        logs = {f"train/{k}": v for k, v in aux.items()}
        logs.update({
            "train/disc_loss": d_loss,
            "train/logits_real": jnp.mean(lr_),
            "train/logits_fake": jnp.mean(lf_),
        })
        new_state = GanTrainState(
            params_g=params_g, params_d=params_d, batch_stats_d=stats,
            opt_state_g=opt_state_g, opt_state_d=opt_state_d,
            step=state.step + 1, model_state=model_state,
        )
        return new_state, logs

    def traced_step(*args, **kw):
        # trace-time flag: Pallas convs dispatch to XLA inside training
        # graphs (PROBE_R14/R15 — inference-only win, training regression)
        from sd_tpu.kernels.conv2d import training_trace

        with training_trace():
            return train_step(*args, **kw)

    return jax.jit(traced_step) if jit else traced_step


def gumbel_temp_schedule(temp_init: float = 1.0, temp_min: float = 1e-6,
                         anneal_rate: float = 1e-5):
    """Exponential Gumbel temperature annealing (the taming
    temperature_scheduler convention): temp(step) = max(min, init·e^{-r·step})."""

    def fn(step):
        return jnp.maximum(
            jnp.float32(temp_min),
            jnp.float32(temp_init) * jnp.exp(-anneal_rate * step.astype(jnp.float32)),
        )

    return fn


def gan_adam(lr: float, b1: float = 0.5, b2: float = 0.9) -> optax.GradientTransformation:
    """Adam with the GAN betas used by every reference autoencoder trainer
    (reference: VAE/autoencoder.py:226-236, ldm/models/autoencoder.py:393-402)."""
    return optax.adam(lr, b1=b1, b2=b2)
