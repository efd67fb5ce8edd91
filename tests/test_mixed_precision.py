"""Mixed-precision training policy: `train.param_dtype: bfloat16` stores
params (and runs the model) in bf16 while Adam moments and the EMA shadow
stay fp32 — the production memory shape for the 859M-param SD UNet on one
16 GB chip (BASELINE.md round-1 probe). The reference's analog is
Lightning's precision="16-mixed" (reference: Diffusion/main.py:118-123,
VAE/autoencoder.py:463-471)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def _float_leaves(tree):
    return [l for l in jax.tree.leaves(tree)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]


def test_float32_moments_wrapper_dtypes():
    from sd_tpu.train.diffusion import float32_moments

    opt = float32_moments(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3)))
    params = {"w": jnp.ones((4, 4), jnp.bfloat16),
              "b": jnp.zeros((4,), jnp.bfloat16)}
    st = opt.init(params)
    moments = [l for l in _float_leaves(st) if l.ndim > 0]
    assert moments, "adam moments expected in the wrapped state"
    assert all(l.dtype == jnp.float32 for l in moments)
    grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-3), params)
    up, _ = opt.update(grads, st, params)
    # updates come back in the grads' dtype so apply_updates keeps bf16
    assert all(l.dtype == jnp.bfloat16 for l in _float_leaves(up))


def test_float32_moments_matches_fp32_adam():
    """The wrapped optimizer on bf16 grads tracks plain fp32 adam."""
    from sd_tpu.train.diffusion import float32_moments

    rng = np.random.default_rng(0)
    p32 = {"w": jnp.asarray(rng.normal(0, 0.1, (8, 8)), jnp.float32)}
    p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p32)
    ref, mixed = optax.adam(1e-2), float32_moments(optax.adam(1e-2))
    s32, s16 = ref.init(p32), mixed.init(p16)
    for i in range(5):
        g32 = {"w": jnp.asarray(rng.normal(0, 1.0, (8, 8)), jnp.float32)}
        g16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), g32)
        u32, s32 = ref.update(g32, s32, p32)
        u16, s16 = mixed.update(g16, s16, p16)
        p32 = optax.apply_updates(p32, u32)
        p16 = optax.apply_updates(p16, u16)
    err = jnp.max(jnp.abs(p16["w"].astype(jnp.float32) - p32["w"]))
    # bf16 param storage is the only precision loss (moments are fp32)
    assert float(err) < 2e-2, float(err)


def test_init_train_state_param_dtype():
    from sd_tpu.train.diffusion import (float32_moments, init_train_state,
                                        make_diffusion_train_step)

    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.normal(0, 0.1, (16, 16)), jnp.float32)}
    opt = float32_moments(optax.adam(1e-3))
    state = init_train_state(params, opt, ema_decay=0.999,
                             param_dtype="bfloat16")
    assert all(l.dtype == jnp.bfloat16 for l in _float_leaves(state.params))
    assert all(l.dtype == jnp.float32
               for l in _float_leaves(state.ema.shadow))
    moments = [l for l in _float_leaves(state.opt_state) if l.ndim > 0]
    assert all(l.dtype == jnp.float32 for l in moments)

    # the donated-state train step must run twice back to back — catches
    # params/shadow buffer aliasing from the jitted init (double-donate)
    def loss_fn(p, batch, r, logvar):
        loss = jnp.mean((p["w"].astype(jnp.float32) @ batch - batch) ** 2)
        return loss, {"loss": loss}

    step = make_diffusion_train_step(loss_fn, opt)
    batch = jnp.asarray(rng.normal(0, 1, (16, 4)), jnp.float32)
    state, logs1 = step(state, batch, jax.random.PRNGKey(0))
    state, logs2 = step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 2
    assert np.isfinite(float(logs2["loss"]))


def test_init_train_state_bf16_ema_target():
    """bf16 EMA shadow (the distillation target-network shape) — built
    eagerly to dodge params/shadow aliasing, still donation-safe."""
    from sd_tpu.train.diffusion import (float32_moments, init_train_state,
                                        make_diffusion_train_step)

    params = {"w": jnp.ones((8, 8), jnp.float32)}
    opt = float32_moments(optax.adam(1e-3))
    state = init_train_state(params, opt, ema_decay=0.95,
                             param_dtype="bfloat16",
                             ema_dtype=jnp.bfloat16)
    assert all(l.dtype == jnp.bfloat16
               for l in _float_leaves(state.ema.shadow))

    def loss_fn(p, batch, r, logvar):
        loss = jnp.sum(p["w"].astype(jnp.float32) ** 2)
        return loss, {"loss": loss}

    step = make_diffusion_train_step(loss_fn, opt)
    state, _ = step(state, jnp.zeros(()), jax.random.PRNGKey(0))
    state, _ = step(state, jnp.zeros(()), jax.random.PRNGKey(1))
    assert int(state.step) == 2


def test_bf16_step_loss_matches_fp32(rng):
    """A bf16-param diffusion train step tracks the fp32 loss trajectory
    (the r1 probe's 3-decimal observation, as a regression test at toy
    scale)."""
    import flax.linen as nn

    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.train.diffusion import (float32_moments, init_train_state,
                                        make_diffusion_train_step)

    class Tiny(nn.Module):
        dtype: jnp.dtype | None = None

        @nn.compact
        def __call__(self, x, t):
            h = nn.Conv(16, (3, 3), dtype=self.dtype)(x)
            h = nn.silu(h)
            return nn.Conv(x.shape[-1], (3, 3), dtype=self.dtype)(h)

    sched = DiffusionSchedule.create(timesteps=100)
    x0 = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 3))

    def make(dtype_name):
        model = Tiny(dtype=None if dtype_name is None else jnp.bfloat16)
        params = model.init(rng, x0, jnp.zeros((2,), jnp.int32))["params"]

        def loss_fn(p, batch, r, logvar):
            rt, rn = jax.random.split(r)
            t = jax.random.randint(rt, (batch.shape[0],), 0, 100)
            noise = jax.random.normal(rn, batch.shape)
            x_t = sched.q_sample(batch, t, noise)
            eps = model.apply({"params": p}, x_t, t)
            loss = jnp.mean((eps.astype(jnp.float32) - noise) ** 2)
            return loss, {"loss": loss}

        opt = optax.adam(1e-3)
        if dtype_name is not None:
            opt = float32_moments(opt)
        state = init_train_state(params, opt, ema_decay=0.999,
                                 param_dtype=dtype_name)
        return make_diffusion_train_step(loss_fn, opt), state

    step32, s32 = make(None)
    step16, s16 = make("bfloat16")
    for i in range(4):
        key = jax.random.PRNGKey(10 + i)
        s32, l32 = step32(s32, x0, key)
        s16, l16 = step16(s16, x0, key)
    rel = abs(float(l16["loss"]) - float(l32["loss"])) / float(l32["loss"])
    assert rel < 5e-2, (float(l16["loss"]), float(l32["loss"]))


def test_train_ldm_param_dtype_end_to_end(tmp_path):
    """Full runner wiring: param_dtype + remat through train_ldm — params
    land bf16, EMA fp32, checkpoint written, steps run under donation."""
    from PIL import Image

    from sd_tpu.core.config import load_yaml
    from sd_tpu.train.runners import train_ldm

    d = tmp_path / "imgs"
    d.mkdir()
    nprng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            nprng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")

    cfg = load_yaml(os.path.join("configs", "sd_txt2img_smoke.yaml"))
    cfg["train"]["total_steps"] = 2
    cfg["train"]["checkpoint_every"] = 2
    cfg["train"]["eval_every"] = 100
    cfg["train"]["param_dtype"] = "bfloat16"
    cfg["train"]["remat"] = "dots"
    state = train_ldm(cfg, str(d), out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2
    assert all(l.dtype == jnp.bfloat16 for l in _float_leaves(state.params))
    assert all(l.dtype == jnp.float32
               for l in _float_leaves(state.ema.shadow))
    assert os.path.isdir(tmp_path / "run" / "ckpt")


def test_train_kl_vae_param_dtype(tmp_path):
    """GAN-trainer policy: generator+discriminator params stored bf16, the
    learned logvar stays fp32, the two-optimizer step runs."""
    from PIL import Image

    from sd_tpu.core.config import load_yaml
    from sd_tpu.train.runners import train_kl_vae

    d = tmp_path / "imgs"
    d.mkdir()
    nprng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            nprng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")

    cfg = load_yaml(os.path.join("configs", "kl_smoke.yaml"))
    cfg["train"]["total_steps"] = 2
    cfg["train"]["checkpoint_every"] = 2
    cfg["train"]["eval_every"] = 100
    cfg["train"]["param_dtype"] = "bfloat16"
    state = train_kl_vae(cfg, str(d), out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2
    assert all(l.dtype == jnp.bfloat16
               for l in _float_leaves(state.params_g["model"]))
    assert all(l.dtype == jnp.bfloat16
               for l in _float_leaves(state.params_d))
    assert state.params_g["logvar"].dtype == jnp.float32
