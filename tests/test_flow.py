"""Rectified flow / flow matching (diffusion/flow.py).

Oracles: the straight path's endpoints are exact identities; the marginal
velocity field of Gaussian data is known in closed form, so the ODE
sampler can be validated against analytic moments; a tiny MLP trained
with the flow-matching loss must recover the data distribution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.diffusion.flow import FlowEulerSampler, FlowProcess, FlowSchedule


@pytest.fixture(scope="module")
def fs():
    return FlowSchedule(num_timesteps=1000)


def test_q_sample_endpoints(fs):
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t0 = jnp.zeros((2,), jnp.int32)
    tT = jnp.full((2,), fs.num_timesteps - 1, jnp.int32)
    np.testing.assert_allclose(np.asarray(fs.q_sample(x0, t0, eps)),
                               np.asarray(x0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fs.q_sample(x0, tT, eps)),
                               np.asarray(eps), atol=1e-6)


def test_timestep_shift_monotone():
    fs3 = FlowSchedule(num_timesteps=1000, shift=3.0)
    t = jnp.concatenate([jnp.arange(0, 1000, 50, dtype=jnp.int32),
                         jnp.asarray([999], jnp.int32)])
    u1 = np.asarray(FlowSchedule(1000).t_cont(t))
    u3 = np.asarray(fs3.t_cont(t))
    # shift>1 pushes interior times toward 1 (more high-noise mass),
    # endpoints fixed
    assert u3[0] == 0.0 and abs(u3[-1] - 1.0) < 1e-6
    assert np.all(u3[1:-1] > u1[1:-1])
    assert np.all(np.diff(u3) > 0)


def test_perfect_model_zero_loss(fs):
    proc = FlowProcess(fs)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 3))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.asarray([3, 400, 700, 999], jnp.int32)
    target = eps - x0
    loss, logs = proc.p_losses(lambda z, tt, c: target, x0, t, eps)
    assert float(loss) < 1e-10
    # and a wrong model scores > 0
    loss2, _ = proc.p_losses(lambda z, tt, c: jnp.zeros_like(z), x0, t, eps)
    assert float(loss2) > 0.1


def test_logit_normal_weight_mean_one(fs):
    """The importance weight has mean ~1 over the uniform lattice draw, so
    the density reweighting preserves the loss scale."""
    proc = FlowProcess(fs, timestep_density="logit_normal")
    t = jnp.arange(1000, dtype=jnp.int32)
    x0 = jnp.zeros((1000, 2))
    eps = jnp.zeros((1000, 2))
    # model error of exactly 1 per element → loss_raw = 1, so the mean
    # loss IS the mean weight
    loss, _ = proc.p_losses(lambda z, tt, c: jnp.ones_like(z), x0, t, eps)
    assert abs(float(loss) - 1.0) < 0.05


def _analytic_velocity(fs, mu, std):
    """E[ε − x0 | z_t] for x0 ~ N(mu, std²), ε ~ N(0, I) on the straight
    path z = (1−t)x0 + tε (linear-Gaussian posterior)."""

    def model(z, t, cond):
        u = fs.t_cont(t)
        u = u.reshape(u.shape + (1,) * (z.ndim - 1))
        var = (1 - u) ** 2 * std**2 + u**2
        resid = z - (1 - u) * mu
        e_x0 = mu + (1 - u) * std**2 / var * resid
        e_eps = u / var * resid
        return e_eps - e_x0

    return model


@pytest.mark.parametrize("method", ["euler", "midpoint"])
def test_sampler_analytic_gaussian(fs, method):
    mu, std = 1.2, 0.5
    model = _analytic_velocity(fs, mu, std)
    s = FlowEulerSampler(fs, method=method).sample(
        model, jax.random.PRNGKey(0), (8192, 4), num_steps=64)
    assert abs(float(s.mean()) - mu) < 0.05, float(s.mean())
    assert abs(float(s.std()) - std) < 0.05, float(s.std())


def test_midpoint_beats_euler_at_few_steps(fs):
    """2nd-order midpoint should track the curved Gaussian flow better
    than Euler at a small step budget."""
    mu, std = 1.2, 0.5
    model = _analytic_velocity(fs, mu, std)

    def moment_err(method, steps):
        s = FlowEulerSampler(fs, method=method).sample(
            model, jax.random.PRNGKey(0), (4096, 4), num_steps=steps)
        return abs(float(s.mean()) - mu) + abs(float(s.std()) - std)

    assert moment_err("midpoint", 4) < moment_err("euler", 4)


def test_cfg_path_shapes(fs):
    calls = []

    def model(z, t, cond):
        calls.append(z.shape)
        return jnp.zeros_like(z)

    cond = {"c": jnp.ones((2, 3))}
    uncond = {"c": jnp.zeros((2, 3))}
    out = FlowEulerSampler(fs).sample(
        model, jax.random.PRNGKey(0), (2, 4, 4, 3), num_steps=2,
        cond=cond, uncond=uncond, guidance_scale=3.0)
    assert out.shape == (2, 4, 4, 3)
    assert calls[0][0] == 4  # batched-2× CFG call


def test_flow_matching_training_end_to_end(fs):
    """Train a tiny MLP with the flow-matching loss on Gaussian data; the
    ODE samples must recover the data moments. Pure regression (no
    bootstrap), so convergence is fast."""
    import flax.linen as nn
    import optax

    mu, std, dim = 1.2, 0.5, 4
    proc = FlowProcess(fs, timestep_density="logit_normal")

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, z, t):
            tf = t.astype(jnp.float32)[:, None] / fs.num_timesteps
            h = jnp.concatenate([z, tf, jnp.sin(6.28 * tf),
                                 jnp.cos(6.28 * tf)], axis=-1)
            h = nn.silu(nn.Dense(64)(h))
            h = nn.silu(nn.Dense(64)(h))
            return nn.Dense(dim)(h)

    mlp = MLP()
    key = jax.random.PRNGKey(0)
    params = mlp.init(key, jnp.zeros((1, dim)), jnp.zeros((1,), jnp.int32))
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    def loss(p, r):
        r0, r1, r2 = jax.random.split(r, 3)
        x0 = mu + std * jax.random.normal(r0, (256, dim))
        t = jax.random.randint(r1, (256,), 0, fs.num_timesteps)
        eps = jax.random.normal(r2, x0.shape)
        l, _ = proc.p_losses(lambda z, tt, c: mlp.apply(p, z, tt), x0, t, eps)
        return l

    @jax.jit
    def step(p, o, r):
        l, g = jax.value_and_grad(loss)(p, r)
        up, o = opt.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    losses = []
    for i in range(600):
        params, opt_state, l = step(params, opt_state,
                                    jax.random.fold_in(key, i))
        losses.append(float(l))
    assert np.mean(losses[-50:]) < np.mean(losses[:50])

    s = FlowEulerSampler(fs).sample(
        lambda z, t, c: mlp.apply(params, z, t),
        jax.random.PRNGKey(42), (4096, dim), num_steps=32)
    assert abs(float(s.mean()) - mu) < 0.15, float(s.mean())
    assert abs(float(s.std()) - std) < 0.15, float(s.std())


def test_flow_ldm_runner(tmp_path):
    """Runner smoke: diffusion.type=flow trains through train_ldm and the
    flow sampler serves it through LatentDiffusion.sample."""
    import os

    from PIL import Image

    from sd_tpu.core.config import load_yaml
    from sd_tpu.train.runners import train_ldm

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")

    cfg = load_yaml("configs/flow_smoke.yaml")
    cfg["train"]["total_steps"] = 2
    cfg["train"]["checkpoint_every"] = 2
    cfg["train"]["eval_every"] = 100
    state = train_ldm(cfg, str(d), out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2
    assert os.path.isdir(tmp_path / "run" / "ckpt")


def test_latent_sample_flow_guards(fs):
    """Flow models refuse DDPM-family samplers and vice versa."""
    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.diffusion.ddpm import DDPMProcess
    from sd_tpu.diffusion.latent import LatentDiffusion

    flow_ld = LatentDiffusion(
        process=FlowProcess(fs),
        unet_apply=lambda p, x, t, ctx, y=None: jnp.zeros_like(x),
        conditioning_key=None,
    )
    out = flow_ld.sample({}, jax.random.PRNGKey(0), (1, 4, 4, 3),
                         num_steps=2, decode=False)  # defaults to "flow"
    assert out.shape == (1, 4, 4, 3)
    with pytest.raises(ValueError, match="flow-matching model"):
        flow_ld.sample({}, jax.random.PRNGKey(0), (1, 4, 4, 3),
                       sampler="ddim", num_steps=2, decode=False)

    ddpm_ld = LatentDiffusion(
        process=DDPMProcess(DiffusionSchedule.create(timesteps=50)),
        unet_apply=lambda p, x, t, ctx, y=None: jnp.zeros_like(x),
        conditioning_key=None,
    )
    with pytest.raises(ValueError, match="FlowProcess"):
        ddpm_ld.sample({}, jax.random.PRNGKey(0), (1, 4, 4, 3),
                       sampler="flow", num_steps=2, decode=False)
