"""DPM-Solver++(2M) tests: ODE-limit agreement with DDIM, second-order
convergence on an analytically solvable model, CFG/x0/determinism.

The solver integrates the same probability-flow ODE as DDIM(η=0)
(DDIM is the first-order special case), so the many-step limits must agree;
on the Gaussian-data linear ε-model the exact flow map is the identity,
giving a closed-form error to measure convergence order against.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.diffusion.ddim import DDIMSampler
from sd_tpu.diffusion.dpm_solver import DPMSolverSampler, DPMSolverSchedule

SHAPE = (2, 4, 4, 3)


def make_sched(T=1000):
    return DiffusionSchedule.create(timesteps=T, beta_schedule="linear",
                                    linear_start=0.00085, linear_end=0.012)


def linear_eps_model(sched):
    """ε*(x,t) = sqrt(1-ᾱ_t)·x — the exact MMSE ε-predictor when the data
    distribution is N(0, I). All marginals of x_t are N(0, I), so the
    probability-flow ODE's flow map is the IDENTITY: x(0) = x_T exactly."""
    s1m = jnp.sqrt(1.0 - sched.alphas_cumprod)

    def fn(x, t, c):
        return x * s1m[t].reshape((-1,) + (1,) * (x.ndim - 1))

    return fn


def test_schedule_tables_sane():
    sched = make_sched()
    dp = DPMSolverSchedule.create(sched, 16)
    # uniform striding may round the count up by one (same as DDIMSchedule)
    assert dp.num_steps in (16, 17)
    assert dp.timesteps.shape == (dp.num_steps,)
    # descending model timesteps, noisiest first
    ts = np.asarray(dp.timesteps)
    assert (np.diff(ts) < 0).all()
    # λ gaps positive → expm1(-h) in (-1, 0)
    em1 = np.asarray(dp.em1)
    assert (em1 < 0).all() and (em1 > -1).all()
    # multistep ratio finite/positive beyond the first entry
    assert (np.asarray(dp.r)[1:] > 0).all()


def test_identity_flow_on_gaussian_data_and_order():
    """On the linear model the exact solution is x(0)=x_T; the 2nd-order
    solver must (a) beat DDIM at equal step count and (b) shrink error
    faster than first order when steps double."""
    sched = make_sched()
    model = linear_eps_model(sched)
    rng = jax.random.PRNGKey(0)
    x_T = jax.random.normal(rng, SHAPE)

    def rel_err(out):
        return float(jnp.linalg.norm(out - x_T) / jnp.linalg.norm(x_T))

    dpm = DPMSolverSampler(sched)
    ddim = DDIMSampler(sched)
    e_dpm_24 = rel_err(dpm.sample(model, rng, SHAPE, num_steps=24, x_T=x_T))
    e_dpm_48 = rel_err(dpm.sample(model, rng, SHAPE, num_steps=48, x_T=x_T))
    e_ddim_24 = rel_err(ddim.sample(model, rng, SHAPE, num_steps=24, x_T=x_T))
    e_ddim_48 = rel_err(ddim.sample(model, rng, SHAPE, num_steps=48, x_T=x_T))
    e_ddim_96 = rel_err(ddim.sample(model, rng, SHAPE, num_steps=96, x_T=x_T))

    # beats DDIM at equal budget (measured 0.033 vs 0.052 at S=24,
    # 0.011 vs 0.026 at S=48 — margin grows with S as the order kicks in)
    assert e_dpm_24 < 0.75 * e_ddim_24, (e_dpm_24, e_ddim_24)
    assert e_dpm_48 < 0.55 * e_ddim_48, (e_dpm_48, e_ddim_48)
    # half the budget: DPM-48 at least matches DDIM-96 (measured
    # 0.011 vs 0.013; at S=24 the crossover hasn't fully kicked in yet)
    assert e_dpm_48 < 1.05 * e_ddim_96
    # super-first-order: doubling steps cuts error by >2.5 (exact 1st order
    # gives 2.0; the discrete-ᾱ lattice keeps it below the ideal 4.0)
    assert e_dpm_48 < 0.4 * e_dpm_24, (e_dpm_48, e_dpm_24)
    # and converges to the analytic answer
    assert e_dpm_48 < 0.02


def test_agrees_with_ddim_in_many_step_limit():
    """Same ODE ⇒ same endpoint as S→∞, on a nonlinear model this time."""
    sched = make_sched()
    rng = jax.random.PRNGKey(1)
    w = jax.random.normal(rng, (3, 3)) * 0.3

    def model(x, t, c):
        tt = (t.astype(jnp.float32) / 1000.0).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        return jnp.tanh(x @ w + tt) * 0.5

    x_T = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    hi_ddim = DDIMSampler(sched).sample(model, rng, SHAPE, num_steps=500,
                                        x_T=x_T)
    hi_dpm = DPMSolverSampler(sched).sample(model, rng, SHAPE, num_steps=500,
                                            x_T=x_T)
    lo_dpm = DPMSolverSampler(sched).sample(model, rng, SHAPE, num_steps=15,
                                            x_T=x_T)
    ref = jnp.linalg.norm(hi_ddim)
    assert float(jnp.linalg.norm(hi_dpm - hi_ddim) / ref) < 5e-3
    # 15-call DPM lands near the 500-step solution too (the selling point)
    assert float(jnp.linalg.norm(lo_dpm - hi_ddim) / ref) < 5e-2


def test_cfg_and_determinism():
    sched = make_sched(100)
    dpm = DPMSolverSampler(sched)
    rng = jax.random.PRNGKey(3)
    cond = jnp.ones((2, 4), jnp.float32)
    uncond = jnp.zeros((2, 4), jnp.float32)

    calls = []

    def model(x, t, c):
        calls.append(x.shape[0])
        scale = c.sum(axis=-1).reshape((-1,) + (1,) * (x.ndim - 1))
        return x * 0.1 + scale * 0.01

    out1 = dpm.sample(model, rng, SHAPE, num_steps=8, cond=cond,
                      uncond=uncond, guidance_scale=5.0)
    assert out1.shape == SHAPE
    assert calls[0] == 2 * SHAPE[0]  # batched CFG call
    plain = lambda x, t, c: x * 0.1
    x_T = jax.random.normal(rng, SHAPE)
    a = dpm.sample(plain, rng, SHAPE, num_steps=8, x_T=x_T)
    b = dpm.sample(plain, jax.random.PRNGKey(99), SHAPE, num_steps=8, x_T=x_T)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_x0_parameterization_matches_eps():
    """A model predicting x0 directly must sample to the same endpoint as
    the equivalent ε-model (both describe the same denoiser)."""
    sched = make_sched()
    eps_model = linear_eps_model(sched)
    sa = jnp.sqrt(sched.alphas_cumprod)

    def x0_model(x, t, c):
        return x * sa[t].reshape((-1,) + (1,) * (x.ndim - 1))

    rng = jax.random.PRNGKey(4)
    x_T = jax.random.normal(rng, SHAPE)
    out_eps = DPMSolverSampler(sched).sample(
        eps_model, rng, SHAPE, num_steps=16, x_T=x_T)
    out_x0 = DPMSolverSampler(sched, parameterization="x0").sample(
        x0_model, rng, SHAPE, num_steps=16, x_T=x_T)
    np.testing.assert_allclose(np.asarray(out_eps), np.asarray(out_x0),
                               rtol=1e-4, atol=1e-5)


def test_clip_and_quantize_hooks():
    sched = make_sched(100)
    snap = lambda z: jnp.round(z * 2.0) / 2.0
    dpm = DPMSolverSampler(sched, clip_denoised=True, quantize_fn=snap)
    out = dpm.sample(lambda x, t, c: jnp.zeros_like(x),
                     jax.random.PRNGKey(5), (1, 4, 4, 2), num_steps=6)
    assert out.shape == (1, 4, 4, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_jit_and_scan_compatible():
    sched = make_sched(100)
    dpm = DPMSolverSampler(sched)

    @jax.jit
    def run(rng):
        return dpm.sample(lambda x, t, c: jnp.zeros_like(x), rng, SHAPE,
                          num_steps=10)

    out = run(jax.random.PRNGKey(6))
    assert out.shape == SHAPE and np.isfinite(np.asarray(out)).all()


# -- DPM++ 2M SDE (the stochastic variant) ------------------------------------

def dirac_eps_model(sched, x0_star):
    """ε*(x,t) = (x − sqrt(ᾱ_t)·x0*)/sqrt(1−ᾱ_t): the exact ε-predictor for
    a Dirac data distribution at x0*. The implied x̂0 is CONSTANT (= x0*),
    which makes the exponential SDE integrator exact at ANY step count."""
    sa = jnp.sqrt(sched.alphas_cumprod)
    s1m = jnp.sqrt(1.0 - sched.alphas_cumprod)

    def fn(x, t, c):
        sh = (-1,) + (1,) * (x.ndim - 1)
        return (x - sa[t].reshape(sh) * x0_star) / s1m[t].reshape(sh)

    return fn


def test_sde_dirac_exactness():
    """With a constant-x̂0 model the SDE integrator is exact: the output is
    N(α₀·x0*, σ₀²) regardless of step count — mean pinned at x0*, spread at
    the terminal σ₀ (≈0.029 for this linear schedule)."""
    sched = make_sched()
    x0_star = 0.7
    model = dirac_eps_model(sched, x0_star)
    sig0 = float(np.sqrt(1.0 - np.asarray(sched.alphas_cumprod)[0]))
    sde = DPMSolverSampler(sched, sde=True)
    for steps in (5, 40):
        out = np.asarray(sde.sample(model, jax.random.PRNGKey(steps),
                                    (64, 8, 8, 1), num_steps=steps))
        err = out - x0_star
        assert abs(err.mean()) < 4 * sig0 / np.sqrt(err.size) + 1e-3
        assert abs(err.std() - sig0) < 0.25 * sig0, (steps, err.std(), sig0)


def test_sde_preserves_gaussian_marginals():
    """For N(0,I) data with the exact MMSE ε-model, every reverse marginal
    is N(0,I); at a reasonable step count the SDE sampler's terminal std
    must be ≈1 (this checks the noise-injection scaling σ_t·sqrt(1−e^{−2h})
    against the contraction — a mis-scaled noise term fails immediately)."""
    sched = make_sched()
    model = linear_eps_model(sched)
    sde = DPMSolverSampler(sched, sde=True)
    out = np.asarray(sde.sample(model, jax.random.PRNGKey(0), (256, 8, 8, 1),
                                num_steps=50))
    assert abs(out.std() - 1.0) < 0.05, out.std()
    assert abs(out.mean()) < 0.05


def test_sde_stochastic_vs_ode_deterministic():
    """Same x_T, different seeds: the ODE output is identical, the SDE
    output differs (fresh per-step noise); SDE output is still finite and
    seed-reproducible."""
    sched = make_sched()
    model = linear_eps_model(sched)
    x_T = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    sde = DPMSolverSampler(sched, sde=True)
    a = sde.sample(model, jax.random.PRNGKey(2), SHAPE, num_steps=12, x_T=x_T)
    a2 = sde.sample(model, jax.random.PRNGKey(2), SHAPE, num_steps=12, x_T=x_T)
    b = sde.sample(model, jax.random.PRNGKey(3), SHAPE, num_steps=12, x_T=x_T)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
    assert float(jnp.abs(a - b).max()) > 1e-3
    ode = DPMSolverSampler(sched)
    c = ode.sample(model, jax.random.PRNGKey(2), SHAPE, num_steps=12, x_T=x_T)
    d = ode.sample(model, jax.random.PRNGKey(3), SHAPE, num_steps=12, x_T=x_T)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_sde_through_latent_sample():
    """sampler="dpm_sde" is reachable from LatentDiffusion.sample."""
    from sd_tpu.diffusion.latent import LatentDiffusion
    from sd_tpu.diffusion.ddpm import DDPMProcess

    sched = make_sched(100)
    ld = LatentDiffusion(
        process=DDPMProcess(sched, clip_denoised=False),
        unet_apply=lambda p, x, t, ctx, y=None: x * 0.1,
        encode_fn=None, decode_fn=None, cond_fn=None,
        conditioning_key=None, scale_factor=1.0)
    out = ld.sample({}, jax.random.PRNGKey(0), SHAPE, num_steps=8,
                    sampler="dpm_sde", decode=False)
    assert out.shape == SHAPE and np.isfinite(np.asarray(out)).all()
