"""k-diffusion sampler tests (Euler / Euler-ancestral / Heun): ODE-limit
agreement with DDIM, second-order convergence for Heun on an analytically
solvable model, variance-exactness of the ancestral split, CFG/param modes.

On the Gaussian-data linear ε-model (ε*(x,t) = √(1-ᾱ_t)·x) the
probability-flow ODE's flow map is the identity in x_t-space — in the
samplers' k-space coordinates x_k ∝ √(1+σ²) — giving a closed-form error to
measure convergence order against (same oracle as tests/test_dpm_solver.py).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.diffusion.ddim import DDIMSampler
from sd_tpu.diffusion.k_samplers import KDiffusionSampler, KSchedule

SHAPE = (2, 4, 4, 3)


def make_sched(T=1000):
    return DiffusionSchedule.create(timesteps=T, beta_schedule="linear",
                                    linear_start=0.00085, linear_end=0.012)


def linear_eps_model(sched):
    """Exact MMSE ε-predictor for data ~ N(0, I): flow map = identity."""
    s1m = jnp.sqrt(1.0 - sched.alphas_cumprod)

    def fn(x, t, c):
        return x * s1m[t].reshape((-1,) + (1,) * (x.ndim - 1))

    return fn


def test_schedule_tables_sane():
    sched = make_sched()
    ks = KSchedule.create(sched, 16)
    assert ks.num_steps in (16, 17)
    # S+1 nodes, terminal at t=0 / σ=0 / α=1
    assert ks.timesteps.shape == (ks.num_steps + 1,)
    ts = np.asarray(ks.timesteps)
    assert ts[-1] == 0 and (np.diff(ts.astype(np.int64)) < 0).all()
    sig = np.asarray(ks.sigma)
    assert sig[-1] == 0.0 and (np.diff(sig) < 0).all()
    al = np.asarray(ks.alpha)
    assert al[-1] == 1.0 and (np.diff(al) > 0).all()
    # σ and α agree with the VP lattice: α·σ = √(1-ᾱ)
    abar = np.asarray(sched.alphas_cumprod)[ts[:-1]]
    np.testing.assert_allclose(al[:-1] * sig[:-1], np.sqrt(1 - abar),
                               rtol=1e-5)


def test_identity_flow_and_heun_order():
    """Euler is first-order (≈ DDIM's error class); Heun must beat Euler at
    equal node count and shrink error super-linearly when nodes double."""
    sched = make_sched()
    model = linear_eps_model(sched)
    rng = jax.random.PRNGKey(0)
    x_T = jax.random.normal(rng, SHAPE)

    def rel_err(out):
        return float(jnp.linalg.norm(out - x_T) / jnp.linalg.norm(x_T))

    euler = KDiffusionSampler(sched, order="euler")
    heun = KDiffusionSampler(sched, order="heun")
    e_eu_24 = rel_err(euler.sample(model, rng, SHAPE, num_steps=24, x_T=x_T))
    e_eu_48 = rel_err(euler.sample(model, rng, SHAPE, num_steps=48, x_T=x_T))
    e_he_24 = rel_err(heun.sample(model, rng, SHAPE, num_steps=24, x_T=x_T))
    e_he_48 = rel_err(heun.sample(model, rng, SHAPE, num_steps=48, x_T=x_T))

    # first-order Euler: doubling nodes ≈ halves the error
    assert 0.3 < e_eu_48 / e_eu_24 < 0.7, (e_eu_24, e_eu_48)
    # Heun beats Euler at equal node count
    assert e_he_24 < 0.5 * e_eu_24, (e_he_24, e_eu_24)
    assert e_he_48 < 0.5 * e_eu_48, (e_he_48, e_eu_48)
    # super-first-order: doubling nodes cuts Heun's error by >2.5
    assert e_he_48 < 0.4 * e_he_24, (e_he_24, e_he_48)
    # and both converge to the analytic answer
    assert e_eu_48 < 0.06 and e_he_48 < 0.01


def test_agrees_with_ddim_in_many_step_limit():
    """Same probability-flow ODE ⇒ same endpoint as S→∞ (nonlinear model)."""
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
    hi_euler = KDiffusionSampler(sched, order="euler").sample(
        model, rng, SHAPE, num_steps=500, x_T=x_T)
    lo_heun = KDiffusionSampler(sched, order="heun").sample(
        model, rng, SHAPE, num_steps=30, x_T=x_T)
    ref = jnp.linalg.norm(hi_ddim)
    assert float(jnp.linalg.norm(hi_euler - hi_ddim) / ref) < 5e-3
    # 30-node Heun lands near the 500-step solution (the selling point)
    assert float(jnp.linalg.norm(lo_heun - hi_ddim) / ref) < 5e-2


def test_euler_ancestral_variance_exact_on_gaussian_data():
    """For Gaussian data the ancestral σ_up/σ_down split preserves the
    marginal law at every node in the many-step limit — the terminal
    samples must be ~ N(0, 1) (k-diffusion's design invariant)."""
    sched = make_sched()
    model = linear_eps_model(sched)
    shape = (8, 16, 16, 4)  # 8192 elements → var estimator σ ≈ 1.6%
    out = KDiffusionSampler(sched, order="euler_a").sample(
        model, jax.random.PRNGKey(3), shape, num_steps=200)
    flat = np.asarray(out, np.float64).ravel()
    assert abs(flat.mean()) < 0.05, flat.mean()
    assert abs(flat.var() - 1.0) < 0.1, flat.var()


def test_euler_a_stochastic_and_reproducible():
    sched = make_sched(100)
    s = KDiffusionSampler(sched, order="euler_a")
    model = lambda x, t, c: x * 0.1
    x_T = jax.random.normal(jax.random.PRNGKey(7), SHAPE)
    a = s.sample(model, jax.random.PRNGKey(0), SHAPE, num_steps=8, x_T=x_T)
    b = s.sample(model, jax.random.PRNGKey(0), SHAPE, num_steps=8, x_T=x_T)
    c = s.sample(model, jax.random.PRNGKey(1), SHAPE, num_steps=8, x_T=x_T)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    assert float(jnp.abs(a - c).max()) > 1e-3  # per-step noise differs


def test_cfg_batched_call_and_determinism():
    sched = make_sched(100)
    s = KDiffusionSampler(sched, order="euler")
    cond = jnp.ones((2, 4), jnp.float32)
    uncond = jnp.zeros((2, 4), jnp.float32)
    calls = []

    def model(x, t, c):
        calls.append(x.shape[0])
        scale = c.sum(axis=-1).reshape((-1,) + (1,) * (x.ndim - 1))
        return x * 0.1 + scale * 0.01

    out = s.sample(model, jax.random.PRNGKey(4), SHAPE, num_steps=8,
                   cond=cond, uncond=uncond, guidance_scale=5.0)
    assert out.shape == SHAPE
    assert calls[0] == 2 * SHAPE[0]  # batched [uncond; cond] CFG call
    plain = lambda x, t, c: x * 0.1
    x_T = jax.random.normal(jax.random.PRNGKey(5), SHAPE)
    a = s.sample(plain, jax.random.PRNGKey(0), SHAPE, num_steps=8, x_T=x_T)
    b = s.sample(plain, jax.random.PRNGKey(9), SHAPE, num_steps=8, x_T=x_T)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


@pytest.mark.parametrize("order", ["euler", "heun"])
def test_x0_and_v_parameterizations_match_eps(order):
    """x0- and v-models describing the same denoiser must sample to the
    same endpoint as the ε-model (core/schedules.py coordinate changes)."""
    sched = make_sched()
    eps_model = linear_eps_model(sched)
    sa = jnp.sqrt(sched.alphas_cumprod)
    s1m = jnp.sqrt(1.0 - sched.alphas_cumprod)

    def x0_model(x, t, c):
        return x * sa[t].reshape((-1,) + (1,) * (x.ndim - 1))

    def v_model(x, t, c):
        # v = √ᾱ·ε − √(1-ᾱ)·x0; for this denoiser both are linear in x
        a = sa[t].reshape((-1,) + (1,) * (x.ndim - 1))
        s1 = s1m[t].reshape((-1,) + (1,) * (x.ndim - 1))
        eps = s1 * x
        x0 = a * x
        return a * eps - s1 * x0

    rng = jax.random.PRNGKey(6)
    x_T = jax.random.normal(rng, SHAPE)
    out_eps = KDiffusionSampler(sched, order=order).sample(
        eps_model, rng, SHAPE, num_steps=16, x_T=x_T)
    out_x0 = KDiffusionSampler(sched, order=order,
                               parameterization="x0").sample(
        x0_model, rng, SHAPE, num_steps=16, x_T=x_T)
    out_v = KDiffusionSampler(sched, order=order,
                              parameterization="v").sample(
        v_model, rng, SHAPE, num_steps=16, x_T=x_T)
    np.testing.assert_allclose(np.asarray(out_eps), np.asarray(out_x0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_eps), np.asarray(out_v),
                               rtol=1e-4, atol=1e-5)


def test_karras_striding_and_clip_hooks():
    sched = make_sched()
    ks = KSchedule.create(sched, 12, method="karras")
    sig = np.asarray(ks.sigma)
    assert sig[-1] == 0.0 and (np.diff(sig) < 0).all()
    snap = lambda z: jnp.round(z * 2.0) / 2.0
    s = KDiffusionSampler(make_sched(100), order="heun", clip_denoised=True,
                          quantize_fn=snap)
    out = s.sample(lambda x, t, c: jnp.zeros_like(x),
                   jax.random.PRNGKey(8), (1, 4, 4, 2), num_steps=6,
                   method="karras")
    assert out.shape == (1, 4, 4, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("order", ["euler", "euler_a", "heun"])
def test_jit_and_scan_compatible(order):
    sched = make_sched(100)
    s = KDiffusionSampler(sched, order=order)

    @jax.jit
    def run(rng):
        return s.sample(lambda x, t, c: jnp.zeros_like(x), rng, SHAPE,
                        num_steps=6)

    out = run(jax.random.PRNGKey(10))
    assert out.shape == SHAPE and np.isfinite(np.asarray(out)).all()
