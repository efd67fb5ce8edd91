"""Golden tests for schedule math vs closed-form formulas and a torch oracle.

The reference has no tests (SURVEY.md §4); these pin our tables to the exact
formulas of DDIM/diffusion_modules.py:21-99 computed independently with torch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from sd_tpu.core.schedules import (
    DDIMSchedule,
    DiffusionSchedule,
    betas_for_alpha_bar,
    extract,
    make_beta_schedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)


def torch_linear_betas(start, end, T):
    return (
        torch.linspace(start**0.5, end**0.5, T, dtype=torch.float64) ** 2
    ).numpy()


@pytest.mark.parametrize(
    "start,end,T",
    [(1e-4, 2e-2, 1000), (0.00085, 0.012, 1000), (1e-4, 1e-2, 100)],
)
def test_linear_betas_match_torch(start, end, T):
    ours = make_beta_schedule("linear", T, start, end)
    theirs = torch_linear_betas(start, end, T)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_cosine_betas_properties():
    betas = make_beta_schedule("cosine", 1000)
    assert betas.shape == (1000,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    # cosine schedule should be monotonically increasing until the clip
    assert betas[0] < betas[500] < betas[-1] or betas[-1] == 0.999


def test_sqrt_linear_and_sqrt():
    b1 = make_beta_schedule("sqrt_linear", 10, 0.1, 0.2)
    np.testing.assert_allclose(b1, np.linspace(0.1, 0.2, 10))
    b2 = make_beta_schedule("sqrt", 10, 0.01, 0.04)
    np.testing.assert_allclose(b2, np.linspace(0.01, 0.04, 10) ** 0.5)


def test_betas_for_alpha_bar():
    import math

    f = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    betas = betas_for_alpha_bar(50, f)
    # reconstruct alpha_bar by cumprod and compare with f
    abar = np.cumprod(1 - betas)
    ts = (np.arange(50) + 1) / 50
    np.testing.assert_allclose(abar, [f(t) / f(0) for t in ts], rtol=1e-6, atol=1e-6)


def test_ddim_timesteps_uniform():
    ts = make_ddim_timesteps("uniform", 50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[-1] == 981
    np.testing.assert_array_equal(np.diff(ts), 20)


def test_ddim_timesteps_quad():
    ts = make_ddim_timesteps("quad", 25, 1000)
    assert ts[0] == 1
    assert (np.diff(ts) >= 0).all()
    assert ts[-1] <= 1000


def test_ddim_sampling_parameters_eta0_and_1():
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.012)
    abar = np.cumprod(1 - betas)
    ts = make_ddim_timesteps("uniform", 50, 1000)
    sig0, a, ap = make_ddim_sampling_parameters(abar, ts, 0.0)
    assert (sig0 == 0).all()
    np.testing.assert_allclose(a, abar[ts])
    np.testing.assert_allclose(ap[0], abar[0])
    np.testing.assert_allclose(ap[1:], abar[ts[:-1]])
    sig1, _, _ = make_ddim_sampling_parameters(abar, ts, 1.0)
    expected = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(sig1, expected, rtol=1e-12)


def test_schedule_posterior_identities():
    sched = DiffusionSchedule.create(timesteps=1000)
    b = np.asarray(sched.betas, dtype=np.float64)
    abar = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    abar_prev = np.append(1.0, abar[:-1])
    # posterior variance: beta_t * (1-abar_{t-1}) / (1-abar_t)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_variance),
        b * (1 - abar_prev) / (1 - abar),
        rtol=1e-5,
        atol=1e-8,
    )
    # paper-correct coef2 (COMPAT.md documents the reference's paren bug)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef2),
        (1 - abar_prev) * np.sqrt(1 - b) / (1 - abar),
        rtol=2e-4,  # fp32 tables recombined in fp64: (1-abar) amplifies near t=0
        atol=1e-8,
    )


def test_q_sample_roundtrip():
    sched = DiffusionSchedule.create(timesteps=1000)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8, 8, 3))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([0, 10, 500, 999])
    xt = sched.q_sample(x0, t, noise)
    # invert: x0_hat from (x_t, noise) must equal x0
    x0_hat = sched.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)
    # and eps recovered from (x_t, x0) must equal noise
    eps_hat = sched.predict_eps_from_start(xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(noise), atol=1e-2)


def test_extract_shape():
    table = jnp.arange(10.0)
    t = jnp.array([1, 2, 3])
    out = extract(table, t, 4)
    assert out.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [1, 2, 3])


def test_ddim_schedule_pytree_and_scanable():
    base = DiffusionSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.012)
    dd = DDIMSchedule.create(base, 50, eta=0.0)
    assert dd.num_steps == 50
    leaves = jax.tree.leaves(dd)
    assert all(isinstance(l, jax.Array) for l in leaves)

    # closing over it in jit must work
    @jax.jit
    def f(d: DDIMSchedule):
        return d.alphas.sum()

    f(dd)


def test_lvlb_weights_finite():
    sched = DiffusionSchedule.create(timesteps=1000)
    w = np.asarray(sched.lvlb_weights)
    assert np.isfinite(w).all()
    assert w[0] == w[1]
