"""CFG combination + guidance-rescale tests (arXiv:2305.08891 §3.4)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.diffusion.ddim import DDIMSampler
from sd_tpu.diffusion.dpm_solver import DPMSolverSampler
from sd_tpu.diffusion.guidance import apply_cfg
from sd_tpu.diffusion.plms import PLMSSampler

SHAPE = (2, 4, 4, 3)


def test_rescale_zero_is_plain_cfg():
    rng = jax.random.PRNGKey(0)
    e_u = jax.random.normal(rng, SHAPE)
    e_c = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    out = apply_cfg(e_u, e_c, 7.5, guidance_rescale=0.0)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(e_u + 7.5 * (e_c - e_u)),
                               rtol=1e-6)


def test_full_rescale_matches_cond_std():
    rng = jax.random.PRNGKey(2)
    e_u = jax.random.normal(rng, SHAPE)
    e_c = jax.random.normal(jax.random.PRNGKey(3), SHAPE) * 0.5
    out = apply_cfg(e_u, e_c, 9.0, guidance_rescale=1.0)
    axes = tuple(range(1, len(SHAPE)))
    np.testing.assert_allclose(
        np.asarray(jnp.std(out, axis=axes)),
        np.asarray(jnp.std(e_c, axis=axes)),
        rtol=1e-4,
    )
    # plain CFG at scale 9 has a much larger std — the problem being fixed
    plain = apply_cfg(e_u, e_c, 9.0)
    assert float(jnp.std(plain)) > 2.0 * float(jnp.std(out))


def test_partial_rescale_interpolates():
    rng = jax.random.PRNGKey(4)
    e_u = jax.random.normal(rng, SHAPE)
    e_c = jax.random.normal(jax.random.PRNGKey(5), SHAPE)
    plain = apply_cfg(e_u, e_c, 7.5, 0.0)
    full = apply_cfg(e_u, e_c, 7.5, 1.0)
    half = apply_cfg(e_u, e_c, 7.5, 0.5)
    np.testing.assert_allclose(np.asarray(half),
                               np.asarray(0.5 * full + 0.5 * plain),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("sampler_cls", [DDIMSampler, DPMSolverSampler,
                                         PLMSSampler])
def test_rescale_through_samplers(sampler_cls):
    sched = DiffusionSchedule.create(timesteps=100)
    cond = jnp.ones((2, 4), jnp.float32)
    uncond = jnp.zeros((2, 4), jnp.float32)

    def model(x, t, c):
        # conditioning modulates the SLOPE so the cond branch has a
        # different per-sample std than the CFG combination (a pure mean
        # shift would make std-rescale a mathematical no-op)
        scale = c.sum(axis=-1).reshape((-1,) + (1,) * (x.ndim - 1))
        return x * (0.1 + 0.05 * scale)

    rng = jax.random.PRNGKey(6)
    x_T = jax.random.normal(rng, SHAPE)
    s = sampler_cls(sched)
    base = s.sample(model, rng, SHAPE, num_steps=6, cond=cond, uncond=uncond,
                    guidance_scale=7.5, x_T=x_T)
    resc = s.sample(model, rng, SHAPE, num_steps=6, cond=cond, uncond=uncond,
                    guidance_scale=7.5, x_T=x_T, guidance_rescale=0.7)
    assert np.isfinite(np.asarray(resc)).all()
    # the knob does something at high guidance...
    assert float(jnp.abs(resc - base).max()) > 1e-5
    # ...and nothing when CFG is off (scale 1 skips the CFG branch entirely)
    a = s.sample(model, rng, SHAPE, num_steps=6, cond=cond, x_T=x_T)
    b = s.sample(model, rng, SHAPE, num_steps=6, cond=cond, x_T=x_T,
                 guidance_rescale=0.7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
