"""v-prediction parameterization + Karras striding tests.

v-prediction (Salimans & Ho, arXiv:2202.00512): v = α·ε − σ·x0 with
α=sqrt(ᾱ_t), σ=sqrt(1-ᾱ_t). The coordinate changes are exact identities, and
a v-model equivalent to a given ε-model must sample to identical endpoints
through every sampler.

Karras striding (arXiv:2206.00364 eq.5): ρ-spaced σ nodes mapped onto the
discrete DDPM lattice; must be strictly increasing, in range, and integrate
the same ODE (endpoint agreement at matched budgets).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import (
    DDIMSchedule,
    DiffusionSchedule,
    make_karras_timesteps,
)
from sd_tpu.diffusion.ddim import DDIMSampler
from sd_tpu.diffusion.ddpm import DDPMProcess
from sd_tpu.diffusion.dpm_solver import DPMSolverSampler, DPMSolverSchedule
from sd_tpu.diffusion.plms import PLMSSampler

SHAPE = (2, 4, 4, 3)


def make_sched(T=1000, **kw):
    return DiffusionSchedule.create(timesteps=T, beta_schedule="linear",
                                    linear_start=0.00085, linear_end=0.012,
                                    **kw)


# ---------------------------------------------------------------------------
# v-prediction
# ---------------------------------------------------------------------------


def test_v_coordinate_round_trips():
    """get_v / predict_start_from_v / predict_eps_from_v are exact inverses
    of the forward q_sample decomposition."""
    sched = make_sched()
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, SHAPE)
    eps = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    t = jnp.asarray([17, 700], dtype=jnp.int32)
    x_t = sched.q_sample(x0, t, eps)
    v = sched.get_v(x0, eps, t)
    np.testing.assert_allclose(np.asarray(sched.predict_start_from_v(x_t, t, v)),
                               np.asarray(x0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sched.predict_eps_from_v(x_t, t, v)),
                               np.asarray(eps), rtol=1e-4, atol=1e-5)


def test_v_loss_zero_at_perfect_prediction():
    sched = make_sched(100)
    proc = DDPMProcess(sched, parameterization="v")
    rng = jax.random.PRNGKey(2)
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.PRNGKey(3), SHAPE)
    t = jnp.asarray([5, 60], dtype=jnp.int32)

    perfect = lambda x, tt, c: sched.get_v(x0, noise, tt)
    loss, logs = proc.p_losses(perfect, x0, t, noise)
    assert float(loss) < 1e-10
    # and a wrong model gives a real loss
    loss2, _ = proc.p_losses(lambda x, tt, c: jnp.zeros_like(x), x0, t, noise)
    assert float(loss2) > 0.1


def test_v_lvlb_weights_are_identity():
    sched = make_sched(100, parameterization="v")
    np.testing.assert_allclose(np.asarray(sched.lvlb_weights),
                               np.ones(100, np.float32))


def eps_and_equivalent_v_model(sched):
    """A nontrivial ε-model and the v-model describing the same denoiser."""
    def eps_model(x, t, c):
        tt = (t.astype(jnp.float32) / 1000.0).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        return x * 0.2 + tt * 0.1

    def v_model(x, t, c):
        eps = eps_model(x, t, c)
        x0 = sched.predict_start_from_noise(x, t, eps)
        return sched.get_v(x0, eps, t)

    return eps_model, v_model


@pytest.mark.parametrize("sampler_cls", [DDIMSampler, DPMSolverSampler,
                                         PLMSSampler])
def test_v_model_matches_eps_model_endpoint(sampler_cls):
    sched = make_sched()
    eps_model, v_model = eps_and_equivalent_v_model(sched)
    rng = jax.random.PRNGKey(4)
    x_T = jax.random.normal(rng, SHAPE)
    out_eps = sampler_cls(sched).sample(
        eps_model, rng, SHAPE, num_steps=12, x_T=x_T)
    out_v = sampler_cls(sched, parameterization="v").sample(
        v_model, rng, SHAPE, num_steps=12, x_T=x_T)
    np.testing.assert_allclose(np.asarray(out_eps), np.asarray(out_v),
                               rtol=2e-4, atol=2e-5)


def test_v_ancestral_matches_eps_ancestral():
    sched = make_sched(50)
    eps_model, v_model = eps_and_equivalent_v_model(sched)
    rng = jax.random.PRNGKey(5)
    out_eps = DDPMProcess(sched).p_sample_loop(
        eps_model, rng, SHAPE, temperature=0.0)
    out_v = DDPMProcess(sched, parameterization="v").p_sample_loop(
        v_model, rng, SHAPE, temperature=0.0)
    np.testing.assert_allclose(np.asarray(out_eps), np.asarray(out_v),
                               rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Karras striding
# ---------------------------------------------------------------------------


def test_karras_timesteps_shape_and_monotonicity():
    sched = make_sched()
    abar = np.asarray(sched.alphas_cumprod)
    for S in (8, 25, 50):
        ts = make_karras_timesteps(abar, S)
        assert ts.shape == (S,)
        assert (np.diff(ts) > 0).all()
        assert ts[0] >= 1 and ts[-1] <= len(abar) - 1
        # noisiest node reaches the top of the schedule
        assert ts[-1] >= len(abar) - 2


def test_karras_concentrates_low_noise():
    """ρ=7 spacing puts more than half the nodes in the lower half of the
    σ range — the property that makes it worth having."""
    sched = make_sched()
    abar = np.asarray(sched.alphas_cumprod, np.float64)
    ts = make_karras_timesteps(abar, 20)
    sig = np.sqrt((1 - abar) / abar)
    mid = 0.5 * (sig[1] + sig[-1])
    assert (sig[ts] < mid).sum() > 12


def test_karras_ddim_and_dpm_schedules_build():
    sched = make_sched()
    dd = DDIMSchedule.create(sched, 16, method="karras")
    assert dd.num_steps == 16
    assert (np.diff(np.asarray(dd.timesteps)) > 0).all()
    dp = DPMSolverSchedule.create(sched, 16, method="karras")
    assert dp.num_steps == 16
    em1 = np.asarray(dp.em1)
    assert (em1 < 0).all() and (em1 > -1).all()
    assert (np.asarray(dp.r)[1:] > 0).all()


def test_karras_dpm_reaches_same_endpoint():
    """Same ODE, different node placement: the karras-strided solver must
    land near the fine-grid DDIM solution at a small call budget."""
    sched = make_sched()
    rng = jax.random.PRNGKey(6)
    w = jax.random.normal(rng, (3, 3)) * 0.3

    def model(x, t, c):
        tt = (t.astype(jnp.float32) / 1000.0).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        return jnp.tanh(x @ w + tt) * 0.5

    x_T = jax.random.normal(jax.random.PRNGKey(7), SHAPE)
    hi = DDIMSampler(sched).sample(model, rng, SHAPE, num_steps=500, x_T=x_T)
    lo = DPMSolverSampler(sched).sample(model, rng, SHAPE, num_steps=15,
                                        x_T=x_T, method="karras")
    ref = float(jnp.linalg.norm(hi))
    assert float(jnp.linalg.norm(lo - hi)) / ref < 5e-2


# ---------------------------------------------------------------------------
# zero-terminal-SNR + trailing spacing (arXiv:2305.08891)
# ---------------------------------------------------------------------------


def test_rescale_zero_terminal_snr_properties():
    from sd_tpu.core.schedules import make_beta_schedule, rescale_zero_terminal_snr

    betas = make_beta_schedule("linear", 1000, 0.00085, 0.012)
    rb = rescale_zero_terminal_snr(betas)
    abar = np.cumprod(1.0 - rb)
    abar0 = np.cumprod(1.0 - betas)
    # terminal SNR is exactly zero; the first step is preserved
    assert abs(abar[-1]) < 1e-12
    np.testing.assert_allclose(abar[0], abar0[0], rtol=1e-10)
    # still a valid monotone schedule
    assert (rb > 0).all() and (rb <= 1.0).all()
    assert (np.diff(abar) < 0).all()


def test_zero_terminal_snr_requires_non_eps():
    with pytest.raises(ValueError, match="zero_terminal_snr"):
        DiffusionSchedule.create(timesteps=100, zero_terminal_snr=True)
    sched = DiffusionSchedule.create(timesteps=100, zero_terminal_snr=True,
                                     parameterization="v")
    assert float(sched.alphas_cumprod[-1]) == 0.0


def test_trailing_timesteps():
    from sd_tpu.core.schedules import make_ddim_timesteps

    ts = make_ddim_timesteps("trailing", 10, 1000)
    assert ts[-1] == 999          # includes the terminal step
    assert ts[0] == 99            # trailing spacing: T/S - 1
    assert (np.diff(ts) > 0).all()
    assert len(ts) == 10


def test_v_sampling_with_zero_snr_trailing_is_finite():
    """The paper's full recipe: v-model + zero-terminal-SNR schedule +
    trailing DDIM spacing. The terminal node has alpha-bar = 0, which the
    division-free v update must handle."""
    sched = DiffusionSchedule.create(timesteps=200, zero_terminal_snr=True,
                                     parameterization="v")
    assert float(sched.alphas_cumprod[-1]) == 0.0
    model = lambda x, t, c: x * 0.05  # arbitrary v-model
    out = DDIMSampler(sched, parameterization="v").sample(
        model, jax.random.PRNGKey(0), SHAPE, num_steps=8, method="trailing")
    assert np.isfinite(np.asarray(out)).all()
    # ancestral v-sampling over the same schedule is finite too
    from sd_tpu.diffusion.ddpm import DDPMProcess

    out2 = DDPMProcess(sched, parameterization="v").p_sample_loop(
        model, jax.random.PRNGKey(1), SHAPE)
    assert np.isfinite(np.asarray(out2)).all()
