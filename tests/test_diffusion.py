"""Golden tests for DDPM/DDIM processes against closed-form trajectories
(reference semantics: DDPM/ddpm.py, DDIM/ddim.py — see SURVEY.md §3.1/§3.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.schedules import DDIMSchedule, DiffusionSchedule
from sd_tpu.diffusion.ddim import DDIMSampler
from sd_tpu.diffusion.ddpm import DDPMProcess

SHAPE = (2, 8, 8, 3)


def make_process(T=100):
    sched = DiffusionSchedule.create(timesteps=T)
    return DDPMProcess(schedule=sched, clip_denoised=False)


def test_p_losses_zero_when_model_predicts_noise(rng):
    proc = make_process()
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    t = jnp.array([5, 50])
    loss, logs = proc.p_losses(lambda x, t, c: noise, x0, t, noise)
    assert float(loss) < 1e-12
    assert float(logs["loss_vlb"]) < 1e-10


def test_p_losses_learned_logvar(rng):
    proc = make_process()
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    t = jnp.array([5, 50])
    logvar = jnp.zeros(100)
    loss, logs = proc.p_losses(lambda x, t, c: jnp.zeros_like(x), x0, t, noise,
                               learned_logvar=logvar)
    # with logvar=0 the gamma loss equals the simple loss
    np.testing.assert_allclose(float(loss), float(logs["loss_simple"]), rtol=1e-6)


def test_ddpm_posterior_step_mean(rng):
    """p_sample with an oracle eps model must produce the analytic posterior mean."""
    proc = make_process()
    sched = proc.schedule
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    t = jnp.array([50, 50])
    xt = sched.q_sample(x0, t, noise)
    mean, _, _ = proc.p_mean_variance(lambda x, tt, c: noise, xt, t)
    expected_mean, _, _ = sched.q_posterior(x0, xt, t)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(expected_mean), atol=1e-4)


def test_ddpm_sample_loop_shapes(rng):
    proc = make_process(T=10)
    out = proc.p_sample_loop(lambda x, t, c: jnp.zeros_like(x), rng, SHAPE)
    assert out.shape == SHAPE
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_eps_zero_telescopes(rng):
    """With a zero-eps model and eta=0, DDIM is a pure rescale:
    x_0 = x_T * sqrt(abar_first / abar_last)."""
    sched = DiffusionSchedule.create(timesteps=1000)
    sampler = DDIMSampler(schedule=sched)
    dd = sampler.make_schedule(50, eta=0.0)
    x_T = jax.random.normal(rng, SHAPE)
    out = sampler.sample(
        lambda x, t, c: jnp.zeros_like(x), rng, SHAPE, num_steps=50, x_T=x_T
    )
    ratio = np.sqrt(np.asarray(dd.alphas_prev)[0] / np.asarray(dd.alphas)[-1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x_T) * ratio, rtol=2e-4, atol=1e-5)


def test_ddim_oracle_eps_recovers_x0(rng):
    """An oracle eps model makes each DDIM step land exactly on the
    deterministic forward trajectory of the true x0."""
    sched = DiffusionSchedule.create(timesteps=1000)
    sampler = DDIMSampler(schedule=sched)
    dd = sampler.make_schedule(50, eta=0.0)
    x0_true = jnp.clip(jax.random.normal(rng, SHAPE), -1, 1) * 0.5
    eps_true = jax.random.normal(jax.random.fold_in(rng, 7), SHAPE)

    # start at the top of the chain on the deterministic trajectory
    S = dd.num_steps
    a_top = float(dd.alphas[S - 1])
    x_T = np.sqrt(a_top) * x0_true + np.sqrt(1 - a_top) * eps_true

    out, pred_x0s = sampler.sample(
        lambda x, t, c: eps_true, rng, SHAPE, num_steps=50, x_T=x_T,
        return_pred_x0=True,
    )
    # every intermediate pred_x0 equals the true x0
    np.testing.assert_allclose(np.asarray(pred_x0s[0]), np.asarray(x0_true), atol=1e-3)
    # the chain ends at abar_0 = 1 - beta_0 (NOT 1): exact closed form keeps a
    # sqrt(beta_0)·eps residual
    a0 = float(dd.alphas_prev[0])
    expected = np.sqrt(a0) * np.asarray(x0_true) + np.sqrt(1 - a0) * np.asarray(eps_true)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-3)


def test_ddim_cfg_combination(rng):
    """CFG output must equal u + s·(c − u) exactly for a conditioning-echo model."""
    sched = DiffusionSchedule.create(timesteps=1000)
    sampler = DDIMSampler(schedule=sched)
    dd = sampler.make_schedule(10)
    x = jax.random.normal(rng, SHAPE)
    cond = jnp.ones((SHAPE[0], 1, 1, 1)) * 2.0
    uncond = jnp.zeros((SHAPE[0], 1, 1, 1))

    def model_fn(x, t, c):
        return jnp.broadcast_to(c, x.shape)

    t = jnp.full((SHAPE[0],), int(dd.timesteps[3]), dtype=jnp.int32)
    x_prev, _ = sampler.p_sample_ddim(
        model_fn, x, t, jnp.int32(3), dd, rng, cond=cond, uncond=uncond,
        guidance_scale=7.5,
    )
    # closed form with e_t = 0 + 7.5*(2-0) = 15
    e_t = jnp.full_like(x, 15.0)
    a_t, a_prev = float(dd.alphas[3]), float(dd.alphas_prev[3])
    s1m = float(dd.sqrt_one_minus_alphas[3])
    pred_x0 = (x - s1m * e_t) / np.sqrt(a_t)
    expected = np.sqrt(a_prev) * pred_x0 + np.sqrt(1 - a_prev) * e_t
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expected), rtol=1e-4, atol=1e-4)


def test_ddim_inpainting_mask_keeps_region(rng):
    sched = DiffusionSchedule.create(timesteps=1000)
    sampler = DDIMSampler(schedule=sched)
    x0 = jnp.zeros(SHAPE)
    mask = jnp.zeros(SHAPE).at[:, :4].set(1.0)  # keep top half
    out = sampler.sample(
        lambda x, t, c: jnp.zeros_like(x), rng, SHAPE, num_steps=10,
        mask=mask, x0=x0,
    )
    # masked region went through q_sample at the LAST step (t=1) where the
    # noise contribution is tiny, then one ddim step; should be near x0=0
    kept = np.asarray(out)[:, :4]
    assert np.abs(kept).max() < 0.5


def test_stochastic_encode_decode_roundtrip(rng):
    sched = DiffusionSchedule.create(timesteps=1000)
    sampler = DDIMSampler(schedule=sched)
    dd = sampler.make_schedule(50)
    x0 = jnp.clip(jax.random.normal(rng, SHAPE) * 0.3, -1, 1)
    noise = jax.random.normal(jax.random.fold_in(rng, 3), SHAPE)
    t_enc = 25
    # encode at index t_enc-1 so the first decode step (index t_enc-1) sees a
    # consistent trajectory (the reference's own encode/decode is off by one —
    # "fast, but does not allow for exact reconstruction", DDIM/ddim.py:206).
    x_enc = sampler.stochastic_encode(x0, jnp.int32(t_enc - 1), rng, dd, noise=noise)
    # oracle model: always predicts the exact injected noise. The decode ends
    # at abar_0 = 1 - beta_0, keeping a sqrt(beta_0)·noise residual.
    out = sampler.decode(lambda x, t, c: noise, x_enc, t_enc, rng, dd=dd)
    a0 = float(dd.alphas_prev[0])
    expected = np.sqrt(a0) * np.asarray(x0) + np.sqrt(1 - a0) * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-3)


def test_ddim_quad_method(rng):
    sched = DiffusionSchedule.create(timesteps=1000)
    sampler = DDIMSampler(schedule=sched)
    out = sampler.sample(
        lambda x, t, c: jnp.zeros_like(x), rng, SHAPE, num_steps=25, method="quad"
    )
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_eta_nonzero_stochastic(rng):
    sched = DiffusionSchedule.create(timesteps=1000)
    sampler = DDIMSampler(schedule=sched)
    out1 = sampler.sample(lambda x, t, c: jnp.zeros_like(x), rng, SHAPE,
                          num_steps=10, eta=1.0)
    out2 = sampler.sample(lambda x, t, c: jnp.zeros_like(x),
                          jax.random.fold_in(rng, 1), SHAPE, num_steps=10, eta=1.0)
    # different rng → different trajectories when eta > 0
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-3


def test_ddim_quantize_denoised(rng):
    """quantize_fn is applied to pred_x0 each step (reference:
    DDIM/ddim.py:196-197 quantize_denoised)."""
    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.diffusion.ddim import DDIMSampler

    sched = DiffusionSchedule.create(timesteps=20)
    snap = lambda z: jnp.round(z * 2.0) / 2.0  # fake codebook snap
    sampler = DDIMSampler(sched, quantize_fn=snap)
    model_fn = lambda x, t, c: jnp.zeros_like(x)
    img, pred = sampler.sample(model_fn, rng, (1, 4, 4, 2), num_steps=4,
                               return_pred_x0=True)
    # every intermediate pred_x0 sits on the snapped grid
    p = np.asarray(pred)
    np.testing.assert_allclose(p, np.round(p * 2.0) / 2.0, atol=1e-6)


def test_min_snr_gamma_weighting(rng):
    """min-SNR-γ (arXiv:2303.09556, beyond-reference): the simple loss is
    the per-sample loss reweighted by min(SNR,γ)/SNR (ε-param), which
    down-weights LOW-t (high-SNR) steps and leaves high-t steps unchanged."""
    import dataclasses

    sched = DiffusionSchedule.create(timesteps=1000)
    proc = DDPMProcess(schedule=sched, clip_denoised=False)
    proc_snr = dataclasses.replace(proc, min_snr_gamma=5.0)
    x0 = jax.random.normal(rng, SHAPE)
    noise = jax.random.normal(jax.random.fold_in(rng, 1), SHAPE)
    model = lambda x, t, c: jnp.zeros_like(x)  # constant wrong model

    # low t → SNR >> γ → weight γ/SNR << 1: loss shrinks a lot
    t_lo = jnp.array([2, 3])
    l0, _ = proc.p_losses(model, x0, t_lo, noise)
    l1, _ = proc_snr.p_losses(model, x0, t_lo, noise)
    snr = float(sched.alphas_cumprod[2] / (1 - sched.alphas_cumprod[2]))
    assert snr > 50
    assert float(l1) < 0.2 * float(l0)

    # high t → SNR < γ → weight 1: loss unchanged
    t_hi = jnp.array([900, 950])
    l0, _ = proc.p_losses(model, x0, t_hi, noise)
    l1, _ = proc_snr.p_losses(model, x0, t_hi, noise)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)

    # exact weight at a single t (ε-parameterization)
    t = jnp.array([10, 10])
    l0, _ = proc.p_losses(model, x0, t, noise)
    l1, _ = proc_snr.p_losses(model, x0, t, noise)
    snr_t = float(sched.alphas_cumprod[10] / (1 - sched.alphas_cumprod[10]))
    np.testing.assert_allclose(float(l1), float(l0) * min(snr_t, 5.0) / snr_t,
                               rtol=1e-4)

    # v-parameterization uses min(SNR,γ)/(SNR+1)
    proc_v = DDPMProcess(schedule=sched, clip_denoised=False,
                         parameterization="v", min_snr_gamma=5.0)
    lv, logs = proc_v.p_losses(model, x0, t_hi, noise)
    assert np.isfinite(float(lv)) and float(lv) > 0
