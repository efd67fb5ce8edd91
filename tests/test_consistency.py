"""Consistency distillation (diffusion/consistency.py, train/distill.py).

Oracle strategy: boundary-condition identities are exact by construction;
the solver step is checked against the DDIM sampler's own update; the full
distillation loop is validated on an analytic Gaussian task where the
optimal teacher is known in closed form — the distilled student's few-step
samples must reproduce the data moments the 50-step teacher would."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.diffusion.consistency import (
    ConsistencyDistiller,
    boundary_scalings,
    boundary_timesteps,
    ddim_step_to,
    model_out_to_eps_x0,
    pseudo_huber,
)


@pytest.fixture(scope="module")
def sched():
    # standard DDPM betas at T=1000: ᾱ_T ≈ 4e-5, so the terminal marginal
    # really is ~N(0, I) and sampling-from-noise is well-posed (a T=100
    # truncation leaves ᾱ_T ≈ 0.5 — the mismatch the zero-terminal-SNR
    # paper (arXiv:2305.08891) warns about)
    return DiffusionSchedule.create(timesteps=1000, beta_schedule="linear",
                                    linear_start=1e-4, linear_end=2e-2)


def test_boundary_scalings_anchor():
    t = jnp.asarray([0, 1, 10, 99], jnp.int32)
    c_skip, c_out = boundary_scalings(t)
    # exact consistency boundary: f(z, 0) = z
    assert float(c_skip[0]) == 1.0 and float(c_out[0]) == 0.0
    # monotone hand-off from skip to out as t grows
    assert np.all(np.diff(np.asarray(c_skip)) < 0)
    assert np.all(np.diff(np.asarray(c_out)) > 0)
    # c_skip² + c_out²·(s²+σ²)/... — sanity: both in [0, 1]
    assert np.all((np.asarray(c_skip) >= 0) & (np.asarray(c_skip) <= 1))
    assert np.all((np.asarray(c_out) >= 0) & (np.asarray(c_out) <= 1))


def test_boundary_timesteps_grid():
    ts = boundary_timesteps(1000, 50)
    assert ts.shape == (51,)
    assert ts[0] == 0 and ts[-1] == 999
    assert np.all(np.diff(ts) > 0)


def test_consistency_fn_boundary_identity(sched):
    """f(z, 0) == z regardless of the model output (c_out(0)=0)."""
    d = ConsistencyDistiller(sched)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    crazy_model = lambda x, t, c: jnp.full_like(x, 1e6)
    f = d.consistency_fn(crazy_model, z, jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(np.asarray(f), np.asarray(z), atol=1e-5)


def test_ddim_step_matches_sampler(sched):
    """ddim_step_to between two DDIM-table timesteps == the DDIM sampler's
    own η=0 update (diffusion/ddim.py:104-105) for an ε model."""
    from sd_tpu.core.schedules import DDIMSchedule
    from sd_tpu.diffusion.ddim import DDIMSampler

    dd = DDIMSchedule.create(sched, 10, eta=0.0)
    model = lambda x, t, c: 0.3 * x  # arbitrary deterministic eps model
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
    idx = 5
    t_from = int(dd.timesteps[idx])
    t_to = int(dd.timesteps[idx - 1])

    ref, _ = DDIMSampler(sched).p_sample_ddim(
        model, x, jnp.full((2,), t_from, jnp.int32),
        jnp.asarray(idx, jnp.int32), dd, rng=None)
    eps = model(x, None, None)
    got = ddim_step_to(sched, x, eps,
                       jnp.full((2,), t_from, jnp.int32),
                       jnp.full((2,), t_to, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_model_out_to_eps_x0_roundtrip(sched):
    """eps↔x0 coordinate changes agree across parameterizations when fed
    the corresponding exact outputs."""
    rng = jax.random.PRNGKey(2)
    x0 = jax.random.normal(rng, (2, 4, 4, 3))
    eps = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t = jnp.asarray([10, 70], jnp.int32)
    z = sched.q_sample(x0, t, eps)

    e1, x1 = model_out_to_eps_x0(sched, eps, z, t, "eps")
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=1e-4)
    e2, x2 = model_out_to_eps_x0(sched, x0, z, t, "x0")
    np.testing.assert_allclose(np.asarray(e2), np.asarray(eps), atol=1e-4)
    # v = α ε − σ x0
    from sd_tpu.core.schedules import extract

    a = extract(sched.sqrt_alphas_cumprod, t, 4)
    s = extract(sched.sqrt_one_minus_alphas_cumprod, t, 4)
    v = a * eps - s * x0
    e3, x3 = model_out_to_eps_x0(sched, v, z, t, "v")
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(e3), np.asarray(eps), atol=1e-4)


def test_pseudo_huber_limits():
    a = jnp.zeros((2, 8))
    b = jnp.ones((2, 8)) * 3.0
    # large-gap limit → ~L2 norm per sample
    d = float(pseudo_huber(a, b, c=1e-3))
    assert abs(d - np.sqrt(8 * 9.0)) < 0.01
    assert float(pseudo_huber(a, a)) == 0.0


def test_sampler_shapes_and_determinism(sched):
    d = ConsistencyDistiller(sched, num_boundaries=10)
    model = lambda x, t, c: 0.1 * x
    rng = jax.random.PRNGKey(3)
    for steps in (1, 2, 4):
        out = d.sample(model, rng, (2, 4, 4, 3), num_steps=steps)
        assert out.shape == (2, 4, 4, 3)
        out2 = d.sample(model, rng, (2, 4, 4, 3), num_steps=steps)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


# ---------------------------------------------------------------------------
# analytic end-to-end: distill the closed-form Gaussian teacher
# ---------------------------------------------------------------------------


def _analytic_eps_model(sched, mu, std):
    """Optimal ε-predictor for x0 ~ N(mu, std²): E[x0|z_t] is the Gaussian
    posterior mean, ε = (z − α·E[x0|z])/σ."""

    def model(z, t, cond):
        nd = z.ndim
        from sd_tpu.core.schedules import extract

        a = extract(sched.sqrt_alphas_cumprod, t, nd)
        s = extract(sched.sqrt_one_minus_alphas_cumprod, t, nd)
        x0_hat = (a * std**2 * z + s**2 * mu) / (a**2 * std**2 + s**2)
        return (z - a * x0_hat) / s

    return model


def test_distill_analytic_gaussian(sched):
    """Distill the analytic Gaussian teacher into a tiny MLP; the 2-step
    student samples must reproduce the data moments (the 50-step teacher's
    own endpoint distribution)."""
    import flax.linen as nn
    import optax

    from sd_tpu.core.ema import ema_init, ema_update

    mu, std = 1.5, 0.6
    dim = 4
    teacher = _analytic_eps_model(sched, mu, std)
    # a shorter boundary grid shortens the bootstrap chain (the boundary
    # anchor at t=0 must propagate hop by hop to t=T) — measured: 10
    # boundaries converge ~2× faster than 20 on this task
    dist = ConsistencyDistiller(sched, num_boundaries=10)

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, z, t):
            tf = t.astype(jnp.float32)[:, None] / sched.num_timesteps
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
    # fast-moving target network (iCT drops the EMA target entirely;
    # 0.5 measured best here among {0.0, 0.5, 0.7, 0.9})
    ema = ema_init(params, 0.5)

    def student_fn(p):
        return lambda z, t, c: mlp.apply(p, z, t)

    def loss(p, target_p, z0, r):
        l, _ = dist.distill_loss(student_fn(p), student_fn(target_p),
                                 teacher, z0, r)
        return l

    @jax.jit
    def step(p, o, e, r):
        r0, r1 = jax.random.split(r)
        z0 = mu + std * jax.random.normal(r0, (256, dim))
        l, g = jax.value_and_grad(loss)(p, e.shadow, z0, r1)
        up, o = opt.update(g, o, p)
        p = optax.apply_updates(p, up)
        return p, o, ema_update(e, p), l

    losses = []
    for i in range(1200):
        params, opt_state, ema, l = step(params, opt_state, ema,
                                         jax.random.fold_in(key, i))
        losses.append(float(l))
    assert np.mean(losses[-100:]) < np.mean(losses[:100]), "loss did not drop"

    for num_steps in (1, 2):
        samples = dist.sample(student_fn(params), jax.random.PRNGKey(42),
                              (4096, dim), num_steps=num_steps)
        got_mu = float(jnp.mean(samples))
        got_std = float(jnp.std(samples))
        assert abs(got_mu - mu) < 0.25, \
            f"S={num_steps} mean {got_mu} vs {mu}"
        assert abs(got_std - std) < 0.3, \
            f"S={num_steps} std {got_std} vs {std}"


@pytest.fixture(scope="module")
def teacher_run(tmp_path_factory):
    """A tiny trained LDM teacher + its image dir, shared by the distill
    runner tests."""
    from PIL import Image

    from sd_tpu.core.config import load_yaml
    from sd_tpu.train.runners import train_ldm

    root = tmp_path_factory.mktemp("distill")
    d = root / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")

    teacher_cfg = load_yaml("configs/sd_txt2img_smoke.yaml")
    teacher_cfg["train"]["total_steps"] = 2
    teacher_cfg["train"]["checkpoint_every"] = 2
    teacher_cfg["train"]["eval_every"] = 100
    train_ldm(teacher_cfg, str(d), out_dir=str(root / "teacher"))
    return str(root / "teacher"), str(d)


def test_consistency_step_grad_accum_matches_full_batch():
    """grad_accum=2 consistency step == the full-batch step for a
    deterministic loss (the microbatched flagship-distill memory path,
    make_consistency_train_step; chunk-mean == full mean for equal
    chunks)."""
    import numpy as np

    from sd_tpu.train.diffusion import ddpm_optimizer, init_train_state
    from sd_tpu.train.distill import make_consistency_train_step

    def loss_fn(params, target, prepped, rng):
        pred = params["w"] * prepped["z_hi"]
        tgt = target["w"] * prepped["z_lo"]
        loss = jnp.mean((pred - tgt - 1.0) ** 2)
        return loss, {"loss": loss}

    opt = ddpm_optimizer(1e-2)
    k = jax.random.PRNGKey(3)
    prepped = {"z_hi": jax.random.normal(k, (4, 4, 4, 3)),
               "z_lo": jax.random.normal(jax.random.fold_in(k, 1),
                                         (4, 4, 4, 3))}

    full = make_consistency_train_step(loss_fn, opt)
    acc = make_consistency_train_step(loss_fn, opt, grad_accum=2)

    # fresh states per call: the jitted step donates its input buffers
    mk = lambda: init_train_state({"w": jnp.asarray(0.5)}, opt,
                                  ema_decay=0.9)
    s_full, logs_full = full(mk(), prepped, k)
    s_acc, logs_acc = acc(mk(), prepped, k)

    np.testing.assert_allclose(float(s_acc.params["w"]),
                               float(s_full.params["w"]), rtol=1e-6)
    np.testing.assert_allclose(float(logs_acc["loss"]),
                               float(logs_full["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(logs_acc["grad_norm"]),
                               float(logs_full["grad_norm"]), rtol=1e-5)
    np.testing.assert_allclose(float(s_acc.ema.shadow["w"]),
                               float(s_full.ema.shadow["w"]), rtol=1e-6)


def test_distill_ldm_runner(teacher_run, tmp_path):
    """End-to-end runner smoke: distill the tiny teacher; checkpoints,
    metrics, and the few-step eval grid all land."""
    import os

    from sd_tpu.core.config import load_yaml
    from sd_tpu.train.distill import distill_ldm

    teacher, d = teacher_run
    cfg = load_yaml("configs/distill_smoke.yaml")
    cfg["distill"]["teacher_run"] = teacher
    cfg["train"]["total_steps"] = 2
    cfg["train"]["checkpoint_every"] = 2
    cfg["train"]["eval_every"] = 2  # exercise the few-step eval sampler
    state = distill_ldm(cfg, d, out_dir=str(tmp_path / "student"))
    assert int(state.step) == 2
    assert os.path.isdir(tmp_path / "student" / "ckpt")
    assert os.path.exists(tmp_path / "student" / "metrics.jsonl")
    assert os.path.exists(tmp_path / "student" / "samples" / "step_2.png")


def test_lcm_lora_runner(teacher_run, tmp_path):
    """LCM-LoRA (arXiv:2311.05556): distill into rank-r factors; the
    artifact serves through the ordinary LoRA merge + lcm sampler."""
    import os

    from sd_tpu.core.config import load_yaml
    from sd_tpu.train.distill import distill_ldm
    from sd_tpu.train.lora import load_lora_safetensors, merge_lora
    from sd_tpu.train.runners import build_ldm

    teacher, d = teacher_run
    cfg = load_yaml("configs/distill_smoke.yaml")
    cfg["distill"]["teacher_run"] = teacher
    cfg["distill"]["lora_rank"] = 4
    cfg["train"]["total_steps"] = 2
    cfg["train"]["checkpoint_every"] = 2
    cfg["train"]["eval_every"] = 100
    state = distill_ldm(cfg, d, out_dir=str(tmp_path / "lcm_lora"))
    # the trained state is the FACTOR tree, not full weights
    leaf_names = set()
    for v in state.params.values():
        leaf_names |= set(v.keys())
    assert leaf_names == {"a", "b"}
    art = tmp_path / "lcm_lora" / "lora.safetensors"
    assert art.exists()

    # serve: merge the factors over the teacher and run the lcm sampler
    import jax

    ld, unet, uparams, *_ = build_ldm(cfg, jax.random.PRNGKey(0))
    factors = load_lora_safetensors(str(art))
    merged = merge_lora(uparams, factors, 1.0)
    cond = {"c_crossattn": [jnp.zeros((1, 4, 32))]}  # context_dim=32
    out = ld.sample(merged, jax.random.PRNGKey(1), (1, 8, 8, 4),
                    sampler="lcm", num_steps=2, decode=False,
                    num_boundaries=10, cond=cond)
    assert out.shape == (1, 8, 8, 4)


def test_latent_sample_lcm_route(sched):
    """LatentDiffusion.sample(sampler='lcm') routes through the consistency
    sampler and rejects a CFG request (guidance is baked in)."""
    from sd_tpu.diffusion.ddpm import DDPMProcess
    from sd_tpu.diffusion.latent import LatentDiffusion

    ld = LatentDiffusion(
        process=DDPMProcess(sched),
        unet_apply=lambda p, x, t, ctx, y=None: 0.1 * x,
        conditioning_key=None,
    )
    out = ld.sample({}, jax.random.PRNGKey(0), (2, 4, 4, 3),
                    sampler="lcm", num_steps=2, decode=False)
    assert out.shape == (2, 4, 4, 3)
    with pytest.raises(ValueError, match="no CFG branch"):
        ld.sample({}, jax.random.PRNGKey(0), (2, 4, 4, 3),
                  sampler="lcm", num_steps=2, decode=False,
                  cond={"c_crossattn": [jnp.zeros((2, 4, 8))]},
                  uncond={"c_crossattn": [jnp.zeros((2, 4, 8))]},
                  guidance_scale=3.0)
