"""Self-Attention Guidance (diffusion/sag.py + nn/attn_probe.py).

Beyond-reference feature (the reference exposes only CFG,
DDIM/ddim.py:75-80); tested here for: capture correctness (probs are real
softmax rows from the mid block), blur correctness vs a numpy oracle, mask
semantics, zero-scale degeneration to the plain DDIM path, and the
composed CFG+SAG sampler running finite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.diffusion.ddim import DDIMSampler
from sd_tpu.diffusion.sag import (degrade_pred_x0, gaussian_blur_2d,
                                  make_probs_apply, sag_mask_from_probs)
from sd_tpu.models.unet_sd import UNetModel
from sd_tpu.nn.attn_probe import (capture_self_attention, collect_sown_probs)


@pytest.fixture(scope="module")
def tiny_unet():
    unet = UNetModel(
        in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=[1, 2],
        channel_mult=[1, 2], num_heads=4, context_dim=16)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 5, 16))
    params = unet.init(rng, x, t, ctx)["params"]
    # the SD UNet's out_conv is zero-initialized (reference zero_module) —
    # fresh params predict exactly 0, which would make SAG a trivial no-op.
    # Randomize it so the model output actually depends on its input.
    params["out_conv"]["kernel"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(9), params["out_conv"]["kernel"].shape)
    return unet, params


def test_capture_probs_shape_and_rows(tiny_unet):
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 5, 16))
    with capture_self_attention("mid_attn", max_tokens=64):
        out, inter = unet.apply({"params": params}, x, t, ctx,
                                mutable=["intermediates"])
    probs = collect_sown_probs(inter, "mid_attn")
    # mid block: 16/2 = 8 → 64 tokens, 4 heads
    assert probs.shape == (2, 4, 64, 64)
    np.testing.assert_allclose(np.asarray(jnp.sum(probs, axis=-1)), 1.0,
                               atol=1e-5)
    assert out.shape == x.shape


def test_capture_does_not_change_output(tiny_unet):
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 5, 16))
    base = unet.apply({"params": params}, x, t, ctx)
    with capture_self_attention("mid_attn", max_tokens=64):
        probed, _ = unet.apply({"params": params}, x, t, ctx,
                               mutable=["intermediates"])
    np.testing.assert_allclose(np.asarray(base), np.asarray(probed),
                               atol=2e-5)


def test_collect_raises_without_capture(tiny_unet):
    unet, params = tiny_unet
    x = jnp.zeros((1, 16, 16, 3))
    _, inter = unet.apply(
        {"params": params}, x, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 5, 16)), mutable=["intermediates"])
    with pytest.raises(ValueError, match="attn_probs"):
        collect_sown_probs(inter, "mid_attn")


def test_gaussian_blur_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 12, 10, 3)).astype(np.float32)
    ks, sigma = 5, 1.3
    half = ks // 2
    pts = np.arange(-half, half + 1, dtype=np.float32)
    k1 = np.exp(-(pts**2) / (2 * sigma * sigma))
    k1 /= k1.sum()
    # zero-padded separable conv, matching SAME semantics
    want = np.zeros_like(x)
    pad = np.pad(x, ((0, 0), (half, half), (0, 0), (0, 0)))
    tmp = sum(k1[i] * pad[:, i:i + x.shape[1]] for i in range(ks))
    pad = np.pad(tmp, ((0, 0), (0, 0), (half, half), (0, 0)))
    want = sum(k1[i] * pad[:, :, i:i + x.shape[2]] for i in range(ks))
    got = np.asarray(gaussian_blur_2d(jnp.asarray(x), ks, sigma))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sag_mask_semantics():
    # 4 tokens, 1 head: all queries attend to token 0 → only token 0 salient
    probs = np.zeros((1, 1, 4, 4), np.float32)
    probs[:, :, :, 0] = 1.0
    mask = np.asarray(sag_mask_from_probs(jnp.asarray(probs), 2, 2))
    assert mask.shape == (1, 2, 2, 1)
    assert mask.flatten().tolist() == [1.0, 0.0, 0.0, 0.0]
    # uniform attention → column mass exactly 1.0 everywhere → nothing > 1
    uni = np.full((1, 1, 4, 4), 0.25, np.float32)
    mask = np.asarray(sag_mask_from_probs(jnp.asarray(uni), 2, 2))
    assert mask.sum() == 0.0


def test_degrade_only_inside_mask():
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 8, 8, 2)).astype(np.float32))
    mask = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)
    deg = degrade_pred_x0(x, mask, kernel_size=3, sigma=1.0)
    np.testing.assert_array_equal(np.asarray(deg[:, 5:]),
                                  np.asarray(x[:, 5:]))
    assert float(jnp.abs(deg[:, :4] - x[:, :4]).max()) > 0.0


def test_sag_sampler_runs_and_zero_scale_matches(tiny_unet):
    unet, params = tiny_unet
    rng = jax.random.PRNGKey(3)
    sched = DiffusionSchedule.create(timesteps=20)
    s = DDIMSampler(sched)
    ap = make_probs_apply(unet)
    cond = {"c_crossattn": [jax.random.normal(rng, (2, 5, 16))]}
    unc = {"c_crossattn": [jnp.zeros((2, 5, 16))]}

    def mf(x, t, c):
        return unet.apply({"params": params}, x, t, c["c_crossattn"][0])

    def pf(x, t, c):
        return ap(params, x, t, c["c_crossattn"][0])

    base = s.sample(mf, rng, (2, 16, 16, 3), num_steps=4, cond=cond,
                    uncond=unc, guidance_scale=3.0)
    sag = s.sample(mf, rng, (2, 16, 16, 3), num_steps=4, cond=cond,
                   uncond=unc, guidance_scale=3.0,
                   sag_scale=0.75, sag_probs_fn=pf)
    assert bool(jnp.isfinite(sag).all())
    assert float(jnp.abs(sag - base).max()) > 1e-6  # SAG changes the output
    # sag_scale=0 routes the plain path — bitwise identical
    zero = s.sample(mf, rng, (2, 16, 16, 3), num_steps=4, cond=cond,
                    uncond=unc, guidance_scale=3.0,
                    sag_scale=0.0, sag_probs_fn=pf)
    np.testing.assert_array_equal(np.asarray(zero), np.asarray(base))
    with pytest.raises(ValueError, match="sag_probs_fn"):
        s.sample(mf, rng, (2, 16, 16, 3), num_steps=4, cond=cond,
                 uncond=unc, guidance_scale=3.0, sag_scale=0.5)


def test_sag_through_latent_diffusion(tiny_unet):
    """LatentDiffusion.sample(sag_scale=...) end to end, and the
    non-DDIM-sampler rejection."""
    import dataclasses

    from sd_tpu.diffusion.ddpm import DDPMProcess
    from sd_tpu.diffusion.latent import LatentDiffusion
    from sd_tpu.diffusion.sag import make_probs_apply

    unet, params = tiny_unet
    sched = DiffusionSchedule.create(timesteps=20)
    ld = LatentDiffusion(
        process=DDPMProcess(sched, clip_denoised=False),
        unet_apply=lambda p, x, t, ctx, y=None: unet.apply(
            {"params": p}, x, t, ctx, y),
        unet_apply_probs=make_probs_apply(unet),
        conditioning_key="crossattn",
    )
    rng = jax.random.PRNGKey(4)
    cond = {"c_crossattn": [jnp.zeros((2, 5, 16))]}
    z = ld.sample(params, rng, (2, 16, 16, 3), cond=cond, num_steps=4,
                  decode=False, sag_scale=0.5)
    assert z.shape == (2, 16, 16, 3) and bool(jnp.isfinite(z).all())
    with pytest.raises(ValueError, match="ddim"):
        ld.sample(params, rng, (2, 16, 16, 3), cond=cond, num_steps=4,
                  decode=False, sag_scale=0.5, sampler="euler")
    with pytest.raises(ValueError, match="unet_apply_probs"):
        dataclasses.replace(ld, unet_apply_probs=None).sample(
            params, rng, (2, 16, 16, 3), cond=cond, num_steps=4,
            decode=False, sag_scale=0.5)
