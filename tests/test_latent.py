"""LatentDiffusion tests: conditioning dispatch, frozen stages, training loss,
sampling glue, scale-factor calibration, patched (fold/unfold) apply.
Reference semantics: SURVEY.md §2.12, §5.7 (ldm/diffusion/ddpm.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.diffusion.ddpm import DDPMProcess
from sd_tpu.diffusion.latent import (
    LatentDiffusion,
    apply_conditioned,
    calibrate_scale_factor,
    extract_patches,
    fold_patches,
    patched_apply,
    _tie_breaker_weights,
)


def make_ld(conditioning_key="crossattn", **kw):
    sched = DiffusionSchedule.create(timesteps=20)
    process = DDPMProcess(sched)

    def unet_apply(params, x, t, context, y=None):
        # linear toy epsilon-model; context shifts the output
        out = params["w"] * x
        if context is not None:
            out = out + jnp.mean(context)
        if y is not None:
            out = out + y.astype(jnp.float32).reshape(-1, 1, 1, 1)
        return out

    base = dict(
        process=process,
        unet_apply=unet_apply,
        encode_fn=lambda x, rng: x[:, ::2, ::2],   # fake 2x encoder
        decode_fn=lambda z: jnp.repeat(jnp.repeat(z, 2, 1), 2, 2),
        cond_fn=lambda raw: raw * 2.0,
        conditioning_key=conditioning_key,
        scale_factor=0.5,
    )
    base.update(kw)
    return LatentDiffusion(**base)


PARAMS = {"w": jnp.asarray(0.1)}


def test_apply_conditioned_modes():
    unet_calls = {}

    def unet_apply(params, x, t, context, y=None):
        unet_calls["x_ch"] = x.shape[-1]
        unet_calls["ctx"] = None if context is None else context.shape
        unet_calls["y"] = y
        return x

    x = jnp.ones((1, 4, 4, 2))
    t = jnp.array([0])
    apply_conditioned(unet_apply, {}, x, t, None, None)
    assert unet_calls["x_ch"] == 2 and unet_calls["ctx"] is None

    cond = {"c_concat": [jnp.ones((1, 4, 4, 3))]}
    apply_conditioned(unet_apply, {}, x, t, cond, "concat")
    assert unet_calls["x_ch"] == 5

    cond = {"c_crossattn": [jnp.ones((1, 7, 8)), jnp.ones((1, 2, 8))]}
    apply_conditioned(unet_apply, {}, x, t, cond, "crossattn")
    assert unet_calls["ctx"] == (1, 9, 8)

    cond = {"c_concat": [jnp.ones((1, 4, 4, 1))],
            "c_crossattn": [jnp.ones((1, 7, 8))]}
    apply_conditioned(unet_apply, {}, x, t, cond, "hybrid")
    assert unet_calls["x_ch"] == 3 and unet_calls["ctx"] == (1, 7, 8)

    cond = {"c_adm": jnp.array([3])}
    apply_conditioned(unet_apply, {}, x, t, cond, "adm")
    assert unet_calls["y"] is not None

    with pytest.raises(ValueError):
        apply_conditioned(unet_apply, {}, x, t, cond, "bogus")


def test_get_input_and_scale(rng):
    ld = make_ld()
    batch = {"image": jnp.ones((2, 8, 8, 3)),
             "txt_emb": jnp.ones((2, 7, 16))}
    z, cond = ld.get_input(batch, rng)
    assert z.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(z), 0.5, atol=1e-6)  # scale_factor
    assert set(cond) == {"c_crossattn"}


def test_first_stage_frozen(rng):
    """encode/decode must carry no gradients back (stop_gradient)."""
    ld = make_ld()

    def loss(x):
        z = ld.get_first_stage_encoding(ld.encode_first_stage(x, rng))
        return jnp.sum(z)

    g = jax.grad(loss)(jnp.ones((1, 4, 4, 3)))
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_training_loss_runs(rng):
    ld = make_ld()
    batch = {"image": jnp.ones((2, 8, 8, 3)),
             "txt_emb": jnp.zeros((2, 7, 16))}
    loss, logs = ld.training_loss(PARAMS, batch, rng)
    assert np.isfinite(float(loss))
    assert "loss_simple" in logs and "loss_vlb" in logs

    # learned logvar path
    lv = jnp.zeros((20,))
    loss2, logs2 = ld.training_loss(PARAMS, batch, rng, learned_logvar=lv)
    assert "loss_gamma" in logs2


def test_training_noise_offset(rng):
    """noise_offset changes the drawn noise (same rng) and the loss; the
    offset component is constant per (sample, channel)."""
    import dataclasses as _dc

    from sd_tpu.diffusion.ddpm import draw_training_noise

    n0 = draw_training_noise(rng, (4, 8, 8, 3), 0.0)
    n1 = draw_training_noise(rng, (4, 8, 8, 3), 0.5)
    # the offset term is spatially constant: subtracting the base noise
    # leaves a per-(sample,channel) DC value
    delta = np.asarray(n1 - n0)
    assert not np.allclose(delta, 0.0)
    np.testing.assert_allclose(
        delta, np.broadcast_to(delta[:, :1, :1, :], delta.shape),
        rtol=1e-5, atol=1e-6)
    # channel-mean variance grows with the offset (the knob's entire point)
    assert float(np.var(np.asarray(n1).mean(axis=(1, 2)))) > \
        float(np.var(np.asarray(n0).mean(axis=(1, 2))))

    ld = make_ld()
    batch = {"image": jnp.ones((2, 8, 8, 3)),
             "txt_emb": jnp.zeros((2, 7, 16))}
    loss0, _ = ld.training_loss(PARAMS, batch, rng)
    loss1, _ = _dc.replace(ld, noise_offset=0.5).training_loss(
        PARAMS, batch, rng)
    assert np.isfinite(float(loss1))
    assert float(loss0) != float(loss1)


def test_training_loss_grad_wrt_params(rng):
    ld = make_ld()
    batch = {"image": jnp.ones((2, 8, 8, 3)),
             "txt_emb": jnp.zeros((2, 7, 16))}
    g = jax.grad(lambda p: ld.training_loss(p, batch, rng)[0])(PARAMS)
    assert np.isfinite(float(g["w"])) and float(jnp.abs(g["w"])) > 0


def test_sample_decodes(rng):
    ld = make_ld()
    cond = {"c_crossattn": [jnp.zeros((2, 7, 16))]}
    img = ld.sample(PARAMS, rng, (2, 4, 4, 3), cond=cond, num_steps=5)
    assert img.shape == (2, 8, 8, 3)  # decoded back to pixel space
    z = ld.sample(PARAMS, rng, (2, 4, 4, 3), cond=cond, num_steps=5, decode=False)
    assert z.shape == (2, 4, 4, 3)


def test_sample_cfg_and_ancestral(rng):
    ld = make_ld()
    cond = {"c_crossattn": [jnp.ones((1, 7, 16))]}
    uncond = {"c_crossattn": [jnp.zeros((1, 7, 16))]}
    img = ld.sample(PARAMS, rng, (1, 4, 4, 3), cond=cond, uncond=uncond,
                    guidance_scale=3.0, num_steps=4)
    assert img.shape == (1, 8, 8, 3)
    img2 = ld.sample(PARAMS, rng, (1, 4, 4, 3), cond=cond, use_ddim=False)
    assert img2.shape == (1, 8, 8, 3)


def test_calibrate_scale_factor(rng):
    z = jax.random.normal(rng, (4, 8, 8, 4)) * 2.0
    s = calibrate_scale_factor(z)
    np.testing.assert_allclose(s, 0.5, rtol=0.1)


def test_extract_fold_roundtrip():
    """Non-overlapping patches fold back exactly (weights cancel)."""
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    p = extract_patches(x, ks=4, stride=4)
    assert p.shape == (2, 2, 2, 4, 4, 3)
    w = _tie_breaker_weights(4)
    back = fold_patches(p, (8, 8), 4, w)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5)


def test_extract_fold_overlapping():
    """Overlapping identity fold reproduces the input (normalization)."""
    x = jnp.ones((1, 8, 8, 2))
    p = extract_patches(x, ks=4, stride=2)
    back = fold_patches(p, (8, 8), 2, _tie_breaker_weights(4))
    np.testing.assert_allclose(np.asarray(back), 1.0, rtol=1e-5)


def test_patched_apply_identity_and_scale():
    x = jnp.arange(1 * 8 * 8 * 2, dtype=jnp.float32).reshape(1, 8, 8, 2)
    out = patched_apply(lambda p: p, x, ks=4, stride=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5)

    # a 2x-upsampling fn (e.g. a decoder): output doubles spatially
    up = lambda p: jnp.repeat(jnp.repeat(p, 2, 1), 2, 2)
    out2 = patched_apply(up, x, ks=4, stride=4, scale=2)
    assert out2.shape == (1, 16, 16, 2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(up(x)), rtol=1e-5)


def test_patched_apply_bbox():
    """coordinates_bbox patched apply: every patch is re-conditioned on its
    own tokenized crop box (reference: ldm/diffusion/ddpm.py:1372-1419).
    Oracle: per-patch loop with the same toy model."""
    from sd_tpu.diffusion.latent import (bbox_patch_limits, patched_apply_bbox)

    # per-sample toy model (the default make_ld unet takes a GLOBAL context
    # mean, which differs between the batched-all-patches form and the
    # per-patch oracle)
    def unet_apply(params, x, t, context, y=None):
        shift = jnp.mean(context, axis=(1, 2)).reshape(-1, 1, 1, 1)
        return params["w"] * x + shift

    ld = make_ld(unet_apply=unet_apply)
    B, H, W, C = 2, 8, 8, 3
    ks, stride = 4, 4
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, H, W, C)),
                    jnp.float32)
    t = jnp.array([3, 7])
    cond_tokens = jnp.arange(2 * 6, dtype=jnp.int32).reshape(2, 6)

    # toy pieces: crop box -> 2 int tokens; tokens -> [N, M, D] embeddings
    def crop_encoder(box):
        return [int(box[0] * 100), int(box[1] * 100)]

    def encode_tokens(ids):
        return ids[:, :, None].astype(jnp.float32) * 0.01  # [N, n, 1]

    out = patched_apply_bbox(
        ld, PARAMS, x, t, cond_tokens, ks=ks, stride=stride,
        original_image_size=(64, 64), rescale_latent=8,
        crop_encoder=crop_encoder, encode_tokens=encode_tokens)
    assert out.shape == x.shape

    # oracle: loop over patches, same conditioning construction
    limits = bbox_patch_limits((H, W), ks, stride, (64, 64), 8)
    n_row = (W - ks) // stride + 1
    expected = np.zeros((B, H, W, C), np.float32)
    for pn, box in enumerate(limits):
        ih, iw = pn // n_row, pn % n_row
        patch = x[:, ih * stride:ih * stride + ks, iw * stride:iw * stride + ks]
        coord = jnp.asarray(crop_encoder(box), jnp.int32)
        adapted = jnp.concatenate(
            [cond_tokens[:, :-2], jnp.broadcast_to(coord[None], (B, 2))], -1)
        ctx = encode_tokens(adapted)
        o = ld.apply_model(PARAMS, patch, t, {"c_crossattn": [ctx]})
        expected[:, ih * stride:ih * stride + ks,
                 iw * stride:iw * stride + ks] += np.asarray(o)
    # stride == ks: non-overlapping, weights cancel in the fold
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_patched_apply_downscale():
    """patched_apply supports DOWNSCALING fns (tiled VAE encode): a 2×2
    average-pool per patch must reproduce the whole-image average-pool
    exactly (linear fn ⇒ overlap-add weighting cancels)."""
    import jax.numpy as jnp

    from sd_tpu.diffusion.latent import patched_apply

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))

    def pool2(p):
        B, H, W, C = p.shape
        return p.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))

    out = patched_apply(pool2, x, ks=8, stride=4)
    ref = pool2(x)
    assert out.shape == (2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_patched_apply_downscale_rejects_uneven():
    import jax.numpy as jnp
    import pytest

    from sd_tpu.diffusion.latent import patched_apply

    x = jnp.zeros((1, 12, 12, 1))

    def pool3(p):  # oks=ks/3: stride 4 * 1/3 is not integral
        B, H, W, C = p.shape
        return p.reshape(B, H // 3, 3, W // 3, 3, C).mean(axis=(2, 4))

    with pytest.raises(ValueError, match="evenly"):
        patched_apply(pool3, x, ks=6, stride=4)
