"""FreeU tests (models/unet_sd.py _fourier_filter/_apply_freeu,
arXiv:2309.11497): spectral-filter math, decoder wiring, parameter-freeness,
neutrality at the identity setting."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.models.unet_sd import UNetModel, _apply_freeu, _fourier_filter

KW = dict(in_channels=4, model_channels=32, out_channels=4,
          num_res_blocks=1, attention_resolutions=(2,),
          channel_mult=(1, 2, 4), num_heads=4, context_dim=16,
          transformer_depth=1)


def test_fourier_filter_scales_dc_only():
    """scale on the low band hits the mean (DC) but leaves a pure
    high-frequency signal untouched."""
    B, H, W, C = 1, 8, 8, 2
    const = jnp.ones((B, H, W, C))
    out = _fourier_filter(const, threshold=1, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)

    # Nyquist checkerboard lives at the spectrum edge — untouched
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    checker = jnp.asarray(((-1.0) ** (yy + xx))[None, :, :, None]
                          * np.ones((B, H, W, C)), jnp.float32)
    out = _fourier_filter(checker, threshold=1, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(checker), atol=1e-4)


def test_fourier_filter_identity_at_scale_one():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 3)),
                    jnp.float32)
    out = _fourier_filter(x, threshold=1, scale=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_apply_freeu_width_gating():
    mc = 32
    freeu = (1.5, 1.25, 0.5, 0.75)
    rng = np.random.default_rng(1)
    mk = lambda c: jnp.asarray(rng.standard_normal((1, 4, 4, c)), jnp.float32)

    # deepest width: b1/s1
    h, skip = mk(mc * 4), mk(mc * 4)
    h2, skip2 = _apply_freeu(h, skip, mc, freeu)
    np.testing.assert_allclose(np.asarray(h2[..., : mc * 2]),
                               np.asarray(h[..., : mc * 2]) * 1.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h2[..., mc * 2:]),
                               np.asarray(h[..., mc * 2:]))
    assert not np.allclose(np.asarray(skip2), np.asarray(skip))

    # second width: b2/s2
    h, skip = mk(mc * 2), mk(mc * 2)
    h2, _ = _apply_freeu(h, skip, mc, freeu)
    np.testing.assert_allclose(np.asarray(h2[..., : mc]),
                               np.asarray(h[..., : mc]) * 1.25, rtol=1e-6)

    # other widths untouched
    h, skip = mk(mc), mk(mc)
    h2, skip2 = _apply_freeu(h, skip, mc, freeu)
    np.testing.assert_array_equal(np.asarray(h2), np.asarray(h))
    np.testing.assert_array_equal(np.asarray(skip2), np.asarray(skip))


@pytest.fixture(scope="module")
def unet_setup():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16))
    params = UNetModel(**KW).init(rng, x, t, ctx)["params"]
    # zero-init out conv ⇒ perturb so the decoder path shows through
    params = jax.tree.map(
        lambda p: p + 0.02 * jnp.cos(jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape), params)
    return params, x, t, ctx


def test_unet_freeu_changes_output_not_params(unet_setup):
    params, x, t, ctx = unet_setup
    base = UNetModel(**KW)
    fu = UNetModel(**KW, freeu=(1.2, 1.4, 0.9, 0.2))
    # identical param trees: FreeU is parameter-free
    jax.tree.map(lambda a, b: None, params,
                 fu.init(jax.random.PRNGKey(0), x, t, ctx)["params"])
    out_base = base.apply({"params": params}, x, t, ctx)
    out_fu = fu.apply({"params": params}, x, t, ctx)
    assert out_fu.shape == out_base.shape
    assert np.isfinite(np.asarray(out_fu)).all()
    assert not np.allclose(np.asarray(out_fu), np.asarray(out_base))


def test_unet_freeu_identity_setting_is_exact(unet_setup):
    params, x, t, ctx = unet_setup
    out_base = UNetModel(**KW).apply({"params": params}, x, t, ctx)
    out_id = UNetModel(**KW, freeu=(1.0, 1.0, 1.0, 1.0)).apply(
        {"params": params}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_id), np.asarray(out_base),
                               atol=2e-5)


def test_pipeline_set_unet_options():
    """Serving-time toggle: same params, new graph, program cache reset."""
    from sd_tpu.pipeline import Text2ImagePipeline

    pipe = Text2ImagePipeline.from_config("configs/sd_txt2img_smoke.yaml",
                                          param_dtype=None)
    # perturb so the decoder path contributes (zero-init out conv)
    pipe.unet_params = jax.tree.map(
        lambda p: p + 0.05 * jnp.cos(1.3 * jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape).astype(p.dtype),
        pipe.unet_params)
    base = pipe.generate(["a cat"], num_steps=2, guidance_scale=2.0, seed=3)
    pipe.set_unet_options(freeu=(1.4, 1.6, 0.5, 0.2))
    assert pipe.unet.freeu == (1.4, 1.6, 0.5, 0.2)
    fu = pipe.generate(["a cat"], num_steps=2, guidance_scale=2.0, seed=3)
    assert fu.shape == base.shape
    assert not np.array_equal(fu, base)
    # and back to exact baseline when cleared
    pipe.set_unet_options(freeu=None)
    again = pipe.generate(["a cat"], num_steps=2, guidance_scale=2.0, seed=3)
    np.testing.assert_array_equal(again, base)


def test_unet_freeu_jits(unet_setup):
    params, x, t, ctx = unet_setup
    fu = UNetModel(**KW, freeu=(1.2, 1.4, 0.9, 0.2))
    out = jax.jit(lambda p: fu.apply({"params": p}, x, t, ctx))(params)
    assert np.isfinite(np.asarray(out)).all()
