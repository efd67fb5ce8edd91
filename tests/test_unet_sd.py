"""SD UNet (guided-diffusion UNetModel) tests: shapes, conditioning paths,
zero-init head, class conditioning, attention pooling.
Reference semantics: SURVEY.md §2.11 (openai_model/model.py, attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.models.unet_sd import AttentionPool2d, SelfAttentionBlock2D, UNetModel


def tiny_unet(**kw):
    base = dict(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
        context_dim=16, transformer_depth=1,
    )
    base.update(kw)
    return UNetModel(**base)


def test_unet_sd_shapes_crossattn(rng):
    m = tiny_unet()
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.array([0, 999])
    ctx = jnp.ones((2, 7, 16))
    params = m.init(rng, x, t, ctx)
    out = m.apply(params, x, t, ctx)
    assert out.shape == x.shape


def test_unet_sd_zero_init_head(rng):
    """Output conv is zero-init: a fresh model must output exactly zero."""
    m = tiny_unet()
    x = jax.random.normal(rng, (1, 8, 8, 4))
    t = jnp.array([10])
    ctx = jnp.ones((1, 7, 16))
    params = m.init(rng, x, t, ctx)
    out = m.apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_unet_sd_context_changes_output(rng):
    m = tiny_unet()
    x = jax.random.normal(rng, (1, 8, 8, 4))
    t = jnp.array([10])
    c1 = jnp.zeros((1, 7, 16))
    c2 = jnp.ones((1, 7, 16))
    params = m.init(rng, x, t, c1)
    # perturb the out conv so outputs are non-zero
    params = jax.tree.map(lambda p: p + 0.01, params)
    o1 = m.apply(params, x, t, c1)
    o2 = m.apply(params, x, t, c2)
    assert float(jnp.max(jnp.abs(o1 - o2))) > 0


def test_unet_sd_self_attn_variant(rng):
    m = tiny_unet(use_spatial_transformer=False, context_dim=None)
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.array([5])
    params = m.init(rng, x, t)
    assert m.apply(params, x, t).shape == x.shape


def test_unet_sd_class_conditional(rng):
    m = tiny_unet(num_classes=10)
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.array([1, 2])
    ctx = jnp.ones((2, 7, 16))
    y = jnp.array([3, 7])
    params = m.init(rng, x, t, ctx, y)
    out = m.apply(params, x, t, ctx, y)
    assert out.shape == x.shape
    with pytest.raises(AssertionError):
        m.apply(params, x, t, ctx, None)


def test_unet_sd_num_head_channels(rng):
    m = tiny_unet(num_head_channels=8, num_heads=-1)
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.array([5])
    ctx = jnp.ones((1, 7, 16))
    params = m.init(rng, x, t, ctx)
    assert m.apply(params, x, t, ctx).shape == x.shape


def test_unet_sd_codebook_head(rng):
    m = tiny_unet(n_embed=64)
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.array([5])
    ctx = jnp.ones((1, 7, 16))
    params = m.init(rng, x, t, ctx)
    out = m.apply(params, x, t, ctx)
    assert out.shape == (1, 8, 8, 64)


def test_self_attention_block(rng):
    m = SelfAttentionBlock2D(num_heads=4)
    x = jax.random.normal(rng, (2, 4, 4, 16))
    params = m.init(rng, x)
    out = m.apply(params, x)
    assert out.shape == x.shape
    # zero-init proj: block is identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_attention_pool2d(rng):
    m = AttentionPool2d(num_heads=4, output_dim=8)
    x = jax.random.normal(rng, (2, 4, 4, 16))
    params = m.init(rng, x)
    out = m.apply(params, x)
    assert out.shape == (2, 8)


def test_cross_attention_mask(rng):
    from sd_tpu.nn.attention import CrossAttention

    ca = CrossAttention(heads=2, dim_head=8)
    x = jax.random.normal(rng, (1, 4, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16))
    params = ca.init(rng, x, ctx)
    full = ca.apply(params, x, ctx, jnp.ones((1, 6), bool))
    # masking out half the context must change the output
    half = ca.apply(params, x, ctx, jnp.array([[True] * 3 + [False] * 3]))
    assert float(jnp.max(jnp.abs(full - half))) > 1e-4
    # unmasked call equals all-True mask at fp32 tolerance
    un = ca.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(un), np.asarray(full), atol=1e-5)
