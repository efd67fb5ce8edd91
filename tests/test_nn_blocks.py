"""Shape/behavior tests for the shared nn blocks (SURVEY.md §2.3, §2.11)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from sd_tpu.nn.attention import (
    AttnBlock,
    BasicTransformerBlock,
    CrossAttention,
    FeedForwardGEGLU,
    LinearAttention,
    SpatialTransformer,
    make_attn,
)
from sd_tpu.nn.layers import GroupNorm32, timestep_embedding, zeros_init_conv
from sd_tpu.nn.resnet import ResBlockSD, ResnetBlock
from sd_tpu.nn.updown import Downsample, Upsample, nearest_upsample_2x


def init_apply(mod, rng, *args, **kwargs):
    params = mod.init(rng, *args, **kwargs)
    return mod.apply(params, *args, **kwargs), params


def test_groupnorm_matches_torch(rng):
    x = jax.random.normal(rng, (2, 8, 8, 64))
    mod = GroupNorm32(32, epsilon=1e-6)
    out, params = init_apply(mod, rng, x)
    tx = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)
    ref = torch.nn.functional.group_norm(tx, 32, eps=1e-6).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_groupnorm_bf16_fp32_accum(rng):
    x = jax.random.normal(rng, (1, 4, 4, 32), dtype=jnp.bfloat16)
    mod = GroupNorm32(32)
    out, _ = init_apply(mod, rng, x)
    assert out.dtype == jnp.bfloat16


def test_timestep_embedding_matches_torch_openai():
    import math

    t = jnp.array([0, 1, 500, 999])
    emb = timestep_embedding(t, 128)
    # independent torch computation of the guided-diffusion formula
    tt = torch.tensor([0, 1, 500, 999], dtype=torch.float32)
    half = 64
    freqs = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
    args = tt[:, None] * freqs[None]
    ref = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    # atol covers fp32 trig precision differences (XLA vs torch) at args ~1e3 rad
    np.testing.assert_allclose(np.asarray(emb), ref.numpy(), atol=5e-3)
    # odd dim pads a zero
    assert timestep_embedding(t, 129).shape == (4, 129)


def test_zeros_init_conv(rng):
    x = jax.random.normal(rng, (1, 4, 4, 8))
    mod = zeros_init_conv(8)
    out, params = init_apply(mod, rng, x)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_resnet_block_shapes(rng):
    x = jax.random.normal(rng, (2, 8, 8, 32))
    temb = jax.random.normal(rng, (2, 512))
    for out_ch, conv_short in [(32, False), (64, False), (64, True)]:
        mod = ResnetBlock(out_channels=out_ch, use_conv_shortcut=conv_short)
        out, _ = init_apply(mod, rng, x, temb)
        assert out.shape == (2, 8, 8, out_ch)


def test_resblock_sd_zero_init_is_identity_plus_skip(rng):
    # with zero-init out conv the block output equals the skip path at init
    x = jax.random.normal(rng, (2, 8, 8, 32))
    emb = jax.random.normal(rng, (2, 128))
    mod = ResBlockSD(out_channels=32, use_scale_shift_norm=True)
    out, _ = init_apply(mod, rng, x, emb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_resblock_sd_updown(rng):
    x = jax.random.normal(rng, (2, 8, 8, 32))
    emb = jax.random.normal(rng, (2, 128))
    up, _ = init_apply(ResBlockSD(out_channels=64, up=True), rng, x, emb)
    assert up.shape == (2, 16, 16, 64)
    down, _ = init_apply(ResBlockSD(out_channels=64, down=True), rng, x, emb)
    assert down.shape == (2, 4, 4, 64)


def test_upsample_downsample(rng):
    x = jax.random.normal(rng, (1, 8, 8, 16))
    assert nearest_upsample_2x(x).shape == (1, 16, 16, 16)
    up, _ = init_apply(Upsample(), rng, x)
    assert up.shape == (1, 16, 16, 16)
    down_sym, _ = init_apply(Downsample(), rng, x)
    assert down_sym.shape == (1, 4, 4, 16)
    down_asym, _ = init_apply(Downsample(asymmetric_padding=True), rng, x)
    assert down_asym.shape == (1, 4, 4, 16)
    pool, _ = init_apply(Downsample(with_conv=False), rng, x)
    assert pool.shape == (1, 4, 4, 16)


def test_attn_block(rng):
    x = jax.random.normal(rng, (2, 8, 8, 64))
    out, _ = init_apply(AttnBlock(), rng, x)
    assert out.shape == x.shape


def test_linear_attention(rng):
    x = jax.random.normal(rng, (2, 8, 8, 64))
    out, _ = init_apply(LinearAttention(), rng, x)
    assert out.shape == x.shape


def test_make_attn_none_identity(rng):
    x = jax.random.normal(rng, (1, 4, 4, 32))
    mod = make_attn("none")
    out, _ = init_apply(mod, rng, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_cross_attention_self_and_cross(rng):
    x = jax.random.normal(rng, (2, 16, 64))
    ctx = jax.random.normal(rng, (2, 77, 768))
    self_out, _ = init_apply(CrossAttention(heads=4, dim_head=16), rng, x)
    assert self_out.shape == x.shape
    cross_out, _ = init_apply(CrossAttention(heads=4, dim_head=16), rng, x, ctx)
    assert cross_out.shape == x.shape


def test_geglu_ff(rng):
    x = jax.random.normal(rng, (2, 16, 64))
    out, _ = init_apply(FeedForwardGEGLU(), rng, x)
    assert out.shape == x.shape


def test_spatial_transformer_zero_init_residual(rng):
    x = jax.random.normal(rng, (2, 8, 8, 64))
    ctx = jax.random.normal(rng, (2, 77, 768))
    mod = SpatialTransformer(heads=4, dim_head=16, depth=1)
    out, _ = init_apply(mod, rng, x, ctx)
    assert out.shape == x.shape
    # proj_out is zero-init → residual passthrough at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_basic_transformer_block(rng):
    x = jax.random.normal(rng, (2, 16, 64))
    ctx = jax.random.normal(rng, (2, 77, 768))
    out, _ = init_apply(BasicTransformerBlock(heads=4, dim_head=16), rng, x, ctx)
    assert out.shape == x.shape


def test_upsample_conv_subpixel_weight_exact(rng):
    """The four-phase subpixel form of nearest×2 + SAME 3×3 conv is
    weight-exact vs the naive computation (sd_tpu/nn/updown.py
    upsample_conv_2x; reference op: Unet/unet.py Upsample)."""
    import numpy as np

    from sd_tpu.nn.updown import (Upsample, nearest_upsample_2x,
                                  upsample_conv_2x)

    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(2, 7, 9, 5)).astype(np.float32))
    w = jnp.asarray(r.normal(size=(3, 3, 5, 6)).astype(np.float32))
    b = jnp.asarray(r.normal(size=(6,)).astype(np.float32))

    u = nearest_upsample_2x(x)
    ref = jax.lax.conv_general_dilated(
        u, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = upsample_conv_2x(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)

    # module path: same param tree as a plain nn.Conv ("conv"/{kernel,bias})
    m = Upsample(out_channels=6)
    params = m.init(rng, x)
    assert set(params["params"]["conv"].keys()) == {"kernel", "bias"}
    y = m.apply(params, x)
    ref_m = jax.lax.conv_general_dilated(
        u, params["params"]["conv"]["kernel"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + params["params"]["conv"]["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_m),
                               atol=2e-5, rtol=1e-5)
