"""Shape/behavior tests for the first-stage codec stack (Encoder/Decoder,
auxiliary heads, AutoencoderKL, VQModel). Reference semantics: SURVEY.md §2.4,
§2.5, §2.9."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.models.autoencoder import AutoencoderKL, IdentityFirstStage, VQModel
from sd_tpu.models.codec import (
    Decoder,
    Encoder,
    FirstStagePostProcessor,
    LatentRescaler,
    Resize,
    SimpleDecoder,
    UpsampleDecoder,
)


def test_encoder_decoder_roundtrip_shapes(rng):
    enc = Encoder(ch=16, ch_mult=(1, 2), num_res_blocks=1, resolution=16,
                  z_channels=4, double_z=True, attn_resolutions=(8,))
    x = jnp.ones((2, 16, 16, 3))
    params = enc.init(rng, x)
    moments = enc.apply(params, x)
    # f=2 downsampling: 16 -> 8; double_z doubles channels
    assert moments.shape == (2, 8, 8, 8)

    dec = Decoder(ch=16, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                  resolution=16, z_channels=4, attn_resolutions=(8,))
    z = jnp.ones((2, 8, 8, 4))
    dparams = dec.init(rng, z)
    out = dec.apply(dparams, z)
    assert out.shape == (2, 16, 16, 3)


def test_decoder_tanh_bounds(rng):
    dec = Decoder(ch=8, out_ch=3, ch_mult=(1,), num_res_blocks=1,
                  resolution=8, z_channels=4, tanh_out=True)
    z = jax.random.normal(rng, (1, 8, 8, 4)) * 10
    params = dec.init(rng, z)
    out = dec.apply(params, z)
    assert jnp.all(jnp.abs(out) <= 1.0)


def test_autoencoder_kl_forward_and_kl(rng):
    m = AutoencoderKL(embed_dim=4, ch=16, ch_mult=(1, 2), num_res_blocks=1,
                      resolution=16, z_channels=4)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    params = m.init(rng, x, rng)
    recon, posterior = m.apply(params, x, rng)
    assert recon.shape == x.shape
    kl = posterior.kl()
    assert kl.shape == (2,)
    assert bool(jnp.all(kl >= 0))

    # mode path (sample_posterior=False) is deterministic
    r1, _ = m.apply(params, x, None, False)
    r2, _ = m.apply(params, x, None, False)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))


def test_vq_model_forward(rng):
    m = VQModel(n_embed=32, embed_dim=4, ch=16, ch_mult=(1, 2),
                num_res_blocks=1, resolution=16, z_channels=4)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    params = m.init(rng, x)
    dec, diff, (perp, _, idx) = m.apply(params, x)
    assert dec.shape == x.shape
    assert diff.shape == ()
    assert idx.dtype == jnp.int32
    assert 1.0 <= float(perp) <= 32.0

    # interface paths: encode w/o quantize, decode with quantize
    z = m.apply(params, x, method=VQModel.encode_pre_quant)
    assert z.shape == (2, 8, 8, 4)
    out = m.apply(params, z, method=VQModel.decode_with_quantize)
    assert out.shape == x.shape


def test_vq_model_decode_code(rng):
    m = VQModel(n_embed=16, embed_dim=4, ch=8, ch_mult=(1,),
                num_res_blocks=1, resolution=8, z_channels=4)
    x = jnp.ones((1, 8, 8, 3))
    params = m.init(rng, x)
    codes = jnp.zeros((1, 8 * 8), dtype=jnp.int32)
    out = m.apply(params, codes, (1, 8, 8, 4), method=VQModel.decode_code)
    assert out.shape == (1, 8, 8, 3)


def test_identity_first_stage():
    m = IdentityFirstStage(vq_interface=True)
    x = jnp.ones((2, 4, 4, 3))
    assert m.encode(x) is x
    assert m.decode(x) is x
    q, loss, info = m.quantize(x)
    assert q is x and loss is None


@pytest.mark.parametrize("cls,kwargs,in_shape,out_shape", [
    (SimpleDecoder, dict(out_channels=3), (1, 4, 4, 8), (1, 8, 8, 3)),
    (UpsampleDecoder, dict(out_channels=3, ch=8, num_res_blocks=1, ch_mult=(1, 1)),
     (1, 4, 4, 8), (1, 8, 8, 3)),
])
def test_aux_decoders(rng, cls, kwargs, in_shape, out_shape):
    m = cls(**kwargs)
    x = jnp.ones(in_shape)
    params = m.init(rng, x)
    out = m.apply(params, x)
    assert out.shape == out_shape


def test_latent_rescaler(rng):
    m = LatentRescaler(factor=2.0, mid_channels=8, out_channels=4, depth=1)
    x = jnp.ones((1, 4, 4, 8))
    params = m.init(rng, x)
    assert m.apply(params, x).shape == (1, 8, 8, 4)


def test_resize(rng):
    m = Resize(scale_factor=0.5)
    x = jnp.ones((1, 8, 8, 3))
    params = m.init(rng, x)
    assert m.apply(params, x).shape == (1, 4, 4, 3)


def test_first_stage_post_processor(rng):
    m = FirstStagePostProcessor(ch_mult=(1, 2), in_channels=4,
                                reshape_to_sequence=True)
    z = jnp.ones((1, 8, 8, 4))
    params = m.init(rng, z)
    out = m.apply(params, z)
    # two downsamples: 8 -> 2; sequence layout
    assert out.shape == (1, 4, 8)
