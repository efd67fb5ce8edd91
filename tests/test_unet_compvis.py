"""CompVis time-conditioned UNet tests (reference: Unet/unet.py Model)."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.models.unet_compvis import UNetCompVis


def test_compvis_unet_shapes(rng):
    m = UNetCompVis(ch=16, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                    attn_resolutions=(8,), resolution=16)
    x = jnp.ones((2, 16, 16, 3))
    t = jnp.array([0, 10])
    params = m.init(rng, x, t)
    out = m.apply(params, x, t)
    assert out.shape == (2, 16, 16, 3)


def test_compvis_unet_time_sensitivity(rng):
    m = UNetCompVis(ch=16, out_ch=3, ch_mult=(1,), num_res_blocks=1,
                    attn_resolutions=(), resolution=8)
    x = jnp.ones((1, 8, 8, 3))
    params = m.init(rng, x, jnp.array([0]))
    o1 = m.apply(params, x, jnp.array([0]))
    o2 = m.apply(params, x, jnp.array([500]))
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-4


def test_compvis_unet_no_timestep(rng):
    m = UNetCompVis(ch=16, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                    attn_resolutions=(), resolution=16, use_timestep=False)
    x = jnp.ones((1, 16, 16, 3))
    params = m.init(rng, x, None)
    assert m.apply(params, x, None).shape == x.shape


def test_compvis_unet_linear_attention(rng):
    m = UNetCompVis(ch=16, out_ch=3, ch_mult=(1,), num_res_blocks=1,
                    attn_resolutions=(8,), resolution=8, attn_type="linear")
    x = jnp.ones((1, 8, 8, 3))
    params = m.init(rng, x, jnp.array([1]))
    assert m.apply(params, x, jnp.array([1])).shape == x.shape
