"""Remat tests: gradients identical with and without rematerialization
(reference capability: gradient checkpointing, SURVEY.md §5.9)."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.models.unet_sd import UNetModel
from sd_tpu.train.remat import remat_apply


def test_remat_grads_match(rng):
    unet = UNetModel(in_channels=4, model_channels=32, out_channels=4,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_heads=4, context_dim=16)
    x = jax.random.normal(rng, (1, 8, 8, 4))
    t = jnp.array([3])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16))
    params = unet.init(rng, x, t, ctx)["params"]
    params = jax.tree.map(lambda p: p + 0.01, params)

    def apply_fn(p, x, t, c):
        return unet.apply({"params": p}, x, t, c)

    def loss(apply, p):
        return jnp.sum(apply(p, x, t, ctx) ** 2)

    g_plain = jax.grad(lambda p: loss(apply_fn, p))(params)
    for policy in ("dots", "nothing"):
        g_remat = jax.grad(
            lambda p: loss(remat_apply(apply_fn, policy), p)
        )(params)
        for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
            # recompute reassociates float ops; agreement is approximate
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-2)


def test_remat_none_is_identity():
    f = lambda x: x * 2
    assert remat_apply(f, "none") is f
