"""Cross-attention capture + token heatmaps (utils/attn_viz.py,
nn/attn_probe.py kind='cross')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.models.unet_sd import UNetModel
from sd_tpu.nn.attn_probe import capture_attention, collect_all_sown_probs
from sd_tpu.utils.attn_viz import (_grid_for, cross_attention_maps,
                                   overlay_heatmap_grid, token_heatmaps)


@pytest.fixture(scope="module")
def tiny_unet():
    unet = UNetModel(
        in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=[1, 2],
        channel_mult=[1, 2], num_heads=4, context_dim=16)
    rng = jax.random.PRNGKey(0)
    params = unet.init(rng, jnp.zeros((2, 16, 16, 3)),
                       jnp.zeros((2,), jnp.int32),
                       jnp.zeros((2, 5, 16)))["params"]
    return unet, params


def test_cross_capture_shapes_and_rows(tiny_unet):
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 16))
    maps = cross_attention_maps(unet, params, x, jnp.zeros((2,), jnp.int32),
                                ctx)
    # attention at ds=1 (256 tokens), ds=2 (64) in down/up + mid (64):
    # every captured map is a cross map over the 5 text tokens
    assert len(maps) >= 3
    for path, probs in maps.items():
        assert "attn2" in path, path            # cross-attn modules only
        assert probs.shape[0] == 2 and probs.shape[-1] == 5
        np.testing.assert_allclose(np.asarray(jnp.sum(probs, -1)), 1.0,
                                   atol=1e-5)


def test_self_capture_not_triggered_by_cross_kind(tiny_unet):
    unet, params = tiny_unet
    x = jnp.zeros((1, 16, 16, 3))
    with capture_attention("", max_tokens=4096, kind="cross"):
        _, inter = unet.apply({"params": params}, x,
                              jnp.zeros((1,), jnp.int32),
                              jnp.zeros((1, 5, 16)),
                              mutable=["intermediates"])
    assert all("attn2" in p for p in collect_all_sown_probs(inter))
    with capture_attention("mid_attn", max_tokens=4096, kind="self"):
        _, inter = unet.apply({"params": params}, x,
                              jnp.zeros((1,), jnp.int32),
                              jnp.zeros((1, 5, 16)),
                              mutable=["intermediates"])
    assert all("attn1" in p for p in collect_all_sown_probs(inter))


def test_grid_inference():
    assert _grid_for(256, 16, 16) == (16, 16)
    assert _grid_for(64, 16, 16) == (8, 8)
    assert _grid_for(64, 32, 16) is None   # 32x16 halves to 16x8=128, 8x4=32
    assert _grid_for(128, 32, 16) == (16, 8)


def test_token_heatmaps_aggregation(tiny_unet):
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 16))
    maps = cross_attention_maps(unet, params, x, jnp.zeros((2,), jnp.int32),
                                ctx)
    hm = token_heatmaps(maps, (16, 16))
    assert hm.shape == (2, 16, 16, 5)
    assert hm.min() >= 0.0 and hm.max() <= 1.0 + 1e-6
    un = token_heatmaps(maps, (16, 16), normalize=False)
    # unnormalized: head-averaged softmax rows — token-axis sum stays 1
    np.testing.assert_allclose(un.sum(-1), 1.0, atol=1e-4)


def test_synthetic_dominant_token():
    # one map where every query attends to token 2 → its heatmap is flat 1
    probs = np.zeros((1, 2, 16, 4), np.float32)
    probs[..., 2] = 1.0
    hm = token_heatmaps({"m/attn2": jnp.asarray(probs)}, (4, 4),
                        normalize=False)
    np.testing.assert_allclose(hm[..., 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(hm[..., 0], 0.0, atol=1e-6)


def test_overlay_grid_shape():
    img = np.zeros((32, 32, 3), np.uint8)
    hm = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    grid = overlay_heatmap_grid(img, hm)
    assert grid.shape == (32, 96, 3) and grid.dtype == np.uint8
