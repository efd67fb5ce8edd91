"""ToMe token-merging tests (sd_tpu/nn/tome.py, arXiv:2303.17604):
matching/merge/unmerge mechanics, static-shape/kernel-eligibility rounding,
checkpoint compatibility (no new params), bounded approximation error in
the SD UNet, jit-ability."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.nn.tome import _dst_grid, build_tome, merge_count


def test_dst_grid_partition():
    src, dst = _dst_grid(8, 8)
    assert len(dst) == 16 and len(src) == 48   # one dst per 2x2 tile
    assert sorted(np.concatenate([src, dst]).tolist()) == list(range(64))


def test_merge_count_rounding():
    # N=4096, ratio .5 → 2048 kept (already a multiple of 128)
    assert merge_count(4096, 3072, 0.5) == 2048
    # rounding keeps the reduced count on the 128 lattice
    r = merge_count(4096, 3072, 0.47)
    assert (4096 - r) % 128 == 0 and r <= int(4096 * 0.47)
    # never merge more than the src pool
    assert merge_count(256, 192, 1.0) <= 192
    # tiny grids disable cleanly
    assert merge_count(64, 48, 0.1) == 0


def test_merge_unmerge_mechanics():
    """Duplicated tokens merge together; untouched tokens survive exactly;
    unmerge routes every merged token its dst's (post-attention) value."""
    rng = np.random.default_rng(0)
    H = W = 16  # 256 tokens; ratio .5 → 128 kept (the 128-lattice minimum)
    base = rng.standard_normal((1, H * W, 16)).astype(np.float32)
    x = jnp.asarray(base)
    built = build_tome(x, H, W, ratio=0.5, sy=2, sx=2)
    assert built is not None
    merge, unmerge, r = built
    assert r > 0 and (H * W - r) % 128 == 0

    merged = merge(x)
    assert merged.shape == (1, H * W - r, 16)
    # round-trip: unmerged tokens keep their values bit-exactly; merged
    # tokens come back as their dst's merged average
    back = unmerge(merged)
    assert back.shape == x.shape
    # every output token equals either its input or a dst average —
    # check the exact-preservation count: N - r src tokens + dst tokens
    # changed only by averaging (dst with no merges are exact)
    exact = np.isclose(np.asarray(back), base, atol=1e-6).all(axis=-1).sum()
    assert exact >= H * W - 2 * r  # dst slots that absorbed tokens changed


def test_identical_tokens_merge_losslessly():
    """If src token == its best dst token, merging then unmerging is exact."""
    H = W = 16
    tok = jnp.asarray(np.tile(
        np.random.default_rng(1).standard_normal((1, 1, 8)), (1, H * W, 1)
    ).astype(np.float32))
    built = build_tome(tok, H, W, ratio=0.5)
    merge, unmerge, r = built
    out = unmerge(merge(tok))
    np.testing.assert_allclose(np.asarray(out), np.asarray(tok), atol=1e-5)


def test_build_none_below_threshold():
    x = jnp.zeros((1, 16, 8))
    assert build_tome(x, 4, 4, ratio=0.1) is None  # rounds to r=0


def test_unet_sd_tome_params_identical_and_error_bounded():
    """tome_ratio changes NO parameters (same checkpoints serve both) and
    the merged forward stays close to the exact forward on smooth inputs."""
    from sd_tpu.models.unet_sd import UNetModel

    kw = dict(in_channels=4, model_channels=32, out_channels=4,
              num_res_blocks=1, attention_resolutions=(1,),
              channel_mult=(1,), num_heads=4, context_dim=16,
              transformer_depth=1)
    # 16x16 grid = 256 tokens ⇒ set min_tokens low enough to engage
    base = UNetModel(**kw)
    tome = UNetModel(**kw, tome_ratio=0.5, tome_min_tokens=64)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, 4))
    # smooth input: neighboring tokens similar → merging near-lossless
    xs = jnp.cumsum(x, axis=1) * 0.1
    t = jnp.zeros((1,), jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16))

    params = base.init(rng, x, t, ctx)["params"]
    jax.tree.map(lambda a, b: None, params,
                 tome.init(rng, x, t, ctx)["params"])  # same tree structure

    # zero-init proj_out makes the transformer a no-op at init; perturb so
    # the attention path actually contributes
    params = jax.tree.map(
        lambda p: p + 0.02 * jnp.cos(jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape), params)

    out_base = base.apply({"params": params}, xs, t, ctx)
    out_tome = tome.apply({"params": params}, xs, t, ctx)
    assert out_tome.shape == out_base.shape
    rel = float(jnp.linalg.norm(out_tome - out_base)
                / (jnp.linalg.norm(out_base) + 1e-8))
    assert np.isfinite(np.asarray(out_tome)).all()
    assert rel < 0.15, rel  # bounded approximation, not equality
    # and it is genuinely approximating (the merge engaged)
    assert rel > 0.0


def test_jit_and_batch():
    from sd_tpu.models.unet_sd import UNetModel

    model = UNetModel(in_channels=4, model_channels=32, out_channels=4,
                   num_res_blocks=1, attention_resolutions=(1,),
                   channel_mult=(1,), num_heads=4, context_dim=16,
                   tome_ratio=0.5, tome_min_tokens=64)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jax.random.normal(rng, (2, 7, 16))
    params = model.init(rng, x, t, ctx)["params"]
    # zero-init out conv ⇒ output is identically 0 at init; perturb so the
    # output actually depends on the input
    params = jax.tree.map(
        lambda p: p + 0.02 * jnp.sin(jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape), params)
    fn = jax.jit(lambda p, x: model.apply({"params": p}, x, t, ctx))
    out = fn(params, x)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
    # per-batch-element matching: different images may merge differently
    out2 = fn(params, x.at[1].multiply(-1.0))
    assert not np.allclose(np.asarray(out)[1], np.asarray(out2)[1])
