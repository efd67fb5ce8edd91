"""IP-Adapter decoupled cross-attention (models/ip_adapter.py).

Oracles: the bridge-off path must be bitwise-identical to the base UNet;
scale=0 must be numerically identical even with the bridge on; the
decoupled read is checked against a hand-rolled two-softmax computation;
gradients must flow ONLY to adapter params; runner smoke end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.models.ip_adapter import (
    cross_attention_paths,
    init_image_proj,
    init_ip_adapter,
    ip_apply_fn,
    project_image_embed,
)
from sd_tpu.models.unet_sd import UNetModel


@pytest.fixture(scope="module")
def tiny():
    unet = UNetModel(model_channels=16, out_channels=4, num_res_blocks=1,
                     attention_resolutions=(1,), channel_mult=(1, 2),
                     num_heads=2, context_dim=16, transformer_depth=1)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (2, 5, 16))
    t = jnp.zeros((2,), jnp.int32)
    params = unet.init(key, x, t, context=ctx)["params"]
    # de-zero every zero-init kernel (out_conv AND each SpatialTransformer
    # proj_out) so identity/difference checks see the interior activations
    # instead of zero-multiplied ones
    krng = [jax.random.fold_in(key, 9)]

    def dezero(v):
        krng[0], sub = jax.random.split(krng[0])
        return jnp.where(jnp.all(v == 0),
                         jax.random.normal(sub, v.shape) * 0.05, v)

    params = jax.tree.map(dezero, params)
    return unet, params, x, t, ctx


def test_paths_and_init(tiny):
    unet, params, *_ = tiny
    paths = cross_attention_paths(params)
    assert paths and all(p[-1].startswith("attn2") for p in paths)
    ip = init_ip_adapter(params, jax.random.PRNGKey(1), embed_dim=32,
                         n_tokens=3)
    assert set(ip["layers"]) == {"/".join(p) for p in paths}
    # the paper's init: adapter K/V start as copies of the base K/V
    p0 = paths[0]
    node = params
    for k in p0:
        node = node[k]
    np.testing.assert_array_equal(
        np.asarray(ip["layers"]["/".join(p0)]["to_k_ip"]),
        np.asarray(node["to_k"]["kernel"]))


def test_projector_shapes():
    proj = init_image_proj(jax.random.PRNGKey(0), embed_dim=32, ctx_dim=16,
                           n_tokens=3)
    tok = project_image_embed(proj, jnp.ones((2, 32)))
    assert tok.shape == (2, 3, 16)
    # LN: per-token zero mean / unit var before affine
    proj0 = dict(proj, ln_scale=jnp.ones((16,)), ln_bias=jnp.zeros((16,)))
    tok0 = project_image_embed(proj0, jax.random.normal(jax.random.PRNGKey(1), (2, 32)))
    np.testing.assert_allclose(np.asarray(tok0.mean(-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tok0.var(-1)), 1.0, atol=1e-3)


def test_off_path_bitwise_identity(tiny):
    """ip_embed=None routes the plain forward — bitwise equal to the
    unwrapped UNet (serving without an image prompt is unchanged)."""
    unet, params, x, t, ctx = tiny
    ip = init_ip_adapter(params, jax.random.PRNGKey(1), embed_dim=32)
    apply = ip_apply_fn(unet)
    base = unet.apply({"params": params}, x, t, ctx)
    got = apply({"unet": params, "ip": ip}, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_scale_zero_identity(tiny):
    """Bridge ON with scale=0: the extra attention contributes exactly 0."""
    unet, params, x, t, ctx = tiny
    ip = init_ip_adapter(params, jax.random.PRNGKey(1), embed_dim=32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    base = unet.apply({"params": params}, x, t, ctx)
    got = ip_apply_fn(unet, scale=0.0)({"unet": params, "ip": ip}, x, t, ctx,
                                       ip_embed=emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=1e-6)


def test_nonzero_scale_changes_output(tiny):
    unet, params, x, t, ctx = tiny
    ip = init_ip_adapter(params, jax.random.PRNGKey(1), embed_dim=32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    base = unet.apply({"params": params}, x, t, ctx)
    got = ip_apply_fn(unet, scale=1.0)({"unet": params, "ip": ip}, x, t, ctx,
                                       ip_embed=emb)
    assert float(jnp.abs(got - base).max()) > 1e-4


def test_decoupled_attention_oracle():
    """The CrossAttention hook computes exactly
    softmax(QKᵀ)V + s·softmax(QK_ipᵀ)V_ip on a single layer."""
    from sd_tpu.nn.attention import CrossAttention

    h, d = 2, 8
    attn = CrossAttention(heads=h, dim_head=d)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 6, 16))
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (1, 5, 16))
    params = attn.init(key, x, ctx)["params"]

    tok = jax.random.normal(jax.random.fold_in(key, 2), (1, 3, 16))
    wk_ip = jax.random.normal(jax.random.fold_in(key, 3), (16, h * d)) * 0.1
    wv_ip = jax.random.normal(jax.random.fold_in(key, 4), (16, h * d)) * 0.1
    scale = 0.7
    got = attn.apply({"params": params}, x, ctx,
                     ip_kv=(wk_ip, wv_ip, tok, scale))

    def heads(a, w):
        return (a @ w).reshape(a.shape[0], a.shape[1], h, d)

    q = heads(x, params["to_q"]["kernel"])
    def sdpa(q, k, v):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * d**-0.5
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    out = sdpa(q, heads(ctx, params["to_k"]["kernel"]),
               heads(ctx, params["to_v"]["kernel"]))
    out = out + scale * sdpa(q, heads(tok, wk_ip), heads(tok, wv_ip))
    want = (out.reshape(1, 6, h * d) @ params["to_out"]["kernel"]
            + params["to_out"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_grads_flow_only_to_adapter(tiny):
    unet, params, x, t, ctx = tiny
    ip = init_ip_adapter(params, jax.random.PRNGKey(1), embed_dim=32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    apply = ip_apply_fn(unet)

    def loss(ip_p):
        out = apply({"unet": params, "ip": ip_p}, x, t, ctx, ip_embed=emb)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(ip)
    norms = [float(jnp.abs(v).sum()) for v in jax.tree.leaves(g["layers"])]
    assert any(n > 0 for n in norms), "no gradient reached the adapter K/V"
    gp = [float(jnp.abs(v).sum()) for v in jax.tree.leaves(g["proj"])]
    assert any(n > 0 for n in gp), "no gradient reached the projector"


def test_ip_runner_smoke(tmp_path):
    import os

    from PIL import Image

    from sd_tpu.core.config import load_yaml
    from sd_tpu.train.runners import train_ldm

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")

    cfg = load_yaml("configs/ip_smoke.yaml")
    cfg["train"]["total_steps"] = 2
    cfg["train"]["checkpoint_every"] = 2
    cfg["train"]["eval_every"] = 100
    state = train_ldm(cfg, str(d), out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2
    # the checkpointed state is the ADAPTER tree, not the UNet
    assert "layers" in state.params and "proj" in state.params
    assert os.path.isdir(tmp_path / "run" / "ckpt")
    # frozen embedder persisted for serving parity
    assert os.path.isdir(tmp_path / "run" / "ip_embedder")

    # serving: load the adapter into the pipeline; an image prompt changes
    # the output, no image prompt is bitwise-identical to the plain pipe
    from sd_tpu.pipeline import Text2ImagePipeline

    pipe = Text2ImagePipeline(cfg, param_dtype=None)
    # de-zero the UNTRAINED base's zero-init convs (out_conv + each
    # SpatialTransformer proj_out): at init they hide everything inside the
    # transformer blocks, so the adapter's effect would be invisible
    kr = [jax.random.PRNGKey(11)]

    def dz(v):
        kr[0], sub = jax.random.split(kr[0])
        return jnp.where(jnp.all(v == 0),
                         jax.random.normal(sub, v.shape) * 0.05, v)

    pipe.unet_params = jax.tree.map(dz, pipe.unet_params)
    base = pipe.generate(["x"], num_steps=2, guidance_scale=1.0, seed=3)
    pipe.load_ip_adapter(str(tmp_path / "run"), ip_scale=1.0)
    still = pipe.generate(["x"], num_steps=2, guidance_scale=1.0, seed=3)
    np.testing.assert_array_equal(base, still)
    ip_img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    primed = pipe.generate(["x"], num_steps=2, guidance_scale=1.0, seed=3,
                           ip_image=ip_img)
    assert primed.shape == base.shape
    assert not np.array_equal(primed, base)
