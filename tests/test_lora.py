"""LoRA fine-tuning tests (arXiv:2106.09685, beyond-reference).

Contract: at init the adapted model EQUALS the base model (B=0); only the
targeted attention kernels change under merge; gradients flow to the
factors once the zero-init output conv is past its first update; the
train_ldm `lora:` config trains the factor tree only with the base frozen.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.train.lora import (
    LORA_DEFAULT_TARGETS,
    count_lora_params,
    init_lora,
    lora_targets,
    merge_lora,
)


@pytest.fixture(scope="module")
def unet_params():
    from sd_tpu.models.unet_sd import UNetModel

    m = UNetModel(in_channels=4, model_channels=32, out_channels=4,
                  num_res_blocks=1, attention_resolutions=(1,),
                  channel_mult=(1, 2), num_heads=4,
                  use_spatial_transformer=True, transformer_depth=1,
                  context_dim=16)
    return m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                  jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3, 16)))["params"]


def test_init_merge_is_identity(unet_params):
    lora = init_lora(unet_params, 4, jax.random.PRNGKey(1))
    merged = merge_lora(unet_params, lora, scale=1.0)
    for a, b in zip(jax.tree.leaves(unet_params), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_touches_only_targets(unet_params):
    lora = init_lora(unet_params, 4, jax.random.PRNGKey(1))
    lora = jax.tree.map(lambda x: x + 0.05, lora)  # make deltas nonzero
    merged = merge_lora(unet_params, lora, scale=1.0)
    targets = set(lora_targets(unet_params))
    changed, same = 0, 0
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(unet_params),
            jax.tree_util.tree_leaves_with_path(merged)):
        name = jax.tree_util.keystr(path)
        if np.allclose(np.asarray(a), np.asarray(b)):
            assert name not in targets or float(np.abs(np.asarray(a)).max()) == 0
            same += 1
        else:
            assert name in targets, name
            changed += 1
    assert changed == len(targets) == 32
    assert same > 0


def test_scale_is_linear(unet_params):
    lora = init_lora(unet_params, 4, jax.random.PRNGKey(1))
    lora = jax.tree.map(lambda x: x + 0.1, lora)
    m1 = merge_lora(unet_params, lora, scale=1.0)
    m2 = merge_lora(unet_params, lora, scale=2.0)
    d1 = jax.tree.map(lambda m, b: m - b, m1, unet_params)
    d2 = jax.tree.map(lambda m, b: m - b, m2, unet_params)
    for a, b in zip(jax.tree.leaves(d1), jax.tree.leaves(d2)):
        np.testing.assert_allclose(np.asarray(b), 2.0 * np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_gradients_flow_to_factors(unet_params):
    """dL/dB = Aᵀ·dL/dW must be nonzero once the base is past the zero-init
    output conv (perturb it — at EXACT init every upstream grad is zero by
    the zero-init property, which is correct, not a LoRA failure)."""
    from sd_tpu.models.unet_sd import UNetModel

    m = UNetModel(in_channels=4, model_channels=32, out_channels=4,
                  num_res_blocks=1, attention_resolutions=(1,),
                  channel_mult=(1, 2), num_heads=4,
                  use_spatial_transformer=True, transformer_depth=1,
                  context_dim=16)
    # perturb every zero-init layer (out_conv, transformer proj_out, resblock
    # out convs) — each blocks upstream gradients at exact init
    params = jax.tree.map(lambda x: x + 0.02, unet_params)
    lora = init_lora(params, 4, jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 16))

    def loss(l):
        out = m.apply({"params": merge_lora(params, l, 1.0)}, x,
                      jnp.zeros((1,), jnp.int32), ctx)
        return jnp.mean(out**2)

    g = jax.grad(loss)(lora)
    gb = max(float(jnp.abs(v["b"]).max()) for v in g.values())
    ga = max(float(jnp.abs(v["a"]).max()) for v in g.values())
    assert gb > 1e-9          # B receives gradient immediately
    assert ga == 0.0          # A's grad is 0 while B == 0 (dL/dA = dL/dW·Bᵀ)


def test_param_count_and_default_targets(unet_params):
    lora = init_lora(unet_params, 8, jax.random.PRNGKey(5))
    n_base = sum(int(np.prod(x.shape))
                 for x in jax.tree.leaves(unet_params))
    assert count_lora_params(lora) < 0.1 * n_base
    assert LORA_DEFAULT_TARGETS and len(lora_targets(unet_params)) == 32


def test_train_ldm_lora_and_serving(tmp_path):
    """End-to-end: the `lora:` config trains ONLY the factor tree (base
    frozen), the run checkpoint loads into the serving pipeline via
    load_lora, and the merged model generates."""
    import os

    from PIL import Image

    from sd_tpu.core.config import load_yaml
    from sd_tpu.pipeline import Text2ImagePipeline
    from sd_tpu.train.runners import train_ldm

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(
            d / f"{i}.jpg")

    cfg = load_yaml("configs/sd_txt2img_smoke.yaml")
    cfg["train"].update(total_steps=2, checkpoint_every=2, eval_every=100)
    cfg["lora"] = {"rank": 4, "scale": 1.0}
    run = str(tmp_path / "run")
    state = train_ldm(cfg, str(d), out_dir=run)
    assert int(state.step) == 2
    # the optimizer state is the factor tree, not the UNet
    assert all(set(v) == {"a", "b"} for v in state.params.values())

    pipe = Text2ImagePipeline(load_yaml("configs/sd_txt2img_smoke.yaml"),
                              param_dtype=None)
    base = jax.tree.leaves(pipe.unet_params)[0].copy()
    pipe.load_lora(os.path.join(run, "ckpt"), scale=1.0)
    imgs = pipe.generate(["a cat"], num_steps=2, guidance_scale=1.0)
    assert imgs.shape[0] == 1 and imgs.dtype == np.uint8

    # the trainer also wrote the .safetensors distribution artifact, and
    # loading it merges the same EMA factors
    st_path = os.path.join(run, "lora.safetensors")
    assert os.path.exists(st_path)
    pipe2 = Text2ImagePipeline(load_yaml("configs/sd_txt2img_smoke.yaml"),
                               param_dtype=None)
    pipe2.load_lora(st_path, scale=1.0)
    imgs2 = pipe2.generate(["a cat"], num_steps=2, guidance_scale=1.0)
    np.testing.assert_array_equal(imgs, imgs2)


def test_lora_safetensors_roundtrip(unet_params):
    from sd_tpu.train.lora import (
        init_lora,
        load_lora_safetensors,
        save_lora_safetensors,
    )
    import tempfile, os

    lora = init_lora(unet_params, rank=4, rng=jax.random.PRNGKey(0))
    # give b nonzero values so the round-trip is meaningful
    lora = jax.tree.map(lambda x: x + 0.25, lora)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "l.safetensors")
        save_lora_safetensors(p, lora, metadata={"rank": "4"})
        back = load_lora_safetensors(p)
    assert set(back) == set(lora)
    for k in lora:
        np.testing.assert_array_equal(np.asarray(back[k]["a"]),
                                      np.asarray(lora[k]["a"]), err_msg=k)
        np.testing.assert_array_equal(np.asarray(back[k]["b"]),
                                      np.asarray(lora[k]["b"]), err_msg=k)
