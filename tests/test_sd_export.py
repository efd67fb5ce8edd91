"""Round-trip identity of the SD-checkpoint exporter against the importer:
export(params) fed back through import must reproduce params exactly, and
the exported key set must be exactly what the importer consumes
(sd_tpu/models/sd_export.py ↔ sd_import.py; reference checkpoint layout:
VAE/test/weight_test.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

VAE_KW = dict(ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
              resolution=16)
UNET_KW = dict(channel_mult=(1, 2), num_res_blocks=1,
               attention_resolutions=(2,), transformer_depth=1)


@pytest.fixture(scope="module")
def vae_params():
    from sd_tpu.models.autoencoder import AutoencoderKL

    vae = AutoencoderKL(embed_dim=3, ch=16, z_channels=3, **VAE_KW)
    r = jax.random.PRNGKey(0)
    return vae.init(r, jnp.zeros((1, 16, 16, 3)), r)["params"]


@pytest.fixture(scope="module")
def unet_params():
    from sd_tpu.models.unet_sd import UNetModel

    unet = UNetModel(in_channels=3, model_channels=32, out_channels=3,
                     num_heads=4, context_dim=16, **UNET_KW)
    return unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                     jnp.zeros((1,), jnp.int32),
                     jnp.zeros((1, 4, 16)))["params"]


def _assert_trees_equal(a, b):
    flat_a = jax.tree_util.tree_flatten_with_path(a)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(b)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (path, va), (_, vb) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb),
            err_msg=jax.tree_util.keystr(path))


def test_vae_export_import_roundtrip(vae_params):
    from sd_tpu.models.sd_export import export_sd_vae
    from sd_tpu.models.sd_import import import_sd_vae

    sd = export_sd_vae(vae_params, **VAE_KW)
    assert all(k.startswith("first_stage_model.") for k in sd)
    back = import_sd_vae(vae_params, sd, **VAE_KW)
    _assert_trees_equal(vae_params, back)


def test_unet_export_import_roundtrip(unet_params):
    from sd_tpu.models.sd_export import export_sd_unet
    from sd_tpu.models.sd_import import import_sd_unet

    sd = export_sd_unet(unet_params, **UNET_KW)
    assert all(k.startswith("model.diffusion_model.") for k in sd)
    back = import_sd_unet(unet_params, sd, **UNET_KW)
    _assert_trees_equal(unet_params, back)


def test_export_covers_every_param_leaf(vae_params, unet_params):
    """Every trained value must leave through the exporter: total exported
    element count equals the param-tree element count."""
    from sd_tpu.models.sd_export import export_sd_unet, export_sd_vae

    for params, sd in [
        (vae_params, export_sd_vae(vae_params, **VAE_KW)),
        (unet_params, export_sd_unet(unet_params, **UNET_KW)),
    ]:
        n_tree = sum(np.asarray(x).size for x in jax.tree.leaves(params))
        n_sd = sum(v.size for v in sd.values())
        assert n_sd == n_tree


def test_save_sd_checkpoint_torch_loadable(tmp_path, vae_params):
    """The saved file must load through the same torch path the reference
    uses (VAE/test/test.py:29-64: torch.load -> ['state_dict'])."""
    torch = pytest.importorskip("torch")
    from sd_tpu.models.sd_export import export_sd_vae, save_sd_checkpoint
    from sd_tpu.models.sd_import import load_sd_checkpoint

    sd = export_sd_vae(vae_params, **VAE_KW)
    path = str(tmp_path / "model.ckpt")
    save_sd_checkpoint(path, sd)
    loaded = load_sd_checkpoint(path)
    assert set(loaded) == set(sd)
    k = next(iter(sd))
    np.testing.assert_array_equal(loaded[k], sd[k])

    # fp16 conversion path (reference: vqvae/test/test.py:3-21)
    half_path = str(tmp_path / "model_fp16.ckpt")
    save_sd_checkpoint(half_path, sd, half=True)
    ck = torch.load(half_path, map_location="cpu", weights_only=True)
    assert ck["state_dict"][k].dtype == torch.float16


def test_pipeline_checkpoint_roundtrip(tmp_path):
    """Pipeline-level interop loop: to_sd_checkpoint -> from_sd_checkpoint
    reproduces the exact UNet+VAE params."""
    pytest.importorskip("torch")
    from sd_tpu.pipeline import Text2ImagePipeline

    cfg = "configs/sd_txt2img_smoke.yaml"
    pipe = Text2ImagePipeline.from_config(cfg)
    path = str(tmp_path / "export.ckpt")
    pipe.to_sd_checkpoint(path)
    back = Text2ImagePipeline.from_sd_checkpoint(cfg, path)
    _assert_trees_equal(
        jax.tree.map(np.asarray, pipe.unet_params),
        jax.tree.map(np.asarray, back.unet_params))
    _assert_trees_equal(
        jax.tree.map(np.asarray, pipe.vae_params),
        jax.tree.map(np.asarray, back.vae_params))
