"""SD-checkpoint importer tests: build a synthetic torch-layout state_dict
shaped like a (tiny) SD checkpoint, import it, and assert every flax leaf is
overwritten with correctly-transposed values.
Reference oracle being automated: VAE/test/weight_test.md + VAE/test/test.py."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.models.autoencoder import AutoencoderKL
from sd_tpu.models.sd_import import (
    assert_fully_loaded,
    import_sd_unet,
    import_sd_vae,
)
from sd_tpu.models.unet_sd import UNetModel


def _synthetic_sd(keys_shapes: dict) -> dict:
    rng = np.random.default_rng(0)
    return {k: rng.normal(0, 0.05, s).astype(np.float32)
            for k, s in keys_shapes.items()}


def _torch_shapes_for_vae(p: dict, ch_mult, num_res_blocks, attn_resolutions,
                          resolution) -> dict:
    attn_res = attn_resolutions
    """Derive the torch key/shape set from our param tree (inverse mapping)."""
    out = {}

    def conv(tkey, leaf):
        k = np.asarray(leaf["kernel"])
        out[tkey + ".weight"] = (k.shape[3], k.shape[2], k.shape[0], k.shape[1])
        if "bias" in leaf:
            out[tkey + ".bias"] = np.asarray(leaf["bias"]).shape

    def norm(tkey, leaf):
        s = np.asarray(leaf["GroupNorm_0"]["scale"]).shape
        out[tkey + ".weight"] = s
        out[tkey + ".bias"] = s

    def res(tkey, leaf):
        norm(tkey + ".norm1", leaf["norm1"])
        conv(tkey + ".conv1", leaf["conv1"])
        norm(tkey + ".norm2", leaf["norm2"])
        conv(tkey + ".conv2", leaf["conv2"])
        if "nin_shortcut" in leaf:
            conv(tkey + ".nin_shortcut", leaf["nin_shortcut"])

    def attn(tkey, leaf):
        norm(tkey + ".norm", leaf["norm"])
        for q in ("q", "k", "v", "proj_out"):
            conv(f"{tkey}.{q}", leaf[q])

    L = len(ch_mult)
    enc, dec = p["encoder"], p["decoder"]
    conv("encoder.conv_in", enc["conv_in"])
    ac = 0
    curr = resolution
    for lvl in range(L):
        for j in range(num_res_blocks):
            res(f"encoder.down.{lvl}.block.{j}", enc[f"down_{lvl}_block_{j}"])
            if curr in attn_res:
                attn(f"encoder.down.{lvl}.attn.{j}", enc[f"AttnBlock_{ac}"])
                ac += 1
        if lvl != L - 1:
            conv(f"encoder.down.{lvl}.downsample.conv",
                 enc[f"down_{lvl}_downsample"]["conv"])
            curr //= 2
    res("encoder.mid.block_1", enc["mid_block_1"])
    attn("encoder.mid.attn_1", enc[f"AttnBlock_{ac}"])
    res("encoder.mid.block_2", enc["mid_block_2"])
    norm("encoder.norm_out", enc["norm_out"])
    conv("encoder.conv_out", enc["conv_out"])

    conv("decoder.conv_in", dec["conv_in"])
    res("decoder.mid.block_1", dec["mid_block_1"])
    attn("decoder.mid.attn_1", dec["AttnBlock_0"])
    res("decoder.mid.block_2", dec["mid_block_2"])
    ac = 1
    curr = resolution // 2 ** (L - 1)
    for lvl in reversed(range(L)):
        for j in range(num_res_blocks + 1):
            res(f"decoder.up.{lvl}.block.{j}", dec[f"up_{lvl}_block_{j}"])
            if curr in attn_res:
                attn(f"decoder.up.{lvl}.attn.{j}", dec[f"AttnBlock_{ac}"])
                ac += 1
        if lvl != 0:
            conv(f"decoder.up.{lvl}.upsample.conv",
                 dec[f"up_{lvl}_upsample"]["conv"])
            curr *= 2
    norm("decoder.norm_out", dec["norm_out"])
    conv("decoder.conv_out", dec["conv_out"])
    conv("quant_conv", p["quant_conv"])
    conv("post_quant_conv", p["post_quant_conv"])
    return out


def test_import_sd_vae_full_coverage(rng):
    kw = dict(ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
              resolution=16)
    vae = AutoencoderKL(embed_dim=4, ch=16, z_channels=4, **kw)
    params = vae.init(rng, jnp.zeros((1, 16, 16, 3)), rng)["params"]

    shapes = _torch_shapes_for_vae(params, **kw)
    sd = {"first_stage_model." + k: v for k, v in _synthetic_sd(shapes).items()}
    loaded = import_sd_vae(params, sd, **kw)

    unchanged = assert_fully_loaded(params, loaded)
    # zero-init / deterministic-init leaves may coincidentally match; none
    # should here because every source is random
    assert unchanged == [], unchanged

    # transposition spot check: conv_in OIHW -> HWIO
    w = sd["first_stage_model.encoder.conv_in.weight"]
    np.testing.assert_allclose(
        np.asarray(loaded["encoder"]["conv_in"]["kernel"]),
        w.transpose(2, 3, 1, 0))
    # model still runs with imported weights
    out, _ = vae.apply({"params": loaded}, jnp.ones((1, 16, 16, 3)), rng)
    assert np.isfinite(np.asarray(out)).all()


def _torch_shapes_for_unet(p: dict, channel_mult, num_res_blocks,
                           attention_resolutions, depth=1) -> dict:
    attn_res = attention_resolutions
    out = {}

    def conv(tkey, leaf):
        k = np.asarray(leaf["kernel"])
        out[tkey + ".weight"] = (k.shape[3], k.shape[2], k.shape[0], k.shape[1])
        if "bias" in leaf:
            out[tkey + ".bias"] = np.asarray(leaf["bias"]).shape

    def lin(tkey, leaf, bias=True):
        k = np.asarray(leaf["kernel"])
        out[tkey + ".weight"] = (k.shape[1], k.shape[0])
        if bias and "bias" in leaf:
            out[tkey + ".bias"] = np.asarray(leaf["bias"]).shape

    def norm(tkey, leaf, inner="GroupNorm_0"):
        s = np.asarray(leaf[inner]["scale"]).shape
        out[tkey + ".weight"] = s
        out[tkey + ".bias"] = s

    def res(tkey, leaf):
        norm(tkey + ".in_layers.0", leaf["in_norm"])
        conv(tkey + ".in_layers.2", leaf["in_conv"])
        lin(tkey + ".emb_layers.1", leaf["emb_proj"])
        norm(tkey + ".out_layers.0", leaf["out_norm"])
        conv(tkey + ".out_layers.3", leaf["out_conv"])
        if "skip" in leaf:
            conv(tkey + ".skip_connection", leaf["skip"])

    def xf(tkey, leaf):
        norm(tkey + ".norm", leaf["norm"])
        conv(tkey + ".proj_in", leaf["proj_in"])
        conv(tkey + ".proj_out", leaf["proj_out"])
        for d in range(depth):
            b, lb = f"{tkey}.transformer_blocks.{d}", leaf[f"block_{d}"]
            for a in ("attn1", "attn2"):
                for q in ("to_q", "to_k", "to_v"):
                    lin(f"{b}.{a}.{q}", lb[a][q])
                lin(f"{b}.{a}.to_out.0", lb[a]["to_out"])
            lin(f"{b}.ff.net.0.proj", lb["ff"]["proj_in"])
            lin(f"{b}.ff.net.2", lb["ff"]["proj_out"])
            for nname in ("norm1", "norm2", "norm3"):
                norm(f"{b}.{nname}", lb[nname], inner="LayerNorm_0")

    L = len(channel_mult)
    lin("time_embed.0", p["time_embed_1"])
    lin("time_embed.2", p["time_embed_2"])
    conv("input_blocks.0.0", p["input_conv"])
    n, ds = 1, 1
    for lvl in range(L):
        for i in range(num_res_blocks):
            res(f"input_blocks.{n}.0", p[f"in_{lvl}_{i}_res"])
            if ds in attn_res:
                xf(f"input_blocks.{n}.1", p[f"in_{lvl}_{i}_attn"])
            n += 1
        if lvl != L - 1:
            conv(f"input_blocks.{n}.0.op", p[f"in_{lvl}_down"]["conv"])
            n += 1
            ds *= 2
    res("middle_block.0", p["mid_res1"])
    xf("middle_block.1", p["mid_attn"])
    res("middle_block.2", p["mid_res2"])
    n = 0
    for lvl in reversed(range(L)):
        for i in range(num_res_blocks + 1):
            res(f"output_blocks.{n}.0", p[f"out_{lvl}_{i}_res"])
            k = 1
            if ds in attn_res:
                xf(f"output_blocks.{n}.{k}", p[f"out_{lvl}_{i}_attn"])
                k += 1
            if lvl != 0 and i == num_res_blocks:
                conv(f"output_blocks.{n}.{k}.conv", p[f"out_{lvl}_up"]["conv"])
                ds //= 2
            n += 1
    norm("out.0", p["out_norm"])
    conv("out.2", p["out_conv"])
    return out


def test_import_sd_unet_full_coverage(rng):
    kw = dict(channel_mult=(1, 2), num_res_blocks=1,
              attention_resolutions=(1, 2))
    unet = UNetModel(in_channels=4, model_channels=32, out_channels=4,
                     num_res_blocks=1, attention_resolutions=(1, 2),
                     channel_mult=(1, 2), num_heads=4, context_dim=32)
    x = jnp.zeros((1, 8, 8, 4))
    params = unet.init(rng, x, jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1, 7, 32)))["params"]

    shapes = _torch_shapes_for_unet(params, **kw)
    sd = {"model.diffusion_model." + k: v
          for k, v in _synthetic_sd(shapes).items()}
    loaded = import_sd_unet(params, sd, **kw)

    unchanged = assert_fully_loaded(params, loaded)
    assert unchanged == [], unchanged

    # linear transpose spot check
    w = sd["model.diffusion_model.time_embed.0.weight"]
    np.testing.assert_allclose(np.asarray(loaded["time_embed_1"]["kernel"]), w.T)
    # q projection has no bias in SD; ours neither
    assert "bias" not in loaded["in_0_0_attn"]["block_0"]["attn1"]["to_q"]

    out = unet.apply({"params": loaded}, jnp.ones((1, 8, 8, 4)),
                     jnp.array([3]), jnp.ones((1, 7, 32)))
    assert np.isfinite(np.asarray(out)).all()
