"""Export sd_tpu param trees back into the Stable-Diffusion v1 torch
checkpoint layout — the exact inverse of `sd_tpu.models.sd_import`.

Why: weight interop has to be a two-way street for a reference user to
switch frameworks. `sd_import` brings SD v1 checkpoints (the reference's
own oracle weights, VAE/test/weight_test.md) into sd_tpu; this module
takes models trained or fine-tuned here back out, producing a flat
`state_dict` any torch SD loader (including the reference's
VAE/test/test.py:29-64 load path) accepts:

  * `export_sd_vae(params, ...)`  — AutoencoderKL → `first_stage_model.*`
  * `export_sd_unet(params, ...)` — UNetModel → `model.diffusion_model.*`
  * `save_sd_checkpoint(path, state_dict, half=False)` — torch.save wrapper

Layout conversions (inverse of sd_import): flax Conv HWIO → torch OIHW;
flax Dense [in,out] → torch [out,in]; GroupNorm/LayerNorm scale → weight.
Round-trip identity (export ∘ import == id and vice versa) is pinned by
tests/test_sd_export.py.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _inv_conv(out, key, tree):
    out[key + ".weight"] = np.asarray(
        tree["kernel"], np.float32).transpose(3, 2, 0, 1)
    if "bias" in tree:
        out[key + ".bias"] = np.asarray(tree["bias"], np.float32)


def _inv_linear(out, key, tree):
    out[key + ".weight"] = np.asarray(tree["kernel"], np.float32).T
    if "bias" in tree:
        out[key + ".bias"] = np.asarray(tree["bias"], np.float32)


def _inv_norm(out, key, tree):
    inner = tree["GroupNorm_0"]
    out[key + ".weight"] = np.asarray(inner["scale"], np.float32)
    out[key + ".bias"] = np.asarray(inner["bias"], np.float32)


def _inv_layernorm(out, key, tree):
    inner = tree["LayerNorm_0"]
    out[key + ".weight"] = np.asarray(inner["scale"], np.float32)
    out[key + ".bias"] = np.asarray(inner["bias"], np.float32)


def _inv_codec_resblock(out, key, tree):
    _inv_norm(out, key + ".norm1", tree["norm1"])
    _inv_conv(out, key + ".conv1", tree["conv1"])
    _inv_norm(out, key + ".norm2", tree["norm2"])
    _inv_conv(out, key + ".conv2", tree["conv2"])
    if "temb_proj" in tree:
        _inv_linear(out, key + ".temb_proj", tree["temb_proj"])
    for sk in ("nin_shortcut", "conv_shortcut"):
        if sk in tree:
            _inv_conv(out, f"{key}.{sk}", tree[sk])


def _inv_codec_attn(out, key, tree):
    _inv_norm(out, key + ".norm", tree["norm"])
    for name in ("q", "k", "v", "proj_out"):
        _inv_conv(out, f"{key}.{name}", tree[name])


def export_sd_vae(
    params: dict,
    ch_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    attn_resolutions: Sequence[int] = (),
    resolution: int = 256,
    prefix: str = "first_stage_model.",
) -> dict:
    """AutoencoderKL params → SD first-stage state_dict (numpy fp32).
    Iterates the same block structure as sd_import.import_sd_vae so the
    two stay exact inverses."""
    sd: dict = {}
    L = len(ch_mult)

    enc = params["encoder"]
    _inv_conv(sd, "encoder.conv_in", enc["conv_in"])
    attn_count = 0
    curr_res = resolution
    for lvl in range(L):
        for j in range(num_res_blocks):
            _inv_codec_resblock(sd, f"encoder.down.{lvl}.block.{j}",
                                enc[f"down_{lvl}_block_{j}"])
            if curr_res in attn_resolutions:
                _inv_codec_attn(sd, f"encoder.down.{lvl}.attn.{j}",
                                enc[f"AttnBlock_{attn_count}"])
                attn_count += 1
        if lvl != L - 1:
            _inv_conv(sd, f"encoder.down.{lvl}.downsample.conv",
                      enc[f"down_{lvl}_downsample"]["conv"])
            curr_res //= 2
    _inv_codec_resblock(sd, "encoder.mid.block_1", enc["mid_block_1"])
    _inv_codec_attn(sd, "encoder.mid.attn_1", enc[f"AttnBlock_{attn_count}"])
    _inv_codec_resblock(sd, "encoder.mid.block_2", enc["mid_block_2"])
    _inv_norm(sd, "encoder.norm_out", enc["norm_out"])
    _inv_conv(sd, "encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    _inv_conv(sd, "decoder.conv_in", dec["conv_in"])
    _inv_codec_resblock(sd, "decoder.mid.block_1", dec["mid_block_1"])
    _inv_codec_attn(sd, "decoder.mid.attn_1", dec["AttnBlock_0"])
    _inv_codec_resblock(sd, "decoder.mid.block_2", dec["mid_block_2"])
    attn_count = 1
    curr_res = resolution // 2 ** (L - 1)
    for lvl in reversed(range(L)):
        for j in range(num_res_blocks + 1):
            _inv_codec_resblock(sd, f"decoder.up.{lvl}.block.{j}",
                                dec[f"up_{lvl}_block_{j}"])
            if curr_res in attn_resolutions:
                _inv_codec_attn(sd, f"decoder.up.{lvl}.attn.{j}",
                                dec[f"AttnBlock_{attn_count}"])
                attn_count += 1
        if lvl != 0:
            _inv_conv(sd, f"decoder.up.{lvl}.upsample.conv",
                      dec[f"up_{lvl}_upsample"]["conv"])
            curr_res *= 2
    _inv_norm(sd, "decoder.norm_out", dec["norm_out"])
    _inv_conv(sd, "decoder.conv_out", dec["conv_out"])

    _inv_conv(sd, "quant_conv", params["quant_conv"])
    _inv_conv(sd, "post_quant_conv", params["post_quant_conv"])
    return {prefix + k: v for k, v in sd.items()}


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


def _inv_sd_resblock(out, key, tree):
    _inv_norm(out, key + ".in_layers.0", tree["in_norm"])
    _inv_conv(out, key + ".in_layers.2", tree["in_conv"])
    _inv_linear(out, key + ".emb_layers.1", tree["emb_proj"])
    _inv_norm(out, key + ".out_layers.0", tree["out_norm"])
    _inv_conv(out, key + ".out_layers.3", tree["out_conv"])
    if "skip" in tree:
        _inv_conv(out, key + ".skip_connection", tree["skip"])


def _inv_sd_transformer(out, key, tree, depth: int):
    _inv_norm(out, key + ".norm", tree["norm"])
    _inv_conv(out, key + ".proj_in", tree["proj_in"])
    _inv_conv(out, key + ".proj_out", tree["proj_out"])
    for d in range(depth):
        b = f"{key}.transformer_blocks.{d}"
        blk = tree[f"block_{d}"]
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                _inv_linear(out, f"{b}.{attn}.{proj}", blk[attn][proj])
            _inv_linear(out, f"{b}.{attn}.to_out.0", blk[attn]["to_out"])
        _inv_linear(out, b + ".ff.net.0.proj", blk["ff"]["proj_in"])
        _inv_linear(out, b + ".ff.net.2", blk["ff"]["proj_out"])
        _inv_layernorm(out, b + ".norm1", blk["norm1"])
        _inv_layernorm(out, b + ".norm2", blk["norm2"])
        _inv_layernorm(out, b + ".norm3", blk["norm3"])


def export_sd_unet(
    params: dict,
    channel_mult: Sequence[int] = (1, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (4, 2, 1),
    transformer_depth: int = 1,
    prefix: str = "model.diffusion_model.",
) -> dict:
    """UNetModel params → SD diffusion-model state_dict (numpy fp32)."""
    sd: dict = {}
    L = len(channel_mult)

    _inv_linear(sd, "time_embed.0", params["time_embed_1"])
    _inv_linear(sd, "time_embed.2", params["time_embed_2"])
    _inv_conv(sd, "input_blocks.0.0", params["input_conv"])

    n = 1
    ds = 1
    for lvl in range(L):
        for i in range(num_res_blocks):
            _inv_sd_resblock(sd, f"input_blocks.{n}.0",
                             params[f"in_{lvl}_{i}_res"])
            if ds in attention_resolutions:
                _inv_sd_transformer(sd, f"input_blocks.{n}.1",
                                    params[f"in_{lvl}_{i}_attn"],
                                    transformer_depth)
            n += 1
        if lvl != L - 1:
            _inv_conv(sd, f"input_blocks.{n}.0.op",
                      params[f"in_{lvl}_down"]["conv"])
            n += 1
            ds *= 2

    _inv_sd_resblock(sd, "middle_block.0", params["mid_res1"])
    _inv_sd_transformer(sd, "middle_block.1", params["mid_attn"],
                        transformer_depth)
    _inv_sd_resblock(sd, "middle_block.2", params["mid_res2"])

    n = 0
    for lvl in reversed(range(L)):
        for i in range(num_res_blocks + 1):
            _inv_sd_resblock(sd, f"output_blocks.{n}.0",
                             params[f"out_{lvl}_{i}_res"])
            k = 1
            if ds in attention_resolutions:
                _inv_sd_transformer(sd, f"output_blocks.{n}.{k}",
                                    params[f"out_{lvl}_{i}_attn"],
                                    transformer_depth)
                k += 1
            if lvl != 0 and i == num_res_blocks:
                _inv_conv(sd, f"output_blocks.{n}.{k}.conv",
                          params[f"out_{lvl}_up"]["conv"])
                ds //= 2
            n += 1

    _inv_norm(sd, "out.0", params["out_norm"])
    _inv_conv(sd, "out.2", params["out_conv"])
    return {prefix + k: v for k, v in sd.items()}


def save_sd_checkpoint(path: str, state_dict: dict, half: bool = False) -> None:
    """Save an SD-layout state_dict. A `.safetensors` path writes the SD
    ecosystem's standard format via the native writer
    (sd_tpu.utils.safetensors_io); anything else is torch.save in the
    reference's checkpoint shape {'state_dict': {...}} (`half=True` = the
    fp16 conversion of vqvae/test/test.py:3-21)."""
    if path.endswith(".safetensors"):
        from sd_tpu.utils.safetensors_io import save_safetensors

        dt = np.float16 if half else np.float32
        save_safetensors(
            path, {k: np.asarray(v, dtype=dt) for k, v in state_dict.items()},
            metadata={"format": "pt"})
        return
    import torch

    # copy: torch.from_numpy rejects/warns on non-writable jax-exported views
    t = {k: torch.from_numpy(np.array(v, dtype=np.float32))
         for k, v in state_dict.items()}
    if half:
        t = {k: v.half() for k, v in t.items()}
    torch.save({"state_dict": t}, path)
