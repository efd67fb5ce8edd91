"""Multi-chip serving path of Text2ImagePipeline on the virtual CPU mesh.

The reference serves on a single GPU (VAE/autoencoder.py:463-471); the
TPU-native pipeline shards the prompt batch over a `data` mesh axis and can
TP-shard the UNet over a `model` axis (SURVEY.md §2.14/§5.8). These tests pin
the contract: sharded serving produces the same images as single-device
serving, and the input/weight placements are what GSPMD expects.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from sd_tpu.core.config import load_yaml
from sd_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def pipe():
    from sd_tpu.pipeline import Text2ImagePipeline

    cfg = load_yaml("configs/sd_txt2img_smoke.yaml")
    # fp32 so sharded-vs-unsharded comparison is exact on CPU
    return Text2ImagePipeline(cfg, param_dtype=None)


PROMPTS = ["a cat", "a dog"]


def test_data_parallel_serving_matches_single_device(pipe):
    base = pipe.generate(PROMPTS, num_steps=2, guidance_scale=3.0, seed=7)

    mesh = make_mesh({"data": 2}, devices=jax.devices()[:2])
    pipe.shard_for_serving(mesh)
    assert pipe.mesh is mesh and pipe._jitted == {}
    out = pipe.generate(PROMPTS, num_steps=2, guidance_scale=3.0, seed=7)

    assert out.shape == base.shape
    # uint8 grids must agree to within rounding (fp32 on CPU: exact or ±1)
    assert int(np.abs(out.astype(int) - base.astype(int)).max()) <= 1


def test_batch_must_divide_data_axis(pipe):
    mesh = make_mesh({"data": 2}, devices=jax.devices()[:2])
    pipe.shard_for_serving(mesh)
    with pytest.raises(ValueError, match="divide"):
        pipe.generate(["one prompt"], num_steps=2)


def test_tp_axis_serving_runs(pipe):
    """A dp×tp mesh: UNet params go through the Megatron rules (leaves whose
    shapes don't divide fall back to replication) and the program still
    produces the single-device images."""
    base = pipe.generate(PROMPTS, num_steps=2, guidance_scale=3.0, seed=7)
    mesh = make_mesh({"data": 2, "model": 2}, devices=jax.devices()[:4])
    pipe.shard_for_serving(mesh)
    out = pipe.generate(PROMPTS, num_steps=2, guidance_scale=3.0, seed=7)
    assert out.shape == base.shape
    assert int(np.abs(out.astype(int) - base.astype(int)).max()) <= 1
