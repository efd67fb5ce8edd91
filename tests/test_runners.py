"""In-process runner smoke tests: each capability trains a few steps through
the Python API (the CLI wraps these; reference entry points SURVEY.md §3)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")
    return str(d)


def _load(cfg_name):
    from sd_tpu.core.config import load_yaml

    cfg = load_yaml(os.path.join("configs", cfg_name))
    cfg["train"]["total_steps"] = 2
    cfg["train"]["checkpoint_every"] = 2
    cfg["train"]["eval_every"] = 100  # skip sampling in the smoke run
    return cfg


def test_train_ddpm_runner(image_dir, tmp_path):
    from sd_tpu.train.runners import train_ddpm

    state = train_ddpm(_load("ddpm_smoke.yaml"), image_dir,
                       out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2
    assert os.path.exists(tmp_path / "run" / "metrics.jsonl")
    assert os.path.isdir(tmp_path / "run" / "ckpt")


def test_train_kl_vae_runner(image_dir, tmp_path):
    from sd_tpu.train.runners import train_kl_vae

    cfg = _load("kl_smoke.yaml")
    state = train_kl_vae(cfg, image_dir, out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2


def test_train_vq_runner(image_dir, tmp_path):
    from sd_tpu.train.runners import train_vq

    state = train_vq(_load("vq_smoke.yaml"), image_dir,
                     out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2


def test_train_ldm_runner(image_dir, tmp_path):
    from sd_tpu.train.runners import train_ldm

    state = train_ldm(_load("sd_txt2img_smoke.yaml"), image_dir,
                      out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2
