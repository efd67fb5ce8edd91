"""Super-resolution LDM: SRDataset pairing, concat-conditioned training,
and the super_resolve inference path (sd_tpu/train/sr.py; reference
ingredients: image_degradation/bsrgan.py degradations +
ldm/diffusion/ddpm.py:2004-2034 'concat' dispatch, never composed there)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("sr_imgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        # structured images: gradients survive degradation (pure noise
        # blurs to a constant and would make LR/SR comparisons vacuous)
        g = np.linspace(0, 255, 32, dtype=np.uint8)
        img = np.stack(np.broadcast_arrays(
            g[None, :], g[:, None],
            rng.integers(0, 255, (32, 32), dtype=np.uint8)), axis=-1)
        Image.fromarray(img.astype(np.uint8)).save(d / f"{i}.png")
    return str(d)


def test_sr_dataset_pairs(image_dir):
    from sd_tpu.data.datasets import SRDataset

    for mode in ["bicubic", "bsrgan", "bsrgan_light", "bsrgan_variant"]:
        ds = SRDataset(image_dir, image_size=32, sf=4, degradation=mode,
                       random_flip=False)
        item = ds[0]
        assert item["image"].shape == (32, 32, 3)
        assert item["lr"].shape == (8, 8, 3)
        assert item["lr"].min() >= -1.0 and item["lr"].max() <= 1.0
        # keyed RNG: same (seed, epoch, idx) -> identical degradation
        again = SRDataset(image_dir, image_size=32, sf=4,
                          degradation=mode, random_flip=False)[0]
        np.testing.assert_array_equal(item["lr"], again["lr"])


def test_sr_dataset_rejects_bad_sf(image_dir):
    from sd_tpu.data.datasets import SRDataset

    with pytest.raises(ValueError):
        SRDataset(image_dir, image_size=30, sf=4)


def _load_cfg():
    from sd_tpu.core.config import load_yaml

    cfg = load_yaml(os.path.join("configs", "ldm_sr_smoke.yaml"))
    cfg["train"]["total_steps"] = 2
    cfg["train"]["checkpoint_every"] = 2
    cfg["train"]["eval_every"] = 2  # exercise the SR eval sampler too
    return cfg


def test_train_ldm_sr_runner(image_dir, tmp_path):
    from sd_tpu.train.sr import train_ldm_sr

    out = tmp_path / "run"
    state = train_ldm_sr(_load_cfg(), image_dir, out_dir=str(out))
    assert int(state.step) == 2
    assert os.path.exists(out / "metrics.jsonl")
    assert os.path.exists(out / "calibration.json")  # scale_factor: auto
    # the eval sampler ran and logged SR quality vs ground truth
    import json

    evals = [json.loads(l) for l in open(out / "metrics.jsonl")
             if "eval_psnr" in l]
    assert evals and np.isfinite(evals[-1]["eval_psnr"])
    assert os.path.exists(out / "samples" / "step_2.png")


def test_build_ldm_sr_checks_in_channels():
    import jax

    from sd_tpu.train.sr import build_ldm_sr

    cfg = _load_cfg()
    cfg["unet"]["params"]["in_channels"] = 4  # forgot the 3 concat channels
    with pytest.raises(ValueError, match="concat"):
        build_ldm_sr(cfg, jax.random.PRNGKey(0))


def test_super_resolve_shapes(image_dir):
    import jax

    from sd_tpu.data.datasets import SRDataset
    from sd_tpu.train.sr import build_ldm_sr, super_resolve

    cfg = _load_cfg()
    ld, unet, uparams, vae, vparams = build_ldm_sr(cfg, jax.random.PRNGKey(0))
    ds = SRDataset(image_dir, image_size=32, sf=4, random_flip=False)
    lr = np.stack([ds[i]["lr"] for i in range(2)])
    out = super_resolve(ld, uparams, lr, jax.random.PRNGKey(1),
                        cfg["latent"], num_steps=2)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(out).all()
