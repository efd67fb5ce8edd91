"""Mask-conditioned inpainting LDM (sd_tpu/train/inpaint.py; the
SD-inpainting recipe composed from the reference's hybrid conditioning
dispatch, ldm/diffusion/ddpm.py:2004-2034, and first-stage machinery —
the reference itself only ships the sampling-time mask blend,
DDIM/ddim.py:144-147)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("inpaint_imgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        g = np.linspace(0, 255, 32, dtype=np.uint8)
        img = np.stack(np.broadcast_arrays(
            g[None, :], g[:, None],
            rng.integers(0, 255, (32, 32), dtype=np.uint8)), axis=-1)
        Image.fromarray(img.astype(np.uint8)).save(d / f"{i}.png")
    return str(d)


def _load_cfg():
    from sd_tpu.core.config import load_yaml

    cfg = load_yaml(os.path.join("configs", "inpaint_smoke.yaml"))
    cfg["train"]["total_steps"] = 2
    cfg["train"]["checkpoint_every"] = 2
    cfg["train"]["eval_every"] = 2  # exercise the inpaint eval sampler
    return cfg


def test_random_inpaint_masks():
    from sd_tpu.train.inpaint import random_inpaint_masks

    rng = np.random.default_rng(0)
    m = random_inpaint_masks(rng, 8, 32, 32, full_prob=0.0)
    assert m.shape == (8, 32, 32, 1)
    assert set(np.unique(m)) <= {0.0, 1.0}
    # every sample has a hole and keeps some context
    per = m.reshape(8, -1).mean(axis=1)
    assert (per > 0).all() and (per < 1).all()
    # full_prob=1 -> all-ones masks (the text-to-image training mode)
    m_full = random_inpaint_masks(rng, 2, 16, 16, full_prob=1.0)
    assert (m_full == 1.0).all()


def test_mask_to_latent_nearest():
    import jax.numpy as jnp

    from sd_tpu.train.inpaint import mask_to_latent

    m = np.zeros((1, 8, 8, 1), np.float32)
    m[0, :4, :4] = 1.0
    out = np.asarray(mask_to_latent(jnp.asarray(m), 2, 2))
    assert out.shape == (1, 2, 2, 1)
    np.testing.assert_array_equal(out[0, :, :, 0],
                                  [[1.0, 0.0], [0.0, 0.0]])


def test_config_validation():
    from sd_tpu.train.inpaint import _check_inpaint_config

    cfg = _load_cfg()
    _check_inpaint_config(cfg)  # the smoke config is valid
    bad = _load_cfg()
    bad["unet"]["params"]["in_channels"] = 4
    with pytest.raises(ValueError, match="in_channels"):
        _check_inpaint_config(bad)
    bad2 = _load_cfg()
    bad2["latent"]["conditioning_key"] = "crossattn"
    with pytest.raises(ValueError, match="hybrid"):
        _check_inpaint_config(bad2)


def test_train_ldm_inpaint_runner(image_dir, tmp_path):
    import json

    from sd_tpu.train.inpaint import train_ldm_inpaint

    out = tmp_path / "run"
    state = train_ldm_inpaint(_load_cfg(), image_dir, out_dir=str(out))
    assert int(state.step) == 2
    lines = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert lines and all(np.isfinite(l["loss"]) for l in lines
                         if "loss" in l)
    # the eval sampler ran: masked/inpainted/original grid
    assert os.path.exists(out / "samples" / "step_2.png")


def test_pipeline_inpaint_conditioned(image_dir):
    """End-to-end serving: a hybrid 9-channel pipeline dispatches to the
    mask-conditioned program; kept pixels are bit-preserved by the
    pixel-level composite, hole pixels are generated."""
    from sd_tpu.core.config import load_yaml
    from sd_tpu.pipeline import Text2ImagePipeline

    cfg = load_yaml(os.path.join("configs", "inpaint_smoke.yaml"))
    pipe = Text2ImagePipeline(cfg, param_dtype=None)
    assert pipe._is_inpaint_model()

    rng = np.random.default_rng(3)
    init = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    keep = np.ones((1, 32, 32), np.float32)
    keep[:, 8:24, 8:24] = 0.0  # regenerate the center block
    out = pipe.inpaint(["a test"], init, keep, num_steps=2,
                       guidance_scale=2.0)
    assert out.shape == (1, 32, 32, 3)
    # kept region: exact round-trip of the input through the [-1,1]
    # normalize/denormalize (uint8-exact)
    kept = keep[..., None].astype(bool)
    np.testing.assert_array_equal(np.broadcast_to(kept, out.shape) * out,
                                  np.broadcast_to(kept, out.shape) * init)
    # the hole was actually generated (differs from the input)
    hole = ~kept
    assert np.abs(out.astype(int) - init.astype(int))[
        np.broadcast_to(hole, out.shape)].mean() > 1.0


def test_pipeline_inpaint_fallback_unchanged():
    """A plain crossattn pipeline still uses the mask-blend img2img path."""
    from sd_tpu.core.config import load_yaml
    from sd_tpu.pipeline import Text2ImagePipeline

    cfg = load_yaml(os.path.join("configs", "sd_txt2img_smoke.yaml"))
    pipe = Text2ImagePipeline(cfg, param_dtype=None)
    assert not pipe._is_inpaint_model()
