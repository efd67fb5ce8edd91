"""Text2ImagePipeline tests: generate determinism, SD-checkpoint loading path."""

import numpy as np

import jax

from sd_tpu.core.config import load_yaml
from sd_tpu.pipeline import Text2ImagePipeline


def test_pipeline_generate_deterministic():
    pipe = Text2ImagePipeline.from_config("configs/sd_txt2img_smoke.yaml",
                                          param_dtype=None)
    imgs = pipe.generate(["a cat", "a dog"], num_steps=3, guidance_scale=2.0,
                         seed=7)
    assert imgs.shape == (2, 32, 32, 3)
    assert imgs.dtype == np.uint8
    imgs2 = pipe.generate(["a cat", "a dog"], num_steps=3, guidance_scale=2.0,
                          seed=7)
    np.testing.assert_array_equal(imgs, imgs2)
    imgs3 = pipe.generate(["a cat", "a dog"], num_steps=3, guidance_scale=2.0,
                          seed=8)
    assert not np.array_equal(imgs, imgs3)

    # DPM-Solver path through the same program cache (distinct cache key)
    imgs4 = pipe.generate(["a cat", "a dog"], num_steps=3, guidance_scale=2.0,
                          seed=7, sampler="dpm")
    assert imgs4.shape == (2, 32, 32, 3) and imgs4.dtype == np.uint8
    assert not np.array_equal(imgs, imgs4)  # different solver, different path

    # k-diffusion path (euler_a: stochastic, uses the seed's rng per step)
    imgs5 = pipe.generate(["a cat", "a dog"], num_steps=3, guidance_scale=2.0,
                          seed=7, sampler="euler_a")
    assert imgs5.shape == (2, 32, 32, 3) and imgs5.dtype == np.uint8
    assert not np.array_equal(imgs, imgs5)

    # UniPC predictor-corrector path
    imgs6 = pipe.generate(["a cat", "a dog"], num_steps=3, guidance_scale=2.0,
                          seed=7, sampler="unipc")
    assert imgs6.shape == (2, 32, 32, 3) and imgs6.dtype == np.uint8
    assert not np.array_equal(imgs, imgs6)

    # per-prompt negative prompts reuse the same compiled program. At random
    # init the UNet's zero-init residual convs (proj_out/out_conv, the SD
    # convention) make the model output exactly 0 regardless of conditioning,
    # so perturb the params deterministically to give text a gradient path.
    import jax.numpy as jnp

    pipe.unet_params = jax.tree.map(
        lambda p: p + 0.05 * jnp.cos(1.7 * jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape).astype(p.dtype),
        pipe.unet_params)
    base = pipe.generate(["a cat", "a dog"], num_steps=3, guidance_scale=2.0,
                         seed=7)
    imgs6 = pipe.generate(["a cat", "a dog"], num_steps=3, guidance_scale=2.0,
                          seed=7, negative_prompt=["blurry", "low quality"])
    assert imgs6.shape == (2, 32, 32, 3)
    assert not np.array_equal(base, imgs6)  # conditioning actually changed


def test_pipeline_clip_skip():
    """clip_skip routes conditioning through an earlier CLIP hidden state;
    the smoke config's text tower has 2 layers so skip∈{1,2} are valid."""
    import pytest

    pipe = Text2ImagePipeline.from_config("configs/sd_txt2img_smoke.yaml",
                                          param_dtype=None)
    # perturb past the zero-init output convs so conditioning matters
    import jax.numpy as jnp

    pipe.unet_params = jax.tree.map(
        lambda p: p + 0.05 * jnp.cos(1.7 * jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape).astype(p.dtype),
        pipe.unet_params)
    base = pipe.generate(["a cat"], num_steps=2, guidance_scale=2.0, seed=1)
    skip1 = pipe.generate(["a cat"], num_steps=2, guidance_scale=2.0, seed=1,
                          clip_skip=1)
    skip2 = pipe.generate(["a cat"], num_steps=2, guidance_scale=2.0, seed=1,
                          clip_skip=2)
    np.testing.assert_array_equal(base, skip1)  # 1 == the model default
    assert not np.array_equal(base, skip2)      # earlier state: different cond
    with pytest.raises(ValueError, match="clip_skip"):
        pipe.generate(["a cat"], num_steps=2, clip_skip=3)


def test_pipeline_nonsquare_generate():
    """Arbitrary height/width (fully-convolutional UNet+VAE): the smoke
    config's total downsampling is f4 VAE × 2-level UNet = 8 px."""
    import pytest

    pipe = Text2ImagePipeline.from_config("configs/sd_txt2img_smoke.yaml",
                                          param_dtype=None)
    imgs = pipe.generate(["a wide cat"], num_steps=2, guidance_scale=2.0,
                         height=24, width=40)
    assert imgs.shape == (1, 24, 40, 3) and imgs.dtype == np.uint8
    with pytest.raises(ValueError, match="multiples of 8"):
        pipe.generate(["x"], num_steps=2, height=20, width=40)


def test_pipeline_tiled_decode():
    """decode_tile bounds decoder memory by decoding overlapping latent
    patches. A tile >= the image is exactly the direct path; a smaller
    tile stays close to it (per-tile GroupNorm stats are the only
    divergence, hidden by the Gaussian overlap-add)."""
    pipe = Text2ImagePipeline.from_config("configs/sd_txt2img_smoke.yaml",
                                          param_dtype=None)
    kw = dict(num_steps=2, guidance_scale=2.0, seed=11)
    # smoke config: latent 8x8, f4 VAE -> 32px images
    direct = pipe.generate(["a cat"], **kw)
    same = pipe.generate(["a cat"], decode_tile=32, **kw)
    np.testing.assert_array_equal(direct, same)  # tile >= image: direct path
    tiled = pipe.generate(["a cat"], decode_tile=16, **kw)  # 4px latent tiles
    assert tiled.shape == direct.shape and tiled.dtype == np.uint8
    assert np.isfinite(tiled.astype(np.float64)).all()
    # same decoder weights: tiled output tracks the direct decode closely
    d = direct.astype(np.float32) / 255.0
    t = tiled.astype(np.float32) / 255.0
    assert np.abs(d - t).mean() < 0.12, np.abs(d - t).mean()


def test_pipeline_from_sd_checkpoint(tmp_path):
    """End-to-end: synthesize a torch .ckpt matching the smoke config, load
    through from_sd_checkpoint, generate."""
    import torch

    import jax.numpy as jnp

    from sd_tpu.models.autoencoder import AutoencoderKL
    from sd_tpu.models.unet_sd import UNetModel
    from test_sd_import import (
        _synthetic_sd,
        _torch_shapes_for_unet,
        _torch_shapes_for_vae,
    )

    cfg = load_yaml("configs/sd_txt2img_smoke.yaml")
    rng = jax.random.PRNGKey(0)

    ucfg = cfg["unet"]["params"]
    unet = UNetModel(**ucfg)
    up = unet.init(rng, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
                   jnp.zeros((1, 7, ucfg["context_dim"])))["params"]
    ushapes = _torch_shapes_for_unet(
        up, channel_mult=tuple(ucfg["channel_mult"]),
        num_res_blocks=ucfg["num_res_blocks"],
        attention_resolutions=tuple(ucfg["attention_resolutions"]))

    fcfg = cfg["first_stage"]["params"]
    vae = AutoencoderKL(**fcfg)
    vp = vae.init(rng, jnp.zeros((1, 32, 32, 3)), rng)["params"]
    vshapes = _torch_shapes_for_vae(
        vp, ch_mult=tuple(fcfg["ch_mult"]),
        num_res_blocks=fcfg["num_res_blocks"],
        attn_resolutions=tuple(fcfg["attn_resolutions"]),
        resolution=fcfg["resolution"])

    sd = {}
    for k, v in _synthetic_sd(ushapes).items():
        sd["model.diffusion_model." + k] = torch.tensor(v * 0.1)
    for k, v in _synthetic_sd(vshapes).items():
        sd["first_stage_model." + k] = torch.tensor(v * 0.1)
    ckpt = tmp_path / "sd.ckpt"
    torch.save({"state_dict": sd}, str(ckpt))

    pipe = Text2ImagePipeline.from_sd_checkpoint(
        "configs/sd_txt2img_smoke.yaml", str(ckpt), param_dtype=None)
    imgs = pipe.generate(["hello"], num_steps=2)
    assert imgs.shape == (1, 32, 32, 3)
    assert np.isfinite(imgs.astype(np.float32)).all()


def test_pipeline_img2img_and_inpaint():
    """img2img keeps low-strength outputs near the init image, and the
    inpaint mask preserves kept regions better than regenerated ones
    (reference surface: DDIM/ddim.py:206-241 stochastic_encode/decode,
    mask blend :144-147)."""
    pipe = Text2ImagePipeline.from_config("configs/sd_txt2img_smoke.yaml",
                                          param_dtype=None)
    rngimg = np.random.default_rng(0)
    size = pipe.cfg["latent"]["image_size"] * 4  # smoke VAE is f4
    init = rngimg.integers(60, 196, (1, size, size, 3), dtype=np.uint8)

    lo = pipe.img2img(["a cat"], init, strength=0.2, num_steps=5,
                      guidance_scale=1.0, seed=3)
    hi = pipe.img2img(["a cat"], init, strength=1.0, num_steps=5,
                      guidance_scale=1.0, seed=3)
    assert lo.shape == init.shape and lo.dtype == np.uint8
    d_lo = float(np.mean(np.abs(lo.astype(int) - init.astype(int))))
    d_hi = float(np.mean(np.abs(hi.astype(int) - init.astype(int))))
    # weak re-noising stays closer to the init than full re-noising
    assert d_lo < d_hi, (d_lo, d_hi)

    # inpaint: keep the left half (mask=1), regenerate the right
    mask = np.zeros((1, size, size), np.float32)
    mask[:, :, : size // 2] = 1.0
    out = pipe.inpaint(["a cat"], init, mask, num_steps=5,
                       guidance_scale=1.0, seed=3)
    assert out.shape == init.shape
    kept = np.mean(np.abs(out[:, :, : size // 2].astype(int)
                          - init[:, :, : size // 2].astype(int)))
    regen = np.mean(np.abs(out[:, :, size // 2:].astype(int)
                           - init[:, :, size // 2:].astype(int)))
    assert kept < regen, (kept, regen)

    # img2img shares the weighted-prompt / clip_skip surface with generate.
    # Perturb past the zero-init output convs so conditioning matters.
    import jax
    import jax.numpy as jnp

    pipe.unet_params = jax.tree.map(
        lambda p: p + 0.05 * jnp.cos(1.7 * jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape).astype(p.dtype),
        pipe.unet_params)
    w = pipe.img2img(["a (cat:1.7)"], init, strength=0.6, num_steps=3,
                     guidance_scale=2.0, seed=3, clip_skip=2)
    assert w.shape == init.shape and w.dtype == np.uint8
    plain = pipe.img2img(["a cat"], init, strength=0.6, num_steps=3,
                         guidance_scale=2.0, seed=3, clip_skip=2)
    assert not np.array_equal(w, plain)


def test_generate_hires():
    """Two-stage highres fix: base txt2img -> upscale -> img2img refine.
    Output lands at the scaled size (snapped to the total factor) and the
    refinement actually changes pixels vs plain upscaling."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sd_tpu.core.config import load_yaml
    from sd_tpu.pipeline import Text2ImagePipeline

    pipe = Text2ImagePipeline(load_yaml("configs/sd_txt2img_smoke.yaml"),
                              param_dtype=None)
    pipe.unet_params = jax.tree.map(
        lambda p: p + 0.05 * jnp.cos(1.3 * jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape).astype(p.dtype),
        pipe.unet_params)
    out = pipe.generate_hires(["a cat"], hires_scale=2.0,
                              denoising_strength=0.6, num_steps=2,
                              hires_steps=3, guidance_scale=2.0, seed=0)
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
    base = pipe.generate(["a cat"], num_steps=2, guidance_scale=2.0, seed=0)
    up = np.asarray(Image.fromarray(base[0]).resize((64, 64), Image.BICUBIC))
    assert not np.array_equal(out[0], up)


def test_img2img_threads_current_vae_params(smoke_pipe_cfg=None):
    """The img2img/inpaint programs must encode/decode with the pipeline's
    CURRENT first-stage params, passed as jit ARGUMENTS — not the
    build-time init tree baked in as constants (the from_sd_checkpoint /
    bf16-cast staleness bug class). Zeroing self.vae_params after the
    first call must change the output without any cache reset."""
    import jax
    import jax.numpy as jnp

    from sd_tpu.core.config import load_yaml
    from sd_tpu.pipeline import Text2ImagePipeline

    cfg = load_yaml("configs/sd_txt2img_smoke.yaml")
    pipe = Text2ImagePipeline(cfg, param_dtype=None)
    rng = np.random.default_rng(0)
    init = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    out1 = pipe.img2img(["a"], init, num_steps=2, strength=0.5, seed=3)
    pipe.vae_params = jax.tree.map(
        lambda a: jnp.zeros_like(a)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, pipe.vae_params)
    out2 = pipe.img2img(["a"], init, num_steps=2, strength=0.5, seed=3)
    assert not np.array_equal(out1, out2)


def test_img2img_encode_decode_tiling():
    """encode_tile/decode_tile on img2img: tile >= image is the untiled
    program (bitwise — same jit program modulo the tiling branch), and a
    smaller tile still produces finite images of the right shape."""
    from sd_tpu.core.config import load_yaml
    from sd_tpu.pipeline import Text2ImagePipeline

    cfg = load_yaml("configs/sd_txt2img_smoke.yaml")
    pipe = Text2ImagePipeline(cfg, param_dtype=None)
    rng = np.random.default_rng(1)
    init = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)
    base = pipe.img2img(["a"], init, num_steps=2, strength=0.5, seed=5)
    big = pipe.img2img(["a"], init, num_steps=2, strength=0.5, seed=5,
                       encode_tile=64, decode_tile=64)
    np.testing.assert_array_equal(base, big)
    tiled = pipe.img2img(["a"], init, num_steps=2, strength=0.5, seed=5,
                         encode_tile=16, decode_tile=16)
    assert tiled.shape == base.shape
    assert np.isfinite(tiled.astype(np.float32)).all()
