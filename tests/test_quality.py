"""Quality fences: quantitative regression bounds on generated output.

The reference validates reconstruction quality by eye
(VAE/test/test.py:200-267 renders recon grids; DDPM/utils.py sample grids).
Without real trained weights (artifact-gated, COMPAT.md) absolute quality is
meaningless — but DETERMINISM is not: with fixed-seed init and fixed inputs,
reconstruction PSNR/SSIM and sample statistics are stable numbers, so a
refactor that silently breaks the decode path (e.g. the round-3 GroupNorm
grouping bug caught by tests/test_pipeline_parity.py) shifts them and fails
here. Goldens were recorded on the CPU conftest platform (fp32, highest
matmul precision); bounds are loose enough for cross-platform fp noise and
tight enough to catch structural breaks.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.train.metrics import psnr, ssim


def synthetic_images(n: int = 2, size: int = 32) -> np.ndarray:
    """Deterministic structured test images in [-1, 1]: gradients + a disc +
    a checker, different per batch element."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    imgs = []
    for i in range(n):
        r = np.hypot(yy - 0.35 - 0.2 * i, xx - 0.6 + 0.15 * i)
        disc = (r < 0.25).astype(np.float32)
        checker = ((np.floor(yy * 4 + i) + np.floor(xx * 4)) % 2)
        img = np.stack([xx, yy, 0.5 * disc + 0.5 * checker], axis=-1)
        imgs.append(img * 2.0 - 1.0)
    return np.stack(imgs)


def test_psnr_ssim_sanity():
    x = synthetic_images()
    assert psnr(x, x) == float("inf")
    assert ssim(x, x) == pytest.approx(1.0, abs=1e-9)
    noisy = x + 0.1 * np.random.RandomState(0).randn(*x.shape)
    p, s = psnr(x, noisy), ssim(x, noisy)
    assert 24.0 < p < 29.0  # 0.1-sigma noise on a 2.0 range ≈ 26 dB
    assert 0.2 < s < 0.95
    # heavier corruption must rank strictly worse
    worse = x + 0.5 * np.random.RandomState(1).randn(*x.shape)
    assert psnr(x, worse) < p and ssim(x, worse) < s


# golden values: seed-0 random weights, CPU fp32 (recorded round 3).
KL_GOLD = {"psnr": 7.436, "ssim": 0.0061}
VQ_GOLD = {"psnr": 7.855, "ssim": 0.0095}
PIPE_GOLD = {"px_mean": 0.0116, "px_std": 0.5917}


def test_kl_vae_reconstruction_quality_pinned():
    from sd_tpu.models.autoencoder import AutoencoderKL

    vae = AutoencoderKL(embed_dim=4, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        attn_resolutions=(), resolution=32, z_channels=4)
    x = jnp.asarray(synthetic_images())
    params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))["params"]
    post = vae.apply({"params": params}, x, method=AutoencoderKL.encode)
    recon = np.asarray(vae.apply({"params": params}, post.mode(),
                                 method=AutoencoderKL.decode))
    p, s = psnr(np.asarray(x), recon), ssim(np.asarray(x), recon)
    assert p == pytest.approx(KL_GOLD["psnr"], abs=0.5), (p, s)
    assert s == pytest.approx(KL_GOLD["ssim"], abs=0.02), (p, s)


def test_vq_reconstruction_quality_pinned():
    from sd_tpu.models.autoencoder import VQModel

    vq = VQModel(n_embed=64, embed_dim=3, ch=32, ch_mult=(1, 2),
                 num_res_blocks=1, attn_resolutions=(), resolution=32,
                 z_channels=3)
    x = jnp.asarray(synthetic_images())
    params = vq.init(jax.random.PRNGKey(0), x)["params"]
    z_q, _, _ = vq.apply({"params": params}, x, method=VQModel.encode)
    recon = np.asarray(vq.apply({"params": params}, z_q,
                                method=VQModel.decode))
    p, s = psnr(np.asarray(x), recon), ssim(np.asarray(x), recon)
    assert p == pytest.approx(VQ_GOLD["psnr"], abs=0.5), (p, s)
    assert s == pytest.approx(VQ_GOLD["ssim"], abs=0.02), (p, s)


def test_pipeline_sample_statistics_pinned():
    """End-to-end text-to-image smoke pipeline (bench.py's own smoke build):
    latent and pixel mean/std pinned per seed. Catches silent drift anywhere
    in CLIP encode → DDIM scan → VAE decode."""
    import bench

    pipeline, params, clip_cfg, lat = bench.build(smoke=True)
    from sd_tpu.models.clip_text import SimpleHashTokenizer

    tok = SimpleHashTokenizer(clip_cfg.max_length, clip_cfg.vocab_size)
    ids = jnp.asarray(tok(["a cat", "a dog"]))
    neg = jnp.asarray(tok(["", ""]))
    out = np.asarray(pipeline(*params, ids, neg, jax.random.PRNGKey(0)),
                     np.float32)
    assert np.isfinite(out).all()
    stats = {"px_mean": float(out.mean()), "px_std": float(out.std())}
    for k in ("px_mean", "px_std"):
        assert stats[k] == pytest.approx(PIPE_GOLD[k], abs=0.02), stats
