"""Tests for the quantitative evaluation subsystem (sd_tpu.eval).

The reference has no quality metric at all (quality is eyeballed from grids,
VAE/test/test.py:200-267); these pin the beyond-reference FID machinery to
closed-form Gaussian math and the steering probe to a separable synthetic
two-class problem.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.eval import (
    classifier_fn,
    extract_features,
    fid_from_features,
    frechet_distance,
    gaussian_stats,
    steering_score,
    train_image_classifier,
)


def test_frechet_distance_closed_form_diagonal():
    # For diagonal covariances the distance is analytic:
    # |mu1-mu2|^2 + sum((sqrt(c1)-sqrt(c2))^2)
    mu1 = np.array([0.0, 1.0, -2.0])
    mu2 = np.array([1.0, 1.0, 0.0])
    c1 = np.diag([1.0, 4.0, 9.0])
    c2 = np.diag([4.0, 1.0, 1.0])
    want = 5.0 + ((1 - 2) ** 2 + (2 - 1) ** 2 + (3 - 1) ** 2)
    got = frechet_distance(mu1, c1, mu2, c2)
    assert got == pytest.approx(want, rel=1e-6)


def test_frechet_distance_identity_and_symmetry():
    rs = np.random.RandomState(0)
    a = rs.randn(64, 8)
    mu, cov = gaussian_stats(a)
    assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-8)
    b = rs.randn(64, 8) + 0.5
    mu2, cov2 = gaussian_stats(b)
    d_ab = frechet_distance(mu, cov, mu2, cov2)
    d_ba = frechet_distance(mu2, cov2, mu, cov)
    assert d_ab == pytest.approx(d_ba, rel=1e-9)
    assert d_ab > 0.1


def test_fid_from_samples_tracks_distribution_shift():
    # Empirical Gaussians: FID(same dist) << FID(shifted dist), and the
    # estimate approaches the analytic mean-shift term |delta|^2 = 4.
    rs = np.random.RandomState(1)
    real = rs.randn(4096, 4)
    same = rs.randn(4096, 4)
    shifted = rs.randn(4096, 4) + np.array([2.0, 0, 0, 0])
    d_same = fid_from_features(real, same)
    d_shift = fid_from_features(real, shifted)
    assert d_same < 0.05
    assert d_shift == pytest.approx(4.0, rel=0.1)
    assert d_shift > 20 * d_same


def test_extract_features_batching_and_padding():
    # a deterministic "extractor": channel means per image
    def feat(x):
        return x.mean(axis=(1, 2))

    imgs = np.random.RandomState(2).rand(10, 8, 8, 3).astype(np.float32)
    f1 = extract_features(feat, imgs, batch_size=4)  # 4+4+2 with padding
    f2 = extract_features(feat, imgs, batch_size=10)
    assert f1.shape == (10, 3)
    np.testing.assert_allclose(f1, f2, rtol=1e-6)


def _two_class_images(n_per: int, size: int = 32, seed: int = 0):
    """Class 0: bright disc on dark ground; class 1: dark checker on bright."""
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    images, labels = [], []
    for i in range(2 * n_per):
        cls = i % 2
        if cls == 0:
            cy, cx = 0.3 + 0.4 * rs.rand(2)
            img = ((np.hypot(yy - cy, xx - cx) < 0.2 + 0.1 * rs.rand())
                   .astype(np.float32) * 1.6 - 0.8)
        else:
            k = rs.randint(3, 6)
            img = (((np.floor(yy * k) + np.floor(xx * k)) % 2)
                   .astype(np.float32) * -1.6 + 0.8)
        img = img + 0.1 * rs.randn(size, size).astype(np.float32)
        images.append(np.repeat(img[..., None], 3, axis=-1))
        labels.append(cls)
    return np.stack(images), np.asarray(labels, np.int32)


def test_classifier_probe_learns_and_steering_score_discriminates():
    images, labels = _two_class_images(48)
    model, out = train_image_classifier(
        images, labels, num_classes=2, steps=120, batch_size=16, width=8)
    fn = classifier_fn(model, out["params"])
    discs = images[labels == 0]
    checkers = images[labels == 1]
    s_disc = steering_score(fn, discs, target_class=0)
    s_checker = steering_score(fn, checkers, target_class=1)
    assert s_disc["accuracy"] > 0.9
    assert s_checker["accuracy"] > 0.9
    # asking for the wrong class must score at 1 - accuracy
    s_wrong = steering_score(fn, discs, target_class=1)
    assert s_wrong["accuracy"] == pytest.approx(1.0 - s_disc["accuracy"])
    assert 0.0 <= s_disc["confidence"] <= 1.0


def test_clip_feature_fn_deterministic_surrogate():
    from sd_tpu.eval import clip_feature_fn

    fn1 = clip_feature_fn(seed=0, jit=False)
    fn2 = clip_feature_fn(seed=0, jit=False)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3)
                    .astype(np.float32) * 2 - 1)
    f1, f2 = np.asarray(fn1(x)), np.asarray(fn2(x))
    np.testing.assert_allclose(f1, f2, rtol=1e-6)  # fixed-seed => stable
    assert f1.shape == (2, 512)
    assert np.std(f1) > 0
