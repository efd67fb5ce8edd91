"""Tests for DiagonalGaussian / normal_kl vs closed-form and torch oracle
(reference semantics: Distribution/distribution.py:32-120)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from sd_tpu.core.distributions import DiagonalGaussian, Dirac, normal_kl


def make_posterior(key, shape=(2, 4, 4, 6)):
    params = jax.random.normal(key, shape)
    return DiagonalGaussian.from_moments(params), params


def test_split_and_clamp(rng):
    params = jnp.concatenate(
        [jnp.zeros((1, 2, 2, 2)), jnp.full((1, 2, 2, 2), 100.0)], axis=-1
    )
    post = DiagonalGaussian.from_moments(params)
    assert post.mean.shape == (1, 2, 2, 2)
    np.testing.assert_allclose(np.asarray(post.logvar), 20.0)  # clamped
    params2 = params.at[..., 2:].set(-100.0)
    post2 = DiagonalGaussian.from_moments(params2)
    np.testing.assert_allclose(np.asarray(post2.logvar), -30.0)


def test_kl_to_standard_normal_matches_torch(rng):
    post, params = make_posterior(rng)
    kl = np.asarray(post.kl())
    mean = torch.tensor(np.asarray(post.mean))
    logvar = torch.tensor(np.asarray(post.logvar))
    ref = 0.5 * torch.sum(
        mean.pow(2) + logvar.exp() - 1.0 - logvar, dim=[1, 2, 3]
    )
    np.testing.assert_allclose(kl, ref.numpy(), rtol=1e-5)


def test_kl_between_two(rng):
    k1, k2 = jax.random.split(rng)
    p, _ = make_posterior(k1)
    q, _ = make_posterior(k2)
    kl_pq = np.asarray(p.kl(q))
    assert (kl_pq >= -1e-5).all()
    # kl to itself is 0
    np.testing.assert_allclose(np.asarray(p.kl(p)), 0.0, atol=1e-5)


def test_nll_matches_gaussian_formula(rng):
    post, _ = make_posterior(rng)
    sample = post.mode()
    nll_at_mode = np.asarray(post.nll(sample))
    expected = 0.5 * np.sum(
        np.log(2 * np.pi) + np.asarray(post.logvar), axis=(1, 2, 3)
    )
    np.testing.assert_allclose(nll_at_mode, expected, rtol=1e-4)


def test_sample_statistics(rng):
    params = jnp.zeros((1, 1, 1, 2))  # mean 0, logvar 0 → std 1
    post = DiagonalGaussian.from_moments(params)
    samples = jax.vmap(lambda k: post.sample(k))(jax.random.split(rng, 2000))
    s = np.asarray(samples).ravel()
    assert abs(s.mean()) < 0.1
    assert abs(s.std() - 1.0) < 0.1


def test_normal_kl_zero():
    z = jnp.zeros((3,))
    np.testing.assert_allclose(np.asarray(normal_kl(z, z, z, z)), 0.0)


def test_dirac(rng):
    d = Dirac(value=jnp.ones((2, 3)))
    assert (np.asarray(d.sample()) == 1).all()
    assert d.kl().shape == (2,)
