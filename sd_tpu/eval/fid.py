"""Fréchet distance (FID-style) sample-quality metric with a pluggable
feature extractor.

The reference repo has NO quantitative metric on generated output anywhere —
quality is judged by eye from saved grids (reference: VAE/test/test.py:200-267
reconstruction plots, DDPM/utils.py:19-51 sample grids). This module is
beyond-reference machinery: the standard Fréchet-Gaussian statistic over a
deep feature space, structured so the extractor is injectable:

  * with calibrated CLIP weights (artifact-gated, COMPAT.md) the repo's
    `FrozenClipImageEmbedder` gives the published CLIP-FID variant;
  * with the fixed-seed random extractor it is still a deterministic,
    refactor-sensitive regression statistic (same stance as the random-VGG
    LPIPS surrogate) — distances are comparable within a fixed extractor.

TPU notes: feature extraction is the only device work (one jitted forward,
batched, bf16-friendly); the O(D^3) Gaussian algebra runs on host in fp64
where TPU matmul precision would poison small eigenvalues.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np

import jax
import jax.numpy as jnp


def gaussian_stats(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Mean and covariance of an [N, D] feature matrix (fp64 host math)."""
    f = np.asarray(feats, np.float64)
    if f.ndim != 2:
        raise ValueError(f"expected [N, D] features, got shape {f.shape}")
    mu = f.mean(axis=0)
    cov = np.cov(f, rowvar=False)
    # np.cov squeezes D=1 to a scalar; keep matrix shape for the algebra below
    cov = np.atleast_2d(cov)
    return mu, cov


def _sqrtm_psd(mat: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """Symmetric PSD square root via eigendecomposition (clamped spectrum)."""
    w, v = np.linalg.eigh((mat + mat.T) / 2.0)
    w = np.clip(w, 0.0, None)
    return (v * np.sqrt(w + eps)) @ v.T


def frechet_distance(mu1: np.ndarray, cov1: np.ndarray,
                     mu2: np.ndarray, cov2: np.ndarray) -> float:
    """d² = |μ1−μ2|² + tr(Σ1 + Σ2 − 2·(Σ1 Σ2)^½).

    tr((Σ1 Σ2)^½) is computed as tr((Σ1^½ Σ2 Σ1^½)^½) — the inner matrix is
    symmetric PSD, so two `eigh` calls replace the generic (and numerically
    fragile) non-symmetric sqrtm.
    """
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1 = np.atleast_2d(np.asarray(cov1, np.float64))
    cov2 = np.atleast_2d(np.asarray(cov2, np.float64))
    diff = float(((mu1 - mu2) ** 2).sum())
    s1 = _sqrtm_psd(cov1)
    inner = s1 @ cov2 @ s1
    w = np.linalg.eigvalsh((inner + inner.T) / 2.0)
    tr_sqrt = float(np.sqrt(np.clip(w, 0.0, None)).sum())
    d2 = diff + float(np.trace(cov1) + np.trace(cov2)) - 2.0 * tr_sqrt
    return max(d2, 0.0)


def extract_features(feature_fn: Callable[[jax.Array], jax.Array],
                     images: np.ndarray | Iterable[np.ndarray],
                     batch_size: int = 32) -> np.ndarray:
    """Run a (jitted) image→feature forward over batches; returns [N, D] fp32.

    `images` is an [N, H, W, C] array in [-1, 1] or an iterable of such
    batches. The final short batch is padded to `batch_size` (static shapes —
    one compilation) and the padding rows dropped.
    """
    if isinstance(images, np.ndarray):
        images = [images[i:i + batch_size]
                  for i in range(0, len(images), batch_size)]
    out = []
    for batch in images:
        batch = np.asarray(batch, np.float32)
        n = batch.shape[0]
        if n < batch_size:
            pad = np.zeros((batch_size - n, *batch.shape[1:]), np.float32)
            batch = np.concatenate([batch, pad], axis=0)
        feats = np.asarray(jax.device_get(feature_fn(jnp.asarray(batch))),
                           np.float32)
        out.append(feats[:n].reshape(n, -1))
    if not out:
        raise ValueError("no images given")
    return np.concatenate(out, axis=0)


def fid(feature_fn: Callable[[jax.Array], jax.Array],
        real: np.ndarray, generated: np.ndarray,
        batch_size: int = 32) -> float:
    """Fréchet distance between feature Gaussians of two image sets."""
    fr = extract_features(feature_fn, real, batch_size)
    fg = extract_features(feature_fn, generated, batch_size)
    return fid_from_features(fr, fg)


def fid_from_features(real_feats: np.ndarray,
                      gen_feats: np.ndarray) -> float:
    mu1, c1 = gaussian_stats(real_feats)
    mu2, c2 = gaussian_stats(gen_feats)
    return frechet_distance(mu1, c1, mu2, c2)


def clip_feature_fn(params=None, *, seed: int = 0, dtype=None,
                    jit: bool = True) -> Callable[[jax.Array], jax.Array]:
    """Image→embedding forward on the repo's CLIP ViT-B/32 visual tower
    (`FrozenClipImageEmbedder`, the TPU stand-in for the reference's
    clip_encoder/modules.py:260-302).

    With no `params`, fixed-seed random weights are initialized — the
    deterministic surrogate regime (see module docstring). Pass imported
    calibrated weights for true CLIP-FID once artifacts are available.
    """
    from sd_tpu.models.conditioners import FrozenClipImageEmbedder

    model = FrozenClipImageEmbedder(dtype=dtype)
    if params is None:
        params = model.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, 32, 32, 3), jnp.float32))["params"]

    def fn(x: jax.Array) -> jax.Array:
        return model.apply({"params": params}, x).astype(jnp.float32)

    return jax.jit(fn) if jit else fn
