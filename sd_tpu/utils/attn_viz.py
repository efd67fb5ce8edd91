"""Cross-attention token heatmaps — interpretability/debug tooling.

Answers "where does the model look for each prompt token?" by capturing
the UNet's cross-attention maps (nn/attn_probe.py) during a single
denoising forward at a chosen timestep, averaging them over heads (and
optionally over several transformer blocks at the same grid), and
upsampling to pixel resolution. The standard diagnostic for prompt
engineering, ControlNet/LoRA debugging, and attention-based editing
research (the DAAM/prompt-to-prompt family, arXiv:2210.04885).

No reference counterpart: the reference's attention
(openai_model/attention.py:77-94) materializes probs internally but never
exposes them. Beyond-reference tooling over the same capture
infrastructure SAG uses.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.nn.attn_probe import capture_attention, collect_all_sown_probs


def cross_attention_maps(
    unet,
    params,
    x: jax.Array,                 # [B, H, W, C] latent (noised)
    t: jax.Array,                 # [B] int32
    ctx: jax.Array,               # [B, M, Cc] text embedding
    path_substr: str = "",        # "" = every cross-attn block
    max_tokens: int = 4096,
) -> dict[str, jax.Array]:
    """Run one UNet forward capturing every matching cross-attention map.

    Returns {module_path: probs [B, heads, N_spatial, M_text]} — raw
    softmax rows (each sums to 1 over the text axis)."""
    with capture_attention(path_substr, max_tokens=max_tokens, kind="cross"):
        _, inter = unet.apply({"params": params}, x, t, ctx,
                              mutable=["intermediates"])
    return collect_all_sown_probs(inter, path_substr)


def token_heatmaps(
    maps: dict[str, jax.Array],
    latent_hw: tuple[int, int],
    out_hw: tuple[int, int] | None = None,
    normalize: bool = True,
) -> np.ndarray:
    """Aggregate captured cross-attention maps into per-token heatmaps.

    Each map [B, h, N, M] is head-averaged, reshaped to its own spatial
    grid (inferred from N as the largest stride-2 downsampling of
    `latent_hw` with that many tokens), bilinearly upsampled to `out_hw`
    (default: `latent_hw`), and averaged across maps.

    Returns [B, out_h, out_w, M] float32; with `normalize`, each token's
    map is min-max scaled to [0, 1] per image."""
    lh, lw = latent_hw
    out_hw = out_hw or (lh, lw)
    acc = None
    count = 0
    for probs in maps.values():
        B, _, N, M = probs.shape
        hw = _grid_for(N, lh, lw)
        if hw is None:
            continue
        hm = jnp.mean(probs.astype(jnp.float32), axis=1)   # [B, N, M]
        hm = hm.reshape(B, hw[0], hw[1], M)
        hm = jax.image.resize(hm, (B, out_hw[0], out_hw[1], M), "bilinear")
        acc = hm if acc is None else acc + hm
        count += 1
    if acc is None:
        raise ValueError("no captured map matches the latent grid — was "
                         "cross_attention_maps run on this latent size?")
    out = np.asarray(acc / count, np.float32)
    if normalize:
        lo = out.min(axis=(1, 2), keepdims=True)
        hi = out.max(axis=(1, 2), keepdims=True)
        out = (out - lo) / np.maximum(hi - lo, 1e-8)
    return out


def _grid_for(n_tokens: int, lh: int, lw: int) -> tuple[int, int] | None:
    """The (h, w) stride-2 downsampling of (lh, lw) with n_tokens tokens."""
    h, w = lh, lw
    while h * w >= n_tokens:
        if h * w == n_tokens:
            return (h, w)
        h, w = -(-h // 2), -(-w // 2)
    return None


def overlay_heatmap_grid(
    image: np.ndarray,            # [H, W, 3] uint8
    heatmaps: np.ndarray,         # [h, w, M] float in [0, 1]
    token_labels: Sequence[str] | None = None,
    alpha: float = 0.6,
) -> np.ndarray:
    """Render per-token red-overlay tiles side by side → [H, W·M, 3] uint8
    (labels are returned for the caller's caption; rendering text is left
    to train/metrics.py log_txt_as_img)."""
    H, W = image.shape[:2]
    M = heatmaps.shape[-1]
    hm = np.asarray(jax.image.resize(jnp.asarray(heatmaps),
                                     (H, W, M), "bilinear"))
    tiles = []
    base = image.astype(np.float32)
    red = np.zeros_like(base)
    red[..., 0] = 255.0
    for m in range(M):
        a = (alpha * hm[..., m:m + 1]).clip(0.0, 1.0)
        tiles.append((base * (1 - a) + red * a).astype(np.uint8))
    return np.concatenate(tiles, axis=1)
