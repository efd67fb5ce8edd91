"""Self-Attention Guidance (SAG, arXiv:2210.00939) — a parameter-free
sample-quality knob.

Each sampling step: (1) read the mid-block self-attention map captured via
`nn/attn_probe.py`, (2) build a per-token salience mask (tokens the model
attends to), (3) Gaussian-blur the ε-implied x̂₀ inside the mask, re-noise
it to t with the SAME predicted ε, (4) run one extra forward on the
degraded input, and guide away from it:

    ε* = ε + s_sag · (ε − ε(x̃_t_degraded))

composing with classifier-free guidance (the SAG term rides the
unconditional branch, matching the paper's CFG composition). Cost: +1 UNet
forward per step plus a cheap explicit mid-block attention.

No reference counterpart — the reference exposes only CFG
(DDIM/ddim.py:75-80); SAG is a beyond-reference serving feature.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from sd_tpu.nn.attn_probe import capture_self_attention, collect_sown_probs


def gaussian_blur_2d(x: jax.Array, kernel_size: int = 9,
                     sigma: float = 1.0) -> jax.Array:
    """Separable depthwise Gaussian blur over [B, H, W, C] (SAME, zero-pad).

    Two rank-1 depthwise convs — XLA maps each onto the conv unit; no
    materialized K×K kernel."""
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    half = kernel_size // 2
    pts = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k1 = jnp.exp(-(pts**2) / (2.0 * sigma * sigma))
    k1 = (k1 / jnp.sum(k1)).astype(jnp.float32)
    C = x.shape[-1]
    xdt = x.dtype
    x32 = x.astype(jnp.float32)
    kh = jnp.tile(k1.reshape(kernel_size, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(k1.reshape(1, kernel_size, 1, 1), (1, 1, 1, C))
    dn = jax.lax.conv_dimension_numbers(x32.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x32, kh, (1, 1), [(half, half), (0, 0)], dimension_numbers=dn,
        feature_group_count=C)
    y = jax.lax.conv_general_dilated(
        y, kw, (1, 1), [(0, 0), (half, half)], dimension_numbers=dn,
        feature_group_count=C)
    return y.astype(xdt)


def sag_mask_from_probs(probs: jax.Array, hm: int, wm: int) -> jax.Array:
    """Salience mask from a self-attention map [B, h, N, N] over N = hm·wm
    tokens → [B, hm, wm, 1] in {0, 1}.

    The paper's rule: a token is salient when its attention-column mass,
    averaged over heads and summed over queries, exceeds 1.0 (the uniform-
    attention level, since each row sums to 1 and there are N rows)."""
    B, _, n_q, n_k = probs.shape
    if n_k != hm * wm:
        raise ValueError(f"probs cover {n_k} tokens, expected {hm}x{wm}")
    col_mass = jnp.sum(jnp.mean(probs.astype(jnp.float32), axis=1), axis=1)
    mask = (col_mass > 1.0).astype(jnp.float32)
    return mask.reshape(B, hm, wm, 1)


def make_probs_apply(unet, path_substr: str = "mid_attn") -> Callable:
    """Wrap a flax UNet into `apply(params, x, t, ctx, y=None) ->
    (out, sag_mask)` where sag_mask is the mid-block salience mask upsampled
    (nearest) to the model-input resolution, [B, H, W, 1] float in {0,1}.

    The mid-block token grid is the input grid after
    `len(channel_mult) - 1` stride-2 downsamples (ceil division at odd
    sizes, matching the conv padding)."""
    n_down = len(unet.channel_mult) - 1

    def apply_probs(p, x, t, ctx, y=None, **kw):
        B, H, W = x.shape[0], x.shape[1], x.shape[2]
        hm, wm = H, W
        for _ in range(n_down):
            hm, wm = -(-hm // 2), -(-wm // 2)
        with capture_self_attention(path_substr, max_tokens=hm * wm):
            out, inter = unet.apply({"params": p}, x, t, ctx, y, **kw,
                                    mutable=["intermediates"])
        probs = collect_sown_probs(inter, path_substr)
        mask = sag_mask_from_probs(probs, hm, wm)
        mask = jax.image.resize(mask, (B, H, W, 1), "nearest")
        return out, mask

    return apply_probs


def degrade_pred_x0(pred_x0: jax.Array, mask: jax.Array,
                    kernel_size: int = 9, sigma: float = 1.0) -> jax.Array:
    """Blur pred_x0 where the salience mask is set (the SAG degradation)."""
    blurred = gaussian_blur_2d(pred_x0, kernel_size, sigma)
    m = mask.astype(pred_x0.dtype)
    return blurred * m + pred_x0 * (1.0 - m)
