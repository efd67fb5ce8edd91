"""ToMe — token merging for the SD UNet's self-attention (serving opt-in).

Beyond-reference serving accelerator (Bolya & Hoffman, "Token Merging for
Fast Stable Diffusion", arXiv:2303.17604): adjacent latent tokens are
highly redundant at 512²+ (4096 tokens at the f8 latent), so each
SpatialTransformer block merges the `ratio` most-redundant tokens before
its SELF-attention and unmerges after — cutting the O(N²) attention and
the per-token projections without retraining (ToMe has no parameters;
checkpoints are unchanged).

TPU-first shape: everything is static-shaped. The dst set is a fixed
sy×sx strided grid (a numpy index table baked at trace time), the merge
count r is rounded so the reduced token count stays a multiple of 128
(lane width — keeps the flash-attention kernel eligible and the MXU tiles
full), and the src→dst assignment is one [Ns, Nd] cosine-similarity
matmul + `lax.top_k`. Merge/unmerge are gathers plus one batched
scatter-add — no dynamic shapes anywhere, so the whole thing lives happily
inside the jitted UNet.

Wiring: `UNetSD(tome_ratio=0.5)` (config `model.params.tome_ratio`)
applies it in every SpatialTransformer whose token count ≥
`tome_min_tokens` (default 1024 ⇒ only the two largest grids at 512²).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


def _dst_grid(H: int, W: int, sy: int = 2, sx: int = 2):
    """Static src/dst index split: one dst per sy×sx tile (its top-left
    corner — deterministic, serving must be reproducible), src = the rest."""
    idx = np.arange(H * W).reshape(H, W)
    dst = idx[::sy, ::sx].reshape(-1)
    mask = np.ones(H * W, bool)
    mask[dst] = False
    src = np.nonzero(mask)[0]
    return src, dst


def merge_count(n_tokens: int, n_src: int, ratio: float,
                multiple: int = 128) -> int:
    """r such that (a) r ≤ ratio·N, (b) r ≤ Ns, (c) N−r is a multiple of
    `multiple` (flash-kernel/MXU eligibility). 0 ⇒ merging disabled."""
    r = min(int(n_tokens * ratio), n_src)
    kept = n_tokens - r
    kept = -(-kept // multiple) * multiple  # round kept UP → r down
    r = n_tokens - kept
    return max(r, 0)


def build_tome(
    x: jax.Array,      # [B, N, C] block input (the matching metric)
    H: int,
    W: int,
    ratio: float,
    sy: int = 2,
    sx: int = 2,
) -> tuple[Callable, Callable, int] | None:
    """Bipartite soft matching on cosine similarity of the block input.

    Returns (merge, unmerge, r) where merge: [B,N,C']→[B,N−r,C'] (any C' —
    the same matching is applied to the normed attention input) and
    unmerge: [B,N−r,C']→[B,N,C'] routes each merged token its dst's output.
    None when the rounded merge count is 0.
    """
    B, N, C = x.shape
    assert N == H * W, (N, H, W)
    src_np, dst_np = _dst_grid(H, W, sy, sx)
    r = merge_count(N, len(src_np), ratio)
    if r <= 0:
        return None
    src_idx = jnp.asarray(src_np)
    dst_idx = jnp.asarray(dst_np)
    Ns, Nd = len(src_np), len(dst_np)

    metric = x.astype(jnp.float32)
    metric = metric / (jnp.linalg.norm(metric, axis=-1, keepdims=True) + 1e-6)
    a = jnp.take(metric, src_idx, axis=1)            # [B, Ns, C]
    b = jnp.take(metric, dst_idx, axis=1)            # [B, Nd, C]
    scores = jnp.einsum("bsc,bdc->bsd", a, b)        # [B, Ns, Nd]
    node_max = scores.max(axis=-1)                   # [B, Ns]
    node_idx = scores.argmax(axis=-1)                # [B, Ns] → dst slot
    # most-similar src tokens get merged; top_k is descending
    _, order = jax.lax.top_k(node_max, Ns)           # [B, Ns]
    merged_src = order[:, :r]                        # [B, r]
    unm_src = order[:, r:]                           # [B, Ns-r]
    m_dst = jnp.take_along_axis(node_idx, merged_src, axis=1)  # [B, r]

    @partial(jax.vmap, in_axes=(0, 0, 0))
    def _scatter_mean(dst_t, m_dst_b, m_src_t):
        # dst_t [Nd, C'], m_dst_b [r], m_src_t [r, C']
        sums = jnp.zeros_like(dst_t).at[m_dst_b].add(m_src_t)
        cnt = jnp.ones((dst_t.shape[0],), dst_t.dtype).at[m_dst_b].add(1.0)
        return (dst_t + sums) / cnt[:, None]

    def merge(tokens: jax.Array) -> jax.Array:
        src_t = jnp.take(tokens, src_idx, axis=1)
        dst_t = jnp.take(tokens, dst_idx, axis=1)
        cexp = lambda i: jnp.broadcast_to(
            i[..., None], i.shape + (tokens.shape[-1],))
        unm_t = jnp.take_along_axis(src_t, cexp(unm_src), axis=1)
        m_src_t = jnp.take_along_axis(src_t, cexp(merged_src), axis=1)
        dst_m = _scatter_mean(dst_t, m_dst, m_src_t)
        return jnp.concatenate([unm_t, dst_m], axis=1)  # [B, N-r, C']

    def unmerge(tokens: jax.Array) -> jax.Array:
        Cp = tokens.shape[-1]
        unm_t = tokens[:, : Ns - r]
        dst_t = tokens[:, Ns - r:]
        cexp = lambda i: jnp.broadcast_to(i[..., None], i.shape + (Cp,))
        m_t = jnp.take_along_axis(dst_t, cexp(m_dst), axis=1)   # [B, r, C']
        out = jnp.zeros((B, N, Cp), tokens.dtype)
        bidx = jnp.arange(B)[:, None]
        out = out.at[bidx, jnp.take(src_idx, unm_src)].set(unm_t)
        out = out.at[bidx, jnp.take(src_idx, merged_src)].set(m_t)
        out = out.at[bidx, dst_idx[None, :]].set(dst_t)
        return out

    return merge, unmerge, r
