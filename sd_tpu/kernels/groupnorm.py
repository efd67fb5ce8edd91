"""Pallas (Mosaic/TPU) fused GroupNorm for the UNet's token-scale shapes.

Why: the profiler-attributed UNet trace (PROBE_R19) shows XLA's GroupNorm
lowering — a `convert_reduce_fusion` producing (mean, rinv, normalized) with
a transposed {3,0,2,1} layout — running 10-25× above memory floor at the SD
UNet's shapes: 1.26 ms for a [8,64,64,320] GN whose two-pass HBM floor is
~60 µs, and ~10-15 ms/step summed over the ~60 norms of one CFG forward.
This kernel streams each batch row's [S, C] slab through VMEM once, takes
per-group fp32 sum/sum-of-squares in chunked passes, and normalizes in
place — pure memory-bound work at HBM bandwidth.

Used for moderate-size activations ([B, S, C] with S·C·2B ≤ ~4 MB — the
UNet levels); the huge codec maps (512²) keep XLA's fusion, which is near
its floor there (the reduction is spatial-major and wide at those shapes).

Reference op being accelerated: GroupNorm32/normalization(channels)
(reference: openai_model/utils.py:15-22, Unet/unet.py:9-12).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_kernel(x_ref, s_ref, b_ref, o_ref, *, S: int, C: int, groups: int,
               eps: float, act: str | None, chunk: int):
    """Grid step b: GroupNorm over the [S, C] slab of batch row b.

    x_ref/o_ref: [1, S, C] VMEM blocks; s_ref/b_ref: [1, C] affine params.
    Two chunked passes in fp32: (1) per-channel sum/sumsq accumulation,
    reduced to per-group stats; (2) normalize (+ optional SiLU) and store.
    """
    n = S // chunk
    s1 = jnp.zeros((1, C), jnp.float32)
    s2 = jnp.zeros((1, C), jnp.float32)
    for k in range(n):
        xc = x_ref[0, k * chunk:(k + 1) * chunk, :].astype(jnp.float32)
        s1 = s1 + jnp.sum(xc, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(xc * xc, axis=0, keepdims=True)
    cg = C // groups
    # Mosaic cannot shape-cast [1, C] vectors to [g, C/g]; do the per-group
    # reduction (and the broadcast back) as tiny matmuls against the group-
    # membership one-hot M [C, g] — both stay in natural [1, ·] lane layout.
    ch_g = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0) // cg
    g_id = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    m = (ch_g == g_id).astype(jnp.float32)                        # [C, g]
    g1 = jnp.dot(s1, m, preferred_element_type=jnp.float32)       # [1, g]
    g2 = jnp.dot(s2, m, preferred_element_type=jnp.float32)
    cnt = float(S * cg)
    mu = g1 / cnt
    var = jnp.maximum(g2 / cnt - mu * mu, 0.0)
    rinv = jax.lax.rsqrt(var + eps)
    mu_c = jnp.dot(mu, m.T, preferred_element_type=jnp.float32)   # [1, C]
    rinv_c = jnp.dot(rinv, m.T, preferred_element_type=jnp.float32)
    a = rinv_c * s_ref[:].astype(jnp.float32)                     # [1, C]
    c = b_ref[:].astype(jnp.float32) - mu_c * a
    for k in range(n):
        xc = x_ref[0, k * chunk:(k + 1) * chunk, :].astype(jnp.float32)
        y = xc * a + c
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        o_ref[0, k * chunk:(k + 1) * chunk, :] = y.astype(o_ref.dtype)


def group_norm(
    x: jax.Array,            # [B, S, C]
    scale: jax.Array,        # [C]
    bias: jax.Array,         # [C]
    *,
    groups: int = 32,
    eps: float = 1e-5,
    act: str | None = None,
    interpret: bool = False,
) -> jax.Array:
    """GroupNorm over the channel (last) axis, fp32 stats/normalize, output
    in x.dtype. Optionally fuses a SiLU epilogue (fp32, before the cast)."""
    B, S, C = x.shape
    assert C % groups == 0, (C, groups)
    # fp32 chunk working set ~500 KB; chunk must divide S
    chunk = max(8, min(S, (128 * 1024) // max(1, C)))
    while S % chunk != 0:
        chunk -= 1
    kernel = functools.partial(
        _gn_kernel, S=S, C=C, groups=groups, eps=float(eps), act=act,
        chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
        interpret=interpret,
    )(x, scale.reshape(1, C), bias.reshape(1, C))


def group_norm_xla(x, scale, bias, *, groups=32, eps=1e-5, act=None):
    """XLA reference with the kernel's numerics (fp32 fast-variance stats)."""
    B, S, C = x.shape
    cg = C // groups
    x32 = x.astype(jnp.float32).reshape(B, S, groups, cg)
    mu = jnp.mean(x32, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=(1, 3), keepdims=True) - mu * mu
    y = (x32 - mu) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    y = y.reshape(B, S, C) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def group_norm_trainable(x, scale, bias, groups=32, eps=1e-5, act=None,
                         interpret=False):
    """group_norm with a custom VJP: Pallas forward for undifferentiated
    (inference) calls, XLA fwd+bwd under jax.grad — mirroring the conv2d
    dispatch discipline (training graphs schedule Pallas custom calls
    poorly; PROBE_R12/R14)."""
    return group_norm(x, scale, bias, groups=groups, eps=eps, act=act,
                      interpret=interpret)


def _gn_fwd(x, scale, bias, groups, eps, act, interpret):
    out, vjp = jax.vjp(
        lambda x, s, b: group_norm_xla(x, s, b, groups=groups, eps=eps,
                                       act=act),
        x, scale, bias)
    return out, vjp


def _gn_bwd(groups, eps, act, interpret, vjp, g):
    return vjp(g)


group_norm_trainable.defvjp(_gn_fwd, _gn_bwd)


def group_norm_wants_pallas(shape: tuple, groups: int, dtype) -> bool:
    """Dispatch heuristic: TPU inference traces, 2-byte activations, channel
    counts that tile the lane dim, and slabs small enough to double-buffer
    whole [S, C] rows in VMEM (the UNet levels; codec 512² maps stay XLA)."""
    from sd_tpu.kernels.conv2d import _TRAIN_CTX_VAR

    # DEFAULT OFF — measured in-model REGRESSION (PROBE_R20): UNet fwd B8
    # 61.4 ms (XLA GN) vs 63.0 ms (this kernel), spreads ≤0.014. Isolated,
    # XLA's GN is already near floor (0.145 ms at [8,4096,320] in a chained
    # scan); the 1.26 ms the profiler attributes to the in-model
    # convert_reduce_fusion is layout work for the NEIGHBORING XLA convs
    # ({3,0,2,1} choices), which a layout-pinning custom call makes WORSE
    # (forced copies on both sides). Kept opt-in for standalone use.
    if _TRAIN_CTX_VAR.get():
        return False
    if os.environ.get("SD_TPU_PALLAS_GN", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if jnp.dtype(dtype).itemsize != 2:
        return False
    C = shape[-1]
    S = 1
    for d in shape[1:-1]:
        S *= d
    if C < 128 or C % groups != 0:
        return False
    if S < 64 or S % 8 != 0:
        return False
    # whole-[S,C] block must fit VMEM: Pallas double-buffers the in AND out
    # blocks across grid steps (4× the slab) plus the kernel's fp32 chunk
    # intermediates against the ~16 MB scoped limit. 4 MB slabs OOMed at
    # [8,1024,1920] (23.2 MB scoped alloc, measured); 3 MB keeps the UNet's
    # hot norms ([·,4096,320] = 2.6 MB) in and the up-path concats out.
    return S * C * 2 <= 3 * 1024 * 1024
