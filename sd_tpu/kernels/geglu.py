"""Pallas (Mosaic/TPU) fused GEGLU feed-forward for the SD transformer blocks.

Why: the FF is `proj_in: [N,C]→[N,2I] → split → a·gelu(g) → proj_out: [N,I]→[N,C]`
with I=4C. XLA materializes the [N,2I] intermediate in HBM — at the UNet's L0
shape ([8·4096, 320→2560]) that is ~500 MB of round-trip traffic for a 67 GF
computation, measured 1.14 ms = 30% MFU (PROBE_R5 `ff_geglu_L0`). Fused, both
matmuls and the gelu-gate run per token-tile entirely in VMEM: the weights
(2.4 MB bf16) stay resident, the [bt, 2I] activation tile never leaves the
chip, and HBM sees only x once in and out once back.

Numerics: matmuls accumulate fp32 (MXU), the gelu gate is the exact (erf)
form in fp32 — same contract as the XLA path (`nn/attention.py
FeedForwardGEGLU`): torch F.gelu default, which SD checkpoints were trained
with. The custom VJP runs the backward as plain XLA einsums (recomputing the
cheap intermediate), so training and remat work unchanged.

Reference op being accelerated: GEGLU/FeedForward
(reference: openai_model/attention.py:121-184, clip_encoder/x_transformer.py:184-211).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_poly(x):
    """Abramowitz–Stegun 7.1.26 rational erf approximation, |ε| ≤ 1.5e-7 —
    Mosaic has no erf/erfc lowering; exp it does have."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x):
    """0.5·x·(1+erf(x/√2)) — the erf (torch-default) gelu, fp32."""
    return 0.5 * x * (1.0 + _erf_poly(x * 0.7071067811865476))


def _geglu_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, inner: int):
    x = x_ref[0]                                   # [bt, C]
    h = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [bt, 2I] fp32
    h = h + b1_ref[0].astype(jnp.float32)
    a, g = h[:, :inner], h[:, inner:]
    y = a * _gelu_exact(g)                         # exact-erf gelu, fp32
    out = jax.lax.dot_general(
        y.astype(x.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [bt, C] fp32
    out = out + b2_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def geglu_ff(
    x: jax.Array,        # [..., C]
    w1: jax.Array,       # [C, 2I]
    b1: jax.Array,       # [2I]
    w2: jax.Array,       # [I, C]
    b2: jax.Array,       # [C]
    *,
    token_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Fused `(x@w1+b1) → a·gelu(g) → @w2+b2` over flattened tokens."""
    orig_shape = x.shape
    C = x.shape[-1]
    I2 = w1.shape[-1]
    inner = I2 // 2
    xf = x.reshape(-1, C)
    N = xf.shape[0]
    # budget the [bt, 2I] fp32 tile against VMEM (~16 MB) after the resident
    # weights: C=320 (2.4 MB weights) → bt 512; C=640 (9.8 MB) → bt 128.
    weight_bytes = (C * I2 + inner * C) * x.dtype.itemsize
    tile_budget = 10 * 1024 * 1024 - weight_bytes
    max_bt = max(128, tile_budget // max(1, I2 * 4 + inner * 4))
    bt = min(token_tile, N, int(max_bt))
    while N % bt != 0:
        bt //= 2
    assert bt >= 1
    n_steps = N // bt

    kernel = functools.partial(_geglu_kernel, inner=inner)
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, bt, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((C, I2), lambda i: (0, 0)),
            pl.BlockSpec((1, I2), lambda i: (0, 0)),
            pl.BlockSpec((inner, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_steps, bt, C), x.dtype),
        interpret=interpret,
    )(
        xf.reshape(n_steps, bt, C),
        w1.astype(x.dtype),
        b1.reshape(1, I2).astype(jnp.float32),
        w2.astype(x.dtype),
        b2.reshape(1, C).astype(jnp.float32),
    )
    return out.reshape(orig_shape)


def _geglu_xla(x, w1, b1, w2, b2):
    """XLA reference with identical numerics (fp32 accum + erf gelu)."""
    dt = x.dtype
    h = jnp.einsum("...c,ci->...i", x, w1.astype(dt),
                   preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)
    inner = w1.shape[-1] // 2
    a, g = h[..., :inner], h[..., inner:]
    y = (a * jax.nn.gelu(g, approximate=False)).astype(dt)
    out = jnp.einsum("...i,ic->...c", y, w2.astype(dt),
                     preferred_element_type=jnp.float32)
    return (out + b2.astype(jnp.float32)).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def geglu_ff_trainable(x, w1, b1, w2, b2, interpret=False):
    """geglu_ff with a custom VJP that makes the op **Pallas for inference,
    XLA for training**: undifferentiated calls run the fused kernel; under
    `jax.grad` the forward runs the XLA form ONCE, capturing its vjp closure
    as the residual, so training keeps XLA's own fused fwd+bwd with standard
    residuals (the earlier scheme re-ran the whole forward inside the
    backward — see the analogous conv finding, PROBE_R12)."""
    return geglu_ff(x, w1, b1, w2, b2, interpret=interpret)


def _geglu_fwd(x, w1, b1, w2, b2, interpret):
    out, vjp = jax.vjp(_geglu_xla, x, w1, b1, w2, b2)
    return out, vjp


def _geglu_bwd(interpret, vjp, g):
    return vjp(g)


geglu_ff_trainable.defvjp(_geglu_fwd, _geglu_bwd)


def geglu_wants_pallas(n_tokens: int, c: int, inner: int,
                       dtype=jnp.bfloat16) -> bool:
    """The fused kernel pays when the [N, 2I] intermediate would be HBM
    traffic: big token counts, VMEM-resident weights (≤ ~4 MB)."""
    if jax.default_backend() != "tpu":
        return False
    if n_tokens < 2048 or n_tokens % 256 != 0:
        return False
    weight_bytes = (c * 2 * inner + inner * c) * jnp.dtype(dtype).itemsize
    return inner % 128 == 0 and weight_bytes <= 11 * 1024 * 1024
