"""Pallas (Mosaic/TPU) fused 3×3 SAME convolution for the high-resolution
codec levels.

Why: XLA lowers large-spatial NHWC convs via materialized im2col patches —
at the KL-f8 decoder's 512²×128 shape that is ~9× input HBM traffic, measured
26% MFU (5.6 ms for a 309 GF conv whose MXU floor is 1.6 ms; PROBE_R3.jsonl
`conv3x3_128_512sq_*`). This kernel reads the input ONCE: rows stream
HBM→VMEM through an explicit double-buffered async copy, and the 9 taps are
9 [rows·W, C]×[C, O] MXU matmuls accumulated in fp32 — contraction K=C≥128
fills the systolic array (unlike attention's d=40).

Used for stride-1 SAME 3×3 convs with C_in ≥ 128 at large spatial dims (the
VAE decoder/encoder hot levels); everything else stays on XLA.

Reference op being accelerated: the Conv2d(3,3,pad=1) stacks of
Encoder/Decoder (reference: ldm/modules/diffusionmodules/model.py:370-574,
Encoder_Decoder/encoder.py:8-210).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_kernel(x_hbm, w_ref, b_ref, o_ref, xwin, sem, *,
                    th: int, W: int, C: int, O: int, n_rows: int,
                    im2col: bool = False):
    """Grid step (b, i): compute output rows [i*th, i*th+th) for batch b.

    x_hbm:  [B, H+2, W+2, C] pre-padded input, stays in HBM/ANY
    xwin:   VMEM scratch [2, th+2, W+2, C] (double buffer)
    w_ref:  [3, 3, C, O] in VMEM
    b_ref:  [1, O] in VMEM (zeros when the conv has no bias)
    o_ref:  [1, th, W, O] output block in VMEM
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    slot = jax.lax.rem(i, 2)

    # DMA this step's input window (th+2 rows with halo). The NEXT step's
    # window is prefetched into the other buffer before we compute, so the
    # copy engine overlaps the matmuls.
    def start_copy(step, slot):
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(step * th, th + 2)],
            xwin.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _first():
        start_copy(i, slot).start()

    start_copy(i, slot).wait()

    @pl.when(i + 1 < n_rows)
    def _prefetch():
        start_copy(i + 1, jax.lax.rem(i + 1, 2)).start()

    if im2col:
        # build the [th·W, 9C] patch matrix once, then ONE K=9C matmul: the
        # accumulation over taps happens inside the MXU pipeline instead of
        # 9 fp32 read-modify-write passes over the [th·W, O] accumulator.
        parts = []
        for di in range(3):
            rows = xwin[slot, di:di + th]
            for dj in range(3):
                parts.append(rows[:, dj:dj + W, :].reshape(th * W, C))
        patches = jnp.concatenate(parts, axis=-1)       # [th·W, 9C]
        acc = jax.lax.dot_general(
            patches, w_ref[:].reshape(9 * C, O),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        acc = jnp.zeros((th * W, O), jnp.float32)
        for di in range(3):
            rows = xwin[slot, di:di + th]          # [th, W+2, C]
            for dj in range(3):
                win = rows[:, dj:dj + W, :].reshape(th * W, C)
                acc = acc + jax.lax.dot_general(
                    win, w_ref[di, dj],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(th, W, O).astype(o_ref.dtype)


def conv3x3_same(
    x: jax.Array,                 # [B, H, W, C] NHWC
    w: jax.Array,                 # [3, 3, C, O] HWIO
    b: jax.Array | None = None,   # [O]
    *,
    row_tile: int | None = None,
    im2col: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Stride-1 SAME 3×3 convolution, fp32 accumulation, output in x.dtype."""
    B, H, W, C = x.shape
    O = w.shape[-1]
    # the DMA'd window is [th+2, W2, C]; Mosaic requires the sliced sublane
    # dim (W2) to be 8-aligned, so right-pad the width beyond the SAME halo
    W2 = ((W + 2 + 7) // 8) * 8
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, W2 - W - 1), (0, 0)])

    if row_tile is None:
        # ~2-4 MB double-buffered window; keep th a divisor of H. The im2col
        # form also holds a [th·W, 9C] patch matrix — budget for it.
        budget = 4 * 1024 * 1024
        per_row = 2 * (W + 2) * C * x.dtype.itemsize
        if im2col:
            per_row += 9 * W * C * x.dtype.itemsize
        th = max(8, min(H, budget // max(1, per_row)))
        while H % th != 0:
            th -= 1
        row_tile = max(1, th)
    th = row_tile
    assert H % th == 0, (H, th)
    n_rows = H // th

    bias = (b if b is not None else jnp.zeros((O,), jnp.float32))
    bias = bias.reshape(1, O)

    kernel = functools.partial(
        _conv3x3_kernel, th=th, W=W, C=C, O=O, n_rows=n_rows, im2col=im2col)
    wc = w.astype(x.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, n_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # x stays in HBM
            pl.BlockSpec((3, 3, C, O), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, O), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, W, O), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, W2, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wc, bias)


def _xla_conv3x3(x, w, b):
    """nn.Conv-semantics XLA reference (used for the backward)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_same_trainable(x, w, b, interpret=False):
    """conv3x3_same with a custom VJP: Pallas forward, XLA convs backward
    (pallas_call has no automatic transpose; the backward convs are the
    channel-rotated/kernel-flipped forms XLA already runs at full speed
    for these shapes in the im2col regime that hurts only the forward's
    extra HBM traffic — the cotangent convs contract over spatial dims)."""
    return conv3x3_same(x, w, b, interpret=interpret)


def _conv_fwd(x, w, b, interpret):
    return conv3x3_same(x, w, b, interpret=interpret), (x, w, b)


def _conv_bwd(interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(_xla_conv3x3, x, w, b)
    return vjp(g)


conv3x3_same_trainable.defvjp(_conv_fwd, _conv_bwd)


def conv3x3_wants_pallas(shape: tuple, c_in: int, c_out: int,
                         dtype=jnp.bfloat16) -> bool:
    """Heuristic: the kernel beats XLA when the im2col blowup dominates —
    big spatial maps with MXU-filling channel counts."""
    if jax.default_backend() != "tpu":
        return False
    B, H, W = shape[0], shape[1], shape[2]
    if c_in < 128 or c_in % 128 != 0 or c_out % 128 != 0:
        return False
    return H * W >= 128 * 128 and W >= 128
