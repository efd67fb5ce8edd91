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
    _conv3x3_kernel_impl(x_hbm, w_ref, b_ref, None, None, o_ref, xwin, sem,
                         th=th, W=W, C=C, O=O, n_rows=n_rows, im2col=im2col,
                         H=None)


def _conv3x3_prologue_kernel(x_hbm, w_ref, b_ref, a_ref, c_ref, o_ref, xwin,
                             sem, *, th: int, W: int, C: int, O: int,
                             n_rows: int, H: int):
    """conv3x3 with a fused normalize+silu prologue: the DMA'd window is
    transformed as silu(x·a_b + c_b) (a/c fold the GroupNorm mean/rinv/scale/
    bias per (batch, channel)) before the taps, with the SAME-padding halo
    re-zeroed. Saves the full read+write of the normalized tensor that a
    separate GN pass costs at the 512²/256² decoder levels."""
    _conv3x3_kernel_impl(x_hbm, w_ref, b_ref, a_ref, c_ref, o_ref, xwin, sem,
                         th=th, W=W, C=C, O=O, n_rows=n_rows, im2col=False,
                         H=H)


def _conv3x3_kernel_impl(x_hbm, w_ref, b_ref, a_ref, c_ref, o_ref, xwin, sem,
                         *, th: int, W: int, C: int, O: int, n_rows: int,
                         im2col: bool, H: int | None):
    """Grid step (b, i): compute output rows [i*th, i*th+th) for batch b.

    x_hbm:  [B, H, W, C] UNPADDED input, stays in HBM/ANY. The SAME halo is
            assembled in VMEM: three DMAs land the body rows plus the
            one-row top/bottom halos at a column offset of 8 (Mosaic
            requires DMA-target sublane slices to be 8-aligned; unaligned
            READS of VMEM are fine, so the taps read offsets 7/8/9), and the
            boundary rows / halo columns are zero-stored in VMEM — no
            materialized XLA pad feeds the kernel (PROBE_R19 attributed
            10.6 ms of the 96 ms decode to those pads).
    xwin:   VMEM scratch [2, th+2, W2, C] (double buffer)
    w_ref:  [3, 3, C, O] in VMEM
    b_ref:  [1, O] in VMEM (zeros when the conv has no bias)
    o_ref:  [1, th, W, O] output block in VMEM
    sem:    DMA semaphores [2, 3] (slot × {body, top, bottom})
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    slot = jax.lax.rem(i, 2)

    def copies(step, slot):
        body = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(step * th, th)],
            xwin.at[slot, pl.ds(1, th), pl.ds(8, W)],
            sem.at[slot, 0],
        )
        top = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(step * th - 1, 1)],
            xwin.at[slot, pl.ds(0, 1), pl.ds(8, W)],
            sem.at[slot, 1],
        )
        bot = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(step * th + th, 1)],
            xwin.at[slot, pl.ds(th + 1, 1), pl.ds(8, W)],
            sem.at[slot, 2],
        )
        return body, top, bot

    def start_copies(step, slot):
        body, top, bot = copies(step, slot)
        body.start()

        @pl.when(step > 0)
        def _top():
            top.start()

        @pl.when(step < n_rows - 1)
        def _bot():
            bot.start()

    def wait_copies(step, slot):
        body, top, bot = copies(step, slot)
        body.wait()

        @pl.when(step > 0)
        def _top():
            top.wait()

        @pl.when(step < n_rows - 1)
        def _bot():
            bot.wait()

    # Zero the halo columns of both slots once per kernel launch: the DMAs
    # only ever write cols 8..8+W, and the taps only read cols 7..9+W, so
    # the halo columns stay zero for the whole grid.
    W2 = xwin.shape[2]
    @pl.when((b == 0) & (i == 0))
    def _zero_halo_cols():
        xwin[:, :, 0:8, :] = jnp.zeros((2, th + 2, 8, C), xwin.dtype)
        xwin[:, :, 8 + W:W2, :] = jnp.zeros(
            (2, th + 2, W2 - 8 - W, C), xwin.dtype)

    @pl.when(i == 0)
    def _first():
        start_copies(i, slot)

    wait_copies(i, slot)

    @pl.when(i + 1 < n_rows)
    def _prefetch():
        start_copies(i + 1, jax.lax.rem(i + 1, 2))

    # boundary rows of the SAME halo are zeros (stores are compute-phase,
    # after this slot's DMA wait; disjoint from the DMA'd cols 8..8+W rows
    # 1..th, and they re-zero the halo cols they touch, which is harmless)
    zr = jnp.zeros((1, xwin.shape[2], C), xwin.dtype)

    @pl.when(i == 0)
    def _zero_top():
        xwin[slot, 0:1, :, :] = zr

    @pl.when(i == n_rows - 1)
    def _zero_bot():
        xwin[slot, th + 1:th + 2, :, :] = zr

    if a_ref is not None:
        # fused GroupNorm+SiLU prologue on the resident window, fp32 math
        win = xwin[slot]                              # [th+2, W2, C]
        a = a_ref[b].astype(jnp.float32)              # [C]
        cc = c_ref[b].astype(jnp.float32)             # [C]
        y = win.astype(jnp.float32) * a + cc
        y = y * jax.nn.sigmoid(y)                     # silu
        # re-zero the SAME-conv halo (normalize would turn padding nonzero):
        # window row r is halo-array row i*th + r (valid 1..H); only cols
        # 8..8+W are real data (cols 7 and 8+W are the halo the taps read).
        row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, W2, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (th + 2, W2, 1), 1)
        gr = i * th + row
        valid = (gr >= 1) & (gr <= H) & (col >= 8) & (col < 8 + W)
        win = jnp.where(valid, y, 0.0).astype(xwin.dtype)

        acc = jnp.zeros((th * W, O), jnp.float32)
        for di in range(3):
            rows = win[di:di + th]                    # [th, W+2.., C]
            for dj in range(3):
                tap = rows[:, 7 + dj:7 + dj + W, :].reshape(th * W, C)
                acc = acc + jax.lax.dot_general(
                    tap, w_ref[di, dj],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        acc = acc + b_ref[0].astype(jnp.float32)
        o_ref[0] = acc.reshape(th, W, O).astype(o_ref.dtype)
        return

    if im2col:
        # build the [th·W, 9C] patch matrix once, then ONE K=9C matmul: the
        # accumulation over taps happens inside the MXU pipeline instead of
        # 9 fp32 read-modify-write passes over the [th·W, O] accumulator.
        parts = []
        for di in range(3):
            rows = xwin[slot, di:di + th]
            for dj in range(3):
                parts.append(rows[:, 7 + dj:7 + dj + W, :].reshape(th * W, C))
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
                win = rows[:, 7 + dj:7 + dj + W, :].reshape(th * W, C)
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
    # the VMEM window is [th+2, W2, C] with data at column offset 8 (DMA
    # targets must be 8-aligned in the sublane dim). The halo lives only in
    # VMEM — x is consumed unpadded straight from HBM (no XLA pad).
    W2 = ((W + 9 + 7) // 8) * 8

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
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(x, wc, bias)


def _xla_conv3x3(x, w, b):
    """nn.Conv-semantics XLA reference (used for the backward)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_same_trainable(x, w, b, interpret=False):
    """conv3x3_same with a custom VJP that makes the op **Pallas for
    inference, XLA for training**: undifferentiated calls run the Pallas
    kernel; under `jax.grad` the forward runs the XLA conv ONCE (capturing
    its vjp closure as the residual), so training keeps XLA's own fused
    fwd+bwd. The earlier residual scheme re-ran the XLA forward inside the
    backward's `jax.vjp` — measured +65 ms on the KL-GAN train step
    (PROBE_R12 `kl_gan_step_256_B8_pallasconv` 267 vs `_xlaconv` 202 ms)."""
    return conv3x3_same(x, w, b, interpret=interpret)


def _conv_fwd(x, w, b, interpret):
    out, vjp = jax.vjp(_xla_conv3x3, x, w, b)
    return out, vjp


def _conv_bwd(interpret, vjp, g):
    return vjp(g)


conv3x3_same_trainable.defvjp(_conv_fwd, _conv_bwd)


def _gn_stats_affine(x, gn_scale, gn_bias, groups, eps):
    """Per-(batch, channel) affine (a, c) folding GroupNorm stats: the
    normalized+scaled value is x·a + c. One read of x (XLA fuses the two
    reductions); flax-equivalent fp32 fast-variance stats."""
    B, H, W, C = x.shape
    cg = C // groups
    x32g = x.astype(jnp.float32).reshape(B, H * W, groups, cg)
    mu = jnp.mean(x32g, axis=(1, 3))                   # [B, g]
    mu2 = jnp.mean(jnp.square(x32g), axis=(1, 3))
    var = jnp.maximum(mu2 - jnp.square(mu), 0.0)
    rinv = jax.lax.rsqrt(var + eps)
    rinv_c = jnp.repeat(rinv, cg, -1)                  # [B, C]
    mu_c = jnp.repeat(mu, cg, -1)
    a = rinv_c * gn_scale[None].astype(jnp.float32)
    c = gn_bias[None].astype(jnp.float32) - mu_c * a
    return a, c


def gn_silu_conv3x3(
    x: jax.Array,          # [B, H, W, C]
    gn_scale: jax.Array,   # [C]
    gn_bias: jax.Array,    # [C]
    w: jax.Array,          # [3, 3, C, O]
    b: jax.Array | None,   # [O]
    *,
    groups: int = 32,
    eps: float = 1e-6,
    row_tile: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused GroupNorm → SiLU → 3×3 SAME conv: stats are one XLA reduction
    pass over x; normalize+silu run on the conv kernel's DMA'd window (fp32)
    so the normalized tensor never round-trips HBM. Saves the separate GN
    normalize write+read (~1.3 ms per pair at the 512²/128ch decoder level).
    """
    B, H, W, C = x.shape
    O = w.shape[-1]
    a, c = _gn_stats_affine(x, gn_scale, gn_bias, groups, eps)

    W2 = ((W + 9 + 7) // 8) * 8
    if row_tile is None:
        # tighter budget than the plain conv: the prologue materializes an
        # fp32 window intermediate and an fp32 acc alongside the
        # double-buffered bf16 window (a th=8 floor at 256²/512ch compiled
        # to 17.5 MB scoped VMEM and was rejected)
        budget = 3 * 1024 * 1024
        per_row = ((W + 2) * C * (2 * x.dtype.itemsize + 4)
                   + W * O * (4 + x.dtype.itemsize))
        th = max(2, min(H, budget // max(1, per_row)))
        while H % th != 0:
            th -= 1
        row_tile = max(1, th)
    th = row_tile
    assert H % th == 0, (H, th)
    n_rows = H // th

    bias = (b if b is not None else jnp.zeros((O,), jnp.float32)).reshape(1, O)
    kernel = functools.partial(
        _conv3x3_prologue_kernel, th=th, W=W, C=C, O=O, n_rows=n_rows, H=H)
    return pl.pallas_call(
        kernel,
        grid=(B, n_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # x stays in HBM
            pl.BlockSpec((3, 3, C, O), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, O), lambda b, i: (0, 0)),
            pl.BlockSpec((B, C), lambda b, i: (0, 0)),
            pl.BlockSpec((B, C), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, W, O), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, W2, C), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(x, w.astype(x.dtype), bias, a, c)


def _gn_silu_conv_xla(x, gn_scale, gn_bias, w, b, groups, eps):
    """XLA reference with the fused kernel's numerics: fp32 normalize+silu,
    bf16 conv with fp32 accumulation via MXU."""
    a, c = _gn_stats_affine(x, gn_scale, gn_bias, groups, eps)
    y = x.astype(jnp.float32) * a[:, None, None, :] + c[:, None, None, :]
    y = (y * jax.nn.sigmoid(y)).astype(x.dtype)
    return _xla_conv3x3(y, w, b if b is not None else jnp.zeros((w.shape[-1],)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gn_silu_conv3x3_trainable(x, gn_scale, gn_bias, w, b, groups=32,
                              eps=1e-6, interpret=False):
    """gn_silu_conv3x3 with a custom VJP (Pallas forward, XLA backward —
    the backward recomputes the normalized activation once, which is what
    remat would choose anyway)."""
    return gn_silu_conv3x3(x, gn_scale, gn_bias, w, b, groups=groups,
                           eps=eps, interpret=interpret)


def _gnsc_fwd(x, gn_scale, gn_bias, w, b, groups, eps, interpret):
    out = gn_silu_conv3x3(x, gn_scale, gn_bias, w, b, groups=groups,
                          eps=eps, interpret=interpret)
    return out, (x, gn_scale, gn_bias, w, b)


def _gnsc_bwd(groups, eps, interpret, res, g):
    x, gn_scale, gn_bias, w, b = res
    _, vjp = jax.vjp(
        lambda x, s, bb, w, cb: _gn_silu_conv_xla(x, s, bb, w, cb, groups, eps),
        x, gn_scale, gn_bias, w, b)
    return vjp(g)


gn_silu_conv3x3_trainable.defvjp(_gnsc_fwd, _gnsc_bwd)


# Trace-time training context: the Pallas conv is a 1.7× IN-MODEL decode win
# (104 vs 178 ms interleaved A/B, PROBE_R15 `decode_ab_*`) but costs +70 ms
# on the KL-GAN train step even with the training-XLA VJP (PROBE_R14
# `gan_ab_*`: 271.5 vs 202.3 ms) — the primal kernel still lands in the
# non-differentiated parts of the training graph and schedules poorly there.
# Train-step builders set this flag around their traced bodies. A
# ContextVar (not a module global) so concurrent traces in different
# threads/tasks cannot leak the flag into each other's graphs. CAVEAT for
# user-authored training loops: this is a TRACE-time gate — custom jitted
# train steps that are not built through sd_tpu.train must wrap their own
# tracing in `training_trace()` (or set SD_TPU_PALLAS_CONV=0) or the Pallas
# conv will be traced into the training graph, re-introducing the measured
# ~70 ms regression. Documented in docs/KERNELS.md.
import contextvars as _contextvars

_TRAIN_CTX_VAR = _contextvars.ContextVar("sd_tpu_training_trace",
                                         default=False)


class training_trace:
    """Context manager marking a jit trace as a TRAINING step: Pallas convs
    dispatch to XLA for the whole traced body."""

    def __enter__(self):
        self._token = _TRAIN_CTX_VAR.set(True)

    def __exit__(self, *exc):
        _TRAIN_CTX_VAR.reset(self._token)
        return False


def conv3x3_wants_pallas(shape: tuple, c_in: int, c_out: int,
                         dtype=jnp.bfloat16) -> bool:
    """Heuristic: the kernel beats XLA when the im2col blowup dominates —
    big spatial maps with MXU-filling channel counts."""
    import os

    if _TRAIN_CTX_VAR.get():
        return False
    if os.environ.get("SD_TPU_PALLAS_CONV", "1") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    # the kernel's VMEM sizing (window double-buffer + weights) is tuned for
    # 2-byte dtypes; fp32 shapes would need their own geometry — keep them
    # on XLA.
    if jnp.dtype(dtype).itemsize != 2:
        return False
    B, H, W = shape[0], shape[1], shape[2]
    if c_in < 128 or c_in % 128 != 0 or c_out % 128 != 0:
        return False
    return H * W >= 128 * 128 and W >= 128
