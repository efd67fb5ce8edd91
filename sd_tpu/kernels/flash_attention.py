"""Pallas (Mosaic/TPU) flash attention.

TPU-native replacement for the reference's only native kernel, the
flash_attn==2.7.4 CUDA wheel (reference: req.txt:1,
openai_model/attention.py:99-117,369-404; Unet/attention.py:219-264).

Online-softmax tiling (Dao et al., FlashAttention-2) shaped for the TPU:
  * grid = (batch×heads, q-tiles, kv-tiles), kv innermost so the fp32
    accumulator, running max m and running sum l live in VMEM scratch across
    the kv sweep;
  * q·kᵀ and p·v hit the MXU with fp32 `preferred_element_type`;
  * base-2 softmax: log2(e) folds into the scale and the VPU runs exp2 —
    measured exp-bound at SD head dims (see BASELINE.md);
  * depth is never padded (BlockSpec's last dim covers the true head dim);
    kv raggedness is masked in-kernel, padded q rows are sliced away;
  * block sizes are tuned on v5e (q1024/k1024 defaults; large-q path for
    small-KV cross attention; width-scaled blocks in the backward);
  * non-causal only — diffusion self/cross attention has no causal mask.

Backward pass (`jax.custom_vjp`): the forward-for-VJP also emits the base-2
row log-sum-exp; dq and dk/dv are two Pallas kernels that recompute p from
the saved lse tile-by-tile — no S×S tensor is ever materialized in either
direction (the dense logits would be ~4 GB fp32 at the SD 4096-token level).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128
LOG2E = 1.4426950408889634  # log2(e): softmax in exp2 form (VPU-cheaper)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pv_int8(p, v):
    """PV contraction on the int8 MXU (2× the bf16 rate on v5e; the PV
    contraction dim is the kv tile, which FILLS the MXU — unlike the d=40
    QK contraction, so int8 genuinely doubles it. SageAttention-style
    per-tile quantization): p∈[0,1] scales by 127, v by a per-column
    max-abs. Returns (pv, p_row_sum): the row sum is computed from the
    QUANTIZED p so numerator and softmax denominator stay consistent
    (without it the dropped sub-1/254 tail mass biases the output low).
    Error contract (measured, random attention): ~5% worst ELEMENT from the
    p truncation, <1% mean. Inference-only knob."""
    p_i8 = (p * 127.0 + 0.5).astype(jnp.int8)            # p >= 0
    p_sum = jnp.sum(p_i8.astype(jnp.float32), axis=1, keepdims=True) / 127.0
    v32 = v.astype(jnp.float32)
    vs = jnp.max(jnp.abs(v32), axis=0, keepdims=True) / 127.0   # [1, d]
    v_i8 = jnp.round(v32 / jnp.maximum(vs, 1e-30)).astype(jnp.int8)
    pv = jax.lax.dot_general(
        p_i8, v_i8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return pv.astype(jnp.float32) * (vs / 127.0), p_sum


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  scale: float, kv_len: int, block_k: int,
                  p_dtype=jnp.float32, pv_quant: str = "none"):
    """One (bh, q-tile, kv-tile) grid step of online-softmax attention.

    `kv_len` is the TRUE (unpadded) kv length; zero-padded kv positions in the
    last tile are masked to -inf so they contribute nothing to the softmax.
    """
    j = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # [block_q, d]
    k = k_ref[0]  # [block_k, d]
    # softmax in base-2: fold log2(e) into the scale so the VPU runs exp2
    # (the native transcendental) — the kernel is exp-bound at small d.
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2E)  # [block_q, block_k], base-2 logits

    if kv_len % block_k != 0:  # static: only the last tile can be ragged
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(j * block_k + col < kv_len, s, NEG_INF)

    m_prev = m_ref[:, :1]                                  # [block_q, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)              # [block_q, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    # p_dtype=bfloat16 runs the exp2 (the VPU bottleneck at small head dims)
    # at reduced precision; the row sum still accumulates in fp32.
    p = jnp.exp2((s - m_new).astype(p_dtype))              # [block_q, block_k]
    corr = jnp.exp2(m_prev - m_new)                        # [block_q, 1]

    if pv_quant == "int8":
        pv, p_sum = _pv_int8(p.astype(jnp.float32), v_ref[0])
    else:
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p_sum = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
    l_new = corr * l_ref[:, :1] + p_sum
    acc_ref[:] = acc_ref[:] * corr + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_j - 1)
    def _finalize():
        l = l_ref[:, :1]
        # padded q rows can have l == 0; keep them finite, they are sliced off
        o_ref[0] = (acc_ref[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_kernel_pipelined(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref,
                            l_ref, p_a, p_b, c_scr, *, scale: float,
                            kv_len: int, block_k: int, n_kv: int,
                            p_dtype=jnp.float32):
    """Software-pipelined variant: the PV matmul for kv-tile j-1 runs in the
    same grid step as tile j's QK matmul and exp2 — they are data-independent,
    and Mosaic overlaps MXU and VPU work (measured: an independent matmul +
    exp chain costs max, not sum — PROBE_R11 `overlap_*`). The serial kernel
    measures exactly MXU+VPU serial (4.06 ms ≈ 2.8 matmul + 1.3 exp at the SD
    L0 shape). The kv grid has ONE extra drain step; the v BlockSpec lags one
    tile behind k.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # ---- deferred PV for tile j-1 (independent of this step's QK/exp) ----
    # p double-buffers as TWO separate scratch allocations selected by kv-step
    # parity: a single [2, bq, bk] buffer made Mosaic serialize the read
    # (tile j-1) against the write (tile j) and killed the overlap.
    def _pv_from(p_ref):
        read = jax.lax.rem(j - 1, 2)
        pv = jax.lax.dot_general(
            p_ref[...], v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * c_scr[read][:, :1] + pv

    @pl.when((j > 0) & (jax.lax.rem(j - 1, 2) == 0))
    def _pv_prev_a():
        _pv_from(p_a)

    @pl.when((j > 0) & (jax.lax.rem(j - 1, 2) == 1))
    def _pv_prev_b():
        _pv_from(p_b)

    # ---- QK + online softmax for tile j ----------------------------------
    @pl.when(j < n_kv)
    def _qk():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)

        if kv_len % block_k != 0:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(j * block_k + col < kv_len, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2((s - m_new).astype(p_dtype))
        corr = jnp.exp2(m_prev - m_new)
        l_ref[:] = jnp.broadcast_to(
            corr * l_ref[:, :1]
            + jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32),
            l_ref.shape)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        write = jax.lax.rem(j, 2)

        @pl.when(write == 0)
        def _store_a():
            p_a[...] = p.astype(p_a.dtype)

        @pl.when(write == 1)
        def _store_b():
            p_b[...] = p.astype(p_b.dtype)

        c_scr[write] = jnp.broadcast_to(corr, c_scr.shape[1:])

    @pl.when(j == n_kv)
    def _finalize():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_attention_bhsd(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    block_q: int, block_k: int, true_kv_len: int, interpret: bool,
    p_dtype=jnp.float32, pv_quant: str = "none",
) -> jax.Array:
    """Flash attention over [BH, S, D] tensors (already padded/aligned)."""
    import os

    bh, sq, d = q.shape
    skv = k.shape[1]
    n_kv = pl.cdiv(skv, block_k)

    # OPT-IN (SD_TPU_FLASH_PIPE=1): Mosaic DOES overlap independent MXU/VPU
    # work (PROBE_R11 `overlap_*`: mm+exp = max, not sum), but BOTH pipelined
    # formulations measured ~25-40% SLOWER than the serial kernel at the SD
    # L0 shape (7.8/7.1 vs 6.6/5.2 ms — PROBE_R12/R13): the drain step, the
    # p-tile store/load, and the acc serialization eat more than the exp
    # overlap saves. Kept for experimentation; exact numerical parity is
    # tested either way.
    pipelined = (os.environ.get("SD_TPU_FLASH_PIPE", "0") == "1"
                 and n_kv >= 2)
    p_store = jnp.bfloat16 if v.dtype == jnp.bfloat16 else jnp.float32
    if pipelined:
        # two p buffers of [bq, bk] in the PV-input dtype; shrink block_q
        # until the added scratch stays well inside VMEM.
        p_item = jnp.dtype(p_store).itemsize
        bq = block_q
        while bq > 256 and 2 * bq * block_k * p_item > 6 * 1024 * 1024:
            bq //= 2
        if sq % bq != 0:
            pipelined = False
        else:
            block_q = bq

    if not pipelined:
        grid = (bh, sq // block_q, n_kv)
        kernel = functools.partial(
            _flash_kernel, scale=scale, kv_len=true_kv_len, block_k=block_k,
            p_dtype=p_dtype, pv_quant=pv_quant,
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
            ],
            interpret=interpret,
        )(q, k, v)

    grid = (bh, sq // block_q, n_kv + 1)  # one extra drain step
    last = n_kv - 1
    kernel = functools.partial(
        _flash_kernel_pipelined, scale=scale, kv_len=true_kv_len,
        block_k=block_k, n_kv=n_kv, p_dtype=p_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            # k serves tile j (clamped on the drain step); v lags one tile
            pl.BlockSpec((1, block_k, d),
                         lambda b, i, j: (b, jnp.minimum(j, last), 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda b, i, j: (b, jnp.maximum(j - 1, 0), 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, block_k), p_store),
            pltpu.VMEM((block_q, block_k), p_store),
            pltpu.VMEM((2, block_q, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _flash_hpacked_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                          *, scale: float, kv_len: int, block_k: int,
                          heads: int, p_dtype=jnp.float32,
                          pv_quant: str = "none"):
    """Head-packed variant: tensors stay in the projection-native
    [B, S, H·D] layout and each grid step loops the heads, slicing
    [·, h·d:(h+1)·d] columns of the VMEM-resident tiles (ROADMAP round-2:
    the one untried idea against the ~2.8 ms/step [B,S,H,D]→[B·H,S,D]
    transpose glue). The per-head running max/sum live in lane column h of
    shared [block_q, LANES] scratch. Grid = (B, q-tiles, kv-tiles) — H×
    fewer grid steps than the bhsd kernel; the MXU work is identical
    (block-diagonal heads cannot share tiles — measured dead end)."""
    j = pl.program_id(2)
    n_j = pl.num_programs(2)
    d = q_ref.shape[-1] // heads

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    ragged = kv_len % block_k != 0
    if ragged:
        col = jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[1], block_k), 1)
        kv_mask = j * block_k + col < kv_len

    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0][:, sl]                                # [block_q, d]
        k = k_ref[0][:, sl]                                # [block_k, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * LOG2E)
        if ragged:
            s = jnp.where(kv_mask, s, NEG_INF)

        m_prev = m_ref[:, h:h + 1]                         # [block_q, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2((s - m_new).astype(p_dtype))
        corr = jnp.exp2(m_prev - m_new)
        if pv_quant == "int8":
            pv, p_sum = _pv_int8(p.astype(jnp.float32), v_ref[0][:, sl])
        else:
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0][:, sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p_sum = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
        l_ref[:, h:h + 1] = corr * l_ref[:, h:h + 1] + p_sum
        m_ref[:, h:h + 1] = m_new
        acc_ref[:, sl] = acc_ref[:, sl] * corr + pv

    @pl.when(j == n_j - 1)
    def _finalize():
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            l = jnp.maximum(l_ref[:, h:h + 1], 1e-30)
            o_ref[0, :, sl] = (acc_ref[:, sl] / l).astype(o_ref.dtype)


def flash_attention_hpacked(
    q: jax.Array, k: jax.Array, v: jax.Array, heads: int, *,
    scale: float | None = None, block_q: int = 1024, block_k: int = 1024,
    interpret: bool = False, softmax_dtype=jnp.float32,
    pv_quant: str = "none",
) -> jax.Array:
    """Flash attention over projection-native [B, S, H·D] tensors: no
    [B,S,H,D] transpose enters or leaves the kernel (see
    _flash_hpacked_kernel). INFERENCE-ONLY — no custom_vjp; the training
    path uses `flash_attention`. Non-causal, like the rest of the family."""
    b, sq, hd = q.shape
    skv = k.shape[1]
    d = hd // heads
    assert hd == heads * d
    if scale is None:
        scale = d ** -0.5

    bq = min(block_q, _round_up(sq, 8))
    bk = min(block_k, _round_up(skv, LANES))
    # VMEM ceiling: acc [bq, H·D] fp32 + in/out tiles (double-buffered)
    while bq * hd * 6 > 8 * 1024 * 1024 and bq > 256:
        bq //= 2
    while bk * hd * 4 > 4 * 1024 * 1024 and bk > 256:
        bk //= 2
    # Scoped-vmem stack ceiling: the per-head body materializes ~6 live
    # [bq, bk] fp32 intermediates (s, p, mask, quant temps); Mosaic reuses
    # them ACROSS heads but not within one body. Measured: bq=bk=1024 →
    # 25.4M scoped > the 16M limit. Cap bq*bk at 512K elements (~13M).
    while bq * bk > 512 * 1024 and bq > 256:
        bq //= 2
    while bq * bk > 512 * 1024 and bk > 256:
        bk //= 2
    sq_pad, skv_pad = _round_up(sq, bq), _round_up(skv, bk)
    if sq_pad != sq:
        q = jnp.pad(q, [(0, 0), (0, sq_pad - sq), (0, 0)])
    if skv_pad != skv:
        k = jnp.pad(k, [(0, 0), (0, skv_pad - skv), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, skv_pad - skv), (0, 0)])

    kernel = functools.partial(
        _flash_hpacked_kernel, scale=float(scale), kv_len=skv, block_k=bk,
        heads=heads, p_dtype=jnp.dtype(softmax_dtype), pv_quant=pv_quant,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, sq_pad // bq, skv_pad // bk),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, hd), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, hd), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, hd), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :sq]


def _flash_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref,
                      l_ref, *, scale: float, kv_len: int, block_k: int):
    """Forward that also emits base-2 row log-sum-exp (for the Pallas bwd)."""
    j = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2E)
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(j * block_k + col < kv_len, s, NEG_INF)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    corr = jnp.exp2(m_prev - m_new)
    l_new = corr * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * corr + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_j - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)
        # base-2 lse; padded q rows (l==0) get NEG_INF → masked in bwd
        lse = m_ref[:, :1] + jnp.log2(l)
        lse_ref[0] = jnp.where(l_ref[:, :1] > 0.0, lse, NEG_INF)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, o_ref,
                         dq_ref, delta_ref, acc_ref, delta_acc, *,
                         scale: float, kv_len: int, block_k: int):
    """dq = scale · Σ_kv [p ∘ (do·vᵀ − delta)] k, p recomputed from lse.

    delta_i = Σ_d do ∘ o is FUSED into the first kv step (it only needs this
    q-tile's rows, which are already resident) and emitted as a second output
    for the dkv kernel — no separate XLA reduction pass over [BH, S, D]."""
    j = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        delta_acc[:] = jnp.broadcast_to(jnp.sum(
            do_ref[0].astype(jnp.float32) * o_ref[0].astype(jnp.float32),
            axis=-1, keepdims=True), delta_acc.shape)
        delta_ref[0] = delta_acc[:, :1]

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2E)
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(j * block_k + col < kv_len, s, NEG_INF)

    lse = lse_ref[0]                     # [block_q, 1]
    p = jnp.exp2(s - lse)
    p = jnp.where(lse > NEG_INF / 2, p, 0.0)  # padded q rows contribute 0
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                     # [block_q, block_k]
    ds = p * (dp - delta_acc[:, :1])
    acc_ref[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == n_j - 1)
    def _finalize():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float):
    """dv = Σ_q pᵀ do;  dk = scale · Σ_q [p ∘ (do·vᵀ − delta)]ᵀ q."""
    i = pl.program_id(2)
    n_i = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0]
    q = q_ref[0]
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2E)                  # [block_k, block_q] = s2ᵀ
    # lse/delta arrive PRE-TRANSPOSED as [1, block_q] rows: an in-kernel
    # [bq,1]→[1,bq] reshape is a sublane→lane shuffle that spilled ~330 MB
    # of registers in Mosaic — the transpose is done once in XLA instead.
    lse_row = lse_ref[0]                 # [1, block_q]
    pt = jnp.exp2(st - lse_row)
    pt = jnp.where(lse_row > NEG_INF / 2, pt, 0.0)  # mask padded q columns
    dpt = jax.lax.dot_general(
        v_ref[0], do_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                     # [block_k, block_q]
    dst = pt * (dpt - delta_ref[0])
    dv_acc[:] += jax.lax.dot_general(
        pt.astype(do_ref.dtype), do_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_acc[:] += jax.lax.dot_general(
        dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == n_i - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_forward(
    q: jax.Array, k: jax.Array, v: jax.Array, *,
    scale: float, block_q: int, block_k: int, interpret: bool,
    p_dtype=jnp.float32, pv_quant: str = "none",
) -> jax.Array:
    b, sq, h, d = q.shape
    skv = k.shape[1]

    # [B, S, H, D] → [B*H, S, D]
    def bhsd(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = bhsd(q), bhsd(k), bhsd(v)

    # depth is NOT padded: BlockSpec's last dim covers the full true d
    # (Mosaic lane-pads in VMEM; materializing padded HBM copies measured
    # ~3% slower at the SD shapes — the kernel is exp-bound, not copy-bound)

    # small-KV (cross-attention, e.g. 77-token text context): the whole KV is
    # one tile, so the grid cost is q-steps — use a large q block to amortize
    # per-step overhead (cross-attn was grid-overhead-bound at bq=512).
    if skv <= 2 * LANES and sq >= 2048:
        block_q = max(block_q, 2048)

    bq = min(block_q, _round_up(sq, 8))
    bk = min(block_k, _round_up(skv, LANES))
    # wide heads (the codec's single-head d=512 mid-block attention): shrink
    # q AND k tiles so the working set stays inside the 16 MB VMEM scoped
    # limit (bq1024/bk1024 at d=512 compiles to 17.02 MB and is rejected) —
    # measured 2.67 ms vs XLA's 3.95 ms at [4,4096,1,512] with q1024/k512
    # (PROBE_R8 `midattn_d512_*`)
    while bq * d * 2 > (1 << 20) and bq > 512:
        bq //= 2
    while bk * d * 2 > (1 << 19) and bk > 512:
        bk //= 2
    sq_pad = _round_up(sq, bq)
    skv_pad = _round_up(skv, bk)
    if sq_pad != sq:
        qf = jnp.pad(qf, [(0, 0), (0, sq_pad - sq), (0, 0)])
    if skv_pad != skv:
        kf = jnp.pad(kf, [(0, 0), (0, skv_pad - skv), (0, 0)])
        vf = jnp.pad(vf, [(0, 0), (0, skv_pad - skv), (0, 0)])

    out = _flash_attention_bhsd(qf, kf, vf, scale, bq, bk, skv, interpret,
                                p_dtype, pv_quant)
    out = out[:, :sq]
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_attention_core(q, k, v, scale, block_q, block_k, interpret,
                          p_dtype=jnp.float32, pv_quant="none"):
    return _flash_forward(
        q, k, v, scale=scale, block_q=block_q, block_k=block_k,
        interpret=interpret, p_dtype=p_dtype, pv_quant=pv_quant,
    )


def _xla_ref(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _bwd_geometry(sq: int, skv: int, block_q: int, block_k: int, d: int):
    """Backward tiling: capped at 512 so the [bq, bk] fp32 intermediates
    (s, p, dp, ds) stay well inside VMEM, and scaled down for wide heads
    (d=1280 at the SD mid block) so double-buffered [b*, d] tiles fit."""
    bq = min(block_q, 512, _round_up(sq, 8))
    bk = min(block_k, 512, _round_up(skv, LANES))
    while bq * d * 2 > 262144 and bq > 64:   # ≤256 KB bf16 per q/do tile
        bq //= 2
    while bk * d * 2 > 262144 and bk > 128:  # ≤256 KB bf16 per k/v tile
        bk //= 2
    bq = max(8, bq)
    return bq, bk, _round_up(sq, bq), _round_up(skv, bk)


def _use_pallas_bwd() -> bool:
    """Pallas backward is the default: 2.06x faster than the chunked-JAX
    backward at the SD hot shape (24.9 vs 51.2 ms fwd+bwd) once the dkv
    kernel's lse rows were pre-transposed (the in-kernel reshape spilled
    ~330 MB of Mosaic registers). SD_TPU_FLASH_BWD=chunked opts out."""
    import os

    return os.environ.get("SD_TPU_FLASH_BWD", "pallas") == "pallas"


def _fwd(q, k, v, scale, block_q, block_k, interpret, p_dtype=jnp.float32,
         pv_quant="none"):
    """Forward for the VJP: same kernel family but also emits the base-2
    row lse so the backward never re-derives the softmax normalizer.
    p_dtype/pv_quant are ignored here — the differentiated path always runs
    the softmax and PV in fp32/bf16 (training numerics contract)."""
    if not _use_pallas_bwd():
        out = _flash_attention_core(q, k, v, scale, block_q, block_k,
                                    interpret)
        return out, (q, k, v, None, None)
    b, sq, h, d = q.shape
    skv = k.shape[1]

    def bhsd(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = bhsd(q), bhsd(k), bhsd(v)
    bq, bk, sq_pad, skv_pad = _bwd_geometry(sq, skv, block_q, block_k, d)
    if sq_pad != sq:
        qf = jnp.pad(qf, [(0, 0), (0, sq_pad - sq), (0, 0)])
    if skv_pad != skv:
        kf = jnp.pad(kf, [(0, 0), (0, skv_pad - skv), (0, 0)])
        vf = jnp.pad(vf, [(0, 0), (0, skv_pad - skv), (0, 0)])

    bh = b * h
    grid = (bh, sq_pad // bq, skv_pad // bk)
    kernel = functools.partial(
        _flash_kernel_lse, scale=scale, kv_len=skv, block_k=bk
    )
    out_f, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq_pad, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    out = out_f[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return out, (q, k, v, out_f, lse)


def _bwd_chunked(scale, block_q, res, g):
    """Chunked-recompute backward in plain JAX: scan over q chunks,
    accumulate dk/dv — O(S·chunk) memory, no S×S tensor. The default
    training backward (see _use_pallas_bwd)."""
    q, k, v = res
    b, sq, h, d = q.shape
    chunk = min(block_q, 512, sq)
    if sq % chunk != 0:  # odd lengths: dense fallback (cheap at these sizes)
        _, vjp = jax.vjp(lambda q, k, v: _xla_ref(q, k, v, scale), q, k, v)
        return vjp(g)

    n_chunks = sq // chunk
    qc = q.reshape(b, n_chunks, chunk, h, d)
    gc = g.reshape(b, n_chunks, chunk, h, d)

    def body(carry, inp):
        dk, dv = carry
        q_i, g_i = inp  # [b, chunk, h, d]
        s = jnp.einsum("bqhd,bkhd->bhqk", q_i, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        dp = jnp.einsum("bqhd,bkhd->bhqk", g_i, v,
                        preferred_element_type=jnp.float32).astype(jnp.float32)
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        dq_i = jnp.einsum("bhqk,bkhd->bqhd", ds.astype(q_i.dtype), k,
                          preferred_element_type=jnp.float32) * scale
        dk = dk + jnp.einsum("bhqk,bqhd->bkhd", ds.astype(q_i.dtype), q_i,
                             preferred_element_type=jnp.float32) * scale
        dv = dv + jnp.einsum("bhqk,bqhd->bkhd", p.astype(g_i.dtype), g_i,
                             preferred_element_type=jnp.float32)
        return (dk, dv), dq_i.astype(q_i.dtype)

    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    (dk, dv), dqs = jax.lax.scan(
        body, (dk0, dv0),
        (qc.transpose(1, 0, 2, 3, 4), gc.transpose(1, 0, 2, 3, 4)),
    )
    dq = dqs.transpose(1, 0, 2, 3, 4).reshape(b, sq, h, d)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _bwd(scale, block_q, block_k, interpret, p_dtype, pv_quant, res, g):
    """Pallas flash backward: a dq kernel (kv innermost) and a dk/dv kernel
    (q innermost), both recomputing p from the saved base-2 lse — no S×S
    tensor is ever materialized (the dense logits are ~4 GB fp32 at the SD
    4096-token level)."""
    q, k, v, out_f, lse = res
    if out_f is None:
        return _bwd_chunked(scale, block_q, res[:3], g)
    b, sq, h, d = q.shape
    skv = k.shape[1]
    bh = b * h

    def bhsd(x):
        return x.transpose(0, 2, 1, 3).reshape(bh, x.shape[1], d)

    bq, bk, sq_pad, skv_pad = _bwd_geometry(sq, skv, block_q, block_k, d)
    qf, kf, vf, gf = bhsd(q), bhsd(k), bhsd(v), bhsd(g)
    if sq_pad != sq:
        pad = [(0, 0), (0, sq_pad - sq), (0, 0)]
        qf, gf = jnp.pad(qf, pad), jnp.pad(gf, pad)
    if skv_pad != skv:
        pad = [(0, 0), (0, skv_pad - skv), (0, 0)]
        kf, vf = jnp.pad(kf, pad), jnp.pad(vf, pad)

    # ---- dq (+fused delta): grid (bh, q-tiles, kv-tiles), kv innermost ----
    # delta = Σ_d do ∘ o computes inside the dq kernel's first kv step and is
    # emitted as a second output for the dkv kernel.
    dq_kernel = functools.partial(
        _flash_bwd_dq_kernel, scale=scale, kv_len=skv, block_k=bk
    )
    dqf, delta = pl.pallas_call(
        dq_kernel,
        grid=(bh, sq_pad // bq, skv_pad // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),   # q
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),   # k
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),   # v
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),   # do
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0)),   # lse
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),   # o
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq_pad, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, gf, lse, out_f)

    # ---- dk/dv: grid (bh, kv-tiles, q-tiles), q innermost ---------------
    # lse/delta transposed to row layout [bh, 1, sq] (see kernel comment)
    lse_t = lse.transpose(0, 2, 1)
    delta_t = delta.transpose(0, 2, 1)
    dkv_kernel = functools.partial(_flash_bwd_dkv_kernel, scale=scale)
    dkf, dvf = pl.pallas_call(
        dkv_kernel,
        grid=(bh, skv_pad // bk, sq_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),   # k
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),   # v
            pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0)),   # q
            pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0)),   # do
            pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i)),   # lseᵀ
            pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i)),   # deltaᵀ
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, skv_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, skv_pad, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        interpret=interpret,
    )(kf, vf, qf, gf, lse_t, delta_t)

    def unflat(x, s):
        return x[:, :s].reshape(b, h, s, d).transpose(0, 2, 1, 3)

    return unflat(dqf, sq), unflat(dkf, skv), unflat(dvf, skv)


_flash_attention_core.defvjp(_fwd, _bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    block_q: int = 2048,
    block_k: int = 1024,
    interpret: bool = False,
    softmax_dtype=jnp.float32,
    pv_quant: str = "none",
) -> jax.Array:
    # default blocks measured on v5e at the SD L0 shape (B8/S4096/H8/D40):
    # q256/k512 → q512/k1024 = 2.0x → q1024 +5% → q2048 +3% (fewer grid
    # steps amortize per-step overhead); see BASELINE.md kernel notes.
    """Flash attention over q [B, Sq, H, D], k/v [B, Skv, H, D] (non-causal).

    softmax_dtype: dtype the exp2 runs in (inference-only knob; the
    differentiated path always uses fp32). bfloat16 trades ~2^-8 relative
    probability error for VPU-exp throughput at small head dims.
    pv_quant: "int8" runs the PV contraction on the int8 MXU (2× rate,
    ~1e-2 worst-case relative error — inference-only knob, ignored by the
    differentiated path; see _pv_int8).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_attention_core(q, k, v, float(scale), block_q, block_k,
                                 interpret, jnp.dtype(softmax_dtype),
                                 pv_quant)
