"""Attention front-end: one signature, multiple backends.

The reference's only native dependency is the flash_attn CUDA wheel
(reference: req.txt:1, openai_model/attention.py:99-117, Unet/attention.py:219).
Here the equivalent hot path is a Pallas (Mosaic/TPU) flash-attention kernel,
selected automatically on TPU for MXU-friendly shapes, with an XLA
einsum-softmax fallback that is used for correctness testing, CPU execution,
and odd shapes.

Layout: q [B, Sq, H, D], k/v [B, Skv, H, D] — heads kept separate so the
backend can tile over (batch × head). Softmax always accumulates in fp32
regardless of input dtype (the reference's numerics contract).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
) -> jax.Array:
    """Reference einsum-softmax attention with fp32 accumulation."""
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _pallas_ok(q: jax.Array, k: jax.Array) -> bool:
    if jax.default_backend() != "tpu":
        return False
    sq, d = q.shape[1], q.shape[3]
    skv = k.shape[1]
    # flash kernel wants MXU-aligned q tiles; kv raggedness is masked inside
    # the kernel (77-token CLIP context pads to one 128-lane tile). d up to
    # 512 covers the codec mid-block single-head attention (flash 2.67 ms vs
    # XLA 3.95 ms at [4,4096,1,512] — PROBE_R8; XLA materializes the
    # [B,1,S,S] fp32 logits there).
    if sq % 128 != 0 or d > 512:
        return False
    # the kernels' VMEM tile budgets assume 2-byte activations; an f32
    # trace (e.g. the KL-VAE trainers' f32 eval/recon pass hitting the
    # codec mid-block's single-head d=512 attention at 256² → S=1024)
    # doubles every tile and overflows scoped VMEM (measured: 19.52M vs
    # the 16M limit, kl_f8_256 run). f32 goes to XLA.
    if q.dtype.itemsize != 2:
        return False
    # measured crossovers on v5e (PROBE_R2.jsonl, bf16, B8/h8):
    #   cross-attn kv=77, Sq=4096/d40: XLA 0.26 ms vs flash 0.85 ms — the
    #     S×77 logits are tiny, flash's grid overhead dominates;
    #   self-attn S=256/d160: XLA 0.219 ms vs flash 0.258 ms;
    #   self-attn S=1024/d80: flash 0.324 ms vs XLA 0.779 ms — flash wins.
    # So flash only pays once the kv side is long enough that the dense
    # S_q×S_kv logits tensor is the bottleneck.
    return skv >= 512 and sq >= 512


# Tensor-parallel context: GSPMD cannot auto-partition a pallas_call, so
# when a mesh with a model axis is active, the flash kernel runs under
# shard_map over the head axis (attention is per-(batch, head) independent —
# zero communication). Enable once per program via enable_sharded_attention.
# `interpret` runs the kernel in Pallas interpret mode — how the virtual
# CPU mesh (dryrun_multichip, tests) exercises the REAL kernel + sharding
# path without TPU hardware.
_SHARD_CTX: dict = {"mesh": None, "axis": None, "data_axis": "data",
                    "interpret": False}


def enable_sharded_attention(mesh, axis: str = "model",
                             data_axis: str = "data",
                             interpret: bool | None = None) -> None:
    """Route the flash kernel through shard_map over `axis` (heads) for
    tensor-parallel meshes; the batch dim additionally shards over
    `data_axis` when the mesh has one (so dp×tp activations enter without
    an all-gather). interpret=None auto-selects interpret mode off-TPU.
    Call with (None,) to disable."""
    _SHARD_CTX["mesh"] = mesh
    _SHARD_CTX["axis"] = axis if mesh is not None else None
    _SHARD_CTX["data_axis"] = data_axis
    if interpret is None:
        interpret = mesh is not None and jax.default_backend() != "tpu"
    _SHARD_CTX["interpret"] = interpret


def _shard_mapped_flash(q, k, v, scale):
    """flash attention with heads sharded over the TP axis (no collectives)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from sd_tpu.kernels.flash_attention import flash_attention

    mesh, ax = _SHARD_CTX["mesh"], _SHARD_CTX["axis"]
    interpret = _SHARD_CTX["interpret"]
    da = _SHARD_CTX["data_axis"]
    batch_ax = (da if da in mesh.axis_names
                and q.shape[0] % mesh.shape[da] == 0 else None)
    spec = P(batch_ax, None, ax, None)
    f = shard_map(
        lambda q, k, v: flash_attention(q, k, v, scale=scale,
                                        interpret=interpret),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )
    return f(q, k, v)


def _shard_ctx_applies(q: jax.Array) -> bool:
    mesh, ax = _SHARD_CTX["mesh"], _SHARD_CTX["axis"]
    return (
        mesh is not None
        and ax in mesh.axis_names
        and q.shape[2] % mesh.shape[ax] == 0
    )


# Packed-projection layout: for flash-eligible SELF-attention the caller can
# emit q/k/v projections directly as [B, H, S, D] (einsum with a 3-D weight)
# and run the kernel with H folded into batch — the front-end's
# [B,S,H,D]→[B·H,S,D] transpose then becomes a pure reshape. Measured
# 4.45 vs 4.65 ms per L0 block (PROBE_R8 `selfattn_L0_einsum_bhsd`), exact
# parity. Not compatible with the shard_map TP path (heads must stay a
# real axis to shard over).
_PACKED_CTX = {"force_interpret": False}  # tests: exercise the packed path on CPU


def packed_flash_ok(sq: int, skv: int, heads: int, d: int) -> bool:
    """True when the packed [B,H,S,D] self-attention layout should be used.

    OPT-IN (SD_TPU_ATTN_PACKED=1): the isolated block measured faster
    (4.45 vs 4.65 ms, PROBE_R8) but the full UNet step got SLOWER
    (61.8 vs 59.6 ms, PROBE_R9 `unet_fwd_B8_packed_attn`) — XLA's global
    layout assignment around the packed einsums loses more than the
    front-end transposes cost. Kept for experimentation."""
    if _PACKED_CTX["force_interpret"]:
        return True
    if os.environ.get("SD_TPU_ATTN_PACKED") != "1":
        return False
    if os.environ.get("SD_TPU_ATTN_IMPL") == "xla":
        return False
    if _SHARD_CTX["mesh"] is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    return sq % 128 == 0 and d <= 512 and skv >= 512 and sq >= 512


def packed_flash_attention(q, k, v, *, scale: float | None = None):
    """Flash attention over packed [B, H, S, D] tensors (self-attention only;
    heads fold into the kernel's batch dim with zero data movement)."""
    from sd_tpu.kernels.flash_attention import flash_attention

    B, H, S, D = q.shape
    fold = lambda x: x.reshape(B * H, S, 1, D)
    out = flash_attention(fold(q), fold(k), fold(v), scale=scale,
                          interpret=_PACKED_CTX["force_interpret"])
    return out.reshape(B, H, S, D)


# In-kernel head-packed layout: projections stay [B, S, H·D] end to end and
# the kernel slices heads in VMEM (flash_attention_hpacked) — no transpose
# enters or leaves. Inference-only (no vjp); training traces and TP meshes
# fall through to the standard path.
_HPACKED_CTX = {"force_interpret": False}  # tests: exercise the path on CPU


def hpacked_flash_ok(sq: int, skv: int, heads: int, d: int) -> bool:
    """True when the [B,S,H·D] in-kernel head-sliced variant should be used.

    DEFAULT ON for inference (opt out with SD_TPU_ATTN_HPACKED=0): the
    interleaved in-model A/B (PROBE_R17.jsonl) measured UNet fwd B8
    61.72 → 59.43 ms (−2.3 ms, the projection/layout glue the variant was
    built to kill). Same shape gates as _pallas_ok."""
    if _HPACKED_CTX["force_interpret"]:
        return True
    if os.environ.get("SD_TPU_ATTN_HPACKED", "1") != "1":
        return False
    if os.environ.get("SD_TPU_ATTN_IMPL") == "xla":
        return False
    if _SHARD_CTX["mesh"] is not None:
        return False
    from sd_tpu.kernels.conv2d import _TRAIN_CTX_VAR

    if _TRAIN_CTX_VAR.get():  # no custom_vjp on the packed kernel
        return False
    if jax.default_backend() != "tpu":
        return False
    return sq % 128 == 0 and d <= 512 and skv >= 512 and sq >= 512


def hpacked_flash_attention(q, k, v, heads: int, *, scale=None):
    """Flash attention over projection-native [B, S, H·D] tensors."""
    from sd_tpu.kernels.flash_attention import flash_attention_hpacked

    p_dtype = (jnp.bfloat16 if os.environ.get("SD_TPU_FLASH_EXP") == "bf16"
               else jnp.float32)
    pv_quant = ("int8" if os.environ.get("SD_TPU_FLASH_PV") == "int8"
                else "none")
    return flash_attention_hpacked(
        q, k, v, heads, scale=scale,
        interpret=_HPACKED_CTX["force_interpret"], softmax_dtype=p_dtype,
        pv_quant=pv_quant)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    impl: str | None = None,
) -> jax.Array:
    """Scaled dot-product attention over [B, S, H, D] tensors.

    impl: "xla" | "pallas" | None (auto). Override globally with
    SD_TPU_ATTN_IMPL for experiments.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    impl = impl or os.environ.get("SD_TPU_ATTN_IMPL")
    if impl == "xla":
        return _xla_attention(q, k, v, scale)
    use_pallas = impl == "pallas" or (impl is None and _pallas_ok(q, k))
    # interpret-mode shard ctx (virtual CPU mesh): the shape heuristics still
    # gate which shapes take the kernel, but the backend check is bypassed so
    # the real kernel-under-shard_map path is what gets validated.
    if _shard_ctx_applies(q) and _SHARD_CTX["interpret"] and impl is None:
        # keep in lockstep with _pallas_ok so the virtual-mesh validation
        # exercises the same backend production would pick
        sq, d, skv = q.shape[1], q.shape[3], k.shape[1]
        use_pallas = sq % 128 == 0 and d <= 512 and skv >= 512 and sq >= 512
    if use_pallas and _shard_ctx_applies(q):
        return _shard_mapped_flash(q, k, v, scale)
    if use_pallas:
        from sd_tpu.kernels.flash_attention import flash_attention

        # SD_TPU_FLASH_EXP=bf16 runs the (inference-only) softmax exp2 in
        # bfloat16 — the differentiated path stays fp32 either way.
        # SD_TPU_FLASH_PV=int8 runs the (inference-only) PV contraction on
        # the int8 MXU (2× rate, ~1e-2 error bound — see _pv_int8).
        p_dtype = (jnp.bfloat16
                   if os.environ.get("SD_TPU_FLASH_EXP") == "bf16"
                   else jnp.float32)
        pv_quant = ("int8" if os.environ.get("SD_TPU_FLASH_PV") == "int8"
                    else "none")
        return flash_attention(q, k, v, scale=scale, softmax_dtype=p_dtype,
                               pv_quant=pv_quant)
    return _xla_attention(q, k, v, scale)
