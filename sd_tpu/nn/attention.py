"""Attention blocks: codec self-attention, linear attention, and the SD
transformer (cross-attention / GEGLU / SpatialTransformer).

Capability parity with the reference's attention zoo
(reference: Unet/attention.py:76-264 AttentionBlock/LinearAttention/make_attention,
openai_model/attention.py:24-363 CrossAttention/BasicTransformerBlock/
SpatialTransformer, ldm/modules/attention.py). All variants route through
`sd_tpu.kernels.attention.dot_product_attention`, so the Pallas flash kernel
serves every model family. NHWC layout; LayerNorm/softmax in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from sd_tpu.kernels.attention import dot_product_attention
from sd_tpu.nn import attn_probe
from sd_tpu.nn.layers import GroupNorm32


class LayerNorm32(nn.Module):
    """LayerNorm computed in fp32, cast back to input dtype."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return y.astype(x.dtype)


class AttnBlock(nn.Module):
    """Codec self-attention: GN → 1×1 q/k/v → single-head attention → 1×1
    proj_out → residual (reference: Unet/attention.py:76-128)."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        h = GroupNorm32(32, epsilon=1e-6, name="norm")(x)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="q")(h)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="k")(h)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="v")(h)
        # single head over H*W tokens
        q = q.reshape(B, H * W, 1, C)
        k = k.reshape(B, H * W, 1, C)
        v = v.reshape(B, H * W, 1, C)
        out = dot_product_attention(q, k, v)
        out = out.reshape(B, H, W, C)
        out = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class LinearAttention(nn.Module):
    """kv-first linear attention (reference: Unet/attention.py:131-181,
    ldm/modules/attention.py:80-96): k softmaxed over tokens, context = kᵀv,
    out = context·q. O(N·d²) instead of O(N²·d)."""

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Conv(inner * 3, (1, 1), use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, h, d]
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(x.dtype)
        # context[b,h,d,e] = sum_n k[b,n,h,d] v[b,n,h,e]
        context = jnp.einsum("bnhd,bnhe->bhde", k, v, preferred_element_type=jnp.float32)
        out = jnp.einsum(
            "bhde,bnhd->bnhe", context.astype(x.dtype), q,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.reshape(B, H, W, inner)
        return x + nn.Conv(C, (1, 1), dtype=self.dtype, name="to_out")(out)


def make_attn(attn_type: str = "vanilla", dtype=None) -> nn.Module:
    """Attention factory (reference: Unet/attention.py:198-211):
    vanilla | linear | none."""
    if attn_type == "vanilla":
        return AttnBlock(dtype=dtype)
    if attn_type == "linear":
        return LinearAttention(dtype=dtype)
    if attn_type == "none":
        return _Identity()
    raise ValueError(f"unknown attn_type {attn_type!r}")


class _Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


class _DenseKernel(nn.Module):
    """Bias-free counterpart of _DenseParams (nn.Dense(use_bias=False) tree)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )


class CrossAttention(nn.Module):
    """Multi-head attention where kv comes from `context` (or x itself for
    self-attention). Reference: openai_model/attention.py:24-117,
    ldm/modules/attention.py:152-188.

    Flash-eligible self-attention takes the PACKED layout: projections are
    emitted straight into [B, H, N, D] by an einsum with the 3-D-reshaped
    kernel, and heads fold into the kernel's batch dim — the [B,N,H,D]
    transpose around the kernel disappears (4.45 vs 4.65 ms per L0 block,
    PROBE_R8). Param tree is Dense-compatible (to_q/to_k/to_v {kernel},
    to_out {kernel, bias})."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                       # [B, N, C]
        context: jax.Array | None = None,   # [B, M, Cc]
        mask: jax.Array | None = None,      # [B, M] bool — True = attend
        *,
        ip_kv: tuple | None = None,         # (wk, wv, tokens, scale)
        deterministic: bool = True,
    ) -> jax.Array:
        from sd_tpu.kernels.attention import (hpacked_flash_attention,
                                              hpacked_flash_ok,
                                              packed_flash_attention,
                                              packed_flash_ok)

        B, N, C = x.shape
        ctx = x if context is None else context
        M = ctx.shape[1]
        h, d = self.heads, self.dim_head
        inner = h * d
        Cc = ctx.shape[-1]

        wq = _DenseKernel(inner, C, name="to_q")()
        wk = _DenseKernel(inner, Cc, name="to_k")()
        wv = _DenseKernel(inner, Cc, name="to_v")()
        wo, bo = _DenseParams(C, inner, name="to_out")()
        cdt = self.dtype or jnp.result_type(x.dtype, jnp.float32)
        xc, cc = x.astype(cdt), ctx.astype(cdt)

        # IP-Adapter decoupled cross-attention (models/ip_adapter.py): an
        # extra attention read over projected image tokens with adapter-
        # owned K/V, summed pre-output-projection (arXiv:2308.06721 eq. 5).
        # Threaded as a REAL argument (not a ContextVar): remat re-traces
        # module code during the backward pass, and only argument-carried
        # values survive that re-trace with gradients intact.
        ip = ip_kv if context is not None else None

        def add_ip(out_bqhd, q_bqhd):
            if ip is None:
                return out_bqhd
            wk_ip, wv_ip, tok, scale = ip
            Mi = tok.shape[1]
            k_i = (tok.astype(cdt) @ wk_ip.astype(cdt)).reshape(B, Mi, h, d)
            v_i = (tok.astype(cdt) @ wv_ip.astype(cdt)).reshape(B, Mi, h, d)
            extra = dot_product_attention(q_bqhd, k_i, v_i)
            return out_bqhd + scale * extra.astype(out_bqhd.dtype)

        if (mask is None
                and attn_probe.wants_capture(self.scope.path, N,
                                             is_self=context is None)):
            # probe path (nn/attn_probe.py): explicit softmax probs, sown
            # for guidance/visualization (SAG, utils/attn_viz.py).
            # Trace-time opt-in only.
            q = (xc @ wq.astype(cdt)).reshape(B, N, h, d)
            k = (cc @ wk.astype(cdt)).reshape(B, M, h, d)
            v = (cc @ wv.astype(cdt)).reshape(B, M, h, d)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits.astype(jnp.float32) * self.dim_head**-0.5
            probs = jax.nn.softmax(logits, axis=-1)
            self.sow("intermediates", attn_probe.SOW_NAME, probs)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                             preferred_element_type=jnp.float32).astype(cdt)
            out = add_ip(out, q)
            out = out.reshape(B, N, inner) @ wo.astype(cdt) + bo.astype(cdt)
            return nn.Dropout(self.dropout)(out, deterministic=deterministic)

        if (mask is None and context is None
                and hpacked_flash_ok(N, M, h, d)):
            # projection-native [B, N, H·D] end to end: the head split and
            # merge happen as VMEM column slices inside the kernel — zero
            # layout ops around it (see kernels/flash_attention.py
            # _flash_hpacked_kernel).
            q = xc @ wq.astype(cdt)
            k = cc @ wk.astype(cdt)
            v = cc @ wv.astype(cdt)
            o = hpacked_flash_attention(q, k, v, h)
            out = o @ wo.astype(cdt) + bo.astype(cdt)
            return nn.Dropout(self.dropout)(out, deterministic=deterministic)

        if (mask is None and context is not None and ip is None):
            from sd_tpu.kernels.cross_attention import (
                crossattn_kv_trainable, crossattn_kv_wants_pallas)

            if crossattn_kv_wants_pallas(N, M, h, d, C, cdt):
                # fused small-KV cross-attention: q-projection + exact
                # softmax over the VMEM-resident 77-token K/V + output
                # projection in ONE kernel — a single HBM round-trip of
                # x/out (kernels/cross_attention.py). K/V projections stay
                # XLA (tiny 77-token matmuls, hoisted out of the sampler
                # scan by LICM since context is loop-invariant).
                k = cc @ wk.astype(cdt)
                v = cc @ wv.astype(cdt)
                out = crossattn_kv_trainable(
                    xc, wq.astype(cdt), k, v, wo.astype(cdt),
                    bo.astype(cdt), h)
                return nn.Dropout(self.dropout)(
                    out, deterministic=deterministic)

        if (mask is None and context is None
                and packed_flash_ok(N, M, h, d)):
            q = jnp.einsum("bsc,chd->bhsd", xc, wq.reshape(C, h, d).astype(cdt))
            k = jnp.einsum("bsc,chd->bhsd", cc, wk.reshape(Cc, h, d).astype(cdt))
            v = jnp.einsum("bsc,chd->bhsd", cc, wv.reshape(Cc, h, d).astype(cdt))
            o = packed_flash_attention(q, k, v)
            out = jnp.einsum("bhsd,hdc->bsc", o, wo.reshape(h, d, C).astype(cdt))
            out = out + bo.astype(cdt)
            return nn.Dropout(self.dropout)(out, deterministic=deterministic)

        q = (xc @ wq.astype(cdt)).reshape(B, N, h, d)
        k = (cc @ wk.astype(cdt)).reshape(B, M, h, d)
        v = (cc @ wv.astype(cdt)).reshape(B, M, h, d)
        if mask is not None:
            # masked path: explicit logits (reference: the einsum branch of
            # openai_model/attention.py:77-94; the flash kernel is unmasked)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits.astype(jnp.float32) * self.dim_head**-0.5
            logits = jnp.where(mask[:, None, None, :], logits, -1e9)
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            out = out.astype(cdt)
        else:
            out = dot_product_attention(q, k, v)
        out = add_ip(out, q)
        out = out.reshape(B, N, inner) @ wo.astype(cdt) + bo.astype(cdt)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's tree ({kernel, bias}) and default
    initializers, so checkpoints and weight import see an ordinary Dense."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class FeedForwardGEGLU(nn.Module):
    """GEGLU feed-forward (reference: openai_model/attention.py GEGLU/FeedForward,
    clip_encoder/x_transformer.py:184-211).

    The glu path runs as ONE fused Pallas kernel on TPU (kernels/geglu.py):
    XLA materializes the 4×-expanded [N, 2I] intermediate in HBM, measured
    30% MFU at the SD shapes (PROBE_R5 `ff_geglu_*`). Param tree is
    Dense-compatible ({proj_in,proj_out}×{kernel,bias})."""

    mult: int = 4
    dropout: float = 0.0
    glu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        C = x.shape[-1]
        inner = C * self.mult
        # exact (erf) gelu: torch F.gelu / nn.GELU default, which is what the
        # reference and SD checkpoints were trained with; jax defaults to the
        # tanh approximation (~1e-3 divergence).
        if not self.glu:
            h = nn.gelu(nn.Dense(inner, dtype=self.dtype, name="proj_in")(x),
                        approximate=False)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            return nn.Dense(C, dtype=self.dtype, name="proj_out")(h)

        from sd_tpu.kernels.geglu import (_geglu_xla, geglu_ff_trainable,
                                          geglu_wants_pallas)

        w1, b1 = _DenseParams(inner * 2, C, name="proj_in")()
        w2, b2 = _DenseParams(C, inner, name="proj_out")()
        # nn.Dense(dtype=None) promotes with the fp32 params — mirror that.
        cdt = self.dtype or jnp.result_type(x.dtype, jnp.float32)
        xc = x.astype(cdt)
        n_tokens = xc.size // C

        if self.dropout > 0.0 and not deterministic:
            # dropout needs the materialized intermediate — unfused path
            h = jnp.einsum("...c,ci->...i", xc, w1.astype(cdt),
                           preferred_element_type=jnp.float32)
            h = h + b1.astype(jnp.float32)
            a, g = h[..., :inner], h[..., inner:]
            y = (a * nn.gelu(g, approximate=False)).astype(cdt)
            y = nn.Dropout(self.dropout)(y, deterministic=False)
            out = jnp.einsum("...i,ic->...c", y, w2.astype(cdt),
                             preferred_element_type=jnp.float32)
            return (out + b2.astype(jnp.float32)).astype(cdt)

        if geglu_wants_pallas(n_tokens, C, inner, cdt):
            return geglu_ff_trainable(xc, w1, b1, w2, b2)
        return _geglu_xla(xc, w1.astype(cdt), b1, w2.astype(cdt), b2)


class BasicTransformerBlock(nn.Module):
    """pre-LN self-attn → cross-attn → GEGLU FF with residuals
    (reference: openai_model/attention.py:187-257)."""

    heads: int
    dim_head: int
    dropout: float = 0.0
    gated_ff: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: jax.Array | None = None,
        *,
        tome=None,  # (merge, unmerge) closures from nn/tome.py, or None
        ip_kv: tuple | None = None,  # IP-Adapter (wk, wv, tokens, scale)
        deterministic: bool = True,
    ) -> jax.Array:
        if tome is not None:
            # ToMe (arXiv:2303.17604): self-attention runs on the merged
            # token set; merged tokens inherit their dst's output. Cross-
            # attn and FF stay full-resolution (the SD recipe).
            merge, unmerge = tome
            x = x + unmerge(CrossAttention(
                self.heads, self.dim_head, self.dropout, dtype=self.dtype,
                name="attn1",
            )(merge(LayerNorm32(name="norm1")(x)),
              deterministic=deterministic))
        else:
            x = x + CrossAttention(
                self.heads, self.dim_head, self.dropout, dtype=self.dtype,
                name="attn1",
            )(LayerNorm32(name="norm1")(x), deterministic=deterministic)
        x = x + CrossAttention(
            self.heads, self.dim_head, self.dropout, dtype=self.dtype, name="attn2"
        )(LayerNorm32(name="norm2")(x), context, ip_kv=ip_kv,
          deterministic=deterministic)
        x = x + FeedForwardGEGLU(
            dropout=self.dropout, glu=self.gated_ff, dtype=self.dtype, name="ff"
        )(LayerNorm32(name="norm3")(x), deterministic=deterministic)
        return x


class SpatialTransformer(nn.Module):
    """GN → 1×1 proj_in → `depth` transformer blocks over H·W tokens →
    zero-init 1×1 proj_out → residual (reference: openai_model/attention.py:303-363)."""

    heads: int
    dim_head: int
    depth: int = 1
    dropout: float = 0.0
    tome_ratio: float = 0.0   # >0: ToMe self-attn token merging (serving)
    tome_min_tokens: int = 1024
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                      # [B, H, W, C]
        context: jax.Array | None = None,  # [B, M, Cc]
        *,
        ip=None,  # IP-Adapter ({block_name: {to_k_ip, to_v_ip}}, tok, scale)
        deterministic: bool = True,
    ) -> jax.Array:
        B, H, W, C = x.shape
        inner = self.heads * self.dim_head
        h = GroupNorm32(32, epsilon=1e-6, name="norm")(x)
        h = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, inner)
        use_tome = (self.tome_ratio > 0.0 and H * W >= self.tome_min_tokens
                    and H >= 2 and W >= 2)
        for i in range(self.depth):
            tome = None
            if use_tome:
                from sd_tpu.nn.tome import build_tome

                built = build_tome(h, H, W, self.tome_ratio)
                if built is not None:
                    tome = (built[0], built[1])
            ip_kv = None
            if ip is not None and f"block_{i}" in ip[0]:
                entry = ip[0][f"block_{i}"]
                ip_kv = (entry["to_k_ip"], entry["to_v_ip"], ip[1], ip[2])
            h = BasicTransformerBlock(
                self.heads, self.dim_head, self.dropout,
                dtype=self.dtype, name=f"block_{i}",
            )(h, context, tome=tome, ip_kv=ip_kv,
              deterministic=deterministic)
        h = h.reshape(B, H, W, inner)
        h = nn.Conv(
            C, (1, 1),
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="proj_out",
        )(h)
        return x + h
