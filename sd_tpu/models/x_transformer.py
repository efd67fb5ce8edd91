"""Mini x-transformers library backing the BERT-style conditioner.

Capability parity with the reference's vendored x-transformer
(reference: clip_encoder/x_transformer.py:184-640 — Attention with
talking-heads / sparse-topk / memory-kv / causal masking, AttentionLayers
with sandwich/macaron layouts, scalenorm/rmsnorm/rezero residual scaling,
GRU-gated residuals, TransformerWrapper with token+absolute-position
embeddings and memory tokens, GEGLU FeedForward).

TPU-first: attention routes through the shared front-end (Pallas flash kernel
where shapes allow; masked/talking-heads paths use the explicit-logits XLA
form since they need the probability tensor), fp32 softmax/norms.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sd_tpu.nn.attention import FeedForwardGEGLU, LayerNorm32


class ScaleNorm(nn.Module):
    """x * g / ‖x‖ (reference: x_transformer.py ScaleNorm)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, ())
        n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        n = jnp.maximum(n * x.shape[-1] ** -0.5, self.eps)
        return (x / n * g).astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (C,))
        n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        n = jnp.maximum(n * C**-0.5, self.eps)
        return (x / n * g).astype(x.dtype)


class XAttention(nn.Module):
    """Multi-head attention with the reference's optional extras
    (reference: x_transformer.py:215-367)."""

    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    talking_heads: bool = False
    sparse_topk: int | None = None
    num_mem_kv: int = 0
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, context=None, mask=None, context_mask=None, *,
                 deterministic: bool = True):
        B, N, C = x.shape
        kv = x if context is None else context
        M = kv.shape[1]
        inner = self.heads * self.dim_head

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(kv)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(kv)
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, M, self.heads, self.dim_head)
        v = v.reshape(B, M, self.heads, self.dim_head)

        if self.num_mem_kv > 0:
            mem_k = self.param("mem_k", nn.initializers.normal(0.02),
                               (self.heads, self.num_mem_kv, self.dim_head))
            mem_v = self.param("mem_v", nn.initializers.normal(0.02),
                               (self.heads, self.num_mem_kv, self.dim_head))
            mk = jnp.broadcast_to(
                mem_k.transpose(1, 0, 2)[None],
                (B, self.num_mem_kv, self.heads, self.dim_head),
            ).astype(k.dtype)
            mv = jnp.broadcast_to(
                mem_v.transpose(1, 0, 2)[None],
                (B, self.num_mem_kv, self.heads, self.dim_head),
            ).astype(v.dtype)
            k = jnp.concatenate([mk, k], axis=1)
            v = jnp.concatenate([mv, v], axis=1)
            M = M + self.num_mem_kv

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits.astype(jnp.float32) * self.dim_head**-0.5

        if self.talking_heads:
            pre = self.param("pre_softmax_proj", nn.initializers.normal(0.02),
                             (self.heads, self.heads))
            logits = jnp.einsum("bhqk,hg->bgqk", logits, pre)

        big_neg = -1e9
        if mask is not None or context_mask is not None:
            q_mask = mask if mask is not None else jnp.ones((B, N), bool)
            if context is None:
                k_mask = q_mask
            else:
                k_mask = (context_mask if context_mask is not None
                          else jnp.ones((B, kv.shape[1]), bool))
            if self.num_mem_kv > 0:
                k_mask = jnp.concatenate(
                    [jnp.ones((B, self.num_mem_kv), bool), k_mask], axis=1
                )
            pair = q_mask[:, None, :, None] & k_mask[:, None, None, :]
            logits = jnp.where(pair, logits, big_neg)

        if self.causal:
            i = jax.lax.broadcasted_iota(jnp.int32, (N, M), 0)
            j = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1)
            causal_mask = j - self.num_mem_kv > i
            logits = jnp.where(causal_mask[None, None], big_neg, logits)

        if self.sparse_topk is not None and self.sparse_topk < M:
            topk = jax.lax.top_k(logits, self.sparse_topk)[0]
            kth = topk[..., -1:]
            logits = jnp.where(logits < kth, big_neg, logits)

        probs = jax.nn.softmax(logits, axis=-1)
        if self.talking_heads:
            post = self.param("post_softmax_proj", nn.initializers.normal(0.02),
                              (self.heads, self.heads))
            probs = jnp.einsum("bhqk,hg->bgqk", probs, post)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)

        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, N, inner).astype(x.dtype)
        return nn.Dense(C, dtype=self.dtype, name="to_out")(out)


class AttentionLayers(nn.Module):
    """Stack of (attn, [cross], ff) blocks with pre/post-norm, macaron and
    sandwich layouts, rezero, and GRU-gated residuals
    (reference: x_transformer.py:370-544)."""

    dim: int
    depth: int
    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    cross_attend: bool = False
    use_scalenorm: bool = False
    use_rmsnorm: bool = False
    use_rezero: bool = False
    gate_residual: bool = False
    macaron: bool = False
    sandwich_coef: int | None = None
    talking_heads: bool = False
    sparse_topk: int | None = None
    num_mem_kv: int = 0
    ff_glu: bool = True
    dropout: float = 0.0
    pre_norm: bool = True
    dtype: jnp.dtype | None = None

    def _norm(self, name):
        if self.use_rezero:
            return lambda x: x
        if self.use_scalenorm:
            return ScaleNorm(name=name)
        if self.use_rmsnorm:
            return RMSNorm(name=name)
        return LayerNorm32(name=name)

    def _layer_types(self) -> Sequence[str]:
        if self.cross_attend:
            default = ("a", "c", "f")
        elif self.macaron:
            default = ("f", "a", "f")
        else:
            default = ("a", "f")
        if self.sandwich_coef:
            c = self.sandwich_coef
            return (
                ("a",) * c + default * (self.depth - c) + ("f",) * c
            )
        return default * self.depth

    @nn.compact
    def __call__(self, x, context=None, mask=None, context_mask=None, *,
                 deterministic: bool = True):
        for idx, lt in enumerate(self._layer_types()):
            residual = x
            h = x
            if self.pre_norm:
                h = self._norm(f"norm_{idx}")(h)

            if lt == "a":
                h = XAttention(
                    heads=self.heads, dim_head=self.dim_head, causal=self.causal,
                    talking_heads=self.talking_heads, sparse_topk=self.sparse_topk,
                    num_mem_kv=self.num_mem_kv, dropout=self.dropout,
                    dtype=self.dtype, name=f"attn_{idx}",
                )(h, mask=mask, deterministic=deterministic)
            elif lt == "c":
                h = XAttention(
                    heads=self.heads, dim_head=self.dim_head,
                    dropout=self.dropout, dtype=self.dtype, name=f"cross_{idx}",
                )(h, context=context, mask=mask, context_mask=context_mask,
                  deterministic=deterministic)
            else:
                h = FeedForwardGEGLU(
                    glu=self.ff_glu, dropout=self.dropout, dtype=self.dtype,
                    name=f"ff_{idx}",
                )(h, deterministic=deterministic)
                if self.macaron:
                    h = h * 0.5  # macaron half-step FFs

            if self.use_rezero:
                g = self.param(f"rezero_{idx}", nn.initializers.zeros, ())
                h = h * g

            if self.gate_residual:
                # GRU-style gate between residual and branch
                zr = nn.Dense(2 * self.dim, dtype=self.dtype, name=f"gate_{idx}")(
                    jnp.concatenate([residual, h], axis=-1)
                )
                z, r = jnp.split(jax.nn.sigmoid(zr), 2, axis=-1)
                cand = jnp.tanh(
                    nn.Dense(self.dim, dtype=self.dtype, name=f"gate_c_{idx}")(
                        jnp.concatenate([r * residual, h], axis=-1)
                    )
                )
                x = (1 - z) * residual + z * cand
            else:
                x = residual + h

            if not self.pre_norm:
                x = self._norm(f"norm_{idx}")(x)
        return x


def XEncoder(**kwargs) -> AttentionLayers:
    """Non-causal AttentionLayers (reference: x_transformer.py Encoder)."""
    assert not kwargs.pop("causal", False), "encoder cannot be causal"
    return AttentionLayers(causal=False, **kwargs)


class TransformerWrapper(nn.Module):
    """Token + absolute-position embeddings, optional memory tokens, attention
    stack, final norm and logits/embedding head
    (reference: x_transformer.py:548-640).

    Like the reference, the wrapper accepts a pre-configured `attn_layers`
    stack (an AttentionLayers/XEncoder instance), so every extra — sandwich/
    macaron layouts, scalenorm/rmsnorm/rezero, talking heads, sparse-topk,
    memory-kv, GRU residual gating — is reachable from the wrapper
    (reference: x_transformer.py:551 asserts isinstance(attn_layers,
    AttentionLayers)). When `attn_layers` is None, a plain stack is built
    from (dim, depth, heads, causal).
    """

    num_tokens: int
    max_seq_len: int
    dim: int | None = None
    depth: int | None = None
    heads: int = 8
    num_memory_tokens: int = 0
    emb_dropout: float = 0.0
    return_embeddings: bool = True
    causal: bool = False
    attn_layers: AttentionLayers | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, tokens: jax.Array, mask: jax.Array | None = None, *,
                 deterministic: bool = True,
                 return_logits: bool | None = None) -> jax.Array:
        layers = self.attn_layers
        if layers is None:
            assert self.dim is not None and self.depth is not None, (
                "TransformerWrapper needs either attn_layers or (dim, depth)")
            layers = AttentionLayers(
                dim=self.dim, depth=self.depth, heads=self.heads,
                causal=self.causal, dtype=self.dtype, name="attn_layers",
            )
        dim = layers.dim

        B, L = tokens.shape
        x = nn.Embed(self.num_tokens, dim, dtype=self.dtype,
                     name="token_emb")(tokens)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (self.max_seq_len, dim))
        x = x + pos[None, :L].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        if self.num_memory_tokens > 0:
            mem = self.param("memory_tokens", nn.initializers.normal(0.02),
                             (self.num_memory_tokens, dim))
            x = jnp.concatenate(
                [jnp.broadcast_to(mem[None], (B, *mem.shape)).astype(x.dtype), x],
                axis=1,
            )
            if mask is not None:
                mask = jnp.concatenate(
                    [jnp.ones((B, self.num_memory_tokens), bool), mask], axis=1
                )

        x = layers(x, mask=mask, deterministic=deterministic)
        x = LayerNorm32(name="norm")(x)

        if self.num_memory_tokens > 0:
            x = x[:, self.num_memory_tokens:]

        want_logits = (not self.return_embeddings
                       if return_logits is None else return_logits)
        to_logits = nn.Dense(self.num_tokens, dtype=self.dtype, name="to_logits")
        if want_logits:
            return to_logits(x)
        if self.is_initializing():
            to_logits(x[:, :1])  # materialize head params for both modes
        return x
