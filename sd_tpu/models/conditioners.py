"""Conditioning encoders: class embedder, transformer/BERT text embedders,
spatial rescaler, CLIP image embedder.

Capability parity with the reference conditioner zoo
(reference: clip_encoder/modules.py — ClassEmbedder :25-45,
TransformerEmbedder :48-73, BERTTokenizer :76-120, BERTEmbedder :123-165,
SpatialRescaler :168-209, FrozenClipImageEmbedder :260-302; the frozen CLIP
text path lives in sd_tpu.models.clip_text).

All are Flax modules (or host-side tokenizers); "frozen" conditioners are
frozen by excluding their params from the optimizer / wrapping apply in
stop_gradient — JAX needs no .eval() state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sd_tpu.models.clip_text import ClipEncoderLayer, ClipTextConfig
from sd_tpu.models.x_transformer import TransformerWrapper


class ClassEmbedder(nn.Module):
    """Label → embedding dict for adm-style conditioning
    (reference: clip_encoder/modules.py:25-45)."""

    embed_dim: int
    n_classes: int = 1000
    key: str = "class_label"

    @nn.compact
    def __call__(self, batch, key: str | None = None) -> jax.Array:
        key = key or self.key
        c = batch[key] if isinstance(batch, dict) else batch
        c = c.reshape(-1)
        return nn.Embed(self.n_classes, self.embed_dim, name="embedding")(c)


class TransformerEmbedder(nn.Module):
    """Token ids → contextual embeddings via the mini x-transformer
    (reference: clip_encoder/modules.py:48-73)."""

    n_embed: int
    n_layer: int
    vocab_size: int
    max_seq_len: int = 77
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, tokens: jax.Array, *, deterministic: bool = True) -> jax.Array:
        return TransformerWrapper(
            num_tokens=self.vocab_size, max_seq_len=self.max_seq_len,
            dim=self.n_embed, depth=self.n_layer, dtype=self.dtype,
            name="transformer",
        )(tokens, deterministic=deterministic)


class BERTTokenizerHost:
    """Host-side BERT wordpiece tokenizer (reference:
    clip_encoder/modules.py:76-120 wraps HF bert-base-uncased). Uses the HF
    tokenizer when cached locally, else a deterministic hash fallback."""

    def __init__(self, max_length: int = 77, vq_interface: bool = True,
                 vocab_size: int = 30522):
        self.max_length = max_length
        self.vq_interface = vq_interface
        self.vocab_size = vocab_size
        try:
            from transformers import BertTokenizerFast

            self._tok = BertTokenizerFast.from_pretrained(
                "bert-base-uncased", local_files_only=True
            )
        except Exception:
            self._tok = None

    def tokenize(self, texts: list[str]) -> np.ndarray:
        if self._tok is not None:
            enc = self._tok(
                texts, truncation=True, max_length=self.max_length,
                padding="max_length", return_tensors="np",
            )
            return enc["input_ids"].astype(np.int32)
        import hashlib

        out = np.zeros((len(texts), self.max_length), np.int32)
        for i, t in enumerate(texts):
            ids = [101]  # [CLS]
            for w in t.lower().split()[: self.max_length - 2]:
                h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                ids.append(h % (self.vocab_size - 1000) + 999)
            ids.append(102)  # [SEP]
            out[i, : len(ids)] = ids
        return out

    def __call__(self, texts: list[str]):
        tokens = self.tokenize(texts)
        if not self.vq_interface:
            return tokens
        return None, None, [None, None, tokens]

    def decode(self, text):
        return text


class BERTEmbedder(nn.Module):
    """BERT-style text conditioner: host tokenizer + own TransformerWrapper
    (reference: clip_encoder/modules.py:123-165). Call with token ids
    (tokenize on host via BERTTokenizerHost)."""

    n_embed: int = 1280
    n_layer: int = 32
    vocab_size: int = 30522
    max_seq_len: int = 77
    use_tokenizer: bool = True
    embedding_dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, tokens: jax.Array, *, deterministic: bool = True) -> jax.Array:
        return TransformerWrapper(
            num_tokens=self.vocab_size, max_seq_len=self.max_seq_len,
            dim=self.n_embed, depth=self.n_layer,
            emb_dropout=self.embedding_dropout, dtype=self.dtype,
            name="transformer",
        )(tokens, deterministic=deterministic)


class SpatialRescaler(nn.Module):
    """Repeated spatial rescale + optional 1×1 channel remap
    (reference: clip_encoder/modules.py:168-209)."""

    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    in_channels: int = 3
    out_channels: int | None = None
    bias: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for _ in range(self.n_stages):
            B, H, W, C = x.shape
            new_hw = (max(1, round(H * self.multiplier)),
                      max(1, round(W * self.multiplier)))
            x = jax.image.resize(x, (B, *new_hw, C), method=self.method)
        if self.out_channels is not None:
            x = nn.Conv(self.out_channels, (1, 1), use_bias=self.bias,
                        dtype=self.dtype, name="channel_mapper")(x)
        return x


class HybridConditioner(nn.Module):
    """Two sub-conditioners producing {'c_concat', 'c_crossattn'} for hybrid
    conditioning (reference: DDIM/diffusion_modules.py:251-261)."""

    concat_conditioner: nn.Module
    crossattn_conditioner: nn.Module

    def __call__(self, c_concat, c_crossattn) -> dict:
        return {
            "c_concat": [self.concat_conditioner(c_concat)],
            "c_crossattn": [self.crossattn_conditioner(c_crossattn)],
        }


class ClipVisionTransformer(nn.Module):
    """CLIP ViT-B/32 visual tower → image embedding [B, output_dim]
    (the TPU-native stand-in for `clip.load("ViT-B/32")` in the reference's
    FrozenClipImageEmbedder, clip_encoder/modules.py:260-302)."""

    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    image_size: int = 224
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B = x.shape[0]
        h = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), use_bias=False,
                    dtype=self.dtype, name="patch_embed")(x)
        h = h.reshape(B, -1, self.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (B, 1, self.width)).astype(h.dtype), h],
            axis=1,
        )
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (h.shape[1], self.width))
        h = h + pos[None].astype(h.dtype)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_pre")(
            h.astype(jnp.float32)
        ).astype(h.dtype)
        cfg = ClipTextConfig(hidden_size=self.width, num_heads=self.heads)
        no_mask = jnp.zeros((1, 1, h.shape[1], h.shape[1]), jnp.float32)
        for i in range(self.layers):
            h = ClipEncoderLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(h, no_mask)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_post")(
            h[:, 0].astype(jnp.float32)
        )
        proj = self.param("proj", nn.initializers.normal(self.width**-0.5),
                          (self.width, self.output_dim))
        return (h @ proj).astype(x.dtype)


def clip_image_preprocess(x: jax.Array, size: int = 224) -> jax.Array:
    """[-1,1] NHWC image → CLIP input: bicubic resize + CLIP normalization
    (reference preprocessing via kornia, clip_encoder/modules.py:278-296)."""
    B, H, W, C = x.shape
    x = jax.image.resize(x, (B, size, size, C), method="bicubic")
    x = (x + 1.0) / 2.0
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073], jnp.float32)
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711], jnp.float32)
    return (x - mean) / std


class FrozenClipImageEmbedder(nn.Module):
    """Preprocess + ViT-B/32 visual encode (frozen in use)
    (reference: clip_encoder/modules.py:260-302)."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = clip_image_preprocess(x)
        return ClipVisionTransformer(dtype=self.dtype, name="visual")(x)
