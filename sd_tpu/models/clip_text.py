"""Frozen CLIP text encoder (the SD-v1 conditioner) in Flax.

Capability parity with the reference's FrozenCLIPEmbedder
(reference: clip_encoder/modules.py:212-256 — HF CLIPTokenizer +
CLIPTextModel "openai/clip-vit-large-patch14", pad-to-77, returns
last_hidden_state [B, 77, 768], frozen), re-built as a first-party Flax
module (ViT-L/14 text tower: vocab 49408, width 768, 12 layers, 12 heads,
quick-gelu, causal mask, final LN) plus:

  * `import_torch_clip_text` — graft weights from a HF/openai torch
    checkpoint when one is available locally (no network egress here);
  * tokenizer: uses HF `CLIPTokenizer` when its vocab files are present,
    otherwise a deterministic hashing fallback (`SimpleHashTokenizer`) so the
    pipeline runs end-to-end with random weights in tests/benchmarks.

The causal mask is static and the whole encode is one jittable function —
tokenization stays on host in the input pipeline (SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sd_tpu.kernels.attention import dot_product_attention


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    mlp_ratio: int = 4
    layer_norm_eps: float = 1e-5
    # 1 = final layer output (SD v1 default). N>1 = take the hidden state
    # N-1 layers from the end, then final LN — the community "CLIP skip"
    # knob (clip_skip=2 is the SD2.x / anime-model convention).
    clip_skip: int = 1

    @classmethod
    def vit_l_14(cls) -> "ClipTextConfig":
        return cls()


class ClipEncoderLayer(nn.Module):
    cfg: ClipTextConfig
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, mask_bias: jax.Array) -> jax.Array:
        cfg = self.cfg
        B, L, C = x.shape
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm1")(x.astype(jnp.float32)).astype(x.dtype)
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(h)
        hd = C // cfg.num_heads
        # causal attention: fold the additive mask in via explicit logits
        # (77 tokens — XLA path; the flash kernel is for the 4096-token UNet)
        q = q.reshape(B, L, cfg.num_heads, hd)
        k = k.reshape(B, L, cfg.num_heads, hd)
        v = v.reshape(B, L, cfg.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd**-0.5)
        logits = logits + mask_bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(B, L, C).astype(x.dtype)
        x = x + nn.Dense(C, dtype=self.dtype, name="out_proj")(attn)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm2")(x.astype(jnp.float32)).astype(x.dtype)
        h = nn.Dense(C * cfg.mlp_ratio, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(C, dtype=self.dtype, name="fc2")(h)
        return x + h


class ClipTextTransformer(nn.Module):
    """CLIP text tower; returns last_hidden_state [B, L, C].

    `clip_skip` (call arg, default from cfg): 1 = final layer, N>1 = the
    hidden state N-1 layers before the end, then the final LayerNorm — the
    standard community knob (A1111 convention; clip_skip=2 = penultimate,
    how SD2.x conditions). Static, so each value is its own program; layers
    after the selected one are dead code XLA eliminates (all layers still
    trace so the param tree is invariant)."""

    cfg: ClipTextConfig = ClipTextConfig()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 clip_skip: int | None = None) -> jax.Array:
        cfg = self.cfg
        skip = cfg.clip_skip if clip_skip is None else int(clip_skip)
        if not 1 <= skip <= cfg.num_layers:
            raise ValueError(
                f"clip_skip must be in [1, {cfg.num_layers}], got {skip}")
        B, L = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (cfg.max_length, cfg.hidden_size),
        )
        x = tok + pos[None, :L].astype(tok.dtype)

        # static causal bias [1, 1, L, L]
        causal = jnp.triu(jnp.full((L, L), -1e9, jnp.float32), k=1)[None, None]
        states = []
        for i in range(cfg.num_layers):
            x = ClipEncoderLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(x, causal)
            states.append(x)
        x = states[cfg.num_layers - skip]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="final_layer_norm")(x.astype(jnp.float32))
        return x.astype(tok.dtype)


# ---------------------------------------------------------------------------
# Tokenization (host-side)
# ---------------------------------------------------------------------------


class SimpleHashTokenizer:
    """Deterministic fallback tokenizer: hashes whitespace tokens into the
    CLIP vocab range with BOS/EOS/pad framing. NOT the CLIP BPE — use only
    with random weights (tests, benchmarks). The real `CLIPTokenizer` is used
    automatically when its vocab files are available."""

    def __init__(self, max_length: int = 77, vocab_size: int = 49408):
        self.max_length = max_length
        self.vocab_size = vocab_size
        self.bos_token_id = vocab_size - 2
        self.eos_token_id = vocab_size - 1

    def encode_chunk(self, text: str) -> list[int]:
        """Tokenize a fragment WITHOUT special tokens (prompt-weighting
        chunk interface, sd_tpu.utils.prompt_weights)."""
        import hashlib

        return [
            int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
            % (self.vocab_size - 2)
            for w in text.lower().split()
        ]

    def __call__(self, texts: list[str]) -> np.ndarray:
        out = np.full((len(texts), self.max_length), self.eos_token_id, np.int32)
        for i, text in enumerate(texts):
            ids = ([self.bos_token_id]
                   + self.encode_chunk(text)[: self.max_length - 2]
                   + [self.eos_token_id])
            out[i, : len(ids)] = ids
        return out


def get_clip_tokenizer(
    name: str = "openai/clip-vit-large-patch14", max_length: int = 77,
    vocab_size: int = 49408,
):
    """HF CLIPTokenizer when obtainable (local cache), else the hash fallback.
    Non-standard vocab sizes (tiny test configs) always use the fallback so
    token ids stay in range."""
    if vocab_size == 49408:
        try:
            from transformers import CLIPTokenizer

            tok = CLIPTokenizer.from_pretrained(name, local_files_only=True)

            class _HFTokenize:
                max_length_ = max_length
                bos_token_id = tok.bos_token_id
                eos_token_id = tok.eos_token_id

                def __call__(self, texts: list[str]) -> np.ndarray:
                    enc = tok(
                        texts, truncation=True, max_length=max_length,
                        padding="max_length", return_tensors="np",
                    )
                    return enc["input_ids"].astype(np.int32)

                def encode_chunk(self, text: str) -> list[int]:
                    return tok(text, add_special_tokens=False)["input_ids"]

            return _HFTokenize()
        except Exception:
            pass
    return SimpleHashTokenizer(max_length, vocab_size)


class FrozenClipTextEmbedder:
    """User-facing frozen conditioner: texts → [B, 77, 768] embeddings
    (reference: clip_encoder/modules.py FrozenCLIPEmbedder). Params are held
    outside jit and passed to the pure `encode` (so pjit can shard them)."""

    def __init__(self, params=None, cfg: ClipTextConfig | None = None,
                 rng: jax.Array | None = None, dtype=None):
        self.cfg = cfg or ClipTextConfig.vit_l_14()
        self.model = ClipTextTransformer(self.cfg, dtype=dtype)
        self.tokenize = get_clip_tokenizer(
            max_length=self.cfg.max_length, vocab_size=self.cfg.vocab_size
        )
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, self.cfg.max_length), jnp.int32)
            params = self.model.init(rng, dummy)["params"]
        self.params = params

    def encode(self, params, input_ids: jax.Array,
               clip_skip: int | None = None) -> jax.Array:
        return jax.lax.stop_gradient(
            self.model.apply({"params": params}, input_ids,
                             clip_skip=clip_skip)
        )

    def __call__(self, texts: list[str]) -> jax.Array:
        ids = jnp.asarray(self.tokenize(list(texts)))
        return self.encode(self.params, ids)


# ---------------------------------------------------------------------------
# torch weight importer
# ---------------------------------------------------------------------------


def import_torch_clip_text(params: dict, state_dict: dict,
                           prefix: str = "text_model.") -> dict:
    """Graft a HF CLIPTextModel state_dict into ClipTextTransformer params.

    Handles the HF layout: `{prefix}embeddings.token_embedding.weight`,
    `{prefix}encoder.layers.{i}.self_attn.{q,k,v,out}_proj.*`,
    `.layer_norm{1,2}.*`, `.mlp.fc{1,2}.*`, `{prefix}final_layer_norm.*`.
    Linear weights transpose (torch [out,in] → flax [in,out])."""
    p = jax.tree.map(lambda x: x, params)
    g = lambda k: jnp.asarray(np.asarray(state_dict[prefix + k], dtype=np.float32))

    p["token_embedding"]["embedding"] = g("embeddings.token_embedding.weight")
    p["position_embedding"] = g("embeddings.position_embedding.weight")
    n_layers = len([k for k in p if k.startswith("layer_")])
    for i in range(n_layers):
        src = f"encoder.layers.{i}."
        dst = p[f"layer_{i}"]
        for a, b in (("q_proj", "self_attn.q_proj"), ("k_proj", "self_attn.k_proj"),
                     ("v_proj", "self_attn.v_proj"), ("out_proj", "self_attn.out_proj"),
                     ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            dst[a]["kernel"] = g(src + b + ".weight").T
            dst[a]["bias"] = g(src + b + ".bias")
        for a, b in (("layer_norm1", "layer_norm1"), ("layer_norm2", "layer_norm2")):
            dst[a]["scale"] = g(src + b + ".weight")
            dst[a]["bias"] = g(src + b + ".bias")
    p["final_layer_norm"]["scale"] = g("final_layer_norm.weight")
    p["final_layer_norm"]["bias"] = g("final_layer_norm.bias")
    return p
