"""IP-Adapter: image-prompt conditioning via decoupled cross-attention
(Ye et al., arXiv:2308.06721 — beyond-reference; the reference's only
image conditioner is the unused FrozenClipImageEmbedder,
clip_encoder/modules.py:260-302, with no way to feed it into the UNet).

A frozen CLIP image embedding is projected to `n_tokens` context-width
tokens; every cross-attention layer gets adapter-owned K/V kernels that
read those tokens in a SECOND attention op, summed with the text read
before the shared output projection:

    z = Attn(Q, K_txt, V_txt) + scale · Attn(Q, K_img, V_img)

Only the projector and the per-layer K/V kernels train (~2·L·Cc·inner
params); the base UNet is untouched. TPU design: the adapter params thread
through the UNet as a REAL traced argument (`UNetModel(..., ip=...)` →
SpatialTransformer → CrossAttention ip_kv) — never a side channel, so they
survive remat's backward re-trace with gradients intact, and base
checkpoints, LoRA, ControlNet and the flash self-attention paths all
compose unchanged."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


PyTree = Any


# ---------------------------------------------------------------------------
# image-embedding projector (the paper's linear + LayerNorm head)
# ---------------------------------------------------------------------------


def init_image_proj(rng: jax.Array, embed_dim: int, ctx_dim: int,
                    n_tokens: int = 4) -> dict:
    """{kernel, bias, ln_scale, ln_bias}: [B, embed_dim] CLIP embedding →
    [B, n_tokens, ctx_dim] context tokens."""
    k = jax.random.normal(rng, (embed_dim, n_tokens * ctx_dim),
                          jnp.float32) * embed_dim**-0.5
    return {
        "kernel": k,
        "bias": jnp.zeros((n_tokens * ctx_dim,), jnp.float32),
        "ln_scale": jnp.ones((ctx_dim,), jnp.float32),
        "ln_bias": jnp.zeros((ctx_dim,), jnp.float32),
    }


def project_image_embed(proj: dict, emb: jax.Array) -> jax.Array:
    """[B, embed_dim] → [B, n_tokens, ctx_dim] (linear → reshape → LN).
    n_tokens is structural: kernel columns / ln width."""
    n = proj["kernel"].shape[1] // proj["ln_scale"].shape[0]
    h = emb.astype(jnp.float32) @ proj["kernel"] + proj["bias"]
    h = h.reshape(h.shape[0], n, -1)
    mean = h.mean(-1, keepdims=True)
    var = h.var(-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
    return h * proj["ln_scale"] + proj["ln_bias"]


# ---------------------------------------------------------------------------
# adapter init over a UNet param tree
# ---------------------------------------------------------------------------


def cross_attention_paths(unet_params: PyTree) -> list[tuple[str, ...]]:
    """Paths of every cross-attention module (".../attn2") in the tree."""
    out = []

    def walk(node, path):
        if isinstance(node, dict):
            if (path and path[-1].startswith("attn2")
                    and "to_k" in node and "to_v" in node):
                out.append(path)
                return
            for k, v in node.items():
                walk(v, path + (k,))

    walk(unet_params, ())
    return sorted(out)


def init_ip_adapter(
    unet_params: PyTree,
    rng: jax.Array,
    embed_dim: int = 512,
    n_tokens: int = 4,
) -> dict:
    """Build the adapter tree: {"proj": ..., "layers": {"a/b/attn2":
    {"to_k_ip", "to_v_ip"}}}. Per-layer kernels are initialized as COPIES
    of the base to_k/to_v (the paper's init — the image read starts out
    behaving like the text read, so scale ramps smoothly from 0)."""
    paths = cross_attention_paths(unet_params)
    if not paths:
        raise ValueError("no cross-attention (attn2) modules in this UNet")
    layers = {}
    ctx_dim = None
    for p in paths:
        node = unet_params
        for k in p:
            node = node[k]
        layers["/".join(p)] = {
            "to_k_ip": jnp.array(node["to_k"]["kernel"]),
            "to_v_ip": jnp.array(node["to_v"]["kernel"]),
        }
        ctx_dim = node["to_k"]["kernel"].shape[0]
    return {
        "proj": init_image_proj(rng, embed_dim, ctx_dim, n_tokens),
        "layers": layers,
    }


def count_ip_params(ip: dict) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(ip))


# ---------------------------------------------------------------------------
# apply glue
# ---------------------------------------------------------------------------


def nest_layers(layers: dict) -> dict:
    """Checkpoint-flat {"attn_name/block_i/attn2": kernels} → the nested
    {"attn_name": {"block_i": kernels}} payload UNetModel(ip=...) routes."""
    nested: dict = {}
    for key, kernels in layers.items():
        parts = key.split("/")
        attn_name, block = parts[0], parts[1] if len(parts) > 2 else "block_0"
        nested.setdefault(attn_name, {})[block] = kernels
    return nested


def ip_apply_fn(unet, scale: float = 1.0) -> Callable:
    """(params, x, t, ctx, y=None, ip_embed=None) -> prediction, where
    params = {"unet": base tree, "ip": adapter tree} and `ip_embed` is the
    [B, embed_dim] CLIP image embedding (routed by apply_conditioned from
    cond["c_ip"], diffusion/latent.py). ip_embed=None falls back to the
    plain UNet forward — one compiled program per presence."""

    def apply(params, x, t, ctx, y=None, ip_embed=None, **kw):
        base = params["unet"] if isinstance(params, dict) and "unet" in params \
            else params
        if ip_embed is None:
            return unet.apply({"params": base}, x, t, ctx, y, **kw)
        ip = params["ip"]
        tokens = project_image_embed(ip["proj"], ip_embed)
        payload = {"layers": nest_layers(ip["layers"]), "tokens": tokens,
                   "scale": scale}
        return unet.apply({"params": base}, x, t, ctx, y, ip=payload, **kw)

    return apply
