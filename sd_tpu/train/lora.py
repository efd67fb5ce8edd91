"""LoRA: low-rank adaptation of frozen weights (Hu et al., arXiv:2106.09685).

Beyond-reference capability (the reference fine-tunes nothing — its
cond_stage_trainable path retrains the whole tower): LoRA trains a rank-r
update ΔW = A·B per targeted kernel while the base weights stay frozen —
the standard production fine-tuning path for SD-style models (~0.1-1% of
the parameters, checkpoints of a few MB).

TPU-first shape: pure tree surgery, no model changes. `init_lora` builds a
sparse pytree of {"a","b"} factor pairs mirroring the targeted kernels;
`merge_lora` returns base + scale·A·B as a NEW param tree inside the jitted
loss, so gradients flow to the factors only (the base is a closed-over
constant) and XLA fuses the rank-r matmul into the step. For serving,
merge once and keep the merged tree.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any

# the standard SD LoRA surface: every attention projection (self + cross)
LORA_DEFAULT_TARGETS = [r".*attn[12].*(to_q|to_k|to_v|to_out).*kernel"]


def _path_str(path) -> str:
    return jax.tree_util.keystr(path)


def _key(name: str) -> str:
    """Checkpoint-safe tree key for a kernel path (Orbax uses keys as
    storage names, so strip the keystr brackets/quotes)."""
    return re.sub(r"[^0-9a-zA-Z_]+", "_", name).strip("_")


def lora_targets(params: PyTree,
                 targets: list[str] | None = None) -> list[str]:
    """Paths of the 2-D kernels the target regexes select."""
    targets = targets or LORA_DEFAULT_TARGETS
    out = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = _path_str(path)
        if leaf.ndim == 2 and any(re.match(p, name) for p in targets):
            out.append(name)
    return out


def init_lora(
    params: PyTree,
    rank: int,
    rng: jax.Array,
    targets: list[str] | None = None,
) -> PyTree:
    """A sparse tree of {"a": [d0, r], "b": [r, d1]} factor pairs for every
    targeted 2-D kernel; b=0 so the adapted model starts EXACTLY at the
    base model (the LoRA init contract)."""
    targets = targets or LORA_DEFAULT_TARGETS
    flat = {}
    i = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = _path_str(path)
        if leaf.ndim != 2 or not any(re.match(p, name) for p in targets):
            continue
        d0, d1 = leaf.shape
        a = (jax.random.normal(jax.random.fold_in(rng, i), (d0, rank),
                               jnp.float32) / np.sqrt(rank))
        flat[_key(name)] = {"a": a, "b": jnp.zeros((rank, d1), jnp.float32)}
        i += 1
    if not flat:
        raise ValueError(f"no 2-D kernels matched LoRA targets {targets}")
    return flat


def merge_lora(params: PyTree, lora: PyTree, scale: float = 1.0) -> PyTree:
    """base + scale·A·B on every adapted kernel; other leaves pass through
    untouched. Differentiable w.r.t. `lora` — use inside the jitted loss."""
    def merge(path, leaf):
        pair = lora.get(_key(_path_str(path)))
        if pair is None:
            return leaf
        delta = (pair["a"] @ pair["b"]) * scale
        return (leaf.astype(jnp.float32) + delta).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def count_lora_params(lora: PyTree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(lora))


def save_lora_safetensors(path: str, lora: PyTree,
                          metadata: dict | None = None) -> None:
    """Write a factor tree as a `.safetensors` LoRA file
    (`<kernel>.a` / `<kernel>.b` tensor names) — the distribution format
    for SD adapters."""
    from sd_tpu.utils.safetensors_io import save_safetensors

    flat = {}
    for k, pair in lora.items():
        flat[k + ".a"] = np.asarray(pair["a"], np.float32)
        flat[k + ".b"] = np.asarray(pair["b"], np.float32)
    meta = {"sd_tpu": "lora"}
    if metadata:
        meta.update({str(a): str(b) for a, b in metadata.items()})
    save_safetensors(path, flat, metadata=meta)


def load_lora_safetensors(path: str) -> PyTree:
    """Read a `.safetensors` LoRA file back into a factor tree."""
    from sd_tpu.utils.safetensors_io import load_safetensors

    out: dict = {}
    for name, v in load_safetensors(path).items():
        base, leaf = name.rsplit(".", 1)
        if leaf not in ("a", "b"):
            raise ValueError(f"unexpected LoRA tensor name {name!r}")
        out.setdefault(base, {})[leaf] = jnp.asarray(np.asarray(v))
    for k, pair in out.items():
        if set(pair) != {"a", "b"}:
            raise ValueError(f"LoRA kernel {k!r} missing a/b factor")
        if pair["a"].shape[1] != pair["b"].shape[0]:
            raise ValueError(f"LoRA kernel {k!r} rank mismatch "
                             f"{pair['a'].shape} @ {pair['b'].shape}")
    return out
