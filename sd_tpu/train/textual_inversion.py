"""Textual inversion: learn a new concept as text-embedding vectors
(arXiv:2208.01618 — beyond the reference, whose conditioner vocabulary is
fixed, clip_encoder/modules.py:212-256).

Everything is frozen except `num_vectors` rows of the text encoder's token
embedding table, assigned to a placeholder token (e.g. "<my-cat>"). The
trainable state is just those vectors [num_vectors, hidden]; the UNet, VAE
and the rest of CLIP are closure constants, so the optimizer/EMA/checkpoint
state is a few KB and the jitted step is the ordinary LDM loss with a
functional row-update on the embedding table in front.

TPU notes: the row update is a static-index `.at[ids].set(...)` XLA fuses
into the embedding gather; templated captions are built host-side in the
loader transform (never inside jit).

Tokenizer contract: each expansion word of the placeholder must map to
exactly ONE token id (`encode_chunk(word) -> [id]`). The hash fallback
tokenizer satisfies this for any word; with a BPE tokenizer pick a
placeholder that is a single token (or add one to the tokenizer) — a
multi-token placeholder raises.

Artifacts: `<out_dir>/embedding.safetensors` maps placeholder → vectors
(the modern SD "embedding" distribution format);
`Text2ImagePipeline.load_textual_inversion` consumes it.
"""

from __future__ import annotations

import dataclasses as _dc
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.config import load_yaml
from sd_tpu.train.checkpoint import auto_resume
from sd_tpu.train.diffusion import (
    ddpm_optimizer,
    init_train_state,
    make_diffusion_train_step,
)
from sd_tpu.train.metrics import count_params
from sd_tpu.train.runners import (
    _build_loader,
    _make_lr,
    _run_loop,
    build_ldm,
    ema_eval_params,
)

# the concept-learning prompt templates from the textual-inversion paper's
# "object" set (trimmed): cycled per image so the vectors, not the prose,
# absorb the concept
DEFAULT_TEMPLATES = (
    "a photo of a {}",
    "a rendering of a {}",
    "a cropped photo of the {}",
    "the photo of a {}",
    "a photo of a clean {}",
    "a dark photo of the {}",
    "a photo of a cool {}",
    "a close-up photo of a {}",
    "a bright photo of the {}",
    "a good photo of the {}",
)


def expand_placeholder(token: str, num_vectors: int) -> list[str]:
    """Multi-vector placeholders become distinct words so each maps to its
    own embedding row: '<ph>' -> ['<ph>', '<ph>#1', ...]."""
    return [token if i == 0 else f"{token}#{i}" for i in range(num_vectors)]


def placeholder_ids(tokenize, token: str, num_vectors: int) -> np.ndarray:
    """Resolve each expansion word to its single token id (see module
    docstring for the tokenizer contract)."""
    if not hasattr(tokenize, "encode_chunk"):
        raise ValueError("tokenizer must expose encode_chunk for "
                         "textual inversion")
    ids = []
    for w in expand_placeholder(token, num_vectors):
        got = list(tokenize.encode_chunk(w))
        if len(got) != 1:
            raise ValueError(
                f"placeholder word {w!r} tokenizes to {len(got)} ids; "
                "textual inversion needs exactly one (use a single-token "
                "placeholder or the hash tokenizer)")
        ids.append(got[0])
    if len(set(ids)) != len(ids):
        raise ValueError(f"placeholder expansion ids collide: {ids}")
    return np.asarray(ids, np.int32)


def patch_embedding_rows(clip_params: dict, ids, vectors) -> dict:
    """Functionally set embedding-table rows `ids` to `vectors`
    (jit-safe; used by both the training loss and serving load)."""
    table = clip_params["token_embedding"]["embedding"]
    new = table.at[jnp.asarray(ids)].set(
        jnp.asarray(vectors).astype(table.dtype))
    out = dict(clip_params)
    out["token_embedding"] = {**clip_params["token_embedding"],
                              "embedding": new}
    return out


def save_embedding(path: str, token: str, vectors: np.ndarray) -> None:
    from sd_tpu.utils.safetensors_io import save_safetensors

    save_safetensors(
        path, {token: np.asarray(vectors, np.float32)},
        metadata={"sd_tpu": "textual_inversion",
                  "num_vectors": str(vectors.shape[0])})


def train_textual_inversion(config: dict | str, data_dir: str,
                            out_dir: str = "runs/ti",
                            max_steps: int | None = None) -> Any:
    """Learn placeholder vectors on an image folder of the concept.

    Config block:
        textual_inversion:
          placeholder: "<my-cat>"
          num_vectors: 1
          initializer: "cat"        # optional: init from this word's row
          templates: [...]          # optional prompt templates
    Everything else is the LDM config (task: textual_inversion)."""
    cfg = load_yaml(config) if isinstance(config, str) else config
    tc = cfg["train"]
    ti = cfg["textual_inversion"]
    token = ti["placeholder"]
    nvec = int(ti.get("num_vectors", 1))
    templates = tuple(ti.get("templates", DEFAULT_TEMPLATES))
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    ld, unet, uparams, vae, vparams, clip = build_ldm(cfg, rng)
    if cfg["latent"].get("scale_factor") == "auto":
        raise ValueError("textual_inversion needs a fixed scale_factor "
                         "(run the base LDM training first)")

    ids = placeholder_ids(clip.tokenize, token, nvec)
    table = np.asarray(clip.params["token_embedding"]["embedding"])
    init_word = ti.get("initializer")
    if init_word:
        (iid,) = placeholder_ids(clip.tokenize, init_word, 1)
        vecs = np.tile(table[iid][None], (nvec, 1))
    else:
        vecs = 0.01 * np.asarray(
            jax.random.normal(jax.random.fold_in(rng, 0x7E57),
                              (nvec, table.shape[1])))
    train_params = {"vectors": jnp.asarray(vecs, jnp.float32)}
    frozen_clip = clip.params
    phrase = " ".join(expand_placeholder(token, nvec))
    print(f"[ti] {token} x{nvec} vectors ({table.shape[1]}d); frozen: "
          f"unet {count_params(uparams)/1e6:.1f}M + clip "
          f"{count_params(frozen_clip)/1e6:.1f}M")

    def loss_fn(p, batch, step_rng, logvar):
        cparams = patch_embedding_rows(frozen_clip, ids, p["vectors"])
        emb = clip.model.apply({"params": cparams}, batch["txt_ids"])
        return ld.training_loss(uparams, {**batch, "txt_emb": emb},
                                step_rng, learned_logvar=logvar)

    _tmpl_rng = np.random.default_rng((cfg.get("seed", 0), 0x7E11))

    def embed_batch(batch):
        texts = [templates[_tmpl_rng.integers(len(templates))].format(phrase)
                 for _ in range(len(batch["image"]))]
        return {"image": jnp.asarray(batch["image"]),
                "txt_ids": jnp.asarray(clip.tokenize(texts))}

    opt = ddpm_optimizer(_make_lr(tc), tc.get("grad_clip", 1.0))
    state = init_train_state(train_params, opt,
                             tc.get("ema_decay", 0.9999))
    state, start = auto_resume(os.path.join(out_dir, "ckpt"), state)
    step_fn = make_diffusion_train_step(loss_fn, opt)

    lat = cfg["latent"]
    eval_prompts = ti.get(
        "eval_prompts", [f"a photo of a {token}"] * 4)

    def sampler(st, s_rng):
        vec = ema_eval_params(st)["vectors"]
        cparams = patch_embedding_rows(frozen_clip, ids, vec)
        etexts = [t.replace(token, phrase) for t in eval_prompts]
        emb = clip.model.apply({"params": cparams},
                               jnp.asarray(clip.tokenize(etexts)))
        z = ld.sample(
            uparams, s_rng,
            (len(etexts), lat["image_size"], lat["image_size"],
             lat["channels"]),
            cond={"c_crossattn": [emb]},
            num_steps=cfg.get("sample", {}).get("num_steps", 20),
            decode=False,
        )
        return ld.decode_first_stage(z)  # divides by scale_factor itself

    state = _run_loop(step_fn, state, cfg, data_dir, out_dir, rng, start,
                      max_steps=max_steps, sampler=sampler,
                      batch_transform=embed_batch)

    final = np.asarray(ema_eval_params(state)["vectors"], np.float32)
    save_embedding(os.path.join(out_dir, "embedding.safetensors"),
                   token, final)
    with open(os.path.join(out_dir, "ti.json"), "w") as f:
        json.dump({"placeholder": token, "num_vectors": nvec,
                   "ids": ids.tolist()}, f)
    return state
