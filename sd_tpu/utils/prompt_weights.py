"""Prompt attention weighting — the `(emphasis:1.3)` / `[de-emphasis]`
prompt syntax every production SD frontend ships (beyond the reference,
whose conditioner takes plain strings, clip_encoder/modules.py:234-252).

Grammar (the community convention):
  * `(text)`      — weight ×1.1 (nesting multiplies: `((x))` = 1.21)
  * `(text:1.3)`  — explicit weight for the parenthesized span
  * `[text]`      — weight ×1/1.1 (nesting divides)
  * `\\(` `\\)` `\\[` `\\]` `\\\\` — literal characters
  * everything else — weight 1.0

`parse_weighted_prompt` is a host-side stack parser producing
[(fragment, weight)] with adjacent equal-weight fragments merged; the
fragments are tokenized chunk-wise (no special tokens) and concatenated so
the per-token weight vector aligns with the ids regardless of tokenizer.

Weight application (`apply_prompt_weights`, jit-safe) follows the standard
convention: multiply each token's output embedding by its weight, then
rescale the whole sequence so its mean matches the unweighted mean (keeps
the conditioning magnitude the UNet was trained on). All-ones weights are
an exact no-op, so the weighted path can be applied unconditionally.
"""

from __future__ import annotations

import numpy as np


def _num_end(text: str, start: int) -> int | None:
    """If text[start:] begins with a number immediately followed by ')',
    return the index of that ')'; else None."""
    j = start
    n = len(text)
    while j < n and (text[j].isdigit() or text[j] in ".+-"):
        j += 1
    if j > start and j < n and text[j] == ")":
        try:
            float(text[start:j])
        except ValueError:
            return None
        return j
    return None


def parse_weighted_prompt(text: str) -> list[tuple[str, float]]:
    """Parse emphasis syntax → [(fragment, weight)], in order, with
    adjacent equal-weight fragments merged. Unbalanced brackets keep the
    weight they applied (matching frontend behavior)."""
    out: list[tuple[str, float]] = []
    # stack entries: (bracket char, provisional multiplier, index into
    # `out` where the span began — for retroactive explicit weights)
    stack: list[tuple[str, float, int]] = []
    cur: list[str] = []
    weight = 1.0

    def flush():
        nonlocal cur
        if cur:
            frag = "".join(cur)
            if out and abs(out[-1][1] - weight) < 1e-12:
                out[-1] = (out[-1][0] + frag, weight)
            else:
                out.append((frag, weight))
            cur = []

    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "\\" and i + 1 < n and text[i + 1] in "()[]\\":
            cur.append(text[i + 1])
            i += 2
        elif ch in "([":
            flush()
            mult = 1.1 if ch == "(" else 1.0 / 1.1
            stack.append((ch, mult, len(out)))
            weight *= mult
            i += 1
        elif (ch == ":" and stack and stack[-1][0] == "("
              and _num_end(text, i + 1) is not None):
            j = _num_end(text, i + 1)
            w = float(text[i + 1:j])
            flush()
            _, mult, start = stack.pop()
            # fragments in this span carried ×1.1 provisionally → ×w instead
            for idx in range(start, len(out)):
                f, fw = out[idx]
                out[idx] = (f, fw / mult * w)
            weight /= mult
            i = j + 1  # consume through ')'
        elif ch == ")" and stack and stack[-1][0] == "(":
            flush()
            _, mult, _ = stack.pop()
            weight /= mult
            i += 1
        elif ch == "]" and stack and stack[-1][0] == "[":
            flush()
            _, mult, _ = stack.pop()
            weight /= mult
            i += 1
        else:
            cur.append(ch)
            i += 1
    flush()
    if not out:
        out.append(("", 1.0))
    return out


def tokenize_weighted(
    texts: list[str],
    encode_chunk,
    max_length: int,
    bos_id: int,
    eos_id: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Parse + tokenize each prompt chunk-wise → (ids [B,L] int32,
    weights [B,L] float32). `encode_chunk(str) -> list[int]` must tokenize
    WITHOUT special tokens. BOS/EOS/pad positions get weight 1.0."""
    B = len(texts)
    ids = np.full((B, max_length), eos_id, np.int32)
    wts = np.ones((B, max_length), np.float32)
    for b, text in enumerate(texts):
        toks: list[int] = [bos_id]
        ws: list[float] = [1.0]
        for frag, w in parse_weighted_prompt(text):
            for t in encode_chunk(frag):
                toks.append(int(t))
                ws.append(float(w))
        toks = toks[: max_length - 1] + [eos_id]
        ws = ws[: max_length - 1] + [1.0]
        ids[b, : len(toks)] = toks
        wts[b, : len(ws)] = ws
    return ids, wts


def apply_prompt_weights(emb, weights):
    """Scale token embeddings by their weights, preserving the sequence's
    mean activation (jit-safe; exact identity for all-ones weights).
    emb: [B, L, C]; weights: [B, L]."""
    import jax.numpy as jnp

    orig_mean = jnp.mean(emb, axis=(-2, -1), keepdims=True)
    out = emb * weights[..., None].astype(emb.dtype)
    new_mean = jnp.mean(out, axis=(-2, -1), keepdims=True)
    ratio = jnp.where(new_mean == 0, 1.0, orig_mean / new_mean)
    return out * ratio.astype(emb.dtype)
