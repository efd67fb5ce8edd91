"""Checkpoint merging — weighted-sum and add-difference model merges
(the community "checkpoint merger"; beyond the reference, which only loads
single checkpoints, VAE/test/test.py:29-64).

Operates on flat SD-layout state dicts (what `load_sd_checkpoint` returns
for both torch `.ckpt` and `.safetensors`), so merges compose with the
whole import/export surface:

    sd = merge_checkpoints(load_sd_checkpoint(a), load_sd_checkpoint(b),
                           alpha=0.3)
    save_sd_checkpoint("merged.safetensors", sd)

Modes:
  * weighted:        out = (1-α)·A + α·B
  * add_difference:  out = A + α·(B - C)   (transplant B's fine-tune,
                     measured against its base C, onto A)

Keys present in only some inputs pass through from A (a warning list is
returned alongside); shape mismatches raise.
"""

from __future__ import annotations

import numpy as np


def merge_checkpoints(
    a: dict,
    b: dict,
    alpha: float = 0.5,
    c: dict | None = None,
    mode: str = "weighted",
) -> tuple[dict, list[str]]:
    """Merge state dicts. Returns (merged, skipped_keys)."""
    if mode not in ("weighted", "add_difference"):
        raise ValueError(f"unknown merge mode {mode!r}")
    if mode == "add_difference" and c is None:
        raise ValueError("add_difference needs the base checkpoint c")

    out: dict = {}
    skipped: list[str] = []
    for k, va in a.items():
        va = np.asarray(va)
        vb = b.get(k)
        if vb is None or (mode == "add_difference" and k not in c):
            out[k] = va
            skipped.append(k)
            continue
        vb = np.asarray(vb)
        if vb.shape != va.shape:
            raise ValueError(f"{k}: shape mismatch {va.shape} vs {vb.shape}")
        fa, fb = va.astype(np.float32), vb.astype(np.float32)
        if mode == "weighted":
            m = (1.0 - alpha) * fa + alpha * fb
        else:
            fc = np.asarray(c[k]).astype(np.float32)
            if fc.shape != va.shape:
                raise ValueError(f"{k}: base shape mismatch "
                                 f"{va.shape} vs {fc.shape}")
            m = fa + alpha * (fb - fc)
        out[k] = m.astype(va.dtype) if va.dtype != np.float32 else m
    return out, skipped
