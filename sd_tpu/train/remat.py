"""Rematerialization (gradient checkpointing) policies.

Capability parity with the reference's gradient checkpointing
(reference: openai_model/utils.py:160-196 CheckpointFunction + checkpoint,
DDIM/diffusion_modules.py:102-148, used by ResBlock/BasicTransformerBlock;
globally disabled by monkey-patch in Diffusion/main.py:8-14), done the
XLA-idiomatic way: `jax.checkpoint` with a saveable-set policy over the whole
model apply, letting the compiler schedule recomputation instead of
hand-marking modules.

Policies trade HBM for FLOPs:
  * "none"          — no remat (save everything XLA wants)
  * "dots"          — save matmul/conv outputs with no batch dims
                       (the standard transformer policy)
  * "nothing"       — save nothing; recompute the whole block in backward
  * "checkpoint_dots_with_no_batch_dims" — alias of "dots"
"""

from __future__ import annotations

from typing import Callable

import jax

POLICIES = {
    "none": None,
    "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    "checkpoint_dots_with_no_batch_dims":
        jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    "nothing": jax.checkpoint_policies.nothing_saveable,
}


def remat_apply(apply_fn: Callable, policy: str = "dots",
                prevent_cse: bool = True) -> Callable:
    """Wrap a pure apply fn (e.g. the LatentDiffusion `unet_apply`) in
    jax.checkpoint so the backward pass rematerializes activations.

    Usage:
        ld = LatentDiffusion(unet_apply=remat_apply(unet_apply), ...)
    """
    if policy == "none":
        return apply_fn
    return jax.checkpoint(
        apply_fn, policy=POLICIES[policy], prevent_cse=prevent_cse
    )
