"""Classifier-free-guidance combination helpers.

The plain CFG combine (reference form: DDIM/ddim.py:171-178) plus the
over-exposure fix of Lin et al., "Common Diffusion Noise Schedules and Sample
Steps are Flawed" (arXiv:2305.08891 §3.4, beyond-reference): large guidance
scales inflate the per-sample standard deviation of the prediction, washing
out contrast; rescaling the combined prediction back toward the conditional
branch's std restores it. `guidance_rescale` interpolates between the plain
CFG output (0.0) and the fully std-matched output (1.0); ~0.7 is the paper's
recommendation, and it matters most with v-prediction models.
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_cfg(
    e_uncond: jnp.ndarray,
    e_cond: jnp.ndarray,
    guidance_scale: float,
    guidance_rescale: float = 0.0,
) -> jnp.ndarray:
    """e_uncond + s·(e_cond − e_uncond), optionally std-rescaled."""
    e = e_uncond + guidance_scale * (e_cond - e_uncond)
    if guidance_rescale == 0.0:
        return e
    axes = tuple(range(1, e.ndim))  # per-sample std over all non-batch dims
    std_cond = jnp.std(e_cond.astype(jnp.float32), axis=axes, keepdims=True)
    std_cfg = jnp.std(e.astype(jnp.float32), axis=axes, keepdims=True)
    rescaled = e * (std_cond / jnp.maximum(std_cfg, 1e-12)).astype(e.dtype)
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * e
