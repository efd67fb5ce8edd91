"""Numerics debugging: NaN tracing and health checks.

The TPU-native replacement for the reference's scattered NaN/Inf audits
(reference: VAE/test/test.py:68-132,166-183, VAE/autoencoder.py:88-107,
`assert not torch.isnan(...)` ldm/diffusion/ddpm.py:243; SURVEY.md §5.2):
jax_debug_nans for interactive runs, checkify for jitted production steps.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def enable_nan_debugging(enable: bool = True) -> None:
    """Global NaN tracing: any jitted fn that produces a NaN re-runs
    de-optimized and raises at the exact primitive."""
    jax.config.update("jax_debug_nans", enable)


def nan_check(fn: Callable) -> Callable:
    """Wrap a jittable fn with checkify NaN/div checks; the wrapped fn
    returns (err, out) — call err.throw() on host to surface failures."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)
    return checked


def tree_finite_summary(tree) -> dict:
    """{'finite': bool, 'num_nan': int, 'num_inf': int} over all leaves,
    computed on device (cheap reduction, jit-safe)."""
    leaves = [x for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    if not leaves:
        return {"finite": True, "num_nan": 0, "num_inf": 0}
    num_nan = sum(jnp.isnan(x).sum() for x in leaves)
    num_inf = sum(jnp.isinf(x).sum() for x in leaves)
    return {
        "finite": (num_nan + num_inf) == 0,
        "num_nan": num_nan,
        "num_inf": num_inf,
    }
