"""Exponential moving average of parameters as pure pytree ops.

Capability parity with the reference's LitEma (reference: Ema/ema.py:5-105,
ldm/modules/ema.py) — warm-up decay min(decay, (1+n)/(10+n)) and in-place
shadow update — expressed as a functional (init/update/copy_to) API so it
composes with jit/pjit. The shadow tree shards exactly like the params.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

PyTree = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmaState:
    shadow: PyTree
    num_updates: jax.Array  # int32 scalar; -1 disables warm-up
    decay: float = dataclasses.field(metadata=dict(static=True), default=0.9999)


def ema_init(params: PyTree, decay: float = 0.9999, use_num_updates: bool = True,
             dtype=jnp.float32) -> EmaState:
    """`dtype` is the shadow dtype — fp32 by default (the reference keeps
    fp32 shadow buffers). A bf16 shadow halves EMA memory for fast-moving
    shadows (e.g. the consistency-distillation target network at decay
    ~0.95) where fp32 accumulation precision isn't load-bearing."""
    # explicit copy: same-dtype params would otherwise ALIAS the shadow at
    # init, which breaks buffer donation in the train step (double-donate)
    shadow = jax.tree.map(lambda p: jnp.array(p, dtype, copy=True), params)
    n0 = jnp.asarray(0 if use_num_updates else -1, dtype=jnp.int32)
    return EmaState(shadow=shadow, num_updates=n0, decay=decay)


def ema_update(state: EmaState, params: PyTree) -> EmaState:
    """shadow ← shadow − (1−d)(shadow − params), with warm-up ramped decay."""
    n = jnp.where(state.num_updates >= 0, state.num_updates + 1, state.num_updates)
    warm = (1.0 + n.astype(jnp.float32)) / (10.0 + n.astype(jnp.float32))
    decay = jnp.where(n >= 0, jnp.minimum(state.decay, warm), state.decay)
    one_minus = 1.0 - decay
    shadow = jax.tree.map(
        lambda s, p: (s - (one_minus * (s - p.astype(s.dtype))
                           ).astype(s.dtype)),
        state.shadow,
        params,
    )
    return EmaState(shadow=shadow, num_updates=n, decay=state.decay)


def ema_copy_to(state: EmaState, params: PyTree) -> PyTree:
    """Return the shadow weights cast back to the dtypes of `params`
    (the reference's `copy_to`; store/restore is just keeping `params`)."""
    return jax.tree.map(lambda s, p: s.astype(p.dtype), state.shadow, params)
