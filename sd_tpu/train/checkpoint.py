"""Checkpoint save/restore via Orbax, plus torch-checkpoint import helpers.

Capability parity with the reference's checkpointing
(reference: DDPM/train.py:134-144 torch.save of model/opt/sched/epoch —
with the resume path the reference never implemented (config flag only,
DDPM/config/config.py:21); ldm init_from_ckpt with ignore_keys/only_model,
ldm/diffusion/ddpm.py:269-293; fp16 conversion + `model.` prefix strip,
vqvae/test/test.py:3-21), upgraded to the TPU-idiomatic stack: Orbax async
checkpointing with automatic latest-step resolution and resume — the failure
recovery mechanism the reference lacks (SURVEY.md §5.3/§5.4).
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import jax.numpy as jnp

PyTree = Any


def _manager(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(ckpt_dir: str, state: PyTree, step: int,
                    max_to_keep: int = 3, wait: bool = True) -> None:
    """Async-save `state` (any pytree) at `step`."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> int | None:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, target: PyTree, step: int | None = None) -> PyTree:
    """Restore into the structure of `target` (abstract shapes ok).
    step=None → latest. Returns the restored pytree."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            mgr.close()
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    out = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return out


def restore_pytree(ckpt_dir: str, step: int | None = None, *,
                   device: str | None = None) -> PyTree:
    """Restore a checkpoint WITHOUT a live target tree: structure, shapes and
    dtypes come from the checkpoint's own metadata, placed on the default
    device (so a TPU-written checkpoint restores on CPU and vice versa).

    This is the cross-task loading path — e.g. an LDM pulling the trained
    first-stage params out of a KL-VAE GAN checkpoint by directory alone
    (the reference loads its first stage from a torch ckpt path:
    instantiate_first_stage + init_from_ckpt, ldm/diffusion/ddpm.py:269-293).

    `device="cpu"` stages the restore in HOST memory instead of the default
    device: a full flagship train-state checkpoint is ~12 GB (bf16 params +
    fp32 Adam moments + fp32 EMA) and restoring it into HBM just to pull
    out the EMA subtree evicts the working set on a 15.75 GB chip. Callers
    staging on cpu must `jax.device_put` whatever subtree they keep —
    cpu-committed arrays are NOT valid inputs to TPU-jitted programs."""
    import orbax.checkpoint as ocp

    dev = (jax.local_devices(backend="cpu")[0] if device == "cpu"
           else jax.devices()[0])
    sharding = jax.sharding.SingleDeviceSharding(dev)
    with ocp.CheckpointManager(
            os.path.abspath(ckpt_dir),
            options=ocp.CheckpointManagerOptions(create=False),
            item_handlers={"default": ocp.StandardCheckpointHandler()}) as mgr:
        if step is None:
            step = mgr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        meta = mgr.item_metadata(step)["default"]
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=sharding),
            meta, is_leaf=lambda x: hasattr(x, "shape"))
        return mgr.restore(
            step, args=ocp.args.Composite(
                default=ocp.args.StandardRestore(abstract)))["default"]


def auto_resume(ckpt_dir: str, state: PyTree) -> tuple[PyTree, int]:
    """Resume-from-latest if a checkpoint exists, else return `state` as-is.
    Returns (state, start_step). The preemption-recovery path for long runs.

    `state` may be the concrete fresh train state OR a zero-argument thunk
    that builds it. Pass the thunk: when a checkpoint exists the thunk is
    traced with `jax.eval_shape` — zero device allocation — and the
    checkpoint restores straight into fresh buffers. A concrete fresh state
    stays resident on device for the whole restore (double residency), and
    any init-time arrays the caller's frame keeps alive (module.init
    outputs) stay resident for the whole RUN: that extra footprint is what
    OOM'd the klf8_refresh 256² GAN resume on a 15.75 GB chip
    (runs/klf8_refresh/train.log, three identical step-1001 OOMs), and at
    the 859M-param flagship shape the fp32 double residency alone would be
    ~7 GB. The concrete form is kept for small models / tests."""
    step = latest_step(ckpt_dir)
    if callable(state):
        if step is None:
            return state(), 0
        abstract = jax.eval_shape(state)
        return restore_checkpoint(ckpt_dir, abstract, step), step
    if step is None:
        return state, 0
    return restore_checkpoint(ckpt_dir, state, step), step


# ---------------------------------------------------------------------------
# torch-checkpoint interop (reference: vqvae/test/test.py, VAE/test/test.py)
# ---------------------------------------------------------------------------


def strip_prefix(state_dict: dict, prefix: str = "model.") -> dict:
    """Drop a leading module prefix from torch state_dict keys."""
    out = {}
    for k, v in state_dict.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def filter_ignore_keys(state_dict: dict, ignore_keys: list[str]) -> dict:
    """Delete keys matching any ignore prefix (reference: init_from_ckpt)."""
    return {
        k: v for k, v in state_dict.items()
        if not any(k.startswith(ik) for ik in ignore_keys)
    }


def cast_tree(tree: PyTree, dtype=jnp.bfloat16) -> PyTree:
    """Cast floating leaves (the reference's fp16 converter, TPU-flavored bf16)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def check_tree_health(tree: PyTree) -> dict[str, list[str]]:
    """NaN/Inf audit of a param tree (reference: VAE/test/test.py:68-132
    check_model_health). Returns {'nan': [paths], 'inf': [paths]}."""
    import numpy as np

    bad = {"nan": [], "inf": []}
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        name = jax.tree_util.keystr(path)
        if np.isnan(arr).any():
            bad["nan"].append(name)
        if np.isinf(arr).any():
            bad["inf"].append(name)
    return bad
