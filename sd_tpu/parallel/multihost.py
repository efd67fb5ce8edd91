"""Multi-host (multi-slice / DCN) runtime glue.

Single-host multi-chip is `parallel.mesh` alone (one process sees all
chips). Across hosts, every process sees only its local chips and three
extra problems appear; this module owns them:

  1. runtime bring-up — `initialize()` wraps `jax.distributed.initialize`
     with TPU-pod env autodetection (on Cloud TPU the coordinator/process
     env is injected; explicit args for DCN clusters), and is an explicit
     no-op for single-process runs so the same trainer script works
     everywhere;
  2. data sharding — each process must feed a DISJOINT slice of the global
     batch. `DataLoader(rank=, world=)` (data/loader.py) strides batches
     round-robin; `process_local_batch` does the divisibility math;
  3. host→global arrays — `host_local_to_global` wraps
     `jax.make_array_from_process_local_data` so a per-process batch
     becomes one globally-sharded jax.Array the pjit step consumes.

The mesh layer itself is unchanged: `make_mesh` over `jax.devices()`
(which is global after initialize()) with the "data" axis ordered so DP
gradient psums ride ICI within a slice and DCN only between slices —
jax orders devices process-contiguously by default, which does exactly
this. Single physical chip here, so multi-host paths are validated the
same way the mesh layer is: on the forced-multi-device CPU backend
(tests/test_multihost.py).

The reference has no distributed layer at all (SURVEY.md §2.14/§5.8);
this is new TPU-native design surface.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

PyTree = Any


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> bool:
    """Bring up the cross-host runtime. Returns True if distributed mode
    was (or already is) initialized, False for the single-process no-op.

    Autodetection: with no args, initialize only when the environment
    advertises a multi-process run (Cloud TPU pod env or an explicit
    JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID triple);
    bare single-host runs skip bring-up entirely.
    """
    # NOTE: no jax calls before the env checks — jax.process_count() etc.
    # initialize the XLA backend, after which distributed bring-up fails.
    env = os.environ
    coordinator_address = coordinator_address or env.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])
    # a single-entry worker list is NOT a pod (the axon tunnel environment
    # sets TPU_WORKER_HOSTNAMES=localhost on a one-host slice)
    workers = [w for w in env.get("TPU_WORKER_HOSTNAMES", "").split(",") if w]
    tpu_pod = len(workers) > 1 or env.get("MEGASCALE_COORDINATOR_ADDRESS")
    if coordinator_address is None and not tpu_pod:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:
        if jax.process_count() > 1:
            return True  # already initialized by the launcher
        # backend already initialized (e.g. a platform plugin touched the
        # device at interpreter boot) — single-process fallback, not fatal
        print(f"[multihost] distributed bring-up skipped: {e}")
        return False
    return True


def process_local_batch(global_batch_size: int,
                        world: int | None = None) -> int:
    """Per-process batch size; global must divide evenly (anything else
    silently changes the effective LR/batch statistics across scales)."""
    world = jax.process_count() if world is None else world
    if global_batch_size % world:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{world} processes")
    return global_batch_size // world


def host_local_to_global(batch: PyTree, mesh, axis: str = "data") -> PyTree:
    """Per-process host batch → globally-sharded jax.Array pytree.

    Each process passes its LOCAL shard (shape [B_local, ...]); the result
    is a global array of shape [B_local * process_count, ...] sharded on
    `axis`. Single-process: equivalent to parallel.mesh.shard_batch.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim > 0 else P()
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree.map(put, batch)
