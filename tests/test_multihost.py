"""Multi-host runtime glue (parallel/multihost.py) + DataLoader rank/world
sharding. Validated single-process + forced-multi-device CPU mesh, the
same way the rest of the parallel layer is (conftest.py sets
xla_force_host_platform_device_count=8)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sd_tpu.data.loader import DataLoader
from sd_tpu.parallel import mesh as pmesh
from sd_tpu.parallel.multihost import (
    host_local_to_global,
    initialize,
    process_local_batch,
)


class RangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.float32), "idx": int(i)}


def test_initialize_single_process_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert initialize() is False
    assert jax.process_count() == 1


def test_process_local_batch_math():
    assert process_local_batch(32, world=4) == 8
    assert process_local_batch(8, world=1) == 8
    with pytest.raises(ValueError):
        process_local_batch(10, world=4)


def test_loader_rank_sharding_disjoint_and_covering():
    ds = RangeDataset(40)
    world = 4
    loaders = [DataLoader(ds, batch_size=2, shuffle=True, seed=5,
                          num_workers=1, rank=r, world=world)
               for r in range(world)]
    assert sum(len(l) for l in loaders) == 40 // 2
    seen: list[int] = []
    for l in loaders:
        for batch in l:
            seen.extend(int(v) for v in batch["x"][:, 0])
    # disjoint shards cover the whole epoch exactly once
    assert sorted(seen) == list(range(40))


def test_loader_ranks_agree_on_epoch_permutation():
    """All ranks derive the same shuffled batch list (no coordination) —
    rank r takes batches r, r+world, ... of the SAME permutation."""
    ds = RangeDataset(24)
    full = DataLoader(ds, batch_size=3, shuffle=True, seed=9, num_workers=1)
    all_batches = [b["x"][:, 0].tolist() for b in full]
    r1 = DataLoader(ds, batch_size=3, shuffle=True, seed=9, num_workers=1,
                    rank=1, world=2)
    got = [b["x"][:, 0].tolist() for b in r1]
    assert got == all_batches[1::2]


def test_loader_rank_validation():
    with pytest.raises(ValueError):
        DataLoader(RangeDataset(8), batch_size=2, rank=2, world=2)


def test_host_local_to_global_single_process():
    """Single process: global array == local batch, sharded on data."""
    mesh = pmesh.make_mesh({"data": 4}, devices=jax.devices()[:4])
    batch = {"image": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
             "label": np.arange(8, dtype=np.int32)}
    out = host_local_to_global(batch, mesh)
    assert out["image"].shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])
    # genuinely sharded over the data axis
    assert len(out["image"].sharding.device_set) == 4
    # consumable by a jitted reduction without resharding surprises
    s = jax.jit(lambda b: jnp.sum(b["image"]))(out)
    assert float(s) == float(batch["image"].sum())
