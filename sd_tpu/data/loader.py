"""Batching, shuffling, and background prefetch.

Capability parity with the reference's data plumbing
(reference: torch DataLoader usage DDPM/train.py:40-43,
Diffusion/main.py:80-95 num_workers=4; `parallel_data_prefetch`
ldm/utils.py:108-203 — mp/thread queue prefetch; DataModuleFromConfig
Diffusion/data/dataset.py:11-198), rebuilt host-side:

  * `DataLoader` — shuffled epoch batching with a thread-pool of workers
    decoding images ahead of the training step (threads, not processes:
    PIL/numpy release the GIL for the heavy parts and threads share the
    host memory the TPU runtime DMAs from);
  * `parallel_data_prefetch` — the reference's generic parallel-map utility;
  * collation stacks dicts of numpy arrays; string fields are collected as
    lists (tokenized downstream, host-side).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator

import numpy as np


def collate(items: list[dict]) -> dict:
    """Stack numeric fields, collect strings/objects as lists."""
    out: dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray) or (
            np.isscalar(vals[0]) and not isinstance(vals[0], str)
        ):
            out[key] = np.stack([np.asarray(v) for v in vals])
        else:
            out[key] = vals
    return out


class DataLoader:
    """Shuffled, batched, prefetching loader over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4,
                 prefetch: int = 2, seed: int = 0,
                 collate_fn: Callable = collate,
                 rank: int = 0, world: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.collate_fn = collate_fn
        # multi-host data sharding (parallel/multihost.py): every process
        # builds the SAME shuffled batch list (seed+epoch-keyed, rank-free)
        # and takes batches round-robin — shards are disjoint, cover each
        # epoch, and stay aligned without any cross-host coordination.
        if not 0 <= rank < world:
            raise ValueError(f"rank {rank} outside world {world}")
        self.rank = rank
        self.world = world
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        total = (n // self.batch_size if self.drop_last
                 else -(-n // self.batch_size))
        return len(range(self.rank, total, self.world))

    def _batch_indices(self) -> list[np.ndarray]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        batches = []
        for s in range(0, n, self.batch_size):
            b = idx[s: s + self.batch_size]
            if len(b) < self.batch_size and self.drop_last:
                break
            batches.append(b)
        return batches[self.rank::self.world]

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        # advance the dataset's per-epoch RNG stream (random flips etc.) —
        # without this the per-item generators seeded by (seed, epoch, idx)
        # repeat epoch 0's decisions forever
        set_epoch = getattr(self.dataset, "set_epoch", None)
        if callable(set_epoch):
            set_epoch(self._epoch)
        batches = self._batch_indices()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # Bounded put that re-checks `stop` — if the consumer breaks out
            # early (mid-epoch), a blocking q.put would strand this thread
            # (and its prefetched batches) forever.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(self.dataset.__getitem__, b))
                    if not put(self.collate_fn(items)):
                        return
            put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


def parallel_data_prefetch(
    func: Callable,
    data,
    n_proc: int = 4,
    target_data_type: str = "ndarray",
) -> Any:
    """Parallel map over chunks of `data` (reference: ldm/utils.py:108-203).
    Threads instead of processes — same semantics, no pickling constraints."""
    if target_data_type not in ("ndarray", "list"):
        raise ValueError("target_data_type must be 'ndarray' or 'list'")
    if isinstance(data, np.ndarray) and target_data_type == "list":
        raise ValueError("list expected but function got ndarray")
    if isinstance(data, (dict,)):
        data = list(data.values())
    arr = np.asarray(data, dtype=object) if target_data_type == "ndarray" else list(data)

    n = len(arr)
    n_proc = max(1, min(n_proc, n))
    step = -(-n // n_proc)
    chunks = [arr[i * step: (i + 1) * step] for i in range(n_proc)]

    with ThreadPoolExecutor(n_proc) as pool:
        results = list(pool.map(lambda c: [func(x) for x in c], chunks))

    flat = [r for chunk in results for r in chunk]
    if target_data_type == "ndarray":
        return np.concatenate([np.asarray(f)[None] for f in flat], axis=0)
    return flat
