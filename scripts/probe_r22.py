#!/usr/bin/env python
"""Round-4 probe #22: bench envelope sweep (VERDICT r3 next #8).

One session, one process, interleaved measurements of the full 512² DDIM-50
CFG pipeline (bench.build) across batch ∈ {2, 4, 6, 8}, plus an async
double-buffered arm at the winning batch (dispatch batch i+1 before fencing
batch i — hides host dispatch + tunnel round-trip, device work on the one
v5e core is serialized either way).

Appends JSON lines to PROBE_R22.jsonl. The chosen default goes to
BASELINE.md + bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("PROBE_R22.jsonl", "a", buffering=1)
REPS = 5


def report(rec):
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def fence(out):
    return float(jnp.sum(out.astype(jnp.float32)))


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    import bench

    pipeline, params, clip_cfg, lat = bench.build(smoke=False)
    jitted = jax.jit(pipeline)
    rng = jax.random.PRNGKey(0)
    batches = [2, 4, 6, 8]
    args = {}
    for b in batches:
        ids = jnp.asarray(
            np.random.RandomState(0).randint(0, 49000, (b, 77)), jnp.int32)
        neg = jnp.asarray(
            np.random.RandomState(1).randint(0, 49000, (b, 77)), jnp.int32)
        args[b] = (ids, neg)
        t0 = time.perf_counter()
        fence(jitted(*params, ids, neg, rng))
        print(f"compiled B{b} in {time.perf_counter()-t0:.0f}s", flush=True)
        fence(jitted(*params, ids, neg, rng))  # warm

    # interleaved sweep
    times = {b: [] for b in batches}
    for r in range(REPS):
        for b in batches:
            ids, neg = args[b]
            t0 = time.perf_counter()
            fence(jitted(*params, ids, neg, jax.random.PRNGKey(r + 1)))
            times[b].append(time.perf_counter() - t0)
    best_b, best_ips = None, 0.0
    for b in batches:
        dt = float(np.median(times[b]))
        ips = b / dt
        spread = float((max(times[b]) - min(times[b])) / dt)
        report({"name": f"pipeline_B{b}", "ms": round(dt * 1e3, 1),
                "images_per_s": round(ips, 4), "spread": round(spread, 3)})
        if ips > best_ips:
            best_b, best_ips = b, ips

    # async double-buffered arm at the winning batch: keep 2 calls in
    # flight; steady-state rate over 6 calls
    ids, neg = args[best_b]
    n_calls = 6
    outs = []
    t0 = time.perf_counter()
    for i in range(n_calls):
        outs.append(jitted(*params, ids, neg, jax.random.PRNGKey(100 + i)))
        if len(outs) > 1:
            fence(outs.pop(0))   # fence the PREVIOUS call only
    fence(outs.pop(0))
    dt = (time.perf_counter() - t0) / n_calls
    report({"name": f"pipeline_B{best_b}_doublebuf",
            "ms": round(dt * 1e3, 1),
            "images_per_s": round(best_b / dt, 4)})

    # sentinel for session-noise context
    s_ms = bench.sentinel_ms()
    report({"name": "sentinel", "ms": round(s_ms, 2),
            "drift_vs_ref": round(s_ms / bench.SENTINEL_REF_MS - 1.0, 4)})


if __name__ == "__main__":
    main()
