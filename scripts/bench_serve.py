#!/usr/bin/env python
"""Measure the HTTP serving daemon on the real chip (VERDICT r3 next #3).

Drives `sd_tpu.serve.BatchingServer` + the stdlib HTTP front-end with
concurrent clients against the REAL Text2ImagePipeline (512² SD-v1
geometry, random weights — serving cost is weight-independent), and
reports per scenario:

  requests/s, images/s, p50/p99 request latency, mean realized batch size
  (batching efficiency vs max_batch), and the single-batch bench.py rate
  for comparison.

Scenarios:
  ddim50   50-step DDIM + CFG 7.5 — the bench.py workload behind HTTP
  dpm15    15-step DPM-Solver++(2M) — the quality-parity few-step path
  lcm4     4-step consistency student path (guidance baked in) — the 25×
           serving lever measured end-to-end through the daemon

Appends one JSON line per scenario to SERVE_BENCH.jsonl.
Reference anchor: none — beyond-reference surface (sd_tpu/serve.py), which
is exactly why it needs its own measured numbers (VERDICT r3 weak #8).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("SERVE_BENCH.jsonl", "a", buffering=1)


def post(port: int, payload: dict, timeout: float = 900.0) -> dict:
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        conn.request("POST", "/generate", body=json.dumps(payload),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = resp.read()
        if resp.status != 200:
            raise RuntimeError(f"HTTP {resp.status}: {body[:200]!r}")
        return json.loads(body)
    finally:
        conn.close()


def run_scenario(port: int, name: str, payload: dict, n_clients: int,
                 reqs_per_client: int, max_batch: int,
                 bench_ips: float | None):
    """Saturating closed-loop load: n_clients threads, each issuing
    reqs_per_client sequential requests."""
    lat: list[float] = []
    batch_sizes: list[int] = []
    errors: list[str] = []
    lock = threading.Lock()

    def client(i: int):
        for j in range(reqs_per_client):
            p = dict(payload)
            p["prompt"] = f"a photograph of a cat, variant {i}"
            t0 = time.perf_counter()
            try:
                r = post(port, p)
                dt = time.perf_counter() - t0
                with lock:
                    lat.append(dt)
                    batch_sizes.append(int(r.get("batch_size", 1)))
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(str(e)[:200])

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    n_ok = len(lat)
    rec = {
        "scenario": name,
        "n_clients": n_clients,
        "requests": n_ok,
        "errors": len(errors),
        "wall_s": round(wall, 2),
        "requests_per_s": round(n_ok / wall, 4),
        "images_per_s": round(n_ok / wall, 4),  # 1 image per request
        "p50_latency_s": round(float(np.percentile(lat, 50)), 3) if lat else None,
        "p99_latency_s": round(float(np.percentile(lat, 99)), 3) if lat else None,
        "mean_batch": round(float(np.mean(batch_sizes)), 2) if batch_sizes else None,
        "max_batch": max_batch,
        **payload,
    }
    if bench_ips is not None:
        # batching efficiency vs the raw single-program batch-4 rate
        rec["vs_bench_ips"] = round(rec["images_per_s"] / bench_ips, 3)
    if errors:
        rec["error_sample"] = errors[:3]
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")
    return rec


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sd_tpu.pipeline import Text2ImagePipeline
    from sd_tpu.serve import BatchingServer, make_http_server

    max_batch = int(os.environ.get("SD_TPU_SERVE_MAX_BATCH", "4"))
    bench_ips = os.environ.get("SD_TPU_BENCH_IPS")
    bench_ips = float(bench_ips) if bench_ips else None

    print("building pipeline (512² SD-v1 geometry, random weights)...",
          flush=True)
    pipe = Text2ImagePipeline.from_config("configs/sd_txt2img.yaml")

    batcher = BatchingServer(pipe, max_batch=max_batch,
                             batch_window_ms=100.0, default_steps=50)
    srv = make_http_server(batcher, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    print(f"serving on :{port}", flush=True)

    scenarios = [
        ("ddim50", {"steps": 50, "sampler": "ddim", "guidance_scale": 7.5,
                    "seed": None}),
        ("dpm15", {"steps": 15, "sampler": "dpm", "guidance_scale": 7.5,
                   "seed": None}),
        ("lcm4", {"steps": 4, "sampler": "lcm", "guidance_scale": 1.0,
                  "seed": None}),
    ]
    n_clients = int(os.environ.get("SD_TPU_SERVE_CLIENTS", "8"))
    reqs = int(os.environ.get("SD_TPU_SERVE_REQS", "6"))

    for name, payload in scenarios:
        payload = {k: v for k, v in payload.items() if v is not None}
        # warmup: compile the batched program shape (max_batch) and the
        # stragglers' smaller shapes outside the timed window
        print(f"[{name}] warmup (compiles on first run)...", flush=True)
        t0 = time.perf_counter()
        ws = [threading.Thread(
            target=lambda: post(port, {**payload, "prompt": "warmup"}))
            for _ in range(max_batch)]
        for t in ws:
            t.start()
        for t in ws:
            t.join()
        print(f"[{name}] warmup done in {time.perf_counter()-t0:.0f}s",
              flush=True)
        run_scenario(port, name, payload, n_clients, reqs, max_batch,
                     bench_ips)

    srv.shutdown()


if __name__ == "__main__":
    main()
