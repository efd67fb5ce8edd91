"""Measure the serving daemon on real hardware (requests/s, p50/p99,
micro-batching efficiency).

    python scripts/bench_serve.py --config configs/sd_txt2img.yaml \
        --clients 8 --requests 3 --out /tmp/bench_serve.json

Drives `sd_tpu.serve.BatchingServer` + its stdlib HTTP front-end
*in-process* (real HTTP over loopback — the same code path production
takes, minus the NIC) with concurrent client threads, at the flagship
bench.py geometry: 512×512 text-to-image through the SD-v1 UNet.

Two rows, matching the two serving regimes:
  ddim50  50-step DDIM + CFG 7.5       — quality regime; directly
          comparable to bench.py's single-batch img/s
  lcm4    4-step LCM, no CFG branch    — few-step regime (the 25× lever
          landed in runs/lcm32_catdog; here measured at flagship shape)

For each row: a sequential single-client phase (baseline latency, batch
size 1) then a concurrent phase (`--clients` threads × `--requests` each).
Batching efficiency = concurrent img/s ÷ sequential img/s; the batcher's
own counters give the realized mean batch size.

Weights are random (no pretrained artifacts in this env) — serving
throughput is weight-independent.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _post(port: int, body: dict, timeout: float = 900.0) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _percentile(xs: list[float], p: float) -> float:
    xs = sorted(xs)
    k = (len(xs) - 1) * p
    lo, hi = int(k), min(int(k) + 1, len(xs) - 1)
    return xs[lo] + (xs[hi] - xs[lo]) * (k - lo)


def run_row(name: str, port: int, batcher, body: dict, clients: int,
            requests_per_client: int) -> dict:
    prompts = [
        "a photo of a cat", "a photo of a dog", "a watercolor cat",
        "a studio portrait of a dog", "a cat on a sofa", "a dog in snow",
        "an oil painting of a cat", "a sketch of a dog",
    ]

    # -- warmup / compile: one request group per pow2 bucket size the
    #    phases can hit (bucket = next pow2 of group size; sequential hits
    #    1, concurrent hits max_batch for full groups but also 2/3-sized
    #    TAIL groups when the remaining queue is short — every bucket must
    #    be compiled before measurement or a mid-phase remote compile
    #    pollutes p50/p99). Compile time is reported, not timed in.
    t0 = time.perf_counter()
    nb = 1
    while True:
        if nb == 1:
            _post(port, {**body, "prompt": prompts[0]})
        else:
            barrier = threading.Barrier(nb)

            def warm(i):
                barrier.wait()
                _post(port, {**body, "prompt": prompts[i % len(prompts)]})

            ws = [threading.Thread(target=warm, args=(i,))
                  for i in range(nb)]
            [w.start() for w in ws]
            [w.join() for w in ws]
        if nb >= batcher.max_batch:
            break
        nb = min(nb * 2, batcher.max_batch)
    compile_s = time.perf_counter() - t0

    # -- phase 1: sequential single client (baseline latency, no batching)
    seq_lat = []
    for i in range(3):
        t = time.perf_counter()
        _post(port, {**body, "prompt": prompts[i % len(prompts)]})
        seq_lat.append(time.perf_counter() - t)
    seq_ips = 1.0 / (sum(seq_lat) / len(seq_lat))

    # -- phase 2: concurrent clients
    batcher.requests_served = 0
    batcher.batches_run = 0
    lat: list[float] = []
    lat_lock = threading.Lock()
    start = threading.Barrier(clients + 1)

    def client(ci: int):
        start.wait()
        for ri in range(requests_per_client):
            t = time.perf_counter()
            _post(port, {**body,
                         "prompt": prompts[(ci + ri) % len(prompts)]})
            dt = time.perf_counter() - t
            with lat_lock:
                lat.append(dt)

    threads = [threading.Thread(target=client, args=(ci,))
               for ci in range(clients)]
    [t.start() for t in threads]
    start.wait()
    t0 = time.perf_counter()
    [t.join() for t in threads]
    wall = time.perf_counter() - t0

    n = clients * requests_per_client
    mean_batch = (batcher.requests_served / batcher.batches_run
                  if batcher.batches_run else 0.0)
    return {
        "row": name,
        "steps": body["steps"],
        "sampler": body["sampler"],
        "guidance_scale": body["guidance_scale"],
        "clients": clients,
        "requests": n,
        "wall_s": round(wall, 3),
        "requests_per_s": round(n / wall, 4),
        "img_per_s": round(n / wall, 4),          # 1 image per request
        "p50_s": round(_percentile(lat, 0.50), 3),
        "p99_s": round(_percentile(lat, 0.99), 3),
        "seq_latency_s": round(sum(seq_lat) / len(seq_lat), 3),
        "seq_img_per_s": round(seq_ips, 4),
        "batching_speedup": round((n / wall) / seq_ips, 3),
        "mean_batch": round(mean_batch, 2),
        "batches_run": batcher.batches_run,
        "compile_warmup_s": round(compile_s, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="configs/sd_txt2img.yaml")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=3,
                    help="requests per client in the concurrent phase")
    ap.add_argument("--max-batch", type=int, default=4)
    ap.add_argument("--batch-window-ms", type=float, default=50.0)
    ap.add_argument("--rows", default="ddim50,lcm4",
                    help="comma list of: ddim50, lcm4, dpm15")
    ap.add_argument("--out", default=None, help="write JSON results here")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model on CPU (script self-test)")
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_compilation"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from sd_tpu.pipeline import Text2ImagePipeline
    from sd_tpu.serve import BatchingServer, make_http_server

    cfg = ("configs/sd_txt2img_smoke.yaml" if args.smoke else args.config)
    pipe = Text2ImagePipeline.from_config(cfg)

    batcher = BatchingServer(pipe, max_batch=args.max_batch,
                             batch_window_ms=args.batch_window_ms)
    batcher.start()
    server = make_http_server(batcher, port=0)
    port = server.server_address[1]
    srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
    srv_thread.start()

    all_rows = {
        "ddim50": {"steps": 50, "sampler": "ddim", "guidance_scale": 7.5},
        # LCM: guidance is baked into the student at distillation time, so
        # the serving request carries no CFG branch (guidance_scale 1.0)
        "lcm4": {"steps": 4, "sampler": "lcm", "guidance_scale": 1.0},
        "dpm15": {"steps": 15, "sampler": "dpm", "guidance_scale": 7.5},
    }
    if args.smoke:
        for r in all_rows.values():
            r["steps"] = min(r["steps"], 3)

    results = []
    for name in args.rows.split(","):
        name = name.strip()
        body = dict(all_rows[name])
        print(f"[bench_serve] row {name}: warmup+measure "
              f"({args.clients} clients x {args.requests} requests) ...",
              flush=True)
        row = run_row(name, port, batcher, body, args.clients,
                      args.requests)
        results.append(row)
        print(json.dumps(row), flush=True)

    server.shutdown()
    batcher.stop()

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    # summary table
    print(f"\n{'row':8} {'img/s':>8} {'p50 s':>7} {'p99 s':>7} "
          f"{'seq img/s':>10} {'speedup':>8} {'mean batch':>10}")
    for r in results:
        print(f"{r['row']:8} {r['img_per_s']:8.3f} {r['p50_s']:7.2f} "
              f"{r['p99_s']:7.2f} {r['seq_img_per_s']:10.3f} "
              f"{r['batching_speedup']:8.2f} {r['mean_batch']:10.2f}")


if __name__ == "__main__":
    main()
