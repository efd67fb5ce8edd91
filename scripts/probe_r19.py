#!/usr/bin/env python
"""Round-4 probe #19: profiler-attributed per-op decomposition of the three
hot programs (VERDICT r3 "what's weak" #1/#3):

  1. UNet fwd B8 in-scan step (the 59.4 ms headline vs 48.5 ms padded floor)
  2. KL-f8 VAE decode B4 -> 512^2 (measured 103-104 ms vs ~90 ms estimate)
  3. one full bench pipeline call (the ~140 ms scan/CLIP/readback tail)

Captures jax.profiler device traces on the real chip (verified working over
the axon tunnel: /device:TPU:0 plane carries per-HLO-op events with
device_duration_ps) and aggregates XLA-op device time per program step.

Appends JSON lines to PROBE_R19.jsonl; prints human tables.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import sys
import time
from collections import defaultdict

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("PROBE_R19.jsonl", "a", buffering=1)


def report(rec):
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def fence(out):
    return float(jnp.sum(out.astype(jnp.float32)))


def chain_into(x, out):
    return x + (jnp.mean(out.astype(jnp.float32)) * 1e-6).astype(x.dtype)


# --------------------------------------------------------------------------
# xplane parsing
# --------------------------------------------------------------------------

_OPCODE_RE = re.compile(r"=\s+\S+\s+([\w-]+)\(")
_KEY_RE = re.compile(r"^(%[\w.\-]+)")
_FUSION_KIND_RE = re.compile(r"kind=(\w+)")
_CUSTOM_TARGET_RE = re.compile(r'custom_call_target="([^"]+)"')


def classify(name: str) -> str:
    opcode = None
    m = _OPCODE_RE.search(name)
    if m:
        opcode = m.group(1)
    if opcode == "fusion":
        k = _FUSION_KIND_RE.search(name)
        return f"fusion.{k.group(1) if k else '?'}"
    if opcode == "custom-call":
        t = _CUSTOM_TARGET_RE.search(name)
        return f"custom.{t.group(1) if t else '?'}"
    return opcode or "?"


def parse_trace(trace_dir: str, steps: int) -> dict:
    """Aggregate device-side XLA op durations from the newest xplane file.

    Returns {total_ms_per_step, by_op: [(key, category, ms_per_step, count)],
    by_category: {cat: ms_per_step}}.
    """
    files = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    assert files, f"no xplane under {trace_dir}"
    from jax.profiler import ProfileData
    pd = ProfileData.from_file(files[-1])
    per_op_ns = defaultdict(float)
    per_op_count = defaultdict(int)
    op_text = {}
    for plane in pd.planes:
        if plane.name != "/device:TPU:0":
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                key = None
                m = _KEY_RE.match(e.name)
                key = m.group(1) if m else e.name[:48]
                per_op_ns[key] += float(e.duration_ns)
                per_op_count[key] += 1
                if key not in op_text:
                    op_text[key] = e.name
    by_op = []
    by_cat = defaultdict(float)
    total = 0.0
    for key, ns in per_op_ns.items():
        ms = ns / 1e6 / steps
        cat = classify(op_text[key])
        by_op.append((key, cat, ms, per_op_count[key] // steps,
                      op_text[key][:150]))
        by_cat[cat] += ms
        total += ms
    by_op.sort(key=lambda r: -r[2])
    return {"total_ms_per_step": total, "by_op": by_op,
            "by_category": dict(sorted(by_cat.items(), key=lambda kv: -kv[1]))}


def trace_program(tag: str, fn, args, steps_per_call: int, calls: int = 3):
    trace_dir = f"/tmp/trace_{tag}"
    shutil.rmtree(trace_dir, ignore_errors=True)
    t0 = time.perf_counter()
    fence(fn(*args))
    print(f"[{tag}] compiled/warm in {time.perf_counter()-t0:.1f}s", flush=True)
    # honest wall-clock alongside the trace
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    wall_ms = float(np.median(ts)) / steps_per_call * 1e3
    with jax.profiler.trace(trace_dir):
        for _ in range(calls):
            fence(fn(*args))
    agg = parse_trace(trace_dir, steps_per_call * calls)
    print(f"\n== {tag}: wall {wall_ms:.2f} ms/step, device-busy "
          f"{agg['total_ms_per_step']:.2f} ms/step ==")
    print(f"{'op':<28} {'category':<26} {'ms/step':>8} {'n':>4}")
    for key, cat, ms, n, text in agg["by_op"][:40]:
        print(f"{key:<28} {cat:<26} {ms:8.3f} {n:4d}  {text[:70]}")
    print("-- categories --")
    for cat, ms in agg["by_category"].items():
        print(f"  {cat:<30} {ms:8.3f}")
    report({"name": f"trace_{tag}", "wall_ms_per_step": round(wall_ms, 3),
            "device_ms_per_step": round(agg["total_ms_per_step"], 3),
            "by_category": {k: round(v, 3)
                            for k, v in agg["by_category"].items()},
            "top_ops": [
                {"op": key, "cat": cat, "ms": round(ms, 4), "n": n,
                 "text": text}
                for key, cat, ms, n, text in agg["by_op"][:40]]})
    return agg


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(key.normal(0, 1, s).astype(np.float32),
                                 jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    which = set(sys.argv[1:]) or {"unet", "decode", "pipeline"}

    if "unet" in which:
        from sd_tpu.models.unet_sd import UNetModel
        ctx = rnd(8, 77, 768)
        unet = UNetModel(in_channels=4, model_channels=320, out_channels=4,
                         num_res_blocks=2, attention_resolutions=(4, 2, 1),
                         channel_mult=(1, 2, 4, 4), num_heads=8,
                         context_dim=768, dtype=jnp.bfloat16)
        x = rnd(8, 64, 64, 4)
        t = jnp.full((8,), 500, jnp.int32)
        up = unet.init(rng, x, t, ctx)
        up = jax.device_put(jax.tree.map(
            lambda a: a.astype(jnp.bfloat16), up))

        @jax.jit
        def unet_loop(p, c):
            c, _ = jax.lax.scan(
                lambda c, _: (chain_into(c, unet.apply(p, c, t, ctx)), None),
                c, None, length=8)
            return c

        trace_program("unet_fwd_B8", unet_loop, (up, x), steps_per_call=8)

    if "decode" in which:
        from sd_tpu.models.autoencoder import AutoencoderKL
        vae = AutoencoderKL(embed_dim=4, ch=128, ch_mult=(1, 2, 4, 4),
                            num_res_blocks=2, resolution=512, z_channels=4,
                            dtype=jnp.bfloat16)
        vp = vae.init(rng, jnp.zeros((1, 512, 512, 3), jnp.bfloat16), rng)["params"]
        vp = jax.device_put(jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, vp))
        z = rnd(4, 64, 64, 4)

        @jax.jit
        def dec(vp, z):
            return vae.apply({"params": vp}, z, method=AutoencoderKL.decode)

        trace_program("decode_B4", dec, (vp, z), steps_per_call=1)

    if "pipeline" in which:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench
        pipeline, params, clip_cfg, lat = bench.build(smoke=False)
        ids = jnp.asarray(
            np.random.RandomState(0).randint(0, 49000, (4, 77)), jnp.int32)
        neg = jnp.asarray(
            np.random.RandomState(1).randint(0, 49000, (4, 77)), jnp.int32)
        jp = jax.jit(pipeline)
        trace_program("pipeline_B4", jp,
                      (*params, ids, neg, rng), steps_per_call=1, calls=2)


if __name__ == "__main__":
    main()
