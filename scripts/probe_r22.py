"""probe_r22 — the Pallas flash kernel UNDER shard_map on REAL TPU hardware.

Closes VERDICT r4 weak #7 (carried from r3 weak #6): `dryrun_multichip`
pins attention to XLA on the virtual CPU mesh, so until now the only
kernel-under-shard_map coverage was interpret-mode at toy shape. This
probe runs the REAL Mosaic-compiled flash kernel through the exact
`enable_sharded_attention` / `_shard_mapped_flash` TP routing on the live
chip, on a 1-device mesh with a "model" axis, at the SD-512² L0
self-attention shape (B=8 incl. CFG, S=4096, h=8, d=40, bf16).

Checks, recorded to PROBE_R22.jsonl:
  1. numerics: shard_map-wrapped kernel == direct kernel call (bitwise) and
     == XLA reference attention (within bf16 tolerance);
  2. timing: shard_map wrapper adds no measurable overhead vs the direct
     pallas_call (same program after partitioning — zero collectives).

Usage (on the TPU host, chip idle):  python scripts/probe_r22.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from sd_tpu.kernels.attention import (
    enable_sharded_attention,
    _shard_mapped_flash,
)
from sd_tpu.kernels.flash_attention import flash_attention


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def main() -> None:
    assert jax.default_backend() == "tpu", "this probe needs the real chip"
    B, S, H, D = 8, 4096, 8, 40  # SD-512² L0 self-attn (bench.py geometry)
    scale = D ** -0.5
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("model",))
    enable_sharded_attention(mesh, "model", interpret=False)

    direct = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale=scale))
    sharded = jax.jit(lambda q, k, v: _shard_mapped_flash(q, k, v, scale))

    def xla_ref(q, k, v):
        qf = q.astype(jnp.float32) * scale
        logits = jnp.einsum("bqhd,bkhd->bhqk", qf, k.astype(jnp.float32))
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)).astype(
            q.dtype)

    ref = jax.jit(xla_ref)

    t_direct, o_direct = timed(direct, q, k, v)
    t_shard, o_shard = timed(sharded, q, k, v)
    t_ref, o_ref = timed(ref, q, k, v)

    bitwise = bool(jnp.all(o_direct == o_shard))
    err = float(jnp.max(jnp.abs(o_shard.astype(jnp.float32)
                                - o_ref.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(o_ref.astype(jnp.float32))))

    rec = {
        "probe": "r22_flash_under_shard_map_real_chip",
        "shape": {"B": B, "S": S, "H": H, "D": D, "dtype": "bfloat16"},
        "mesh": {"model": 1},
        "ms_direct": round(t_direct, 4),
        "ms_shard_map": round(t_shard, 4),
        "ms_xla_ref": round(t_ref, 4),
        "shard_map_vs_direct_bitwise": bitwise,
        "max_abs_err_vs_xla": err,
        "max_rel_err_vs_xla": rel,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec))
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "PROBE_R22.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    assert bitwise, "shard_map routing changed kernel numerics"
    assert rel < 2e-2, f"kernel vs XLA rel err too large: {rel}"
    print("[probe_r22] OK — real-chip flash under shard_map matches "
          "direct kernel bitwise and XLA within bf16 tolerance")


if __name__ == "__main__":
    main()
