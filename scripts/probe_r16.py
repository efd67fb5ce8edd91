#!/usr/bin/env python
"""Round-2 probe #16: GAN step with the trace-time training flag (Pallas
convs → XLA inside training bodies). Expect ≈ PROBE_R14's 'off' arm (202 ms),
not the 271 ms 'on' arm.
"""

from __future__ import annotations

import json, os, sys, time
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_compilation"))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("PROBE_R16.jsonl", "a", buffering=1)


def report(name, ms, **extra):
    rec = {"name": name, "ms": round(ms, 3), **extra}
    print(json.dumps(rec), flush=True)
    OUT.write(json.dumps(rec) + "\n")


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = np.random.default_rng(0)
    rnd = lambda *s: jnp.asarray(key.normal(0, 1, s).astype(np.float32),
                                 jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    from sd_tpu.losses.gan import GanLossConfig
    from sd_tpu.models.autoencoder import AutoencoderKL
    from sd_tpu.models.discriminator import NLayerDiscriminator
    from sd_tpu.train.gan import gan_adam, init_gan_state, make_kl_gan_train_step

    vae256 = AutoencoderKL(embed_dim=4, ch=128, ch_mult=(1, 2, 4, 4),
                           num_res_blocks=2, resolution=256, z_channels=4,
                           dtype=jnp.bfloat16)
    disc = NLayerDiscriminator(ndf=64, n_layers=3, use_actnorm=False,
                               dtype=jnp.bfloat16)
    Bc = 8
    dummy = jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
    vparams = vae256.init(rng, dummy, rng)["params"]
    dvars = disc.init(rng, dummy)
    cfg = GanLossConfig(disc_start=0, disc_weight=0.5, kl_weight=1e-6,
                        perceptual_weight=0.0, disc_loss="hinge")
    opt_g, opt_d = gan_adam(4.5e-6), gan_adam(4.5e-6)
    state = init_gan_state(vparams, dvars, opt_g, opt_d)
    ae_apply = lambda p, xx, r: vae256.apply({"params": p}, xx, r)
    step = make_kl_gan_train_step(ae_apply, disc, None, opt_g, opt_d, cfg)
    xg = rnd(Bc, 256, 256, 3)
    r = jax.random.PRNGKey(1)
    try:
        t1 = time.perf_counter()
        state, logs = step(state, xg, r)
        float(logs["train/total_loss"])
        compile_s = time.perf_counter() - t1
        times = []
        for i in range(4):
            t1 = time.perf_counter()
            state, logs = step(state, xg, r)
            float(logs["train/total_loss"])
            times.append(time.perf_counter() - t1)
        ms = float(np.median(times)) * 1e3
        report("kl_gan_step_256_B8_trainflag", ms,
               compile_s=round(compile_s, 1),
               img_per_s=round(Bc / (ms / 1e3), 2))
    except Exception as e:
        report("kl_gan_step_256_B8_trainflag", -1.0, error=str(e)[:300])


if __name__ == "__main__":
    main()
