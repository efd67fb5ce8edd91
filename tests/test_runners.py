"""In-process runner smoke tests: each capability trains a few steps through
the Python API (the CLI wraps these; reference entry points SURVEY.md §3)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")
    return str(d)


def _load(cfg_name):
    from sd_tpu.core.config import load_yaml

    cfg = load_yaml(os.path.join("configs", cfg_name))
    cfg["train"]["total_steps"] = 2
    cfg["train"]["checkpoint_every"] = 2
    cfg["train"]["eval_every"] = 100  # skip sampling in the smoke run
    return cfg


def test_train_ddpm_runner(image_dir, tmp_path):
    from sd_tpu.train.runners import train_ddpm

    state = train_ddpm(_load("ddpm_smoke.yaml"), image_dir,
                       out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2
    assert os.path.exists(tmp_path / "run" / "metrics.jsonl")
    assert os.path.isdir(tmp_path / "run" / "ckpt")


def test_train_kl_vae_runner(image_dir, tmp_path):
    from sd_tpu.train.runners import train_kl_vae

    cfg = _load("kl_smoke.yaml")
    state = train_kl_vae(cfg, image_dir, out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2


def test_train_vq_runner(image_dir, tmp_path):
    from sd_tpu.train.runners import train_vq

    state = train_vq(_load("vq_smoke.yaml"), image_dir,
                     out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2


def test_train_vq_gumbel_runner(image_dir, tmp_path):
    """Gumbel-VQ end-to-end: the annealed-temperature stateful step runs and
    the codebook embedding receives gradient (reference:
    ldm/tamming/quantize.py:110-210)."""
    from sd_tpu.train.runners import train_vq

    cfg = _load("vq_smoke.yaml")
    cfg["model"]["params"]["quantizer_type"] = "gumbel"
    cfg["model"]["params"]["kl_weight"] = 1.0e-4
    cfg["gumbel_schedule"] = {"temp_min": 0.5, "anneal_rate": 1.0e-4}
    state = train_vq(cfg, image_dir, out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2
    assert "proj" in state.params_g["model"]["quantize"]


def test_train_vq_ema_runner(image_dir, tmp_path):
    """EMA-VQ end-to-end: the codebook lives in model_state and moves via the
    EMA update, not gradients (reference: ldm/tamming/quantize.py:331-446)."""
    import jax
    import jax.numpy as jnp

    from sd_tpu.train.runners import train_vq

    cfg = _load("vq_smoke.yaml")
    cfg["model"]["params"]["quantizer_type"] = "ema"
    state = train_vq(cfg, image_dir, out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2
    cb = state.model_state["codebook"]["quantize"]
    # cluster sizes accumulated -> codebook weight moved off its init
    assert float(jnp.sum(cb["cluster_size"])) > 0.0
    assert float(jnp.max(jnp.abs(cb["weight"] - cb["embed_avg"]))) > 0.0


def test_train_ldm_runner(image_dir, tmp_path):
    import json

    from sd_tpu.train.runners import train_ldm

    cfg = _load("sd_txt2img_smoke.yaml")
    # std-rescale path: calibrates on the first batch AND persists the
    # factor so scripts/sample.py can decode at the training-time scale
    # (reference scale_by_std keeps it as a ckpt buffer)
    cfg["latent"]["scale_factor"] = "auto"
    state = train_ldm(cfg, image_dir, out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2
    with open(tmp_path / "run" / "calibration.json") as f:
        cal = json.load(f)
    assert 0.01 < cal["scale_factor"] < 100.0


def test_train_ldm_vq_first_stage(image_dir, tmp_path):
    """LDM over a VQ first stage — the reference's VQModelInterface contract:
    latents diffuse in the continuous pre-quant space, decode quantizes
    (Diffusion/ddpm.py:25-32 imports VQModelInterface;
    vqvae/autoencoder.py:435-468)."""
    import jax
    import jax.numpy as jnp

    from sd_tpu.train.runners import build_ldm, train_ldm

    cfg = _load("sd_txt2img_smoke.yaml")
    cfg["first_stage"] = {
        "target": "sd_tpu.models.autoencoder.VQModel",
        "params": {
            "n_embed": 32, "embed_dim": 4, "ch": 16, "ch_mult": [1, 2, 4],
            "num_res_blocks": 1, "attn_resolutions": [], "resolution": 32,
            "z_channels": 4,
        },
    }
    state = train_ldm(cfg, image_dir, out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2

    # sampling decodes through quantize-on-decode (VQModelInterface.decode
    # with force_not_quantize=False)
    ld, unet, uparams, vae, vparams, clip = build_ldm(
        cfg, jax.random.PRNGKey(0))
    c = clip(["a cat"])
    img = ld.sample(uparams, jax.random.PRNGKey(1), (1, 8, 8, 4),
                    cond={"c_crossattn": [c]}, num_steps=2)
    assert img.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(img).all())

    # the latent really is the pre-quant continuous encoding: encode_fn must
    # NOT equal the quantized codebook entries for a random image
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3)) * 2 - 1
    z = ld.encode_fn(x, jax.random.PRNGKey(3))
    zq, _, _ = vae.apply({"params": vparams}, x, method=type(vae).encode)
    assert float(jnp.abs(z - zq).max()) > 1e-4


def test_train_ldm_first_stage_from_ckpt(image_dir, tmp_path):
    """LDM over a TRAINED first stage restored from a KL-VAE GAN checkpoint
    dir — the exact path the flagship run takes (configs/sd512_catdog.yaml
    first_stage.ckpt; reference: instantiate_first_stage + init_from_ckpt,
    ldm/diffusion/ddpm.py:269-293). Asserts the restored weights actually
    flow into the frozen first stage, not a fresh init."""
    import jax
    import numpy as np

    from sd_tpu.train.checkpoint import restore_pytree
    from sd_tpu.train.runners import build_ldm, train_kl_vae, train_ldm

    kl_cfg = _load("kl_smoke.yaml")
    kl_out = str(tmp_path / "kl")
    train_kl_vae(kl_cfg, image_dir, out_dir=kl_out)

    cfg = _load("sd_txt2img_smoke.yaml")
    cfg["first_stage"] = {
        "target": "sd_tpu.models.autoencoder.AutoencoderKL",
        "ckpt": os.path.join(kl_out, "ckpt"),
        "params": dict(kl_cfg["model"]["params"]),
    }
    cfg["latent"]["image_size"] = 16  # 32 px / f2 (kl_smoke is ch_mult [1,2])
    state = train_ldm(cfg, image_dir, out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2

    _, _, _, _, vparams, _ = build_ldm(cfg, jax.random.PRNGKey(0))
    trained = restore_pytree(os.path.join(kl_out, "ckpt"))
    np.testing.assert_allclose(
        np.asarray(vparams["quant_conv"]["kernel"]),
        np.asarray(trained["params_g"]["model"]["quant_conv"]["kernel"]))


def test_train_ldm_cond_stage_trainable(image_dir, tmp_path):
    """cond_stage.trainable=true puts the text tower in the optimizer and its
    params actually move (reference: ldm/diffusion/ddpm.py:1942-1972)."""
    import jax

    from sd_tpu.train.runners import train_ldm

    cfg = _load("sd_txt2img_smoke.yaml")
    cfg["cond_stage"]["trainable"] = True
    cfg["train"]["lr"] = 1e-2
    # zero-init cascade: the UNet out conv AND SpatialTransformer proj_out
    # start at zero, so d(loss)/d(context) is exactly 0 until step 3 — run 4
    # steps so the text tower provably receives gradient.
    cfg["train"]["total_steps"] = 4
    cfg["train"]["checkpoint_every"] = 4
    state = train_ldm(cfg, image_dir, out_dir=str(tmp_path / "run"))
    assert int(state.step) == 4
    assert set(state.params.keys()) == {"unet", "cond"}

    # fresh init of the same config gives the starting cond params; after two
    # steps at lr=1e-2 they must differ
    from sd_tpu.models.clip_text import ClipTextConfig, FrozenClipTextEmbedder

    clip0 = FrozenClipTextEmbedder(
        cfg=ClipTextConfig(**cfg["cond_stage"]["params"]))
    moved = jax.tree.map(
        lambda a, b: float(abs(a - b).max()), state.params["cond"],
        clip0.params)
    assert max(jax.tree.leaves(moved)) > 1e-6


def test_train_ddpm_runner_parallel(image_dir, tmp_path):
    """`parallel:` config block: the DDPM runner trains dp4+FSDP on the
    virtual mesh through the same loop as single-chip, and the params are
    actually sharded on device."""
    import jax

    from sd_tpu.train.runners import train_ddpm

    cfg = _load("ddpm_smoke.yaml")
    cfg["train"]["batch_size"] = 4
    cfg["parallel"] = {"mesh": {"data": 4}, "state_sharding": "fsdp"}
    state = train_ddpm(cfg, image_dir, out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2
    leaves = jax.tree.leaves(state.params)
    assert any(
        len(l.sharding.device_set) == 4
        and l.addressable_shards[0].data.size < l.size
        for l in leaves
    )
    assert os.path.exists(tmp_path / "run" / "metrics.jsonl")


def test_train_kl_vae_runner_parallel(image_dir, tmp_path):
    """`parallel:` block on the GAN trainer: dp4+FSDP KL-VAE step runs on the
    virtual mesh with generator AND discriminator params sharded."""
    import jax

    from sd_tpu.train.runners import train_kl_vae

    cfg = _load("kl_smoke.yaml")
    cfg["train"]["batch_size"] = 4
    cfg["parallel"] = {"mesh": {"data": 4}, "state_sharding": "fsdp"}
    state = train_kl_vae(cfg, image_dir, out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2

    def frac_sharded(tree):
        leaves = jax.tree.leaves(tree)
        return sum(l.addressable_shards[0].data.size < l.size
                   for l in leaves) / len(leaves)

    assert frac_sharded(state.params_g["model"]) > 0.3
    assert frac_sharded(state.params_d) > 0.3


def test_ldm_runner_v_parameterization(image_dir, tmp_path):
    """The config's diffusion.parameterization must reach DDPMProcess (the
    training target + every sampler conversion), not only the schedule's
    lvlb weights — a "v" run trains on the v target end-to-end."""
    import jax
    import numpy as np

    from sd_tpu.train.runners import build_ldm, train_ldm

    cfg = _load("sd_txt2img_smoke.yaml")
    cfg["diffusion"]["parameterization"] = "v"
    state = train_ldm(cfg, image_dir, out_dir=str(tmp_path / "run"))
    assert int(state.step) == 2

    ld, unet, uparams, vae, vparams, clip = build_ldm(
        cfg, jax.random.PRNGKey(0))
    assert ld.process.parameterization == "v"
    c = clip(["a dog"])
    for sampler in ("ddim", "plms", "dpm"):
        img = ld.sample(uparams, jax.random.PRNGKey(1), (1, 8, 8, 4),
                        cond={"c_crossattn": [c]}, num_steps=2,
                        sampler=sampler)
        assert np.isfinite(np.asarray(img)).all(), sampler


def test_pipeline_from_run(image_dir, tmp_path):
    """Deploy path: a scripts/train.py run directory loads straight into the
    serving pipeline — EMA UNet weights, configured first stage, and the
    persisted scale-factor calibration."""
    import json
    import os

    import numpy as np
    import yaml

    from sd_tpu.pipeline import Text2ImagePipeline
    from sd_tpu.train.runners import train_ldm

    cfg = _load("sd_txt2img_smoke.yaml")
    cfg["latent"]["scale_factor"] = "auto"
    run_dir = str(tmp_path / "run")
    train_ldm(cfg, image_dir, out_dir=run_dir)

    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    pipe = Text2ImagePipeline.from_run(cfg_path, run_dir, param_dtype=None)

    with open(os.path.join(run_dir, "calibration.json")) as f:
        sf = json.load(f)["scale_factor"]
    assert abs(pipe.ld.scale_factor - sf) < 1e-6

    imgs = pipe.generate(["a cat"], num_steps=2, guidance_scale=1.0)
    assert imgs.shape[0] == 1 and imgs.dtype == np.uint8
