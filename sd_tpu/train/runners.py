"""Config-driven training runners for the five capability configs.

The entry-point layer (reference L6/L5, SURVEY.md §1): what
`python DDPM/train.py`, `python VAE/autoencoder.py`, and
`python Diffusion/main.py` each hand-roll (reference: DDPM/train.py:13-149,
VAE/autoencoder.py:430-479, Diffusion/main.py:20-129) implemented once:
build models from the YAML config, set up the jitted train step (optionally
data-parallel over a mesh), run the host loop with metrics/checkpoint/sample
dumps, auto-resume from the latest checkpoint.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sd_tpu.core.config import instantiate_from_config, load_yaml
from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.diffusion.ddpm import DDPMProcess
from sd_tpu.losses.gan import GanLossConfig
from sd_tpu.models.discriminator import NLayerDiscriminator
from sd_tpu.train import lr_schedules
from sd_tpu.train.checkpoint import auto_resume, save_checkpoint
from sd_tpu.train.diffusion import (
    ddpm_optimizer,
    init_train_state,
    make_diffusion_train_step,
)
from sd_tpu.train.gan import (
    gan_adam,
    init_gan_state,
    make_kl_gan_train_step,
    make_vq_gan_train_step,
)
from sd_tpu.train.metrics import MetricsLogger, count_params, save_image_grid


def _resolve_lpips(lpips_fn, loss_cfg, mode: str, tag: str):
    """Perceptual-term resolution for the GAN trainers
    (reference loss: VAE/loss.py:78-102, vqvae/vqlpips.py:96-145).

    An explicitly-passed lpips_fn wins. Otherwise `loss.perceptual` in the
    config picks: auto (calibrated when torch VGG16 weights exist locally,
    else the fixed-seed random-VGG surrogate) / calibrated / random / none.
    """
    if lpips_fn is not None or loss_cfg.perceptual_weight <= 0:
        return lpips_fn
    from sd_tpu.models.lpips import make_lpips_fn

    fn = make_lpips_fn(mode=mode)
    if fn is not None:
        kind = "calibrated" if fn.calibrated else "random-VGG surrogate"
        print(f"[{tag}] perceptual loss: {kind} LPIPS "
              f"(weight={loss_cfg.perceptual_weight})")
    else:
        print(f"[{tag}] perceptual loss disabled (perceptual: none)")
    return fn


def _make_lr(train_cfg: dict):
    lr = train_cfg.get("lr", 1e-4)
    sched = train_cfg.get("lr_schedule")
    if sched is None:
        return lr
    if sched == "cosine":
        return lr_schedules.cosine_annealing(lr, train_cfg.get("total_steps", 10000))
    if isinstance(sched, dict):
        lam = lr_schedules.lambda_linear_schedule(**sched)
        return lambda step: lr * lam(step)
    raise ValueError(f"unknown lr_schedule {sched!r}")


def _build_loader(data_dir: str, cfg: dict, batch_size: int):
    from sd_tpu.data.datasets import (ClassCaptionDataset, CocoCaptionDataset,
                                      ImageFolderDataset)
    from sd_tpu.data.loader import DataLoader

    ann = cfg.get("annotation_file")
    size = cfg.get("train", {}).get("image_size", 256)
    dcfg = cfg.get("data", {})
    if ann:
        ds = CocoCaptionDataset(data_dir, ann, image_size=size)
    elif dcfg.get("sr"):
        # paired HR/LR batches for the SR trainer (sd_tpu.train.sr); the
        # degradation runs on host in the loader threads
        from sd_tpu.data.datasets import SRDataset

        sr = dcfg["sr"]
        ds = SRDataset(data_dir, image_size=size,
                       sf=int(sr.get("sf", 4)),
                       degradation=sr.get("degradation", "bicubic"))
    elif dcfg.get("captions") == "class":
        # caption-less class-labeled folders: synthesize prompts from the
        # class label so the text-conditioned path trains with CFG
        ds = ClassCaptionDataset(
            data_dir, image_size=size,
            label_from=dcfg.get("label_from", "filename_prefix"),
            template=dcfg.get("template", "a photo of a {}"))
    else:
        ds = ImageFolderDataset(data_dir, image_size=size)
    # Multi-host: each process loads its own disjoint slice of every epoch
    # (parallel/multihost.py); single-process this is rank 0 of 1.
    import jax as _jax

    return DataLoader(ds, batch_size=batch_size,
                      rank=_jax.process_index(), world=_jax.process_count())


def train_ddpm(config: dict | str, data_dir: str, out_dir: str = "runs/ddpm",
               max_steps: int | None = None) -> Any:
    """Capability #1: unconditional pixel-space DDPM training."""
    cfg = load_yaml(config) if isinstance(config, str) else config
    tc = cfg["train"]
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    model = instantiate_from_config(cfg["model"])
    # process-only keys must not reach the schedule constructor
    diff_cfg = dict(cfg.get("diffusion", {}))
    min_snr = diff_cfg.pop("min_snr_gamma", None)
    sched = DiffusionSchedule.create(**diff_cfg)
    # the config's parameterization must reach the process (training target
    # + sampler conversions), not only the schedule's lvlb weights
    process = DDPMProcess(
        sched, clip_denoised=True,
        parameterization=diff_cfg.get("parameterization", "eps"),
        min_snr_gamma=min_snr,
    )

    size = tc.get("image_size", 256)
    dummy = jnp.zeros((1, size, size, model.out_channels))
    opt = ddpm_optimizer(_make_lr(tc), tc.get("grad_clip", 1.0))

    def fresh_state():
        # thunk: eval_shape-traced on resume (see auto_resume docstring)
        params = model.init(rng, dummy, jnp.zeros((1,), jnp.int32))["params"]
        return init_train_state(params, opt, tc.get("ema_decay", 0.9999))

    state, start = auto_resume(os.path.join(out_dir, "ckpt"), fresh_state)
    print(f"[ddpm] params: {count_params(state.params)/1e6:.1f}M")

    def loss_fn(p, batch, rng, logvar):
        model_fn = lambda x, t, c: model.apply(
            {"params": p}, x, t, deterministic=False,
            rngs={"dropout": jax.random.fold_in(rng, 1)},
        )
        x = batch["image"]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (x.shape[0],), 0, sched.num_timesteps)
        from sd_tpu.diffusion.ddpm import draw_training_noise

        noise = draw_training_noise(rng_n, x.shape,
                                    tc.get("noise_offset", 0.0))
        return process.p_losses(model_fn, x, t, noise, learned_logvar=logvar)

    step_fn, state = _maybe_parallel_step(
        cfg, loss_fn, opt, state, grad_accum=tc.get("grad_accum", 1))

    def sample_with_ema(st, r):
        # the reference samples under ema_scope (ldm/diffusion/ddpm.py:247-265)
        p = ema_eval_params(st)
        return process.p_sample_loop(
            lambda x, t, c: model.apply({"params": p}, x, t),
            r, (cfg.get("sample", {}).get("num_images", 4), size, size,
                model.out_channels))

    state = _run_loop(step_fn, state, cfg, data_dir, out_dir, rng, start,
              max_steps=max_steps,
              batch_transform=lambda b: {"image": jnp.asarray(b["image"])},
              sampler=sample_with_ema)
    return state


def train_kl_vae(config: dict | str, data_dir: str, out_dir: str = "runs/klvae",
                 max_steps: int | None = None, lpips_fn=None) -> Any:
    """Capability #3: KL-VAE with LPIPS+KL+PatchGAN loss."""
    cfg = load_yaml(config) if isinstance(config, str) else config
    tc = cfg["train"]
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    # same mixed-precision policy as train_ldm: bf16 param storage and
    # generator compute, fp32 Adam moments (train/diffusion.py docstrings)
    param_dtype = tc.get("param_dtype")
    if param_dtype is not None:
        param_dtype = jnp.dtype(param_dtype)
        cfg["model"].setdefault("params", {}).setdefault(
            "dtype", param_dtype.name)  # str: keeps cfg YAML-dumpable

    vae = instantiate_from_config(cfg["model"])
    disc = NLayerDiscriminator(**cfg.get("discriminator", {}))
    loss_kwargs = dict(cfg.get("loss", {}))
    lpips_mode = loss_kwargs.pop("perceptual", "auto")
    loss_cfg = GanLossConfig(**loss_kwargs)
    lpips_fn = _resolve_lpips(lpips_fn, loss_cfg, lpips_mode, "kl-vae")
    if lpips_fn is None and loss_cfg.perceptual_weight > 0:
        loss_cfg = GanLossConfig(**{**loss_kwargs, "perceptual_weight": 0.0})

    size = tc.get("image_size", 256)
    dummy = jnp.zeros((1, size, size, 3))

    opt_g = gan_adam(tc.get("lr", 4.5e-6))
    opt_d = gan_adam(tc.get("lr", 4.5e-6))
    if param_dtype is not None and param_dtype != jnp.float32:
        from sd_tpu.train.diffusion import float32_moments

        opt_g, opt_d = float32_moments(opt_g), float32_moments(opt_d)

    def fresh_state():
        # inside the thunk so a resume never materializes these on device
        # (auto_resume traces this with eval_shape) and the fresh path
        # leaves no init arrays alive in this frame for the whole run
        vparams = vae.init(rng, dummy, rng)["params"]
        dvars = disc.init(rng, dummy)
        return init_gan_state(vparams, dvars, opt_g, opt_d,
                              param_dtype=param_dtype)

    state, start = auto_resume(os.path.join(out_dir, "ckpt"), fresh_state)
    print(f"[kl-vae] params: "
          f"{count_params(state.params_g['model'])/1e6:.1f}M")

    ae_apply = lambda p, x, r: vae.apply({"params": p}, x, r)
    step_fn, state = _maybe_parallel_gan_step(
        cfg,
        lambda jit: make_kl_gan_train_step(ae_apply, disc, lpips_fn, opt_g,
                                           opt_d, loss_cfg, jit=jit),
        state)
    state = _run_loop(step_fn, state, cfg, data_dir, out_dir, rng, start,
              max_steps=max_steps,
              sampler=_recon_eval_sampler(
                  cfg, data_dir,
                  lambda st, x, r: vae.apply(
                      {"params": st.params_g["model"]}, x, r)[0]))
    return state


def train_vq(config: dict | str, data_dir: str, out_dir: str = "runs/vq",
             max_steps: int | None = None, lpips_fn=None) -> Any:
    """Capability #4: VQ-VAE with VQ-LPIPS-GAN loss.

    Supports all three quantizer families via model.params.quantizer_type:
    "vq" (argmin codebook), "gumbel" (GumbelQuantize with annealed
    temperature — reference ldm/tamming/quantize.py:110-210), and "ema"
    (EMA codebook updated as non-gradient state — reference :331-446).
    """
    from sd_tpu.train.gan import gumbel_temp_schedule

    cfg = load_yaml(config) if isinstance(config, str) else config
    tc = cfg["train"]
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    # same mixed-precision policy as train_ldm/train_kl_vae
    param_dtype = tc.get("param_dtype")
    if param_dtype is not None:
        param_dtype = jnp.dtype(param_dtype)
        cfg["model"].setdefault("params", {}).setdefault(
            "dtype", param_dtype.name)  # str: keeps cfg YAML-dumpable

    vq = instantiate_from_config(cfg["model"])
    disc = NLayerDiscriminator(**cfg.get("discriminator", {}))
    loss_kwargs = dict(cfg.get("loss", {}))
    lpips_mode = loss_kwargs.pop("perceptual", "auto")
    loss_cfg = GanLossConfig(**loss_kwargs)
    lpips_fn = _resolve_lpips(lpips_fn, loss_cfg, lpips_mode, "vq")
    if lpips_fn is None and loss_cfg.perceptual_weight > 0:
        loss_kwargs["perceptual_weight"] = 0.0
        loss_cfg = GanLossConfig(**loss_kwargs)

    size = tc.get("image_size", 256)
    dummy = jnp.zeros((1, size, size, 3))

    opt_g = gan_adam(tc.get("lr", 4.5e-6))
    opt_d = gan_adam(tc.get("lr", 4.5e-6))
    if param_dtype is not None and param_dtype != jnp.float32:
        from sd_tpu.train.diffusion import float32_moments

        opt_g, opt_d = float32_moments(opt_g), float32_moments(opt_d)

    def fresh_state():
        # thunk: eval_shape-traced on resume (see auto_resume docstring)
        variables = vq.init(rng, dummy)
        vparams = variables["params"]
        mstate = {k: v for k, v in variables.items() if k != "params"}
        dvars = disc.init(rng, dummy)
        return init_gan_state(vparams, dvars, opt_g, opt_d,
                              model_state=mstate, param_dtype=param_dtype)

    state, start = auto_resume(os.path.join(out_dir, "ckpt"), fresh_state)
    print(f"[vq] params: {count_params(state.params_g['model'])/1e6:.1f}M")

    qt = getattr(vq, "quantizer_type", "vq")
    if qt in ("gumbel", "ema"):
        def vq_apply(p, ms, x, rng, temp, update):
            vs = {"params": p, **ms}
            rng, drop_rng = jax.random.split(rng)
            kw = dict(rng=rng, temp=temp, deterministic=False,
                      rngs={"dropout": drop_rng})
            if update and "codebook" in ms:
                out, mut = vq.apply(vs, x, update=True, mutable=["codebook"],
                                    **kw)
                return (*out, {**ms, "codebook": mut["codebook"]})
            out = vq.apply(vs, x, update=False, **kw)
            return (*out, ms)

        temp_fn = None
        if qt == "gumbel":
            temp_fn = gumbel_temp_schedule(
                temp_init=getattr(vq, "temp_init", 1.0),
                **cfg.get("gumbel_schedule", {}))
        build_step = lambda jit: make_vq_gan_train_step(
            vq_apply, disc, lpips_fn, opt_g, opt_d, loss_cfg, stateful=True,
            temp_fn=temp_fn, jit=jit)
    else:
        vq_apply = lambda p, x: vq.apply({"params": p}, x)
        build_step = lambda jit: make_vq_gan_train_step(
            vq_apply, disc, lpips_fn, opt_g, opt_d, loss_cfg, jit=jit)
    step_fn, state = _maybe_parallel_gan_step(cfg, build_step, state)

    if qt in ("gumbel", "ema"):
        def _recon(st, x, r):
            vs = {"params": st.params_g["model"], **st.model_state}
            return vq.apply(vs, x, update=False, rng=r,
                            temp=getattr(vq, "temp_init", 1.0),
                            deterministic=True)[0]
    else:
        _recon = lambda st, x, r: vq.apply(
            {"params": st.params_g["model"]}, x)[0]
    state = _run_loop(step_fn, state, cfg, data_dir, out_dir, rng, start,
              max_steps=max_steps,
              sampler=_recon_eval_sampler(cfg, data_dir, _recon))
    return state


def _build_first_stage(fs_cfg: dict, rng: jax.Array, pix: int):
    """Instantiate + init the frozen first stage from its config block,
    optionally restoring trained weights from a `ckpt` run directory.
    Returns (vae, vparams, encode_fn, decode_fn) — the encode/decode
    closures implement the reference's first-stage contracts (KL-VAE
    posterior sampling vs the VQModelInterface pre-quant/quantize-on-decode
    pair, vqvae/autoencoder.py:435-468). Shared by the text-to-image LDM
    (build_ldm) and the SR LDM (sd_tpu.train.sr)."""
    from sd_tpu.models.autoencoder import AutoencoderKL, VQModel

    vae = instantiate_from_config(fs_cfg)
    is_vq = isinstance(vae, VQModel)
    if is_vq:
        vparams = vae.init(rng, jnp.zeros((1, pix, pix, 3)))["params"]
    else:
        vparams = vae.init(rng, jnp.zeros((1, pix, pix, 3)), rng)["params"]
    fs_ckpt = fs_cfg.get("ckpt")
    if fs_ckpt:
        # load a TRAINED first stage from a KL-VAE GAN checkpoint dir
        # (reference: instantiate_first_stage + init_from_ckpt,
        # ldm/diffusion/ddpm.py:269-293 — torch ckpt path there)
        from sd_tpu.train.checkpoint import restore_pytree

        restored = restore_pytree(fs_ckpt)
        loaded = (restored["params_g"]["model"]
                  if isinstance(restored, dict) and "params_g" in restored
                  else restored)
        # structure AND shape check against the freshly-initialized tree —
        # a same-structure checkpoint from a different-width VAE must fail
        # here with a readable error, not later inside apply
        def _check_leaf(a, b):
            if tuple(a.shape) != tuple(b.shape):
                raise ValueError(
                    f"first-stage ckpt leaf shape {tuple(b.shape)} != "
                    f"model shape {tuple(a.shape)} — wrong checkpoint for "
                    f"this first_stage config?")

        jax.tree.map(_check_leaf, vparams, loaded)
        vparams = loaded
        print(f"[ldm] first stage loaded from {fs_ckpt}")
    encode_fn = (
        (lambda x, r: vae.apply(
            {"params": vparams}, x, method=VQModel.encode_pre_quant))
        if is_vq else
        (lambda x, r: vae.apply(
            {"params": vparams}, x, method=AutoencoderKL.encode
        ).sample(r)))
    decode_fn = (
        (lambda z: vae.apply(
            {"params": vparams}, z, method=VQModel.decode_with_quantize))
        if is_vq else
        (lambda z: vae.apply(
            {"params": vparams}, z, method=AutoencoderKL.decode)))
    return vae, vparams, encode_fn, decode_fn


def first_stage_factor(fs_cfg: dict) -> int:
    """pixel/latent downsampling factor implied by the first-stage config:
    2^(len(ch_mult)-1)."""
    return 2 ** (len(fs_cfg["params"].get("ch_mult", [1, 2, 4, 4])) - 1)


def build_ldm(cfg: dict, rng: jax.Array, param_dtype=None):
    """Assemble the text-to-image LatentDiffusion stack from config.
    Returns (ld, unet, unet_params, vae, vae_params, clip).

    `param_dtype` (e.g. jnp.bfloat16) initializes the UNet params directly
    in that dtype inside one jitted call, so no full-precision copy of an
    859M-param UNet is ever materialized in HBM (the fp32 init + cast
    two-step would transiently hold both)."""
    from sd_tpu.diffusion.latent import LatentDiffusion
    from sd_tpu.models.clip_text import ClipTextConfig, FrozenClipTextEmbedder

    lat = cfg["latent"]
    unet = instantiate_from_config(cfg["unet"])
    clip_cfg = ClipTextConfig(**cfg.get("cond_stage", {}).get("params", {}) or {})
    clip = FrozenClipTextEmbedder(cfg=clip_cfg)

    size, ch = lat["image_size"], lat["channels"]
    r1, r2 = jax.random.split(rng)
    pix = size * first_stage_factor(cfg["first_stage"])
    vae, vparams, encode_fn, decode_fn = _build_first_stage(
        cfg["first_stage"], r1, pix)
    # the UNet may take more than the latent channels (inpainting models
    # concat the mask + masked-image latent: in_channels = 2·z + 1)
    want_in = cfg["unet"].get("params", {}).get("in_channels", ch)

    def _init_unet(r):
        from sd_tpu.train.diffusion import cast_floating

        p = unet.init(
            r, jnp.zeros((1, size, size, want_in)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, clip_cfg.max_length, clip_cfg.hidden_size)),
        )["params"]
        return cast_floating(p, param_dtype)

    uparams = jax.jit(_init_unet)(r2)

    diff_cfg = dict(cfg.get("diffusion", {}))
    min_snr = diff_cfg.pop("min_snr_gamma", None)
    if diff_cfg.pop("type", "ddpm") == "flow":
        # rectified-flow objective (diffusion/flow.py, arXiv:2403.03206) —
        # same trainers, velocity target, ODE sampling (sampler="flow")
        from sd_tpu.diffusion.flow import FlowProcess, FlowSchedule

        process = FlowProcess(
            FlowSchedule(num_timesteps=diff_cfg.get("timesteps", 1000),
                         shift=float(diff_cfg.get("shift", 1.0))),
            timestep_density=diff_cfg.get("timestep_density", "uniform"),
            logit_mean=float(diff_cfg.get("logit_mean", 0.0)),
            logit_std=float(diff_cfg.get("logit_std", 1.0)),
        )
    else:
        sched = DiffusionSchedule.create(**diff_cfg)
        process = DDPMProcess(
            sched, clip_denoised=False,
            parameterization=diff_cfg.get("parameterization", "eps"),
            min_snr_gamma=min_snr,
        )
    from sd_tpu.diffusion.sag import make_probs_apply

    ld = LatentDiffusion(
        process=process,
        unet_apply=lambda p, x, t, ctx, y=None: unet.apply(
            {"params": p}, x, t, ctx, y
        ),
        unet_apply_probs=(make_probs_apply(unet)
                          if getattr(unet, "use_spatial_transformer", False)
                          else None),
        encode_fn=encode_fn,
        decode_fn=decode_fn,
        cond_fn=None,
        conditioning_key=lat.get("conditioning_key", "crossattn"),
        # "auto" = std-rescale on the first batch, resolved in train_ldm
        # (reference scale_by_std, ldm/diffusion/ddpm.py:621-660)
        scale_factor=(1.0 if lat.get("scale_factor") == "auto"
                      else lat.get("scale_factor", 0.18215)),
    )
    return ld, unet, uparams, vae, vparams, clip


def train_ldm(config: dict | str, data_dir: str, out_dir: str = "runs/ldm",
              max_steps: int | None = None) -> Any:
    """Capability #5: text-conditioned latent diffusion training.

    cond_stage.trainable=true fine-tunes the text encoder jointly with the
    UNet — the reference's cond_stage_trainable path, where
    configure_optimizers adds cond_stage_model.parameters() to the AdamW
    param list (reference: ldm/diffusion/ddpm.py:1942-1972). Tokenization
    stays on host; the text tower runs inside the jitted loss so its
    gradients flow.
    """
    import dataclasses as _dc

    cfg = load_yaml(config) if isinstance(config, str) else config
    tc = cfg["train"]
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    # Mixed-precision memory policy (train.param_dtype: bfloat16): params
    # and compute in bf16, Adam moments and the EMA shadow in fp32 — the
    # production shape that fits the 859M-param SD UNet's full training
    # state on one 16 GB chip (BASELINE.md round-1 probe: 236 ms/step,
    # loss matches fp32 params to 3 decimals). The reference's analog is
    # Lightning's precision="16-mixed" (Diffusion/main.py:118-123).
    param_dtype = tc.get("param_dtype")
    if param_dtype is not None:
        param_dtype = jnp.dtype(param_dtype)
        # compute dtype follows the storage dtype unless the config pins one
        cfg["unet"].setdefault("params", {}).setdefault(
            "dtype", param_dtype.name)  # str: keeps cfg YAML-dumpable

    ld, unet, uparams, vae, vparams, clip = build_ldm(
        cfg, rng, param_dtype=param_dtype)
    print(f"[ldm] unet params: {count_params(uparams)/1e6:.1f}M"
          + (f" ({jnp.dtype(param_dtype).name})" if param_dtype else ""))

    if tc.get("noise_offset"):
        ld = _dc.replace(ld, noise_offset=float(tc["noise_offset"]))

    if cfg["latent"].get("scale_factor") == "auto":
        # std-rescaling: set scale_factor to 1/std of the first encoded
        # batch (reference scale_by_std / on_train_batch_start,
        # ldm/diffusion/ddpm.py:621-660)
        from sd_tpu.diffusion.latent import calibrate_scale_factor

        z = ld.encode_fn(_peek_batch(cfg, data_dir), jax.random.PRNGKey(0))
        ld = _dc.replace(ld, scale_factor=calibrate_scale_factor(z))
        print(f"[ldm] scale_factor (std-rescale): {ld.scale_factor:.4f}")
        # persist for sampling-time reconstruction (scripts/sample.py reads
        # this when the config says "auto")
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "calibration.json"), "w") as f:
            json.dump({"scale_factor": float(ld.scale_factor)}, f)

    cond_trainable = bool(
        cfg.get("cond_stage", {}).get("trainable",
                                      tc.get("cond_stage_trainable", False)))

    # classifier-free-guidance training: replace the caption with the empty
    # prompt at rate `train.cond_dropout` so the model also learns the
    # unconditional distribution CFG extrapolates from (the SD recipe's 10%
    # ucg; the reference stack never trains CFG — COMPAT.md)
    cond_dropout = float(tc.get("cond_dropout", 0.0))
    _cd_rng = np.random.default_rng((cfg.get("seed", 0), 0xCFD))

    def _drop_texts(texts):
        if cond_dropout <= 0.0:
            return list(texts)
        return ["" if _cd_rng.random() < cond_dropout else t for t in texts]

    opt = ddpm_optimizer(_make_lr(tc), tc.get("grad_clip", 1.0),
                         weight_decay=tc.get("weight_decay", 0.0))
    if param_dtype is not None and param_dtype != jnp.float32:
        from sd_tpu.train.diffusion import float32_moments

        opt = float32_moments(opt)
    learn_logvar = tc.get("learn_logvar", False)

    lora_cfg = cfg.get("lora")
    cn_cfg = cfg.get("controlnet")
    ip_cfg = cfg.get("ip_adapter")
    if sum(map(bool, (lora_cfg, cn_cfg, ip_cfg))) > 1:
        raise ValueError("lora / controlnet / ip_adapter training are "
                         "mutually exclusive")
    if cn_cfg:
        # ControlNet training (arXiv:2302.05543, beyond-reference): the
        # base UNet/VAE/CLIP are frozen closure constants; the optimizer/
        # EMA/checkpoint state is the control branch only. The branch's
        # encoder initialises from the (trained) base UNet encoder; zero
        # convs make step 0 an exact no-op of the base model.
        if cond_trainable:
            raise ValueError("controlnet and cond_stage.trainable are "
                             "exclusive")
        from sd_tpu.data.hints import HINT_FNS
        from sd_tpu.models.controlnet import (
            controlled_apply_fn,
            controlnet_from_unet_config,
            init_controlnet_from_unet,
        )

        if cn_cfg.get("base_run"):
            # the paper's setup (arXiv:2302.05543 §3.2): control a TRAINED
            # base model — load the base UNet's EMA weights from a prior
            # training run (scripts/train.py output dir or its ckpt)
            from sd_tpu.train.checkpoint import restore_pytree

            base_dir = cn_cfg["base_run"]
            if os.path.isdir(os.path.join(base_dir, "ckpt")):
                base_dir = os.path.join(base_dir, "ckpt")
            tree = restore_pytree(base_dir)
            ema_t = tree.get("ema")
            loaded = (ema_t["shadow"] if isinstance(ema_t, dict)
                      and ema_t.get("shadow") is not None
                      else tree["params"])
            uparams = jax.tree.map(lambda s, p: jnp.asarray(s, p.dtype),
                                   loaded, uparams)
            ld = apply_calibration(ld, cfg, base_dir)
            print(f"[ldm] controlnet base UNet loaded from {base_dir} "
                  f"(scale_factor={ld.scale_factor:.4f})")

        hint_fn = HINT_FNS[cn_cfg.get("hint", "canny")]
        f_vae = first_stage_factor(cfg["first_stage"])
        size, chl = cfg["latent"]["image_size"], cfg["latent"]["channels"]
        cn = controlnet_from_unet_config(
            cfg["unet"]["params"],
            hint_channels=int(cn_cfg.get("hint_channels", 3)),
            hint_downsamples=f_vae.bit_length() - 1)
        cn_params = cn.init(
            jax.random.PRNGKey(cfg.get("seed", 0) ^ 0xC077),
            jnp.zeros((1, size, size, chl)),
            jnp.zeros((1, size * f_vae, size * f_vae, cn.hint_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, clip.cfg.max_length, clip.cfg.hidden_size)),
        )["params"]
        cn_params = init_controlnet_from_unet(cn_params, uparams)
        print(f"[ldm] controlnet: {count_params(cn_params)/1e6:.1f}M "
              f"trainable params (base frozen: "
              f"{count_params(uparams)/1e6:.1f}M)")
        base_uparams = uparams
        ld = _dc.replace(ld, unet_apply=controlled_apply_fn(unet, cn))
        train_params = cn_params

        def loss_fn(p, batch, rng, logvar):
            return ld.training_loss(
                {"unet": base_uparams, "controlnet": p}, batch, rng,
                learned_logvar=logvar)

        def embed_batch(batch):
            out = {"image": jnp.asarray(batch["image"])}
            texts = _drop_texts(batch.get("txt_raw",
                                          [""] * len(batch["image"])))
            out["txt_emb"] = clip(texts)
            out["hint"] = jnp.asarray(hint_fn(np.asarray(batch["image"])))
            return out
    elif ip_cfg:
        # IP-Adapter training (arXiv:2308.06721, beyond-reference): base
        # UNet/VAE frozen; the optimizer/EMA/checkpoint state is the
        # adapter tree (projector + per-layer K/V). The image prompt during
        # training is the target image's own CLIP embedding (the paper's
        # recipe), randomly zeroed at `image_dropout` for CFG-style
        # image-free operation.
        if cond_trainable:
            raise ValueError("ip_adapter and cond_stage.trainable are "
                             "exclusive")
        from sd_tpu.models.conditioners import FrozenClipImageEmbedder
        from sd_tpu.models.ip_adapter import (
            count_ip_params,
            init_ip_adapter,
            ip_apply_fn,
        )

        if ip_cfg.get("base_run"):
            from sd_tpu.train.checkpoint import restore_pytree

            base_dir = ip_cfg["base_run"]
            if os.path.isdir(os.path.join(base_dir, "ckpt")):
                base_dir = os.path.join(base_dir, "ckpt")
            tree = restore_pytree(base_dir)
            ema_t = tree.get("ema")
            loaded = (ema_t["shadow"] if isinstance(ema_t, dict)
                      and ema_t.get("shadow") is not None
                      else tree["params"])
            uparams = jax.tree.map(lambda s, p: jnp.asarray(s, p.dtype),
                                   loaded, uparams)
            ld = apply_calibration(ld, cfg, base_dir)
            print(f"[ldm] ip_adapter base UNet loaded from {base_dir}")

        embedder = FrozenClipImageEmbedder()
        pix = cfg["train"].get("image_size", 256)
        emb_params = embedder.init(
            jax.random.PRNGKey(cfg.get("seed", 0) ^ 0x1BAD),
            jnp.zeros((1, pix, pix, 3)))["params"]
        # persist the frozen embedder so serving embeds identically
        # (pipeline.load_ip_adapter restores it by directory)
        from sd_tpu.train.checkpoint import save_checkpoint as _save_ckpt

        os.makedirs(out_dir, exist_ok=True)
        _save_ckpt(os.path.join(out_dir, "ip_embedder"), emb_params, 0,
                   max_to_keep=1)
        embed_image = jax.jit(
            lambda img: embedder.apply({"params": emb_params}, img))
        embed_dim = int(embed_image(jnp.zeros((1, pix, pix, 3))).shape[-1])

        base_uparams = uparams
        train_params = init_ip_adapter(
            uparams, jax.random.PRNGKey(cfg.get("seed", 0) ^ 0x1BAD1),
            embed_dim=embed_dim, n_tokens=int(ip_cfg.get("n_tokens", 4)))
        print(f"[ldm] ip_adapter: {count_ip_params(train_params)/1e6:.2f}M "
              f"trainable params over {len(train_params['layers'])} "
              f"cross-attn layers (base frozen: "
              f"{count_params(uparams)/1e6:.1f}M)")
        ld = _dc.replace(
            ld, unet_apply=ip_apply_fn(unet,
                                       float(ip_cfg.get("scale", 1.0))))
        img_dropout = float(ip_cfg.get("image_dropout", 0.05))
        _ip_rng = np.random.default_rng((cfg.get("seed", 0), 0x1BAD2))

        def loss_fn(p, batch, rng, logvar):
            return ld.training_loss({"unet": base_uparams, "ip": p},
                                    batch, rng, learned_logvar=logvar)

        def embed_batch(batch):
            out = {"image": jnp.asarray(batch["image"])}
            texts = _drop_texts(batch.get("txt_raw",
                                          [""] * len(batch["image"])))
            out["txt_emb"] = clip(texts)
            emb = embed_image(out["image"])
            if img_dropout > 0.0:
                keep = jnp.asarray(
                    _ip_rng.random(emb.shape[0]) >= img_dropout,
                    emb.dtype)[:, None]
                emb = emb * keep
            out["ip_embed"] = emb
            return out
    elif lora_cfg:
        # LoRA fine-tuning (arXiv:2106.09685, beyond-reference): the base
        # UNet is a frozen closure constant; the optimizer/EMA/checkpoint
        # state is the low-rank factor tree only. merge_lora inside the
        # jitted loss keeps the adapted weights differentiable w.r.t. the
        # factors and lets XLA fuse the rank-r matmuls into the step.
        if cond_trainable:
            raise ValueError("lora and cond_stage.trainable are exclusive")
        from sd_tpu.train.lora import (
            count_lora_params,
            init_lora,
            merge_lora,
        )

        l_scale = float(lora_cfg.get("scale", 1.0))
        base_uparams = uparams
        train_params = init_lora(
            uparams, int(lora_cfg.get("rank", 8)),
            jax.random.PRNGKey(cfg.get("seed", 0) ^ 0x10AA),
            lora_cfg.get("targets"))
        print(f"[ldm] lora: {count_lora_params(train_params)/1e3:.1f}K "
              f"trainable params over {len(train_params)} kernels "
              f"(base frozen: {count_params(uparams)/1e6:.1f}M)")

        def loss_fn(p, batch, rng, logvar):
            merged = merge_lora(base_uparams, p, l_scale)
            return ld.training_loss(merged, batch, rng,
                                    learned_logvar=logvar)

        def embed_batch(batch):
            out = {"image": jnp.asarray(batch["image"])}
            texts = _drop_texts(batch.get("txt_raw",
                                          [""] * len(batch["image"])))
            out["txt_emb"] = clip(texts)
            return out
    elif cond_trainable:
        # optimizer tree = {unet, cond}; note the EMA shadows BOTH subtrees
        # (the reference's LitEma wraps only the UNet — divergence recorded
        # in COMPAT.md; affects only eval-time conditioning during warm-up).
        train_params = {"unet": uparams, "cond": clip.params}
        ld = _dc.replace(
            ld,
            unet_apply=lambda p, x, t, ctx, y=None: unet.apply(
                {"params": p["unet"]}, x, t, ctx, y),
            cond_stage_trainable=True,
        )
        print(f"[ldm] cond-stage params in optimizer: "
              f"{count_params(clip.params)/1e6:.1f}M")

        def loss_fn(p, batch, rng, logvar):
            emb = clip.model.apply({"params": p["cond"]}, batch["txt_ids"])
            return ld.training_loss(
                p, {**batch, "txt_emb": emb}, rng, learned_logvar=logvar)

        def embed_batch(batch):
            texts = _drop_texts(batch.get("txt_raw",
                                          [""] * len(batch["image"])))
            ids = clip.tokenize(texts)
            return {"image": jnp.asarray(batch["image"]),
                    "txt_ids": jnp.asarray(ids)}
    else:
        train_params = uparams

        def loss_fn(p, batch, rng, logvar):
            return ld.training_loss(p, batch, rng, learned_logvar=logvar)

        def embed_batch(batch):
            out = {"image": jnp.asarray(batch["image"])}
            texts = _drop_texts(batch.get("txt_raw",
                                          [""] * len(batch["image"])))
            out["txt_emb"] = clip(texts)
            return out

    # rematerialization policy (train.remat: dots|nothing) — required at
    # the flagship shape: without it the 512²-pixel/64²-latent backward
    # pass holds every transformer activation (reference analog: the
    # CheckpointFunction gradient checkpointing, openai_model/utils.py:160)
    remat_policy = tc.get("remat")
    if remat_policy and remat_policy != "none":
        from sd_tpu.train.remat import remat_apply

        ld = _dc.replace(ld, unet_apply=remat_apply(ld.unet_apply,
                                                    remat_policy))

    def fresh_state():
        # thunk: on resume auto_resume eval_shape-traces this, so the fresh
        # Adam moments + EMA shadow (≈10 GB fp32 at the 859M flagship) are
        # never allocated next to the restored copy
        return init_train_state(
            train_params, opt, tc.get("ema_decay", 0.9999),
            num_timesteps=ld.schedule.num_timesteps,
            learn_logvar=learn_logvar, param_dtype=param_dtype,
        )

    state, start = auto_resume(os.path.join(out_dir, "ckpt"), fresh_state)
    # Free the init tree. On the fresh path it was DONATED into the state
    # inside init_train_state's jit; on RESUME it is still concrete — and
    # `del train_params` alone does NOT free it, because the thunk's
    # closure cell keeps the tree alive for the whole run. At the 859M
    # flagship that leaked bf16 tree is 1.7 GB on a chip with ~1.4 GB of
    # step headroom: fresh training fit, every resume OOM'd at the first
    # step (runs/sd512_catdog/train.log, 18:14/18:44 relaunches).
    del train_params, uparams, fresh_state

    step_fn, state = _maybe_parallel_step(cfg, loss_fn, opt, state,
                                          learn_logvar=learn_logvar,
                                          grad_accum=tc.get("grad_accum", 1))

    state = _run_loop(step_fn, state, cfg, data_dir, out_dir, rng, start,
              max_steps=max_steps, batch_transform=embed_batch)
    if lora_cfg:
        # distribution artifact alongside the resume ckpt (EMA factors)
        from sd_tpu.train.lora import save_lora_safetensors

        save_lora_safetensors(
            os.path.join(out_dir, "lora.safetensors"),
            ema_eval_params(state),
            metadata={"rank": str(lora_cfg.get("rank", 8)),
                      "scale": str(lora_cfg.get("scale", 1.0))})
    return state


def ema_eval_params(state):
    """EMA shadow weights cast to the param dtypes when EMA is tracked, else
    the raw params (the reference's ema_scope context)."""
    from sd_tpu.core.ema import ema_copy_to

    if getattr(state, "ema", None) is not None:
        return ema_copy_to(state.ema, state.params)
    return state.params


def _maybe_parallel_step(cfg, loss_fn, opt, state, **mk_kwargs):
    """Config-driven multi-chip training. A `parallel:` block routes the
    step through the mesh layer (docs/PARALLEL.md) instead of plain jit:

        parallel:
          mesh: {data: 4, model: 2}   # default: all devices on "data"
          state_sharding: zero1       # zero1 (default) | fsdp

    Returns (step_fn, state) with the state device_put to its sharding.
    The reference has no counterpart (single-GPU by construction,
    SURVEY.md §2.14); this is the config surface over the mesh layer."""
    pcfg = cfg.get("parallel")
    if not pcfg:
        return make_diffusion_train_step(loss_fn, opt, **mk_kwargs), state

    from sd_tpu.parallel.mesh import (
        TP_RULES_UNET,
        fsdp_state_sharding,
        make_mesh,
        make_parallel_train_step,
        zero_state_sharding,
    )

    mesh = _parallel_mesh(pcfg)
    raw = make_diffusion_train_step(loss_fn, opt, jit=False, **mk_kwargs)
    tp_rules = TP_RULES_UNET if "model" in mesh.axis_names else []
    mode = pcfg.get("state_sharding", "zero1")
    shard_fns = {"zero1": zero_state_sharding, "fsdp": fsdp_state_sharding}
    if mode not in shard_fns:
        raise ValueError(
            f"parallel.state_sharding={mode!r}: expected one of "
            f"{sorted(shard_fns)}")
    sh = shard_fns[mode](state, mesh, tp_rules=tp_rules)
    state = jax.device_put(state, sh)
    print(f"[parallel] mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"state_sharding={mode}")
    return make_parallel_train_step(raw, mesh, sh), state


def apply_calibration(ld, cfg, ckpt_dir):
    """Restore the std-rescaled scale factor persisted by train_ldm: when the
    config says `scale_factor: auto` and a calibration.json sits next to the
    checkpoint dir, return `ld` with that factor (reference scale_by_std
    keeps it inside the torch ckpt as a buffer, ldm/diffusion/ddpm.py:621).
    Missing file → warn and keep the current factor."""
    import dataclasses as _dc

    if not ckpt_dir or cfg["latent"].get("scale_factor") != "auto":
        return ld
    cal = os.path.join(os.path.dirname(str(ckpt_dir).rstrip("/")),
                       "calibration.json")
    if not os.path.exists(cal):
        print(f"[sample] WARNING: scale_factor=auto but {cal} missing; "
              f"using {ld.scale_factor} (decode will be mis-scaled)")
        return ld
    with open(cal) as f:
        sf = float(json.load(f)["scale_factor"])
    print(f"[sample] scale_factor from {cal}: {sf:.4f}")
    return _dc.replace(ld, scale_factor=sf)


def _parallel_mesh(pcfg):
    from sd_tpu.parallel.mesh import make_mesh

    axes = pcfg.get("mesh")
    if axes:
        # allow a mesh smaller than the host's device count (prefix slice)
        n = int(np.prod(list(axes.values())))
        return make_mesh(axes, devices=jax.devices()[:n])
    return make_mesh()


def _maybe_parallel_gan_step(cfg, build_step, state):
    """GAN-trainer analog of _maybe_parallel_step. `build_step(jit)` returns
    the (state, x, rng) -> (state, logs) GAN step, traced when jit=False.
    Same `parallel:` config block; state_sharding zero1 (default) | fsdp."""
    pcfg = cfg.get("parallel")
    if not pcfg:
        return build_step(True), state

    from sd_tpu.parallel.mesh import gan_state_sharding, make_parallel_train_step

    mesh = _parallel_mesh(pcfg)
    mode = pcfg.get("state_sharding", "zero1")
    sh = gan_state_sharding(state, mesh, mode=mode)
    state = jax.device_put(state, sh)
    print(f"[parallel] mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"state_sharding={mode} (gan)")
    return make_parallel_train_step(build_step(False), mesh, sh), state


def _peek_batch(cfg, data_dir):
    loader = _build_loader(data_dir, cfg, 4)
    for b in loader:
        return jnp.asarray(b["image"])
    raise RuntimeError("empty dataset")


def _recon_eval_sampler(cfg, data_dir, recon_fn):
    """Eval sampler for the autoencoder trainers: reconstruct a FIXED peek
    batch and return (recons, {psnr, ssim}) so _run_loop logs quality as a
    curve (eval_psnr/eval_ssim in metrics.jsonl), not just sample grids.
    The reference eyeballs reconstructions (VAE/test/test.py:200-267)."""
    from sd_tpu.train.metrics import psnr, ssim

    ref_holder = []

    def sampler(state, r):
        if not ref_holder:
            ref_holder.append(_peek_batch(cfg, data_dir))
        ref = ref_holder[0]
        out = recon_fn(state, ref, r)
        a = np.asarray(out, np.float32)
        b = np.asarray(ref, np.float32)
        return out, {"psnr": psnr(a, b), "ssim": ssim(a, b)}

    return sampler


def _run_loop(step_fn, state, cfg, data_dir, out_dir, rng, start_step,
              max_steps=None, sampler=None, batch_transform=None):
    """Host loop. `batch_transform` maps the host batch dict to the second
    argument of step_fn (default: the raw image array — the GAN-step shape)."""
    tc = cfg["train"]
    total = max_steps if max_steps is not None else tc.get("total_steps", 1000)
    ckpt_every = tc.get("checkpoint_every", 1000)
    eval_every = tc.get("eval_every", ckpt_every)
    logger = MetricsLogger(os.path.join(out_dir, "metrics.jsonl"))
    loader = _build_loader(data_dir, cfg, tc.get("batch_size", 4))
    if batch_transform is None:
        batch_transform = lambda batch: jnp.asarray(batch["image"])

    step = start_step
    while step < total:
        for batch in loader:
            if step >= total:
                break
            state, logs = step_fn(state, batch_transform(batch),
                                  jax.random.fold_in(rng, step))
            logger.log(step, logs)
            step += 1
            if step % ckpt_every == 0:
                save_checkpoint(os.path.join(out_dir, "ckpt"), state, step)
            if sampler is not None and step % eval_every == 0:
                eval_rng = jax.random.fold_in(jax.random.fold_in(rng, 0x5EED), step)
                imgs = sampler(state, eval_rng)
                # a sampler may return (images, eval_metrics) — e.g. the
                # autoencoder trainers log reconstruction PSNR/SSIM of the
                # fixed peek batch so quality is a curve, not an eyeball
                if isinstance(imgs, tuple):
                    imgs, eval_logs = imgs
                    logger.log(step, {f"eval_{k}": v
                                      for k, v in eval_logs.items()})
                save_image_grid(np.asarray(imgs),
                                os.path.join(out_dir, f"samples/step_{step}.png"))
    save_checkpoint(os.path.join(out_dir, "ckpt"), state, step)
    logger.close()
    return state
