"""Latent diffusion core: conditioning dispatch, frozen first-stage/cond-stage
plumbing, scale factor, training loss, and sampling glue.

Capability parity with the reference's LatentDiffusion / DiffusionWrapper
(reference: ldm/diffusion/ddpm.py:607-2034, Diffusion/ddpm.py:34-1451),
re-designed functionally:

  * the reference's `DiffusionWrapper.forward` conditioning-mode dispatch
    (None/'concat'/'crossattn'/'hybrid'/'adm', ldm/diffusion/ddpm.py:2004-2034)
    becomes a static branch resolved at trace time — one compiled program per
    conditioning mode;
  * first stage and conditioner are FROZEN pure functions (`encode_fn`,
    `decode_fn`, `cond_fn`) closed over their own params with stop_gradient —
    the JAX equivalent of the reference's instantiate-and-freeze
    (ldm/diffusion/ddpm.py:731-765);
  * `scale_factor` with the optional std-rescale-on-first-batch hook
    (ldm/diffusion/ddpm.py:684-711) is provided as an explicit calibration
    helper (`calibrate_scale_factor`) instead of a hidden training callback;
  * the sliding-window fold/unfold patch pipeline
    (ldm/diffusion/ddpm.py:894-994, used :1097-1279, :1326-1448) is
    re-expressed as static-shape patch extraction + vmapped apply +
    weighted overlap-add (`patched_apply`) — no Python loop over patches
    inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.diffusion.ddim import DDIMSampler
from sd_tpu.diffusion.ddpm import DDPMProcess, draw_training_noise
from sd_tpu.nn.layers import mean_flat

PyTree = Any


# ---------------------------------------------------------------------------
# Conditioning dispatch (reference: ldm/diffusion/ddpm.py:1992-2034)
# ---------------------------------------------------------------------------


def apply_conditioned(
    unet_apply: Callable,
    params: PyTree,
    x: jax.Array,
    t: jax.Array,
    cond: dict | None,
    conditioning_key: str | None,
) -> jax.Array:
    """DiffusionWrapper.forward: route conditioning into the UNet.

    cond keys follow the reference: {'c_concat': [..], 'c_crossattn': [..]}
    (lists are concatenated along channels / tokens). A 'c_control' entry
    (the ControlNet hint image, models/controlnet.py — beyond-reference)
    is forwarded as the `control=` kwarg to a controlled unet_apply.
    """
    kw = ({"control": cond["c_control"]}
          if cond is not None and "c_control" in cond else {})
    if cond is not None and "c_ip" in cond:
        # IP-Adapter image embedding (models/ip_adapter.py) — forwarded to
        # an ip_apply_fn-wrapped unet_apply
        kw["ip_embed"] = cond["c_ip"]
    if conditioning_key is None or cond is None:
        return unet_apply(params, x, t, None, **kw)
    if conditioning_key == "concat":
        xc = jnp.concatenate([x] + list(cond["c_concat"]), axis=-1)
        return unet_apply(params, xc, t, None, **kw)
    if conditioning_key == "crossattn":
        cc = jnp.concatenate(list(cond["c_crossattn"]), axis=1)
        return unet_apply(params, x, t, cc, **kw)
    if conditioning_key == "hybrid":
        xc = jnp.concatenate([x] + list(cond["c_concat"]), axis=-1)
        cc = jnp.concatenate(list(cond["c_crossattn"]), axis=1)
        return unet_apply(params, xc, t, cc, **kw)
    if conditioning_key == "adm":
        return unet_apply(params, x, t, None, cond["c_adm"], **kw)
    raise ValueError(f"unknown conditioning key {conditioning_key!r}")


# ---------------------------------------------------------------------------
# LatentDiffusion
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LatentDiffusion:
    """Functional latent-diffusion model.

    unet_apply(params, x, t, context, y=None) -> eps/x0 prediction
    encode_fn(x, rng) -> z (first-stage latent BEFORE scale factor; frozen)
    decode_fn(z) -> image (takes UNscaled latent; frozen)
    cond_fn(raw_cond) -> conditioning tensor (frozen; None = unconditional)
    """

    process: DDPMProcess
    unet_apply: Callable
    encode_fn: Callable | None = None
    decode_fn: Callable | None = None
    cond_fn: Callable | None = None
    conditioning_key: str | None = "crossattn"
    scale_factor: float = 0.18215
    cond_stage_trainable: bool = False
    learn_logvar: bool = False
    # Noise offset (beyond-reference fine-tuning knob, crosslabs 2023 /
    # the SDXL training recipe): adds `offset · ε_c` with ε_c drawn once
    # per (sample, channel) to the training noise, teaching the model to
    # move overall image brightness — plain iid noise never asks it to.
    noise_offset: float = 0.0
    # Optional probe apply for Self-Attention Guidance (diffusion/sag.py):
    # (params, x, t, ctx, y=None) -> (out, salience_mask). Built by
    # sag.make_probs_apply(unet); attached by build_ldm / the pipeline.
    unet_apply_probs: Callable | None = None

    @property
    def schedule(self) -> DiffusionSchedule:
        return self.process.schedule

    # -- first stage (reference: ldm/diffusion/ddpm.py:795-806,1082-1279) ----

    def get_first_stage_encoding(self, z: jax.Array) -> jax.Array:
        return self.scale_factor * z

    def encode_first_stage(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        assert self.encode_fn is not None
        return jax.lax.stop_gradient(self.encode_fn(x, rng))

    def decode_first_stage(self, z: jax.Array) -> jax.Array:
        assert self.decode_fn is not None
        return jax.lax.stop_gradient(self.decode_fn(z / self.scale_factor))

    def differentiable_decode_first_stage(self, z: jax.Array) -> jax.Array:
        assert self.decode_fn is not None
        return self.decode_fn(z / self.scale_factor)

    def get_learned_conditioning(self, raw_cond) -> jax.Array:
        assert self.cond_fn is not None
        c = self.cond_fn(raw_cond)
        if not self.cond_stage_trainable:
            c = jax.lax.stop_gradient(c)
        return c

    def get_input(self, batch: dict, rng: jax.Array) -> tuple[jax.Array, dict | None]:
        """image batch -> (z, cond) (reference: ldm/diffusion/ddpm.py:998-1079).

        batch: {'image': [B,H,W,3], optional 'txt_emb'/'txt_raw'/'class_label'}.
        Text is pre-embedded ('txt_emb') or raw for a trainable cond stage.
        """
        x = batch["image"]
        z = self.get_first_stage_encoding(self.encode_first_stage(x, rng))
        cond = None
        if self.conditioning_key in ("crossattn", "hybrid"):
            c = (batch["txt_emb"] if "txt_emb" in batch
                 else self.get_learned_conditioning(batch["txt_raw"]))
            cond = {"c_crossattn": [c]}
            if self.conditioning_key == "hybrid":
                cond["c_concat"] = [batch["concat_cond"]]
        elif self.conditioning_key == "concat":
            cond = {"c_concat": [batch["concat_cond"]]}
        elif self.conditioning_key == "adm":
            cond = {"c_adm": batch["class_label"]}
        if "hint" in batch:  # ControlNet pixel-space control image
            cond = dict(cond or {})
            cond["c_control"] = batch["hint"]
        if "ip_embed" in batch:  # IP-Adapter image-prompt embedding
            cond = dict(cond or {})
            cond["c_ip"] = batch["ip_embed"]
        return z, cond

    # -- model application ---------------------------------------------------

    def apply_model(self, params: PyTree, x: jax.Array, t: jax.Array,
                    cond: dict | None) -> jax.Array:
        return apply_conditioned(
            self.unet_apply, params, x, t, cond, self.conditioning_key
        )

    def model_fn(self, params: PyTree) -> Callable:
        """(x, t, cond) -> prediction closure for the samplers."""
        return lambda x, t, cond: self.apply_model(params, x, t, cond)

    def model_probs_fn(self, params: PyTree) -> Callable:
        """(x, t, cond) -> (prediction, sag_salience_mask) closure — the
        Self-Attention Guidance probe (diffusion/sag.py). Needs
        `unet_apply_probs` attached (sag.make_probs_apply)."""
        if self.unet_apply_probs is None:
            raise ValueError(
                "SAG needs unet_apply_probs — attach "
                "sag.make_probs_apply(unet) to this LatentDiffusion")
        return lambda x, t, cond: apply_conditioned(
            self.unet_apply_probs, params, x, t, cond, self.conditioning_key)

    # -- training loss (reference: ldm/diffusion/ddpm.py:1483-1524) ---------

    def p_losses(
        self,
        params: PyTree,
        z: jax.Array,
        cond: dict | None,
        t: jax.Array,
        noise: jax.Array,
        learned_logvar: jax.Array | None = None,
    ) -> tuple[jax.Array, dict]:
        return self.process.p_losses(
            self.model_fn(params), z, t, noise, cond, learned_logvar
        )

    def training_loss(
        self, params: PyTree, batch: dict, rng: jax.Array,
        learned_logvar: jax.Array | None = None,
    ) -> tuple[jax.Array, dict]:
        """Full shared_step: encode → sample t → q_sample → UNet → loss
        (reference: ldm/diffusion/ddpm.py:1282-1304)."""
        rng_enc, rng_t, rng_noise = jax.random.split(rng, 3)
        z, cond = self.get_input(batch, rng_enc)
        b = z.shape[0]
        t = jax.random.randint(rng_t, (b,), 0, self.schedule.num_timesteps)
        noise = draw_training_noise(rng_noise, z.shape, self.noise_offset)
        return self.p_losses(params, z, cond, t, noise, learned_logvar)

    # -- sampling ------------------------------------------------------------

    def sample(
        self,
        params: PyTree,
        rng: jax.Array,
        shape: tuple[int, ...],
        cond: dict | None = None,
        uncond: dict | None = None,
        guidance_scale: float = 1.0,
        num_steps: int = 50,
        eta: float = 0.0,
        use_ddim: bool = True,
        decode: bool = True,
        sampler: str | None = None,
        sag_scale: float = 0.0,
        **kw,
    ):
        """Latent sampling + optional first-stage decode
        (reference: ldm/diffusion/ddpm.py:1742-1826 sample/sample_log +
        DDIM handoff). `sampler`: "ddim" (default) / "dpm"
        (DPM-Solver++(2M), ~15 steps ≈ DDIM-50) / "dpm_sde" (DPM++ 2M
        SDE — stochastic exponential integrator) / "unipc" (predictor-
        corrector, arXiv:2302.04867 — best quality per call at 5-10 steps) /
        "plms" (4th-order pseudo linear multistep, arXiv:2202.09778) /
        "euler" / "euler_a" / "heun" (the k-diffusion family,
        arXiv:2206.00364) / "ddpm" (ancestral);
        overrides the legacy use_ddim flag when given."""
        model_fn = self.model_fn(params)
        if getattr(self.process, "is_flow", False):
            # rectified-flow model (diffusion/flow.py): ODE samplers only
            sampler = sampler or "flow"
            if sampler not in ("flow", "flow_midpoint"):
                raise ValueError(
                    f"a flow-matching model needs sampler='flow' or "
                    f"'flow_midpoint', got {sampler!r}")
        if sampler is None:
            sampler = "ddim" if use_ddim else "ddpm"
        if sag_scale > 0.0:
            if sampler != "ddim":
                raise ValueError(
                    f"sag_scale is only supported by the ddim sampler, "
                    f"got sampler={sampler!r}")
            kw = dict(kw, sag_scale=sag_scale,
                      sag_probs_fn=self.model_probs_fn(params))
        if sampler in ("flow", "flow_midpoint"):
            from sd_tpu.diffusion.flow import FlowEulerSampler

            if not getattr(self.process, "is_flow", False):
                raise ValueError(
                    "sampler='flow' needs a FlowProcess model "
                    "(diffusion.type: flow)")
            kw.pop("guidance_rescale", None)
            z = FlowEulerSampler(
                self.schedule,
                method=("midpoint" if sampler == "flow_midpoint"
                        else "euler"),
            ).sample(
                model_fn, rng, shape, num_steps=num_steps, cond=cond,
                uncond=uncond, guidance_scale=guidance_scale, **kw,
            )
        elif sampler in ("euler", "euler_a", "heun"):
            from sd_tpu.diffusion.k_samplers import KDiffusionSampler

            z = KDiffusionSampler(
                self.schedule,
                order=sampler,
                parameterization=self.process.parameterization,
            ).sample(
                model_fn, rng, shape, num_steps=num_steps, cond=cond,
                uncond=uncond, guidance_scale=guidance_scale, **kw,
            )
        elif sampler in ("dpm", "dpm_sde"):
            from sd_tpu.diffusion.dpm_solver import DPMSolverSampler

            z = DPMSolverSampler(
                self.schedule,
                parameterization=self.process.parameterization,
                sde=(sampler == "dpm_sde"),
            ).sample(
                model_fn, rng, shape, num_steps=num_steps, cond=cond,
                uncond=uncond, guidance_scale=guidance_scale, **kw,
            )
        elif sampler == "unipc":
            from sd_tpu.diffusion.unipc import UniPCSampler

            z = UniPCSampler(
                self.schedule,
                parameterization=self.process.parameterization,
            ).sample(
                model_fn, rng, shape, num_steps=num_steps, cond=cond,
                uncond=uncond, guidance_scale=guidance_scale, **kw,
            )
        elif sampler in ("lcm", "consistency"):
            # few-step serving of a consistency-distilled student
            # (train/distill.py, arXiv:2310.04378); CFG is baked in at
            # distillation time, so uncond/guidance_scale do not apply
            from sd_tpu.diffusion.consistency import ConsistencyDistiller

            if uncond is not None and guidance_scale != 1.0:
                raise ValueError(
                    "lcm sampling has no CFG branch — guidance was baked "
                    "in at distillation (distill.guidance_scale)")
            kw.pop("guidance_rescale", None)  # CFG-only knob (scripts/sample.py)
            z = ConsistencyDistiller(
                self.schedule,
                parameterization=self.process.parameterization,
                sigma_data=kw.pop("sigma_data", 0.5),
                timestep_scaling=kw.pop("timestep_scaling", 10.0),
                num_boundaries=kw.pop("num_boundaries", 50),
            ).sample(
                model_fn, rng, shape, num_steps=num_steps, cond=cond,
                **kw,
            )
        elif sampler == "plms":
            from sd_tpu.diffusion.plms import PLMSSampler

            z = PLMSSampler(
                self.schedule,
                parameterization=self.process.parameterization,
            ).sample(
                model_fn, rng, shape, num_steps=num_steps, cond=cond,
                uncond=uncond, guidance_scale=guidance_scale, **kw,
            )
        elif sampler == "ddim":
            z = DDIMSampler(
                self.schedule,
                parameterization=self.process.parameterization,
            ).sample(
                model_fn, rng, shape, num_steps=num_steps, cond=cond,
                uncond=uncond, guidance_scale=guidance_scale, eta=eta, **kw,
            )
        else:
            # ancestral sampling has no CFG path; drop CFG-only knobs
            kw.pop("guidance_rescale", None)
            z = self.process.p_sample_loop(model_fn, rng, shape, cond, **kw)
        if decode and self.decode_fn is not None:
            return self.decode_first_stage(z)
        return z


# ---------------------------------------------------------------------------
# scale-factor calibration (reference: ldm/diffusion/ddpm.py:669-711)
# ---------------------------------------------------------------------------


def calibrate_scale_factor(z: jax.Array) -> float:
    """1/std of the first batch of latents — the reference computes this once
    at the start of training (`std-rescaling`) and stores it as scale_factor."""
    return float(1.0 / jnp.std(z.astype(jnp.float32)))


# ---------------------------------------------------------------------------
# fold/unfold patched apply (reference: ldm/diffusion/ddpm.py:894-994)
# ---------------------------------------------------------------------------


def _tie_breaker_weights(ks: int, sigma_scale: float = 0.5) -> jax.Array:
    """Border-falloff weighting for overlap-add (the reference's clipped
    Gaussian 'weighting' in get_fold_unfold, ldm/diffusion/ddpm.py:905-930)."""
    r = (jnp.arange(ks, dtype=jnp.float32) - (ks - 1) / 2) / ks
    g = jnp.exp(-(r**2) / (2 * sigma_scale**2))
    w = g[:, None] * g[None, :]
    return jnp.clip(w, 0.01, 1.0)


def extract_patches(x: jax.Array, ks: int, stride: int) -> jax.Array:
    """[B,H,W,C] -> [B,nH,nW,ks,ks,C] static-shape sliding windows."""
    B, H, W, C = x.shape
    nh = (H - ks) // stride + 1
    nw = (W - ks) // stride + 1
    idx_h = jnp.arange(nh) * stride
    idx_w = jnp.arange(nw) * stride

    def get_patch(ih, iw):
        return jax.lax.dynamic_slice(x, (0, ih, iw, 0), (B, ks, ks, C))

    rows = jax.vmap(lambda ih: jax.vmap(lambda iw: get_patch(ih, iw))(idx_w))(idx_h)
    # rows: [nh, nw, B, ks, ks, C] -> [B, nh, nw, ks, ks, C]
    return rows.transpose(2, 0, 1, 3, 4, 5)


def fold_patches(patches: jax.Array, out_hw: tuple[int, int], stride: int,
                 weights: jax.Array) -> jax.Array:
    """Weighted overlap-add of [B,nH,nW,ks,ks,C] back to [B,H,W,C],
    normalized by the summed weights (the reference's fold ∘ weighting /
    normalization)."""
    B, nh, nw, ks, _, C = patches.shape
    H, W = out_hw
    w = weights[None, :, :, None]  # [1,ks,ks,1]

    out = jnp.zeros((B, H, W, C), jnp.float32)
    norm = jnp.zeros((1, H, W, 1), jnp.float32)

    def body(carry, idx):
        out, norm = carry
        ih, iw = idx // nw, idx % nw
        patch = jax.lax.dynamic_index_in_dim(
            jax.lax.dynamic_index_in_dim(patches, ih, 1, keepdims=False),
            iw, 1, keepdims=False,
        )  # [B, ks, ks, C]
        out = jax.lax.dynamic_update_slice(
            out,
            jax.lax.dynamic_slice(
                out, (0, ih * stride, iw * stride, 0), (B, ks, ks, C)
            ) + patch.astype(jnp.float32) * w,
            (0, ih * stride, iw * stride, 0),
        )
        norm = jax.lax.dynamic_update_slice(
            norm,
            jax.lax.dynamic_slice(
                norm, (0, ih * stride, iw * stride, 0), (1, ks, ks, 1)
            ) + w,
            (0, ih * stride, iw * stride, 0),
        )
        return (out, norm), None

    (out, norm), _ = jax.lax.scan(body, (out, norm), jnp.arange(nh * nw))
    # Border rows/cols not covered by any patch (when (H-ks) % stride != 0)
    # have zero accumulated weight; clamp so they come out 0, not NaN.
    return out / jnp.maximum(norm, 1e-8)


def bbox_patch_limits(
    hw: tuple[int, int], ks: int, stride: int,
    original_image_size: tuple[int, int], rescale_latent: int,
) -> list[tuple[float, float, float, float]]:
    """Normalized (x_t1, y_t1, w_frac, h_frac) crop box per patch, row-major
    patch order (reference: ldm/diffusion/ddpm.py:1377-1394 — top-left patch
    coordinates rescaled from latent to original-image fractions)."""
    h, w = hw
    n_row = (w - ks) // stride + 1
    n_col = (h - ks) // stride + 1
    full_h, full_w = original_image_size
    out = []
    for pn in range(n_row * n_col):
        x_t1 = rescale_latent * stride * (pn % n_row) / full_w
        y_t1 = rescale_latent * stride * (pn // n_row) / full_h
        out.append(
            (x_t1, y_t1, rescale_latent * ks / full_w, rescale_latent * ks / full_h)
        )
    return out


def patched_apply_bbox(
    ld: "LatentDiffusion",
    params: PyTree,
    x: jax.Array,                 # [B, H, W, C] noisy latent
    t: jax.Array,                 # [B]
    cond_tokens: jax.Array,       # [B, n] token ids of the base conditioning
    *,
    ks: int,
    stride: int,
    original_image_size: tuple[int, int],
    rescale_latent: int,
    crop_encoder: Callable[[tuple[float, float, float, float]], Any],
    encode_tokens: Callable[[jax.Array], jax.Array],
) -> jax.Array:
    """The coordinates_bbox patched apply_model: every sliding-window patch is
    re-conditioned on its own crop coordinates — the base conditioning's last
    two tokens are cut and replaced by the tokenized patch bbox, re-encoded
    through the cond stage (reference: ldm/diffusion/ddpm.py:1372-1419).

    Unlike the reference's per-patch Python loop, all L patches run as ONE
    batched UNet application of shape [L·B, ks, ks, C] (patch-major, matching
    the reference's `rearrange(.., 'l b n -> (l b) n')`), then weighted
    overlap-add folds the outputs back.

    crop_encoder: bbox -> sequence of int token ids (the reference's
    bbox_tokenizer._crop_encoder); encode_tokens: [L·B, n'] ids -> [L·B, M, D]
    context embeddings (the cond stage).
    """
    import numpy as np

    B, H, W, C = x.shape
    patches = extract_patches(x, ks, stride)  # [B, nh, nw, ks, ks, C]
    nh, nw = patches.shape[1], patches.shape[2]
    L = nh * nw

    limits = bbox_patch_limits((H, W), ks, stride, original_image_size,
                               rescale_latent)
    coord_tokens = jnp.asarray(
        np.stack([np.asarray(crop_encoder(b), dtype=np.int32) for b in limits])
    )  # [L, n_coord]
    cut = cond_tokens[:, :-2]  # reference cuts the last two positions
    adapted = jnp.concatenate(
        [
            jnp.broadcast_to(cut[None], (L, B, cut.shape[1])),
            jnp.broadcast_to(coord_tokens[:, None], (L, B, coord_tokens.shape[1])),
        ],
        axis=-1,
    ).reshape(L * B, -1)
    ctx = encode_tokens(adapted)  # [L*B, M, D]

    flat = patches.transpose(1, 2, 0, 3, 4, 5).reshape(L * B, ks, ks, C)
    t_rep = jnp.broadcast_to(t[None], (L, B)).reshape(-1)
    out = ld.apply_model(params, flat, t_rep, {"c_crossattn": [ctx]})

    out = out.reshape(nh, nw, B, ks, ks, out.shape[-1]).transpose(2, 0, 1, 3, 4, 5)
    weights = _tie_breaker_weights(ks)
    return fold_patches(out, (H, W), stride, weights).astype(x.dtype)


def patched_apply(
    fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    ks: int,
    stride: int,
    scale: int | None = None,
) -> jax.Array:
    """Apply `fn` to overlapping ks×ks patches and overlap-add the results.

    `scale` is the spatial scaling of fn when given (e.g. vq-f4 decode →
    scale=4) and is checked against fn's actual output; with `scale=None`
    any exact rational rescale is accepted — including DOWNSCALING fns
    (tiled VAE *encode*: oks = ks/f), as long as the output grid divides
    out evenly (H·oks % ks == 0, stride·oks % ks == 0). Replaces the
    reference's per-patch Python loop with one vmap — all patches run as
    one batched XLA computation.
    """
    B, H, W, C = x.shape
    patches = extract_patches(x, ks, stride)  # [B,nh,nw,ks,ks,C]
    nh, nw = patches.shape[1], patches.shape[2]
    flat = patches.reshape(B * nh * nw, ks, ks, C)
    out = fn(flat)
    oks = out.shape[1]
    if scale is not None:
        assert oks == ks * scale, \
            f"fn changed patch size {ks}->{oks}, scale={scale}"
    if (H * oks) % ks or (W * oks) % ks or (stride * oks) % ks:
        raise ValueError(
            f"patched_apply: output patch {oks} does not evenly rescale "
            f"H={H}, W={W}, stride={stride} from ks={ks}")
    h_out, w_out = H * oks // ks, W * oks // ks
    out = out.reshape(B, nh, nw, oks, oks, out.shape[-1])
    weights = _tie_breaker_weights(oks)
    return fold_patches(
        out, (h_out, w_out), stride * oks // ks, weights
    ).astype(out.dtype)
