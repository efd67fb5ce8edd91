"""Consistency-distillation trainer: compress a trained latent-diffusion
teacher into a 1-4-step student (LCM, arXiv:2310.04378 — beyond the
reference, whose cheapest serving path is the 50-call DDIM loop,
DDIM/ddim.py:113-163).

The student shares the teacher's architecture and starts FROM the teacher's
EMA weights; each jitted step runs teacher (frozen, one DDIM solver step),
student, and the EMA-target network in one graph. The TrainState's own EMA
shadow doubles as the consistency target network (decay ~0.95 — much
faster-moving than the 0.9999 eval EMA, as the algorithm requires).

Deploys through the ordinary run layout: `Text2ImagePipeline.from_run`
restores the student, `sampler="lcm"` serves it.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import optax

from sd_tpu.core.config import load_yaml
from sd_tpu.core.ema import ema_update
from sd_tpu.diffusion.consistency import ConsistencyDistiller
from sd_tpu.train.checkpoint import auto_resume, restore_checkpoint
from sd_tpu.train.diffusion import (
    TrainState,
    ddpm_optimizer,
    init_train_state,
)
from sd_tpu.train.metrics import count_params
from sd_tpu.train.runners import (
    _build_loader,
    _make_lr,
    _run_loop,
    apply_calibration,
    build_ldm,
    ema_eval_params,
)

PyTree = Any


def load_teacher_params(cfg: dict, teacher_run: str, template: PyTree) -> PyTree:
    """EMA UNet weights from a finished train_ldm run directory (the same
    restore path as Text2ImagePipeline.from_run, pipeline.py:118-158),
    cast to the template's dtypes (bf16 under the param_dtype policy).

    Restores the raw pytree rather than a full TrainState: materializing a
    throwaway optimizer+EMA state for an 859M-param teacher would spike
    ~10 GB of HBM before the student state is even built."""
    from sd_tpu.train.checkpoint import restore_pytree

    # staged on HOST: the flagship teacher's checkpoint is ~12 GB with its
    # Adam moments + EMA; only the EMA subtree (bf16: 1.7 GB) belongs in
    # HBM next to the student train state
    tree = restore_pytree(os.path.join(teacher_run, "ckpt"), device="cpu")
    ema_t = tree.get("ema") if isinstance(tree, dict) else None
    loaded = (ema_t["shadow"]
              if isinstance(ema_t, dict) and ema_t.get("shadow") is not None
              else tree["params"])
    return jax.device_put(
        jax.tree.map(lambda s, p: s.astype(p.dtype), loaded, template),
        jax.devices()[0])


def make_consistency_train_step(loss_fn, optimizer: optax.GradientTransformation,
                                prep_fn=None, jit: bool = True,
                                grad_accum: int = 1):
    """(state, batch, rng) -> (state, logs) where
    loss_fn(params, target_params, prepped, rng) -> (loss, logs) and
    target_params is the state's EMA shadow — updated AFTER the gradient
    step, per the consistency-distillation two-timescale recipe.

    grad_accum > 1 splits the prepped batch into microbatches and
    lax.scans the student backward over them (ONE optimizer + target-EMA
    update; same strict-sequencing rationale as
    diffusion.make_diffusion_train_step — the carry dependency keeps only
    one microbatch's backward temps live, which is what lets the 859M
    student + frozen teacher fit a 15.75 GB chip at the 512² flagship
    shape). The LCM-LoRA `base` tree rides through unsplit.

    prep_fn(batch, rng) -> prepped (optional) runs the gradient-free work
    (first-stage encode + teacher solver step) as its OWN program:
    one combined teacher+student+target+backward graph can exceed a remote
    compiler's program-size limit (HTTP 413 on the tunneled-TPU env), and
    the split costs nothing — the teacher output is stop-gradient anyway.
    prep_fn is called as-is — jit it YOURSELF with the teacher params as an
    ARGUMENT: closure-captured weights are embedded into the lowered
    module as constants (measured 45 MB → 629 MB on the 95M-param catdog
    teacher), which is what actually trips the size limit. Without
    prep_fn, `prepped` is the raw batch."""

    def _accum_grads(params, target, prepped, rng):
        if grad_accum <= 1:
            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, target, prepped, rng)
        # the LCM-LoRA frozen base has no batch dim — pass it through
        passthrough = {}
        if isinstance(prepped, dict) and "base" in prepped:
            prepped = dict(prepped)
            passthrough["base"] = prepped.pop("base")

        def split(x):
            assert x.shape[0] % grad_accum == 0, (
                f"batch dim {x.shape[0]} not divisible by "
                f"grad_accum={grad_accum}")
            return x.reshape(
                (grad_accum, x.shape[0] // grad_accum) + x.shape[1:])

        micro = jax.tree.map(split, prepped)
        mrngs = jax.random.split(rng, grad_accum)

        def lf(p, mb, r):
            if passthrough:
                mb = dict(mb)
                mb.update(passthrough)
            return loss_fn(p, target, mb, r)

        vag = jax.value_and_grad(lf, has_aux=True)
        zero = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(vag, params,
                           jax.tree.map(lambda x: x[0], micro), mrngs[0]))

        def body(acc, xs):
            mb, r = xs
            return jax.tree.map(jnp.add, acc, vag(params, mb, r)), None

        out, _ = jax.lax.scan(body, zero, (micro, mrngs))
        return jax.tree.map(lambda x: x / grad_accum, out)

    def train_step(state: TrainState, prepped, rng: jax.Array):
        target = state.ema.shadow
        (loss, logs), grads = _accum_grads(state.params, target, prepped,
                                           rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params)
        logs = dict(logs)
        # fp32 accumulation: under the bf16 param policy the grads are bf16
        # and a same-dtype sum-of-squares over 10⁸ leaves loses the norm
        logs["grad_norm"] = optax.global_norm(
            jax.tree.map(lambda g: g.astype(jnp.float32), grads))
        return TrainState(params=params, opt_state=opt_state, ema=ema,
                          step=state.step + 1, logvar=state.logvar), logs

    def traced_step(*args, **kw):
        from sd_tpu.kernels.conv2d import training_trace

        with training_trace():
            return train_step(*args, **kw)

    step = jax.jit(traced_step, donate_argnums=(0,)) if jit else traced_step
    if prep_fn is None:
        def one_phase_step(state: TrainState, batch, rng: jax.Array):
            return step(state, batch, jax.random.fold_in(rng, state.step))

        return one_phase_step

    def two_phase_step(state: TrainState, batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        r_prep, r_loss = jax.random.split(rng)
        return step(state, prep_fn(batch, r_prep), r_loss)

    return two_phase_step


def distill_ldm(config: dict | str, data_dir: str,
                out_dir: str = "runs/distill",
                max_steps: int | None = None) -> Any:
    """Distill a trained LDM run into a few-step consistency student.

    Config: the teacher's LDM config plus a `distill:` block —
        distill:
          teacher_run: runs/ldm32_catdog   # finished train_ldm output
          num_boundaries: 50               # solver grid (LCM skipping-step)
          guidance_scale: 1.0              # >1 bakes CFG into the student
          sigma_data: 0.5
          timestep_scaling: 10.0
          target_ema_decay: 0.95           # consistency target network
          sample_steps: 2                  # eval-grid sampling budget
          lora_rank: null                  # set (e.g. 64) for LCM-LoRA
    `train.ema_decay` is OVERRIDDEN by target_ema_decay: the state's EMA is
    the target network here, not an eval-smoothing shadow.

    LCM-LoRA (arXiv:2311.05556): with `lora_rank` set, only rank-r factors
    over the attention projections train — the distilled "acceleration
    module" is a few MB, serves via the ordinary LoRA path
    (`Text2ImagePipeline.from_run(teacher) → load_lora(student_run) →
    generate(sampler="lcm", num_steps=2-4)`), and also lands as
    `lora.safetensors` in the run dir."""
    cfg = load_yaml(config) if isinstance(config, str) else config
    tc = cfg["train"]
    dc = cfg["distill"]
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    # mixed-precision policy at the flagship shape (train.param_dtype:
    # bfloat16): teacher + student params and compute in bf16, Adam
    # moments fp32. The consistency TARGET network (the state's EMA,
    # decay ~0.95) also drops to bf16 — it is fast-moving, so fp32
    # accumulation precision isn't load-bearing, and a second fp32 copy
    # of an 859M-param student would not fit next to the teacher.
    param_dtype = tc.get("param_dtype")
    ema_dtype = jnp.float32
    if param_dtype is not None:
        param_dtype = jnp.dtype(param_dtype)
        ema_dtype = jnp.dtype(dc.get("target_ema_dtype", param_dtype))
        cfg["unet"].setdefault("params", {}).setdefault(
            "dtype", param_dtype.name)  # str: keeps cfg YAML-dumpable

    ld, unet, uparams, vae, vparams, clip = build_ldm(
        cfg, rng, param_dtype=param_dtype)
    if getattr(ld.process, "is_flow", False):
        raise ValueError("consistency distillation needs a DDPM-schedule "
                         "teacher (diffusion.type: ddpm), not a flow model")
    teacher_run = dc["teacher_run"]
    ld = apply_calibration(ld, cfg, os.path.join(teacher_run, "ckpt"))
    if cfg["latent"].get("scale_factor") == "auto" and ld.scale_factor == 1.0:
        raise ValueError(
            f"teacher run {teacher_run} has no calibration.json — "
            "finish train_ldm first")

    teacher_params = load_teacher_params(cfg, teacher_run, uparams)
    lora_rank = dc.get("lora_rank")
    if lora_rank:
        # LCM-LoRA: the student IS the teacher plus trainable rank-r
        # factors (b=0 ⇒ step 0 is exactly the teacher)
        from sd_tpu.train.lora import count_lora_params, init_lora, merge_lora

        student_params = init_lora(
            teacher_params, int(lora_rank),
            jax.random.PRNGKey(cfg.get("seed", 0) ^ 0x1C31),
            dc.get("lora_targets"))
        print(f"[distill] LCM-LoRA rank {lora_rank}: "
              f"{count_lora_params(student_params)/1e3:.1f}K trainable "
              f"factors over frozen "
              f"{count_params(teacher_params)/1e6:.1f}M teacher")
    else:
        # student starts at the teacher — as a COPY: the train step donates
        # the state, and donation would invalidate the teacher closure's
        # buffers if they were shared
        student_params = jax.tree.map(jnp.copy, teacher_params)
        print(f"[distill] student params: "
              f"{count_params(student_params)/1e6:.1f}M "
              f"(init from {teacher_run} EMA)")

    distiller = ConsistencyDistiller(
        schedule=ld.schedule,
        parameterization=ld.process.parameterization,
        sigma_data=float(dc.get("sigma_data", 0.5)),
        timestep_scaling=float(dc.get("timestep_scaling", 10.0)),
        num_boundaries=int(dc.get("num_boundaries", 50)),
    )
    w = float(dc.get("guidance_scale", 1.0))
    uncond_emb = clip([""]) if w != 1.0 else None

    @jax.jit
    def _prep(tp, batch, prep_rng):
        """Gradient-free half (own jitted program — see
        make_consistency_train_step): encode + boundary draw + ONE teacher
        solver step. The teacher tree `tp` is an ARGUMENT, never a closure
        constant — closure weights embed into the lowered module and trip
        remote-compile size limits (45 MB → 629 MB measured here)."""
        r_enc, r_cd = jax.random.split(prep_rng)
        z0, cond = ld.get_input(batch, r_enc)
        uncond = None
        if uncond_emb is not None:
            b = z0.shape[0]
            uncond = {"c_crossattn": [jnp.tile(uncond_emb, (b, 1, 1))]}
        z_hi, z_lo, t_hi, t_lo = distiller.draw_pair(
            ld.model_fn(tp), z0, r_cd, cond=cond,
            uncond=uncond, guidance_scale=w)
        return {"z_hi": z_hi, "z_lo": z_lo, "t_hi": t_hi, "t_lo": t_lo,
                "cond": cond}

    def prep_fn(batch, prep_rng):
        return _prep(teacher_params, batch, prep_rng)

    if lora_rank:
        # the frozen base must ALSO enter the step as an argument (same
        # constant-embedding reason); it rides the prepped tree
        def prep_fn(batch, prep_rng):  # noqa: F811
            out = dict(_prep(teacher_params, batch, prep_rng))
            out["base"] = teacher_params
            return out

        def loss_fn(p, target_p, prepped, step_rng):
            from sd_tpu.train.lora import merge_lora

            def sfn(q):
                return ld.model_fn(merge_lora(prepped["base"], q))

            return distiller.student_loss(
                sfn(p), sfn(target_p),
                prepped["z_hi"], prepped["z_lo"], prepped["t_hi"],
                prepped["t_lo"], prepped["cond"])
    else:
        def loss_fn(p, target_p, prepped, step_rng):
            return distiller.student_loss(
                ld.model_fn(p), ld.model_fn(target_p),
                prepped["z_hi"], prepped["z_lo"], prepped["t_hi"],
                prepped["t_lo"], prepped["cond"])

    def embed_batch(batch):
        out = {"image": jnp.asarray(batch["image"])}
        out["txt_emb"] = clip(batch.get("txt_raw", [""] * len(batch["image"])))
        return out

    opt = ddpm_optimizer(_make_lr(tc), tc.get("grad_clip", 1.0),
                         weight_decay=tc.get("weight_decay", 0.0))
    if param_dtype is not None and param_dtype != jnp.float32:
        from sd_tpu.train.diffusion import float32_moments

        opt = float32_moments(opt)
    remat_policy = tc.get("remat")
    if remat_policy and remat_policy != "none":
        import dataclasses as _dc

        from sd_tpu.train.remat import remat_apply

        ld = _dc.replace(ld, unet_apply=remat_apply(ld.unet_apply,
                                                    remat_policy))
    def fresh_state():
        # thunk: on resume auto_resume eval_shape-traces this so the fresh
        # student state (bf16 params + fp32 Adam + target shadow ≈ 10 GB at
        # the 859M flagship) is never allocated next to the restored copy
        return init_train_state(student_params, opt,
                                float(dc.get("target_ema_decay", 0.95)),
                                param_dtype=param_dtype, ema_dtype=ema_dtype)

    state, start = auto_resume(os.path.join(out_dir, "ckpt"), fresh_state)
    # free the student init copy: deleting the NAME is not enough — the
    # thunk's closure cell also holds it, and on resume the 1.7 GB bf16
    # flagship copy would otherwise stay resident next to the restored
    # state (the leak that OOM'd every train_ldm resume; see runners.py)
    del student_params, fresh_state
    step_fn = make_consistency_train_step(
        loss_fn, opt, prep_fn=prep_fn,
        grad_accum=tc.get("grad_accum", 1))

    lat = cfg["latent"]
    n_eval_steps = int(dc.get("sample_steps", 2))

    eval_shape = (4, lat["image_size"], lat["image_size"], lat["channels"])

    @jax.jit
    def _eval_sample(params, emb, s_rng):
        # params as ARGUMENT (see _prep); lora factors merge inside
        model_fn = (ld.model_fn(params) if not lora_rank else
                    student_model_fn_from(params))
        z = distiller.sample(model_fn, s_rng, eval_shape,
                             num_steps=n_eval_steps,
                             cond={"c_crossattn": [emb]})
        return ld.decode_first_stage(z)

    def student_model_fn_from(params):
        from sd_tpu.train.lora import merge_lora

        return ld.model_fn(merge_lora(params["base"], params["factors"]))

    def sampler(st, s_rng):
        p = ema_eval_params(st)
        if lora_rank:
            p = {"base": teacher_params, "factors": p}
        return _eval_sample(p, clip([""] * 4), s_rng)

    state = _run_loop(step_fn, state, cfg, data_dir, out_dir, rng, start,
                      max_steps=max_steps, sampler=sampler,
                      batch_transform=embed_batch)
    if lora_rank:
        # distribution artifact: the portable LCM-LoRA acceleration module
        from sd_tpu.train.lora import save_lora_safetensors

        save_lora_safetensors(
            os.path.join(out_dir, "lora.safetensors"),
            ema_eval_params(state),
            metadata={"rank": str(lora_rank), "kind": "lcm-lora",
                      "teacher_run": str(teacher_run)})
    return state
