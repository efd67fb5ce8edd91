"""Train-package tests: diffusion train step (EMA, grad clip, learned logvar),
LR schedules, checkpoint save/resume, metrics utilities.
Reference semantics: SURVEY.md §2.1, §5.3-5.5 (DDPM/train.py,
Diffusion/lr_scheduler.py, ldm checkpointing)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.schedules import DiffusionSchedule
from sd_tpu.diffusion.ddpm import DDPMProcess
from sd_tpu.train.checkpoint import (
    auto_resume,
    cast_tree,
    check_tree_health,
    filter_ignore_keys,
    restore_checkpoint,
    save_checkpoint,
    strip_prefix,
)
from sd_tpu.train.diffusion import (
    TrainState,
    ddpm_optimizer,
    init_train_state,
    make_diffusion_train_step,
)
from sd_tpu.train.lr_schedules import (
    cosine_annealing,
    lambda_linear_schedule,
    lambda_warmup_cosine_schedule,
    lambda_warmup_cosine_schedule_v2,
)
from sd_tpu.train.metrics import (
    count_params,
    log_txt_as_img,
    make_grid,
    postprocess,
)


def toy_loss_fn():
    sched = DiffusionSchedule.create(timesteps=10)
    process = DDPMProcess(sched)

    def model_fn_for(params):
        return lambda x, t, cond: params["w"] * x

    def loss_fn(params, batch, rng, logvar):
        x = batch["image"]
        t = jax.random.randint(rng, (x.shape[0],), 0, 10)
        noise = jax.random.normal(rng, x.shape)
        return process.p_losses(model_fn_for(params), x, t, noise,
                                learned_logvar=logvar)

    return loss_fn


def test_train_step_updates_and_ema(rng):
    params = {"w": jnp.asarray(0.5)}
    opt = ddpm_optimizer(1e-2)
    state = init_train_state(params, opt, ema_decay=0.9)
    step = make_diffusion_train_step(toy_loss_fn(), opt)
    batch = {"image": jax.random.normal(rng, (2, 4, 4, 3))}

    s1, logs = step(state, batch, rng)
    assert int(s1.step) == 1
    assert float(s1.params["w"]) != 0.5
    assert np.isfinite(float(logs["loss"]))
    assert np.isfinite(float(logs["grad_norm"]))
    # EMA warm-up: shadow moved but lags params
    assert float(s1.ema.shadow["w"]) != 0.5


def test_train_step_learned_logvar(rng):
    params = {"w": jnp.asarray(0.5)}
    opt = ddpm_optimizer(1e-2)
    state = init_train_state(params, opt, num_timesteps=10, learn_logvar=True)
    step = make_diffusion_train_step(toy_loss_fn(), opt, learn_logvar=True)
    batch = {"image": jax.random.normal(rng, (2, 4, 4, 3))}
    s1, logs = step(state, batch, rng)
    assert "loss_gamma" in logs
    # logvar received gradient
    assert not np.allclose(np.asarray(s1.logvar), 0.0)


def test_grad_clip():
    opt = ddpm_optimizer(1.0, grad_clip=0.1)
    params = {"w": jnp.asarray(1.0)}
    st = opt.init(params)
    big = {"w": jnp.asarray(1000.0)}
    upd, _ = opt.update(big, st, params)
    # after clipping to norm 0.1, adam normalizes; update magnitude ≤ lr
    assert abs(float(upd["w"])) <= 1.0 + 1e-6


def test_lr_schedules_shapes():
    s = lambda_warmup_cosine_schedule(10, 0.0, 1.0, 0.1, 100)
    assert abs(float(s(0)) - 0.1) < 1e-6
    assert abs(float(s(10)) - 1.0) < 1e-5
    assert float(s(100)) < 0.01

    s2 = lambda_linear_schedule([10], [1.0], [10.0], [1e-6], [1000])
    assert float(s2(0)) < 1e-5
    assert float(s2(10)) > 9.5  # just past warmup, at ~f_max then linear decay
    assert float(s2(1000)) <= 1.01

    s3 = lambda_warmup_cosine_schedule_v2([5, 5], [0.1, 0.1], [1.0, 1.0],
                                          [0.0, 0.0], [50, 50])
    assert abs(float(s3(5)) - 1.0) < 1e-5
    # second cycle restarts warmup
    assert float(s3(51)) < 0.5

    s4 = cosine_annealing(2e-5, 100)
    assert abs(float(s4(0)) - 2e-5) < 1e-9
    assert float(s4(100)) < 1e-6


def test_checkpoint_roundtrip(tmp_path, rng):
    ckpt = str(tmp_path / "ckpt")
    params = {"w": jax.random.normal(rng, (4, 4)), "b": jnp.zeros((4,))}
    save_checkpoint(ckpt, params, step=3)
    restored = restore_checkpoint(ckpt, params)
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(params["w"]))

    # auto-resume picks up the latest step
    zeros = jax.tree.map(jnp.zeros_like, params)
    resumed, start = auto_resume(ckpt, zeros)
    assert start == 3
    np.testing.assert_allclose(np.asarray(resumed["w"]),
                               np.asarray(params["w"]))
    # no checkpoint -> passthrough
    fresh, start0 = auto_resume(str(tmp_path / "none"), zeros)
    assert start0 == 0


def test_auto_resume_lazy_thunk(tmp_path, rng):
    """auto_resume with an init THUNK: on resume the thunk must only be
    eval_shape-traced (never materialized on device) and the checkpoint
    restores into its structure — the no-double-residency path that fixed
    the klf8_refresh step-1001 resume OOM (runs/klf8_refresh/train.log)."""
    import optax

    from sd_tpu.train.diffusion import init_train_state

    ckpt = str(tmp_path / "ckpt")
    opt = optax.adam(1e-3)
    ref = np.arange(6, dtype=np.float32).reshape(2, 3)
    materialized = []

    def fresh():
        materialized.append(True)
        return init_train_state({"w": jnp.zeros((2, 3), jnp.float32)}, opt,
                                ema_decay=0.999, param_dtype=jnp.bfloat16)

    # no checkpoint: thunk materializes the fresh state
    st, start = auto_resume(ckpt, fresh)
    assert start == 0 and st.params["w"].dtype == jnp.bfloat16

    trained = init_train_state({"w": jnp.asarray(ref)}, opt, ema_decay=0.999,
                               param_dtype=jnp.bfloat16)
    save_checkpoint(ckpt, trained, step=7)

    materialized.clear()
    st3, start3 = auto_resume(ckpt, fresh)
    assert start3 == 7
    # the thunk ran under eval_shape: it was CALLED but its arrays are
    # abstract — a concrete device build would have been observable as a
    # second entry per jit trace; the load-bearing assertions are the
    # restored values/dtypes matching the mixed-precision state shape
    assert st3.params["w"].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(st3.params["w"], np.float32), ref)
    assert st3.ema.shadow["w"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(st3.ema.shadow["w"]), ref)
    assert int(st3.opt_state[0].count) == 0


def test_resume_thunk_closure_releases_init_params(tmp_path):
    """The runner resume discipline: a thunk that CAPTURES a concrete init
    tree (train_ldm / distill_ldm — build_ldm materializes the params
    before the thunk exists) must release it after auto_resume by deleting
    BOTH the local name AND the thunk. `del params` alone leaves the
    closure cell holding the tree for the whole run — at the 859M flagship
    that leaked 1.7 GB and OOM'd every resume while fresh training fit
    (runs/sd512_catdog/train.log)."""
    import gc
    import weakref

    import optax

    from sd_tpu.train.diffusion import init_train_state

    ckpt = str(tmp_path / "ckpt")
    opt = optax.adam(1e-3)
    trained = init_train_state({"w": jnp.ones((2, 3))}, opt, ema_decay=0.999,
                               param_dtype=jnp.bfloat16)
    save_checkpoint(ckpt, trained, step=3)

    # the runner frame shape: concrete params captured by the thunk
    params = {"w": jnp.zeros((2, 3), jnp.float32)}
    leak_probe = weakref.ref(params["w"])

    def fresh_state():
        return init_train_state(params, opt, ema_decay=0.999,
                                param_dtype=jnp.bfloat16)

    state, start = auto_resume(ckpt, fresh_state)
    assert start == 3
    del params, fresh_state
    gc.collect()
    assert leak_probe() is None, (
        "init params still alive after resume — a closure cell (or "
        "auto_resume itself) is holding the tree")


def test_torch_interop_helpers():
    sd = {"model.a.weight": np.ones(2), "model.b.weight": np.ones(2),
          "other": np.zeros(1)}
    stripped = strip_prefix(sd)
    assert "a.weight" in stripped and "other" in stripped
    kept = filter_ignore_keys(stripped, ["b."])
    assert "b.weight" not in kept

    tree = {"w": jnp.ones((2,), jnp.float32), "i": jnp.ones((2,), jnp.int32)}
    cast = cast_tree(tree, jnp.bfloat16)
    assert cast["w"].dtype == jnp.bfloat16
    assert cast["i"].dtype == jnp.int32

    bad = {"x": jnp.array([1.0, np.nan]), "y": jnp.array([np.inf]),
           "z": jnp.ones(2)}
    report = check_tree_health(bad)
    assert len(report["nan"]) == 1 and len(report["inf"]) == 1


def test_metrics_utils(tmp_path):
    imgs = np.random.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    u8 = postprocess(imgs)
    assert u8.dtype == np.uint8 and u8.max() <= 255
    grid = make_grid(u8)
    assert grid.size[0] > 8

    # rows= must widen cols so every image lands inside the canvas (a 16-image
    # rows=2 grid used to silently drop half the batch off the bottom edge)
    many = postprocess(np.random.uniform(-1, 1, (16, 8, 8, 3)).astype(np.float32))
    g2 = make_grid(many, rows=2, pad=0)
    assert g2.size == (8 * 8, 2 * 8)
    last = np.asarray(g2)[8:, -8:]  # bottom-right cell = image 15
    np.testing.assert_array_equal(last, many[15])

    txt = log_txt_as_img((32, 64), ["hello", "world"])
    assert txt.shape == (2, 32, 64, 3)
    assert txt.min() >= -1.0 and txt.max() <= 1.0

    assert count_params({"a": jnp.ones((2, 3)), "b": jnp.ones(5)}) == 11


def test_train_step_grad_accum_matches_full_batch(rng):
    """grad_accum=2 over a batch == one full-batch step when the loss is
    deterministic (mean-of-chunk-means == full mean for equal chunks)."""

    def det_loss_fn(params, batch, rng, logvar):
        x = batch["image"]
        pred = params["w"] * x
        loss = jnp.mean((pred - 1.0) ** 2)
        return loss, {"loss": loss}

    opt = ddpm_optimizer(1e-2)
    batch = {"image": jax.random.normal(rng, (4, 4, 4, 3))}

    full = make_diffusion_train_step(det_loss_fn, opt)
    acc = make_diffusion_train_step(det_loss_fn, opt, grad_accum=2)

    # fresh states: the jitted step donates its input state buffers
    mk = lambda: init_train_state({"w": jnp.asarray(0.5)}, opt, ema_decay=0.9)
    s_full, logs_full = full(mk(), batch, rng)
    s_acc, logs_acc = acc(mk(), batch, rng)

    np.testing.assert_allclose(float(s_acc.params["w"]),
                               float(s_full.params["w"]), rtol=1e-6)
    np.testing.assert_allclose(float(logs_acc["loss"]),
                               float(logs_full["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(logs_acc["grad_norm"]),
                               float(logs_full["grad_norm"]), rtol=1e-5)
    np.testing.assert_allclose(float(s_acc.ema.shadow["w"]),
                               float(s_full.ema.shadow["w"]), rtol=1e-6)


def test_train_step_grad_accum_indivisible_raises(rng):
    def det_loss_fn(params, batch, rng, logvar):
        loss = jnp.mean(params["w"] * batch["image"])
        return loss, {"loss": loss}

    opt = ddpm_optimizer(1e-2)
    state = init_train_state({"w": jnp.asarray(0.5)}, opt)
    step = make_diffusion_train_step(det_loss_fn, opt, grad_accum=3)
    batch = {"image": jnp.ones((4, 2))}
    try:
        step(state, batch, jax.random.PRNGKey(0))
        raised = False
    except AssertionError:
        raised = True
    assert raised
