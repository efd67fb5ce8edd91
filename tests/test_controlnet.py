"""ControlNet (models/controlnet.py, arXiv:2302.05543): zero-init no-op
property, encoder weight copy, trainer integration, serving pipeline.
Beyond-reference capability — the reference's only conditioning surface is
the DiffusionWrapper key dispatch (ldm/diffusion/ddpm.py:1992-2034)."""

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_tpu.core.config import load_yaml
from sd_tpu.models.controlnet import (
    ControlNet,
    controlled_apply_fn,
    controlnet_from_unet_config,
    init_controlnet_from_unet,
)
from sd_tpu.models.unet_sd import UNetModel

UNET_KW = dict(
    in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
    attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
    context_dim=32,
)


@pytest.fixture(scope="module")
def stack():
    unet = UNetModel(**UNET_KW)
    cn = controlnet_from_unet_config(dict(UNET_KW), hint_downsamples=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    t = jnp.array([3, 7], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 32))
    uparams = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    cparams = cn.init(jax.random.PRNGKey(4), x, hint, t, ctx)["params"]
    # perturb past the zero-init output convs so the base forward is
    # non-trivial (a fresh UNet outputs exact zeros)
    uparams = jax.tree.map(
        lambda p: p + 0.05 * jnp.sin(0.9 * jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape), uparams)
    return unet, cn, uparams, cparams, x, hint, t, ctx


def test_zero_init_is_exact_noop(stack):
    """Fresh zero convs → the controlled forward is bitwise the base
    forward (the paper's training-start contract, arXiv:2302.05543 §3.2)."""
    unet, cn, uparams, cparams, x, hint, t, ctx = stack
    base = unet.apply({"params": uparams}, x, t, ctx)
    fn = controlled_apply_fn(unet, cn)
    out = fn({"unet": uparams, "controlnet": cparams}, x, t, ctx,
             control=hint)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_residual_count_and_control_effect(stack):
    unet, cn, uparams, cparams, x, hint, t, ctx = stack
    res = cn.apply({"params": cparams}, x, hint, t, ctx)
    # ch_mult (1,2) / 1 res block: input conv + res + down + res = 4 skips
    # + middle
    assert len(res) == 5
    assert res[-1].shape == (2, 4, 4, 64)  # middle: 8/2=4, 2*32 ch

    # perturb the zero convs: control must now change the output, and the
    # hint must matter
    pert = jax.tree.map(
        lambda p: p + 0.1 * jnp.cos(jnp.arange(p.size, dtype=jnp.float32)
                                    ).reshape(p.shape), cparams)
    fn = controlled_apply_fn(unet, cn)
    base = unet.apply({"params": uparams}, x, t, ctx)
    out = fn({"unet": uparams, "controlnet": pert}, x, t, ctx, control=hint)
    out2 = fn({"unet": uparams, "controlnet": pert}, x, t, ctx,
              control=hint * 0.3)
    assert not np.allclose(np.asarray(out), np.asarray(base))
    assert not np.allclose(np.asarray(out), np.asarray(out2))

    # control_scale=0 recovers the base model exactly up to the zero adds
    fn0 = controlled_apply_fn(unet, cn, control_scale=0.0)
    out0 = fn0({"unet": uparams, "controlnet": pert}, x, t, ctx,
               control=hint)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base),
                               atol=1e-6)

    # no control image → plain base forward
    outn = fn({"unet": uparams, "controlnet": pert}, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(outn), np.asarray(base))


def test_init_from_unet_copies_encoder(stack):
    unet, cn, uparams, cparams, x, hint, t, ctx = stack
    out = init_controlnet_from_unet(cparams, uparams)
    copied = [k for k in out
              if k in uparams and (k.startswith(("in_", "mid_", "time_embed"))
                                   or k == "input_conv")]
    assert copied, "no encoder modules matched"
    for k in copied:
        ua = jax.tree.leaves(uparams[k])
        ca = jax.tree.leaves(out[k])
        for a, b in zip(ua, ca):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # hint encoder / zero convs keep their fresh init (zero convs zero)
    assert float(jnp.abs(out["zero_conv_0"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(out["mid_zero_conv"]["kernel"]).max()) == 0.0


def test_gradient_flows_to_zero_convs(stack):
    """With a non-degenerate (perturbed) base UNet, the zero convs receive
    gradient at step 0 — training can move off the no-op. (With a FRESH
    base, its zero out_conv blocks all gradient; that degenerate case is
    why the smoke-config trainer logs grad_norm 0 at step 0.)"""
    unet, cn, uparams, cparams, x, hint, t, ctx = stack
    fn = controlled_apply_fn(unet, cn)

    def loss(cp):
        out = fn({"unet": uparams, "controlnet": cp}, x, t, ctx,
                 control=hint)
        return jnp.mean(out**2)

    g = jax.grad(loss)(cparams)
    gz = max(float(jnp.abs(l).max())
             for k in g if "zero_conv" in k or k == "mid_zero_conv"
             for l in jax.tree.leaves(g[k]))
    assert gz > 1e-9
    # the hint encoder is behind its own zero conv AND the zero residual
    # projections — silent at step 0 by design
    assert float(jnp.abs(jax.tree.leaves(g["hint_in"])[0]).max()) == 0.0


def test_edge_hint():
    from sd_tpu.data.hints import edge_hint

    img = np.zeros((32, 32, 3), np.uint8)
    img[:, 16:] = 255  # vertical step edge
    h = edge_hint(img)
    assert h.shape == (32, 32, 3) and h.dtype == np.float32
    assert 0.0 <= h.min() and h.max() <= 1.0
    assert h[:, 14:18].max() == 1.0      # edge fires at the step
    assert h[:, :8].max() == 0.0         # flat region silent
    # batched path
    hb = edge_hint(np.stack([img, img]))
    assert hb.shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(hb[0], h)


def test_train_controlnet_and_serving(tmp_path):
    """End-to-end, the paper's setup: train a base LDM, train a ControlNet
    OVER it (`controlnet.base_run` — base frozen, encoder copied from the
    trained base), deploy base + branch into the serving pipeline, and
    steer generation with a control image."""
    from PIL import Image

    from sd_tpu.data.hints import edge_hint
    from sd_tpu.pipeline import Text2ImagePipeline
    from sd_tpu.train.runners import train_ldm

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(
            d / f"{i}.jpg")

    cfg = load_yaml("configs/sd_txt2img_smoke.yaml")
    cfg["train"].update(total_steps=2, checkpoint_every=2, eval_every=100)
    run_base = str(tmp_path / "base")
    train_ldm(cfg, str(d), out_dir=run_base)

    cn_cfg = load_yaml("configs/sd_txt2img_smoke.yaml")
    cn_cfg["train"].update(total_steps=2, checkpoint_every=2, eval_every=100)
    cn_cfg["controlnet"] = {"hint": "canny", "base_run": run_base}
    run_cn = str(tmp_path / "cn")
    state = train_ldm(cn_cfg, str(d), out_dir=run_cn)
    assert int(state.step) == 2
    # the optimizer state is the control branch, not the UNet
    assert "zero_conv_0" in state.params and "hint_zero" in state.params
    assert "out_conv" not in state.params

    pipe = Text2ImagePipeline.from_run("configs/sd_txt2img_smoke.yaml",
                                       run_base, param_dtype=None)
    plain = pipe.generate(["a cat"], num_steps=2, guidance_scale=2.0)
    pipe.load_controlnet(run_cn, control_scale=1.0)

    img = np.zeros((32, 32, 3), np.uint8)
    img[:, 16:] = 255
    hint = edge_hint(img)
    out = pipe.generate(["a cat"], num_steps=2, guidance_scale=2.0,
                        control_image=hint)
    assert out.shape == plain.shape and out.dtype == np.uint8
    # without a control image the attached branch must not change outputs
    plain2 = pipe.generate(["a cat"], num_steps=2, guidance_scale=2.0)
    np.testing.assert_array_equal(plain2, plain)
