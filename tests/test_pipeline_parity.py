"""Composed-system numerical parity against the reference's own sampler loop.

tests/test_torch_parity.py proves module-level agreement (SD UNet forward,
VAE encode/decode). This file proves the COMPOSED system agrees: the
reference's actual DDIM sampling composition — make_beta_schedule →
make_ddim_timesteps/parameters → the p_sample_ddim update with batched CFG
(reference: DDIM/ddim.py:165-204, DDIM/diffusion_modules.py:21-74; the same
loop appears at ldm/diffusion/ddim.py) — run with the reference's torch code
over the reference torch UNet, versus sd_tpu's single-`lax.scan` DDIM + CFG
(sd_tpu/diffusion/ddim.py) on the same imported weights and the identical
injected x_T, then both final latents through matched VAE decodes
(scale-factor division + post_quant + decoder, reference:
ldm/models/autoencoder.py:292-430).

A drift anywhere — schedule math, timestep striding, CFG combination, the
DDIM update, or the decoder — fails this test.

eta=0 keeps both sides deterministic so "identical injected noise" is exactly
the shared x_T; stochastic (eta>0) sigma tables are covered by the golden
tests in tests/test_schedules.py.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

from test_torch_parity import (  # noqa: E402
    _install_flash_stub,
    _add_ref_path,
    _randomize,
    nchw,
    to_nhwc,
)

T_DDPM = 100          # base DDPM timesteps (small for CPU speed)
S_DDIM = 5            # DDIM steps — enough for drift to compound
LINEAR_START, LINEAR_END = 0.00085, 0.012
GUIDANCE = 4.0
SCALE_FACTOR = 0.18215


@pytest.fixture(scope="module")
def ref_ddim_mod():
    """Load the reference DDIM sampler (DDIM/ddim.py) runnable on CPU.

    Two shims: DDIM/ is a flat script dir (sys.path entry for its
    `from diffusion_modules import ...`), and register_buffer hard-codes
    `.to("cuda")` (DDIM/ddim.py:20-23) — replaced with plain setattr.
    """
    _install_flash_stub()
    ddim_dir = os.path.join(REF, "DDIM")
    if ddim_dir not in sys.path:
        sys.path.insert(0, ddim_dir)
    spec = importlib.util.spec_from_file_location(
        "ref_ddim_sampler", os.path.join(ddim_dir, "ddim.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.DDIMSampler.register_buffer = (
        lambda self, name, attr: setattr(self, name, attr))
    return mod


@pytest.fixture(scope="module")
def ref_unet_mod():
    # same shim as test_torch_parity's fixture (module-scoped there, so it
    # cannot be reused across files): neutralize the hard-coded t_emb.half()
    _install_flash_stub()
    _add_ref_path()
    import openai_model.model as m

    class _NoHalf(torch.Tensor):
        def half(self):
            return self

    orig = m.timestep_embedding
    m.timestep_embedding = lambda *a, **k: orig(*a, **k).as_subclass(_NoHalf)
    yield m
    m.timestep_embedding = orig


@pytest.fixture(scope="module")
def ref_codec_mod():
    _install_flash_stub()
    _add_ref_path()
    import ldm.modules.diffusionmodules.util as ldu
    sys.modules.setdefault("modules", sys.modules["ldm.modules"])
    sys.modules.setdefault("modules.diffusionmodules",
                           sys.modules["ldm.modules.diffusionmodules"])
    sys.modules.setdefault("modules.diffusionmodules.util", ldu)
    import ldm.modules.attention as lattn
    sys.modules.setdefault("modules.attention", lattn)
    import ldm.modules.distributions.distributions as ldist
    sys.modules.setdefault("modules.distributions",
                           sys.modules["ldm.modules.distributions"])
    sys.modules.setdefault("modules.distributions.distributions", ldist)
    import ldm.modules.diffusionmodules.model as codec
    return codec


class _ShimLDM:
    """The minimal `model` surface DDIMSampler reads (DDIM/ddim.py:14-55):
    schedule buffers + apply_model. Buffers come from the reference's own
    make_beta_schedule so the oracle computes its schedule with reference
    code end to end."""

    def __init__(self, unet, ddim_mod):
        import diffusion_modules as dm

        self.unet = unet
        self.num_timesteps = T_DDPM
        self.device = torch.device("cpu")
        betas = np.asarray(dm.make_beta_schedule(
            "linear", T_DDPM, linear_start=LINEAR_START, linear_end=LINEAR_END
        ))
        alphas_cumprod = np.cumprod(1.0 - betas)
        self.betas = torch.tensor(betas, dtype=torch.float32)
        self.alphas_cumprod = torch.tensor(alphas_cumprod, dtype=torch.float32)
        self.alphas_cumprod_prev = torch.tensor(
            np.append(1.0, alphas_cumprod[:-1]), dtype=torch.float32)

    def apply_model(self, x, t, c):
        return self.unet(x, timesteps=t, context=c)


def test_full_pipeline_ddim_cfg_decode_parity(ref_ddim_mod, ref_unet_mod,
                                              ref_codec_mod):
    from sd_tpu.core.schedules import DDIMSchedule, DiffusionSchedule
    from sd_tpu.diffusion.ddim import DDIMSampler
    from sd_tpu.models.autoencoder import AutoencoderKL
    from sd_tpu.models.sd_import import (
        assert_fully_loaded,
        import_sd_unet,
        import_sd_vae,
    )
    from sd_tpu.models.unet_sd import UNetModel

    # --- reference torch models, randomized -------------------------------
    tm = ref_unet_mod.UNetModel(
        image_size=16, in_channels=4, model_channels=64, out_channels=4,
        num_res_blocks=1, attention_resolutions=[1, 2], channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=24,
    ).float().eval()
    # std 0.1: random weights at the module test's 0.2 make the 5-step CFG
    # trajectory blow up numerically on both sides (identically, but the
    # comparison then measures overflow, not math)
    _randomize(tm, 0, std=0.1)
    usd = {k: v.numpy() for k, v in tm.state_dict().items()}

    tdec = ref_codec_mod.Decoder(
        ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(), in_channels=3, resolution=32, z_channels=4,
    ).eval()
    tenc = ref_codec_mod.Encoder(
        ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(), in_channels=3, resolution=32, z_channels=4,
        double_z=True,
    ).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post = torch.nn.Conv2d(4, 4, 1)
    for i, m in enumerate((tenc, tdec, quant, post)):
        _randomize(m, 20 + i, std=0.1)
    vsd = {}
    for pfx, m in (("encoder.", tenc), ("decoder.", tdec),
                   ("quant_conv.", quant), ("post_quant_conv.", post)):
        vsd.update({pfx + k: v.numpy() for k, v in m.state_dict().items()})

    # --- shared inputs ----------------------------------------------------
    rng = np.random.default_rng(7)
    b = 2
    x_T = rng.normal(0, 1, (b, 16, 16, 4)).astype(np.float32)
    cond = rng.normal(0, 1, (b, 7, 24)).astype(np.float32)
    uncond = rng.normal(0, 1, (b, 7, 24)).astype(np.float32)

    # --- reference pipeline: DDIMSampler.sample over the shim -------------
    shim = _ShimLDM(tm, ref_ddim_mod)
    sampler_ref = ref_ddim_mod.DDIMSampler(shim)
    with torch.no_grad():
        z_ref, _ = sampler_ref.sample(
            S=S_DDIM, batch_size=b, shape=(4, 16, 16),
            conditioning=torch.tensor(cond), eta=0.0, verbose=False,
            x_T=nchw(x_T),
            unconditional_guidance_scale=GUIDANCE,
            unconditional_conditioning=torch.tensor(uncond),
        )
        img_ref = tdec(post(z_ref / SCALE_FACTOR))

    # --- sd_tpu pipeline on the imported weights --------------------------
    model = UNetModel(
        in_channels=4, model_channels=64, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2), num_heads=4,
        transformer_depth=1, context_dim=24,
    )
    uparams = model.init(jax.random.PRNGKey(0), jnp.asarray(x_T),
                         jnp.zeros((b,), jnp.int32), jnp.asarray(cond))["params"]
    uloaded = import_sd_unet(uparams, usd, channel_mult=(1, 2),
                             num_res_blocks=1, attention_resolutions=(1, 2),
                             prefix="")
    assert assert_fully_loaded(uparams, uloaded) == []

    vae = AutoencoderKL(embed_dim=4, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        attn_resolutions=(), resolution=32, z_channels=4)
    vparams = vae.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(1))["params"]
    vloaded = import_sd_vae(vparams, vsd, ch_mult=(1, 2), num_res_blocks=1,
                            attn_resolutions=(), resolution=32, prefix="")
    assert assert_fully_loaded(vparams, vloaded) == []

    sched = DiffusionSchedule.create(
        timesteps=T_DDPM, beta_schedule="linear",
        linear_start=LINEAR_START, linear_end=LINEAR_END)
    sampler = DDIMSampler(sched)
    dd = DDIMSchedule.create(sched, S_DDIM, eta=0.0)

    # schedule tables agree with the reference's own (computed inside
    # sampler_ref.sample via make_schedule)
    np.testing.assert_allclose(np.asarray(dd.timesteps),
                               sampler_ref.ddim_timesteps)
    np.testing.assert_allclose(np.asarray(dd.alphas),
                               np.asarray(sampler_ref.ddim_alphas), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dd.alphas_prev),
                               np.asarray(sampler_ref.ddim_alphas_prev),
                               rtol=1e-6)

    model_fn = lambda x, t, ctx: model.apply({"params": uloaded}, x, t, ctx)
    z_ours = sampler.sample(
        model_fn, jax.random.PRNGKey(0), (b, 16, 16, 4), cond=jnp.asarray(cond),
        uncond=jnp.asarray(uncond), guidance_scale=GUIDANCE,
        x_T=jnp.asarray(x_T), dd=dd,
    )
    img_ours = vae.apply({"params": vloaded},
                         jnp.asarray(z_ours) / SCALE_FACTOR,
                         method=AutoencoderKL.decode)

    # --- the composed-system assertion ------------------------------------
    z_ref_nhwc = to_nhwc(z_ref)
    scale = float(np.max(np.abs(z_ref_nhwc))) or 1.0
    np.testing.assert_allclose(np.asarray(z_ours) / scale, z_ref_nhwc / scale,
                               atol=2e-3)
    iscale = float(np.max(np.abs(to_nhwc(img_ref)))) or 1.0
    np.testing.assert_allclose(np.asarray(img_ours) / iscale,
                               to_nhwc(img_ref) / iscale, atol=2e-3)


def test_ddim_timesteps_quad_method_matches_reference(ref_ddim_mod):
    """The 'quad' discretization (DDIM/diffusion_modules.py:50-51) — the
    uniform method is covered end-to-end above."""
    import diffusion_modules as dm

    from sd_tpu.core.schedules import make_ddim_timesteps

    theirs = dm.make_ddim_timesteps("quad", 10, T_DDPM, verbose=False)
    ours = make_ddim_timesteps("quad", 10, T_DDPM)
    np.testing.assert_array_equal(np.asarray(ours), theirs)


# ---------------------------------------------------------------------------
# img2img: stochastic_encode -> CFG decode (reference: DDIM/ddim.py:206-241)
# ---------------------------------------------------------------------------


def test_img2img_stochastic_encode_decode_parity(ref_ddim_mod, ref_unet_mod):
    """The reference img2img composition — stochastic_encode at a DDIM index
    with injected noise, then the partial CFG decode loop from that index
    (reference: DDIM/ddim.py:206-241, the flow VAE/test/img2img drives) —
    versus sd_tpu's DDIMSampler.stochastic_encode + scan decode
    (sd_tpu/diffusion/ddim.py:179-229) on imported weights and the identical
    injected noise. eta=0 keeps both sides deterministic."""
    from sd_tpu.core.schedules import DDIMSchedule, DiffusionSchedule
    from sd_tpu.diffusion.ddim import DDIMSampler
    from sd_tpu.models.sd_import import assert_fully_loaded, import_sd_unet
    from sd_tpu.models.unet_sd import UNetModel

    tm = ref_unet_mod.UNetModel(
        image_size=16, in_channels=4, model_channels=64, out_channels=4,
        num_res_blocks=1, attention_resolutions=[1, 2], channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=24,
    ).float().eval()
    _randomize(tm, 11, std=0.1)
    usd = {k: v.numpy() for k, v in tm.state_dict().items()}

    rng = np.random.default_rng(13)
    b = 2
    x0 = rng.normal(0, 1, (b, 16, 16, 4)).astype(np.float32)
    enc_noise = rng.normal(0, 1, (b, 16, 16, 4)).astype(np.float32)
    cond = rng.normal(0, 1, (b, 7, 24)).astype(np.float32)
    uncond = rng.normal(0, 1, (b, 7, 24)).astype(np.float32)
    t_enc = 3  # of S_DDIM sub-schedule steps

    # --- reference: make_schedule + stochastic_encode + decode ------------
    shim = _ShimLDM(tm, ref_ddim_mod)
    sampler_ref = ref_ddim_mod.DDIMSampler(shim)
    sampler_ref.make_schedule(ddim_num_steps=S_DDIM, ddim_eta=0.0,
                              verbose=False)
    ts = torch.full((b,), t_enc, dtype=torch.long)
    with torch.no_grad():
        z_enc_ref = sampler_ref.stochastic_encode(
            nchw(x0), ts, noise=nchw(enc_noise))
        dec_ref = sampler_ref.decode(
            z_enc_ref, torch.tensor(cond), t_enc,
            unconditional_guidance_scale=GUIDANCE,
            unconditional_conditioning=torch.tensor(uncond))

    # --- sd_tpu on the imported weights -----------------------------------
    model = UNetModel(
        in_channels=4, model_channels=64, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2), num_heads=4,
        transformer_depth=1, context_dim=24,
    )
    uparams = model.init(jax.random.PRNGKey(0), jnp.asarray(x0),
                         jnp.zeros((b,), jnp.int32), jnp.asarray(cond))["params"]
    uloaded = import_sd_unet(uparams, usd, channel_mult=(1, 2),
                             num_res_blocks=1, attention_resolutions=(1, 2),
                             prefix="")
    assert assert_fully_loaded(uparams, uloaded) == []

    sched = DiffusionSchedule.create(
        timesteps=T_DDPM, beta_schedule="linear",
        linear_start=LINEAR_START, linear_end=LINEAR_END)
    sampler = DDIMSampler(sched)
    dd = DDIMSchedule.create(sched, S_DDIM, eta=0.0)

    z_enc = sampler.stochastic_encode(
        jnp.asarray(x0), jnp.full((b,), t_enc, jnp.int32),
        jax.random.PRNGKey(0), dd, noise=jnp.asarray(enc_noise))
    np.testing.assert_allclose(np.asarray(z_enc), to_nhwc(z_enc_ref),
                               atol=1e-5)

    model_fn = lambda x, t, ctx: model.apply({"params": uloaded}, x, t, ctx)
    dec = sampler.decode(
        model_fn, z_enc, t_enc, jax.random.PRNGKey(0),
        cond=jnp.asarray(cond), uncond=jnp.asarray(uncond),
        guidance_scale=GUIDANCE, dd=dd)

    ref = to_nhwc(dec_ref)
    scale = float(np.max(np.abs(ref))) or 1.0
    np.testing.assert_allclose(np.asarray(dec) / scale, ref / scale,
                               atol=2e-3)


# ---------------------------------------------------------------------------
# ancestral DDPM: reference p_sample chain (ldm/diffusion/ddpm.py:314-393)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_ldm_ddpm_mod(ref_codec_mod):
    """Load the reference ldm/diffusion/ddpm.py runnable on CPU.

    `ref_codec_mod` installed the modules.* aliases; this adds stubs for the
    imports the oracle never touches: pytorch_lightning (not in this
    environment), torchvision.utils.make_grid, the first-stage classes, and
    the sibling DDIMSampler import."""
    import types

    import torch.nn as tnn

    if "pytorch_lightning" not in sys.modules:
        pl_stub = types.ModuleType("pytorch_lightning")
        pl_stub.LightningModule = tnn.Module
        util_stub = types.ModuleType("pytorch_lightning.utilities")
        rz = types.ModuleType("pytorch_lightning.utilities.rank_zero")
        rz.rank_zero_only = lambda fn: fn
        pl_stub.utilities = util_stub
        util_stub.rank_zero = rz
        sys.modules["pytorch_lightning"] = pl_stub
        sys.modules["pytorch_lightning.utilities"] = util_stub
        sys.modules["pytorch_lightning.utilities.rank_zero"] = rz
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    import ldm.modules.ema as lema
    sys.modules.setdefault("modules.ema", lema)
    ma = types.ModuleType("models.autoencoder")
    for n in ("VQModelInterface", "AutoencoderKL", "IdentityFirstStage"):
        setattr(ma, n, type(n, (), {}))
    sys.modules.setdefault("models", types.ModuleType("models"))
    sys.modules.setdefault("models.autoencoder", ma)
    dstub = types.ModuleType("diffusion.ddim")
    dstub.DDIMSampler = type("DDIMSampler", (), {})
    sys.modules.setdefault("diffusion", types.ModuleType("diffusion"))
    sys.modules.setdefault("diffusion.ddim", dstub)

    import ldm.diffusion.ddpm as ldpm
    return ldpm


T_ANC = 40


def _anc_model_torch(x, t):
    """Analytic eps model, defined identically on both sides: t-dependent,
    nonlinear in x, bounded. (The real-UNet composition is pinned by
    test_full_pipeline_ddim_cfg_decode_parity; this oracle isolates the
    ancestral update chain.)"""
    tf = (t.float() / T_ANC).reshape(-1, 1, 1, 1)
    return 0.2 * torch.cos(3.0 * tf) * x + 0.1 * torch.sin(2.0 * x) + 0.05 * tf


def _anc_model_jax(x, t, cond):
    tf = (t.astype(jnp.float32) / T_ANC).reshape(-1, 1, 1, 1)
    return (0.2 * jnp.cos(3.0 * tf) * x + 0.1 * jnp.sin(2.0 * x) + 0.05 * tf)


def test_composed_ancestral_ddpm_parity(ref_ldm_ddpm_mod, monkeypatch):
    """The reference's ancestral chain — register_schedule buffer math →
    predict_start_from_noise → clamp → q_posterior → the p_sample update with
    its t==0 noise gate, iterated over all T timesteps
    (ldm/diffusion/ddpm.py:176-231, 314-372, loop body :381-385) — versus
    sd_tpu's single-scan DDPMProcess.p_sample_loop on the identical x_T.

    noise_like is stubbed to zeros / temperature=0 so both trajectories are
    the deterministic posterior-mean chain (the noise SCALE tables are
    asserted against the reference buffers below, so the stochastic branch
    differs only by the shared standard-normal draw). The reference's own
    p_sample_loop wrapper crashes on `torch.randn(shape, device)`
    (:378, device passed positionally) — the loop body it would run is
    replicated verbatim."""
    from sd_tpu.core.schedules import DiffusionSchedule
    from sd_tpu.diffusion.ddpm import DDPMProcess

    mod = ref_ldm_ddpm_mod
    inst = object.__new__(mod.DDPM)
    torch.nn.Module.__init__(inst)
    inst.parameterization = "eps"
    inst.v_posterior = 0.0
    inst.clip_denoised = True
    inst.log_every_t = 1000

    # reference register_schedule bug workaround: `self.num_timesteps =
    # int(betas.shape)` (:199-200) — int() of the shape TUPLE. Feed betas
    # (still computed by the reference's own make_beta_schedule) through an
    # ndarray view whose .shape tuple is int()-able, so the reference code
    # runs unmodified.
    class _IntSize(tuple):
        def __int__(self):
            return self[0]

    class _Betas(np.ndarray):
        @property
        def shape(self):
            return _IntSize(super().shape)

    betas = mod.make_beta_schedule(
        schedule="linear", n_timestep=T_ANC,
        linear_start=LINEAR_START, linear_end=LINEAR_END)
    inst.register_schedule(given_betas=betas.view(_Betas))
    inst.model = _anc_model_torch

    sched = DiffusionSchedule.create(
        timesteps=T_ANC, beta_schedule="linear",
        linear_start=LINEAR_START, linear_end=LINEAR_END)

    # schedule buffers vs the reference's own register_schedule output
    for ours, theirs in [
        (sched.posterior_mean_coef1, inst.posterior_mean_coef1),
        (sched.posterior_mean_coef2, inst.posterior_mean_coef2),
        (sched.posterior_log_variance_clipped,
         inst.posterior_log_variance_clipped),
        (sched.sqrt_recip_alphas_cumprod, inst.sqrt_recip_alphas_cumprod),
        (sched.sqrt_recipm1_alphas_cumprod, inst.sqrt_recipm1_alphas_cumprod),
    ]:
        np.testing.assert_allclose(np.asarray(ours, np.float32),
                                   theirs.numpy(), rtol=2e-5, atol=1e-6)

    monkeypatch.setattr(
        mod, "noise_like",
        lambda shape, device, repeat=False: torch.zeros(shape))

    rng = np.random.default_rng(5)
    b = 2
    x_T = rng.normal(0, 1, (b, 8, 8, 3)).astype(np.float32)

    img = nchw(x_T)
    with torch.no_grad():
        for i in reversed(range(T_ANC)):
            img = inst.p_sample(
                img, t=torch.full((b,), i, dtype=torch.long),
                clip_denoised=inst.clip_denoised)

    proc = DDPMProcess(schedule=sched, clip_denoised=True)
    ours = proc.p_sample_loop(
        _anc_model_jax, jax.random.PRNGKey(0), (b, 8, 8, 3),
        x_T=jnp.asarray(x_T), temperature=0.0)

    np.testing.assert_allclose(np.asarray(ours), to_nhwc(img), atol=2e-4)
