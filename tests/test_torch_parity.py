"""Full-model numerical parity against the reference's own torch source.

The strongest correctness statement available without real SD artifacts:
instantiate the reference torch modules on CPU —
`/root/reference/openai_model/model.py:259` UNetModel and
`/root/reference/ldm/modules/diffusionmodules/model.py:370,468`
Encoder/Decoder — at small-but-real configs, randomize their weights, export
the state_dicts through our importers (`sd_tpu/models/sd_import.py`), and
assert fp32-tolerance output agreement on the same inputs. Unlike
tests/test_sd_import.py (shape plumbing), the oracle here is independent:
the reference code computes the expected outputs.

The reference source needs small shims to run fp32 on CPU:
  * `flash_attn` (CUDA wheel) is stubbed with einsum attention — the math
    flash_attn_func defines (openai_model/attention.py:99-117);
  * the hard-coded fp16 coercions (CrossAttention.convert_to_float16,
    `t_emb.half()` at model.py:566, `.half()` in FeedForward) are undone with
    `model.float()` + a no-op-half tensor subclass for the time embedding;
  * `ldm/` uses both package-relative (`...utils`) and flat (`modules.*`)
    imports; we alias the loaded `ldm.modules.*` modules under `modules.*`.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def _install_flash_stub():
    if "flash_attn" in sys.modules:
        return
    mod = types.ModuleType("flash_attn")

    def flash_attn_func(q, k, v, dropout_p=0.0, softmax_scale=None,
                        causal=False):
        # q/k/v: [B, S, H, D] — the flash-attn layout
        assert not causal
        scale = (softmax_scale if softmax_scale is not None
                 else q.shape[-1] ** -0.5)
        sim = torch.einsum("bqhd,bkhd->bhqk", q.float(), k.float()) * scale
        out = torch.einsum("bhqk,bkhd->bqhd", sim.softmax(dim=-1), v.float())
        return out.to(q.dtype)

    def flash_attn_qkvpacked_func(qkv, dropout_p=0.0, softmax_scale=None,
                                  causal=False):
        return flash_attn_func(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                               dropout_p, softmax_scale, causal)

    mod.flash_attn_func = flash_attn_func
    mod.flash_attn_qkvpacked_func = flash_attn_qkvpacked_func
    # a real ModuleSpec: transformers probes importlib.util.find_spec
    # ("flash_attn") and a spec-less stub raises ValueError there
    import importlib.machinery

    mod.__spec__ = importlib.machinery.ModuleSpec("flash_attn", loader=None)
    sys.modules["flash_attn"] = mod

    if "omegaconf" not in sys.modules:
        # UNetModel.__init__ imports ListConfig only for an isinstance check
        oc = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")
        lc.ListConfig = type("ListConfig", (list,), {})
        oc.listconfig = lc
        sys.modules["omegaconf"] = oc
        sys.modules["omegaconf.listconfig"] = lc


def _add_ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)


def _randomize(module: "torch.nn.Module", seed: int, std: float = 0.2):
    """Give every parameter (incl. zero-inits) a nonzero random value so the
    comparison exercises every layer."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * std)


@pytest.fixture(scope="module")
def ref_unet_mod():
    _install_flash_stub()
    _add_ref_path()
    import openai_model.model as m

    # Neutralize the hard-coded `t_emb.half()` (reference model.py:566) so the
    # fp32 CPU oracle doesn't mix dtypes.
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
    # ldm/modules/diffusionmodules/model.py mixes `from ...utils import` with
    # flat `from modules.attention import`; load under the ldm.* package and
    # alias the flat names.
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


def nchw(x_nhwc: np.ndarray) -> "torch.Tensor":
    return torch.tensor(x_nhwc.transpose(0, 3, 1, 2))


def to_nhwc(t: "torch.Tensor") -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_sd_unet_full_forward_parity(ref_unet_mod):
    """Reference UNetModel (SpatialTransformer path, the SD-v1 block graph at
    openai_model/model.py:259-595) vs our UNetModel through import_sd_unet."""
    from sd_tpu.models.sd_import import assert_fully_loaded, import_sd_unet
    from sd_tpu.models.unet_sd import UNetModel

    tm = ref_unet_mod.UNetModel(
        image_size=16, in_channels=4, model_channels=64, out_channels=4,
        num_res_blocks=1, attention_resolutions=[1, 2], channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=24,
    ).float().eval()
    _randomize(tm, 0)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    model = UNetModel(
        in_channels=4, model_channels=64, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2), num_heads=4,
        transformer_depth=1, context_dim=24,
    )
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 16, 16, 4)).astype(np.float32)
    t = np.array([3, 977], np.int64)
    ctx = rng.normal(0, 1, (2, 7, 24)).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(t.astype(np.int32)),
                        jnp.asarray(ctx))["params"]
    loaded = import_sd_unet(params, sd, channel_mult=(1, 2), num_res_blocks=1,
                            attention_resolutions=(1, 2), prefix="")
    assert assert_fully_loaded(params, loaded) == []

    ours = np.asarray(model.apply({"params": loaded}, jnp.asarray(x),
                                  jnp.asarray(t.astype(np.int32)),
                                  jnp.asarray(ctx)))
    with torch.no_grad():
        theirs = tm(nchw(x), timesteps=torch.tensor(t),
                    context=torch.tensor(ctx))
    np.testing.assert_allclose(ours, to_nhwc(theirs), atol=3e-4, rtol=2e-3)


def test_sd_vae_full_forward_parity(ref_codec_mod):
    """Reference Encoder/Decoder (+1x1 quant convs, the AutoencoderKL graph of
    ldm/models/autoencoder.py:292-430) vs our AutoencoderKL through
    import_sd_vae: encode moments (posterior mean) and full reconstruction."""
    from sd_tpu.models.autoencoder import AutoencoderKL
    from sd_tpu.models.sd_import import assert_fully_loaded, import_sd_vae

    codec = ref_codec_mod
    tenc = codec.Encoder(ch=64, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(), in_channels=3, resolution=32,
                         z_channels=4, double_z=True).eval()
    tdec = codec.Decoder(ch=64, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(), in_channels=3, resolution=32,
                         z_channels=4).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post = torch.nn.Conv2d(4, 4, 1)
    for i, m in enumerate((tenc, tdec, quant, post)):
        _randomize(m, 10 + i)

    sd = {}
    for pfx, m in (("encoder.", tenc), ("decoder.", tdec),
                   ("quant_conv.", quant), ("post_quant_conv.", post)):
        sd.update({pfx + k: v.numpy() for k, v in m.state_dict().items()})

    vae = AutoencoderKL(embed_dim=4, ch=64, ch_mult=(1, 2), num_res_blocks=1,
                        attn_resolutions=(), resolution=32, z_channels=4)
    rng = np.random.default_rng(2)
    x = rng.normal(0, 0.5, (2, 32, 32, 3)).astype(np.float32)
    params = vae.init(jax.random.PRNGKey(0), jnp.asarray(x),
                      jax.random.PRNGKey(1))["params"]
    loaded = import_sd_vae(params, sd, ch_mult=(1, 2), num_res_blocks=1,
                           attn_resolutions=(), resolution=32, prefix="")
    assert assert_fully_loaded(params, loaded) == []

    posterior = vae.apply({"params": loaded}, jnp.asarray(x),
                          method=AutoencoderKL.encode)
    our_mean = np.asarray(posterior.mode())
    our_recon = np.asarray(vae.apply({"params": loaded},
                                     jnp.asarray(our_mean),
                                     method=AutoencoderKL.decode))

    with torch.no_grad():
        moments = quant(tenc(nchw(x)))
        their_mean, _ = torch.chunk(moments, 2, dim=1)
        their_recon = tdec(post(their_mean))

    np.testing.assert_allclose(our_mean, to_nhwc(their_mean),
                               atol=3e-4, rtol=2e-3)
    np.testing.assert_allclose(our_recon, to_nhwc(their_recon),
                               atol=5e-4, rtol=2e-3)
