"""LPIPS / discriminator / GAN-loss / two-optimizer train-step tests.
Reference semantics: SURVEY.md §2.5-2.7, §3.4-3.5 (VAE/loss.py,
vqvae/vqlpips.py, Discriminator/discriminator.py, Lpips/lpips.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.losses.gan import (
    GanLossConfig,
    adopt_weight,
    calculate_adaptive_weight,
    hinge_d_loss,
    vanilla_d_loss,
)
from sd_tpu.models.autoencoder import AutoencoderKL, VQModel
from sd_tpu.models.discriminator import (
    ActNorm,
    NLayerDiscriminator,
    UNetGenerator,
    actnorm_ddi,
)
from sd_tpu.models.lpips import LPIPS, Vgg16Features
from sd_tpu.train.gan import (
    gan_adam,
    init_gan_state,
    make_kl_gan_train_step,
    make_vq_gan_train_step,
)


def test_vgg16_feature_shapes(rng):
    m = Vgg16Features()
    x = jnp.ones((1, 32, 32, 3))
    params = m.init(rng, x)
    feats = m.apply(params, x)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 32, 32, 64), (1, 16, 16, 128), (1, 8, 8, 256),
        (1, 4, 4, 512), (1, 2, 2, 512),
    ]


def test_lpips_zero_for_identical_inputs(rng):
    m = LPIPS()
    x = jax.random.uniform(rng, (2, 16, 16, 3), minval=-1, maxval=1)
    params = m.init(rng, x, x)
    d = m.apply(params, x, x)
    assert d.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    # different inputs -> positive distance
    y = -x
    d2 = m.apply(params, x, y)
    assert float(jnp.min(d2)) > 0.0


def test_discriminator_patch_logits(rng):
    m = NLayerDiscriminator(ndf=8, n_layers=2, use_actnorm=True)
    x = jnp.ones((2, 32, 32, 3))
    variables = m.init(rng, x)
    logits = m.apply(variables, x)
    # two stride-2 convs: 32 -> 8; patch logit map with 1 channel
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    assert logits.shape[1] < 32


def test_discriminator_batchnorm_mode(rng):
    m = NLayerDiscriminator(ndf=8, n_layers=2, use_actnorm=False)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    variables = m.init(rng, x)
    assert "batch_stats" in variables
    logits, mut = m.apply(variables, x, mutable=["batch_stats"])
    assert logits.shape[-1] == 1


def test_discriminator_eval_mode_uses_running_stats(rng):
    """Pins the train-vs-eval BatchNorm semantics (torch defaults,
    reference Discriminator/discriminator.py:239-289): a train-mode apply
    UPDATES the running stats; eval mode normalizes WITH them, so on a
    shifted input the two modes disagree."""
    m = NLayerDiscriminator(ndf=8, n_layers=2, use_actnorm=False)
    x = jax.random.normal(rng, (4, 32, 32, 3)) * 2.0 + 1.5  # non-unit stats
    variables = m.init(rng, x)
    stats0 = variables["batch_stats"]

    train_logits, mut = m.apply(variables, x, mutable=["batch_stats"])
    stats1 = mut["batch_stats"]
    # running stats moved toward the batch stats (momentum 0.9)
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), stats0, stats1)
    assert max(jax.tree.leaves(moved)) > 1e-3

    eval_logits = m.apply(
        {"params": variables["params"], "batch_stats": stats1}, x,
        train=False)
    # eval stats (one 0.9-momentum step from init) != the batch's own stats
    assert float(jnp.max(jnp.abs(eval_logits - train_logits))) > 1e-4

    # eval mode must not request mutation and must be deterministic
    again = m.apply(
        {"params": variables["params"], "batch_stats": stats1}, x,
        train=False)
    assert jnp.array_equal(eval_logits, again)


def test_actnorm_ddi_normalizes(rng):
    m = ActNorm()
    x = jax.random.normal(rng, (8, 4, 4, 3)) * 3.0 + 5.0
    variables = m.init(rng, x)
    p = actnorm_ddi(variables["params"], x)
    h = m.apply({"params": p}, x)
    np.testing.assert_allclose(float(jnp.mean(h)), 0.0, atol=1e-4)
    np.testing.assert_allclose(float(jnp.std(h)), 1.0, atol=1e-2)
    # reverse round-trips
    back = m.apply({"params": p}, h, True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_unet_generator_shapes(rng):
    m = UNetGenerator(ngf=8, n_res_blocks=1)
    x = jnp.ones((1, 16, 16, 3))
    params = m.init(rng, x)
    out = m.apply(params, x)
    assert out.shape == (1, 16, 16, 3)
    assert jnp.all(jnp.abs(out) <= 1.0)


def test_hinge_and_vanilla_d_losses():
    real = jnp.array([2.0, 2.0])
    fake = jnp.array([-2.0, -2.0])
    # perfectly separated: hinge saturates at 0
    assert float(hinge_d_loss(real, fake)) == 0.0
    assert float(vanilla_d_loss(real, fake)) < 0.2
    # inverted predictions are penalized
    assert float(hinge_d_loss(fake, real)) == 3.0


def test_adopt_weight_gate():
    assert float(adopt_weight(0.5, jnp.asarray(10), threshold=50)) == 0.0
    assert float(adopt_weight(0.5, jnp.asarray(50), threshold=50)) == 0.5


def test_adaptive_weight_ratio():
    nll_g = jnp.full((4,), 2.0)
    g_g = jnp.full((4,), 1.0)
    w = calculate_adaptive_weight(nll_g, g_g, discriminator_weight=0.5)
    np.testing.assert_allclose(float(w), 0.5 * 2.0, rtol=1e-3)


def _tiny_cfg(**kw):
    base = dict(disc_start=0, kl_weight=1e-6, disc_weight=0.5,
                perceptual_weight=0.0, disc_factor=1.0)
    base.update(kw)
    return GanLossConfig(**base)


def test_kl_gan_train_step_runs(rng):
    vae = AutoencoderKL(embed_dim=2, ch=8, ch_mult=(1,), num_res_blocks=1,
                        resolution=8, z_channels=2)
    disc = NLayerDiscriminator(ndf=8, n_layers=1, use_actnorm=True)
    x = jax.random.normal(rng, (2, 8, 8, 3))
    vparams = vae.init(rng, x, rng)["params"]
    dvars = disc.init(rng, x)

    ae_apply = lambda p, x, r: vae.apply({"params": p}, x, r)
    opt_g, opt_d = gan_adam(1e-3), gan_adam(1e-3)
    state = init_gan_state(vparams, dvars, opt_g, opt_d)
    step = make_kl_gan_train_step(ae_apply, disc, None, opt_g, opt_d, _tiny_cfg())

    for i in range(3):
        state, logs = step(state, x, jax.random.PRNGKey(i))
    assert int(state.step) == 3
    for k in ("train/total_loss", "train/kl_loss", "train/d_weight",
              "train/disc_loss", "train/logits_real"):
        assert np.isfinite(float(logs[k])), k
    # generator params actually moved
    assert not np.allclose(
        np.asarray(state.params_g["model"]["quant_conv"]["kernel"]),
        np.asarray(vparams["quant_conv"]["kernel"]),
    )


def test_vq_gan_train_step_runs(rng):
    vq = VQModel(n_embed=16, embed_dim=2, ch=8, ch_mult=(1,), num_res_blocks=1,
                 resolution=8, z_channels=2)
    disc = NLayerDiscriminator(ndf=8, n_layers=1, use_actnorm=True)
    x = jax.random.normal(rng, (2, 8, 8, 3))
    vparams = vq.init(rng, x)["params"]
    dvars = disc.init(rng, x)

    vq_apply = lambda p, x: vq.apply({"params": p}, x)
    opt_g, opt_d = gan_adam(1e-3), gan_adam(1e-3)
    state = init_gan_state(vparams, dvars, opt_g, opt_d)
    step = make_vq_gan_train_step(vq_apply, disc, None, opt_g, opt_d,
                                  _tiny_cfg(codebook_weight=1.0))

    state, logs = step(state, x, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["train/quant_loss"]))
    assert np.isfinite(float(logs["train/perplexity"]))
    assert int(state.step) == 1


def test_gan_step_disc_gated_before_start(rng):
    """Before disc_start the d-weighted generator term and disc loss are 0."""
    vae = AutoencoderKL(embed_dim=2, ch=8, ch_mult=(1,), num_res_blocks=1,
                        resolution=8, z_channels=2)
    disc = NLayerDiscriminator(ndf=8, n_layers=1, use_actnorm=True)
    x = jax.random.normal(rng, (2, 8, 8, 3))
    vparams = vae.init(rng, x, rng)["params"]
    dvars = disc.init(rng, x)
    ae_apply = lambda p, x, r: vae.apply({"params": p}, x, r)
    opt_g, opt_d = gan_adam(1e-3), gan_adam(1e-3)
    state = init_gan_state(vparams, dvars, opt_g, opt_d)
    step = make_kl_gan_train_step(ae_apply, disc, None, opt_g, opt_d,
                                  _tiny_cfg(disc_start=100))
    state, logs = step(state, x, jax.random.PRNGKey(0))
    assert float(logs["train/disc_factor"]) == 0.0
    assert float(logs["train/disc_loss"]) == 0.0


def test_make_lpips_fn_random_surrogate():
    """Without calibrated artifacts, make_lpips_fn(mode='auto'|'random') gives
    a frozen fixed-seed perceptual distance: zero at identity, positive and
    input-differentiable otherwise (the documented surrogate for the
    reference's pretrained LPIPS, Lpips/lpips.py:131-231)."""
    import jax
    import jax.numpy as jnp

    from sd_tpu.models.lpips import make_lpips_fn

    fn = make_lpips_fn(mode="random", image_size=32)
    assert fn is not None and fn.calibrated is False
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 0.5
    y = jnp.clip(x + 0.3, -1, 1)
    d_same = fn(x, x)
    d_diff = fn(x, y)
    assert d_same.shape == (2, 1, 1, 1)
    assert float(jnp.abs(d_same).max()) < 1e-5
    assert float(d_diff.min()) > 0.0
    g = jax.grad(lambda a: jnp.sum(fn(a, y)))(x)
    assert float(jnp.abs(g).max()) > 0.0
    # deterministic across constructions (fixed seed)
    fn2 = make_lpips_fn(mode="random", image_size=32)
    assert float(jnp.abs(fn2(x, y) - d_diff).max()) < 1e-6
    assert make_lpips_fn(mode="none") is None


def test_kl_gan_step_with_random_lpips(tmp_path):
    """The perceptual term actually flows through the KL-GAN step when the
    random-VGG surrogate is active (previously silently dropped)."""
    import numpy as np
    from PIL import Image

    from sd_tpu.core.config import load_yaml
    from sd_tpu.train.runners import train_kl_vae

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")

    cfg = load_yaml("configs/kl_smoke.yaml")
    cfg["train"]["total_steps"] = 1
    cfg["train"]["checkpoint_every"] = 1
    cfg["train"]["eval_every"] = 100  # skip the eval sampler in this smoke
    cfg["loss"]["perceptual_weight"] = 1.0
    cfg["loss"]["perceptual"] = "random"
    state = train_kl_vae(cfg, str(d), out_dir=str(tmp_path / "run"))
    assert int(state.step) == 1
