"""Weight-importer parity tests: torch state_dict → Flax params.

The reference's parity oracle is a hand-written weight map
(VAE/test/weight_test.md, SURVEY.md §4); here importers are verified by
building the torch module (HF transformers is available, CPU), copying its
random weights through the importer, and checking outputs agree at fp32
tolerance on the same inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_clip_text_import_matches_hf():
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

    from sd_tpu.models.clip_text import (
        ClipTextConfig,
        ClipTextTransformer,
        import_torch_clip_text,
    )

    hf_cfg = HFCfg(
        vocab_size=99, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu",
    )
    with torch.no_grad():
        hf = CLIPTextModel(hf_cfg).eval()

    cfg = ClipTextConfig(vocab_size=99, hidden_size=32, num_layers=2,
                         num_heads=4, max_length=16)
    model = ClipTextTransformer(cfg)
    ids_np = np.array([[1, 5, 9, 2, 7, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]],
                      np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids_np))["params"]

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = import_torch_clip_text(params, sd)

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(ids_np)))
    with torch.no_grad():
        theirs = hf(torch.tensor(ids_np.astype(np.int64))).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-3)

    # clip_skip parity: hidden state N-1 layers from the end + final LN
    # (the A1111/SD2.x convention; HF exposes it as hidden_states[-skip])
    ours2 = np.asarray(model.apply({"params": params}, jnp.asarray(ids_np),
                                   clip_skip=2))
    with torch.no_grad():
        hs = hf(torch.tensor(ids_np.astype(np.int64)),
                output_hidden_states=True).hidden_states[-2]
        theirs2 = hf.text_model.final_layer_norm(hs).numpy()
    assert not np.allclose(ours2, theirs, atol=1e-3)  # actually different
    np.testing.assert_allclose(ours2, theirs2, atol=2e-4, rtol=2e-3)

    # clip_skip=1 is exactly the default path
    ours1 = np.asarray(model.apply({"params": params}, jnp.asarray(ids_np),
                                   clip_skip=1))
    np.testing.assert_array_equal(ours1, ours)


def test_vgg16_import_shapes_and_forward():
    """Importer maps a synthetic torchvision-layout state_dict; forward must
    change accordingly (no torchvision in this image, so weights are random
    but layout/transposition is exercised)."""
    from sd_tpu.models.lpips import (
        _VGG_TORCH_IDX,
        Vgg16Features,
        import_torch_vgg16,
    )

    m = Vgg16Features()
    x = jnp.ones((1, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]

    # synthetic torch state_dict with the torchvision features.* layout
    rng = np.random.default_rng(0)
    plan = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
            (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
            (512, 512), (512, 512)]
    sd = {}
    for idx, (cin, cout) in zip(_VGG_TORCH_IDX, plan):
        sd[f"features.{idx}.weight"] = rng.normal(0, 0.05, (cout, cin, 3, 3))
        sd[f"features.{idx}.bias"] = rng.normal(0, 0.05, (cout,))

    before = m.apply({"params": params}, x)[0]
    new_params = import_torch_vgg16(params, sd)
    after = m.apply({"params": new_params}, x)[0]
    assert new_params["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
    np.testing.assert_allclose(
        np.asarray(new_params["conv1_1"]["kernel"]),
        sd["features.0.weight"].transpose(2, 3, 1, 0), atol=1e-6)
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_vgg16_import_matches_torch_conv():
    """One conv stage through the importer == torch's F.conv2d on the same
    weights (NCHW↔NHWC + OIHW↔HWIO round trip)."""
    import torch.nn.functional as F

    from sd_tpu.models.lpips import Vgg16Features, import_torch_vgg16, _VGG_TORCH_IDX

    m = Vgg16Features()
    x_np = np.random.default_rng(1).normal(0, 1, (1, 8, 8, 3)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x_np))["params"]

    rng = np.random.default_rng(2)
    plan = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
            (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
            (512, 512), (512, 512)]
    sd = {}
    for idx, (cin, cout) in zip(_VGG_TORCH_IDX, plan):
        sd[f"features.{idx}.weight"] = rng.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
        sd[f"features.{idx}.bias"] = np.zeros((cout,), np.float32)
    params = import_torch_vgg16(params, sd)

    feats = m.apply({"params": params}, jnp.asarray(x_np))
    ours_first = np.asarray(feats[0])  # after conv1_1 relu conv1_2 relu

    with torch.no_grad():
        t = torch.tensor(x_np.transpose(0, 3, 1, 2))
        t = F.relu(F.conv2d(t, torch.tensor(sd["features.0.weight"]),
                            torch.tensor(sd["features.0.bias"]), padding=1))
        t = F.relu(F.conv2d(t, torch.tensor(sd["features.2.weight"]),
                            torch.tensor(sd["features.2.bias"]), padding=1))
    theirs = t.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours_first, theirs, atol=1e-4, rtol=1e-3)
