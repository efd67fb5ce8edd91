"""Textual inversion: placeholder machinery, the trainer (vectors move,
everything else frozen), the embedding artifact, and serving load."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("ti_imgs")
    rng = np.random.default_rng(1)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")
    return str(d)


def test_placeholder_machinery():
    from sd_tpu.models.clip_text import SimpleHashTokenizer
    from sd_tpu.train.textual_inversion import (
        expand_placeholder,
        patch_embedding_rows,
        placeholder_ids,
    )

    assert expand_placeholder("<x>", 3) == ["<x>", "<x>#1", "<x>#2"]
    tok = SimpleHashTokenizer(max_length=16, vocab_size=1000)
    ids = placeholder_ids(tok, "<x>", 3)
    assert ids.shape == (3,) and len(set(ids.tolist())) == 3
    # each expansion word round-trips through the tokenizer to its id
    for w, i in zip(expand_placeholder("<x>", 3), ids):
        assert tok.encode_chunk(w) == [int(i)]

    params = {"token_embedding": {"embedding": jnp.zeros((1000, 8))},
              "other": jnp.ones(3)}
    vecs = jnp.arange(24, dtype=jnp.float32).reshape(3, 8)
    patched = patch_embedding_rows(params, ids, vecs)
    table = np.asarray(patched["token_embedding"]["embedding"])
    np.testing.assert_array_equal(table[np.asarray(ids)], np.asarray(vecs))
    mask = np.ones(1000, bool)
    mask[np.asarray(ids)] = False
    assert (table[mask] == 0).all()  # nothing else touched
    np.testing.assert_array_equal(np.asarray(patched["other"]), np.ones(3))


def test_train_textual_inversion(image_dir, tmp_path):
    """Few-step trainer smoke: only the vectors change, the artifact is
    written, and the pipeline loads + uses it."""
    from sd_tpu.core.config import load_yaml
    from sd_tpu.train.textual_inversion import train_textual_inversion

    cfg = load_yaml("configs/ti_smoke.yaml")
    cfg["train"]["total_steps"] = 3
    cfg["train"]["checkpoint_every"] = 3
    cfg["train"]["eval_every"] = 100
    out = str(tmp_path / "ti_run")
    state = train_textual_inversion(cfg, image_dir, out_dir=out)
    assert int(state.step) == 3
    assert set(state.params) == {"vectors"}
    assert state.params["vectors"].shape == (2, 32)
    emb_path = os.path.join(out, "embedding.safetensors")
    assert os.path.exists(emb_path)

    # vectors moved from their initializer
    from sd_tpu.utils.safetensors_io import load_safetensors

    learned = load_safetensors(emb_path)["<thing>"]
    assert learned.shape == (2, 32)

    # serving: load into the pipeline; the placeholder changes generations
    from sd_tpu.pipeline import Text2ImagePipeline

    pipe = Text2ImagePipeline.from_config("configs/sd_txt2img_smoke.yaml",
                                          param_dtype=None)
    pipe.unet_params = jax.tree.map(
        lambda p: p + 0.05 * jnp.cos(1.7 * jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape).astype(p.dtype),
        pipe.unet_params)
    kw = dict(num_steps=2, guidance_scale=2.0, seed=9)
    before = pipe.generate(["a photo of a <thing>"], **kw)
    loaded = pipe.load_textual_inversion(emb_path)
    assert loaded == ["<thing>"]
    after = pipe.generate(["a photo of a <thing>"], **kw)
    assert not np.array_equal(before, after)
    # unrelated prompts are unaffected only if they avoid the patched rows;
    # determinism of the loaded state itself:
    again = pipe.generate(["a photo of a <thing>"], **kw)
    np.testing.assert_array_equal(after, again)


def test_embedding_dim_mismatch_rejected(tmp_path):
    from sd_tpu.pipeline import Text2ImagePipeline
    from sd_tpu.train.textual_inversion import save_embedding

    path = str(tmp_path / "bad.safetensors")
    save_embedding(path, "<bad>", np.zeros((1, 7), np.float32))
    pipe = Text2ImagePipeline.from_config("configs/sd_txt2img_smoke.yaml",
                                          param_dtype=None)
    with pytest.raises(ValueError, match="hidden size"):
        pipe.load_textual_inversion(path)
