"""Prompt attention weighting: parser grammar, weight application,
and the serving-pipeline integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from sd_tpu.utils.prompt_weights import (
    apply_prompt_weights,
    parse_weighted_prompt,
    tokenize_weighted,
)


@pytest.mark.parametrize("text,expected", [
    ("a cat", [("a cat", 1.0)]),
    ("a (cat)", [("a ", 1.0), ("cat", 1.1)]),
    ("a ((cat))", [("a ", 1.0), ("cat", 1.1 * 1.1)]),
    ("a (cat:1.5)", [("a ", 1.0), ("cat", 1.5)]),
    ("a [cat]", [("a ", 1.0), ("cat", 1 / 1.1)]),
    ("a [[cat]]", [("a ", 1.0), ("cat", 1 / 1.1 / 1.1)]),
    ("(a (cat:2.0) dog)", [("a ", 1.1), ("cat", 2.2), (" dog", 1.1)]),
    (r"a \(cat\)", [("a (cat)", 1.0)]),
    (r"50\% \[off\]", [(r"50\% [off]", 1.0)]),  # only brackets escape
    ("(unclosed", [("unclosed", 1.1)]),
    ("plain:1.5", [("plain:1.5", 1.0)]),       # ':' outside parens literal
    ("(x:y)", [("x:y", 1.1)]),                  # non-numeric weight literal
    ("", [("", 1.0)]),
    ("(cat:0.5) (dog:0.5)", [("cat", 0.5), (" ", 1.0), ("dog", 0.5)]),
])
def test_parse_grammar(text, expected):
    got = parse_weighted_prompt(text)
    assert len(got) == len(expected), got
    for (gf, gw), (ef, ew) in zip(got, expected):
        assert gf == ef, got
        assert abs(gw - ew) < 1e-9, got


def test_parse_explicit_weight_rewrites_span():
    # the provisional 1.1 inside '(...)' must be replaced, not stacked
    [(frag, w)] = parse_weighted_prompt("(cat:1.3)")
    assert frag == "cat" and abs(w - 1.3) < 1e-9
    # nested explicit weights compose with outer provisional ones
    got = parse_weighted_prompt("((cat:2.0))")
    assert got == [("cat", pytest.approx(2.0 * 1.1))]


def test_tokenize_weighted_alignment():
    # word-index fake tokenizer: 1 token per word
    vocab = {}

    def enc(text):
        return [vocab.setdefault(w, len(vocab) + 10) for w in text.split()]

    ids, wts = tokenize_weighted(
        ["a (big:1.5) cat", "dog"], enc, max_length=8, bos_id=1, eos_id=2)
    assert ids.shape == (2, 8) and wts.shape == (2, 8)
    assert ids[0, 0] == 1 and wts[0, 0] == 1.0           # BOS
    np.testing.assert_allclose(wts[0, 1:4], [1.0, 1.5, 1.0])
    assert ids[0, 4] == 2 and wts[0, 4] == 1.0           # EOS
    np.testing.assert_array_equal(wts[1], np.ones(8))    # plain prompt

    # truncation keeps the EOS terminal
    ids2, wts2 = tokenize_weighted(
        ["one two three four five six seven eight nine (ten:2.0)"],
        enc, max_length=5, bos_id=1, eos_id=2)
    assert ids2[0, -1] == 2 and wts2[0, -1] == 1.0


def test_apply_weights_identity_and_effect():
    rng = np.random.RandomState(0)
    emb = jnp.asarray(rng.randn(2, 6, 4).astype(np.float32))
    ones = jnp.ones((2, 6), jnp.float32)
    np.testing.assert_array_equal(np.asarray(apply_prompt_weights(emb, ones)),
                                  np.asarray(emb))  # exact no-op
    w = ones.at[0, 2].set(1.5)
    out = np.asarray(apply_prompt_weights(emb, w))
    assert not np.allclose(out[0], np.asarray(emb)[0])
    np.testing.assert_array_equal(out[1], np.asarray(emb)[1])  # per-sequence
    # mean preservation (the rescale convention)
    np.testing.assert_allclose(out[0].mean(), np.asarray(emb)[0].mean(),
                               rtol=1e-5)


def test_pipeline_weighted_prompts():
    """End-to-end: emphasis changes the generation, plain prompts are
    bitwise-unchanged, and weight 1.0 emphasis == plain."""
    import jax

    from sd_tpu.pipeline import Text2ImagePipeline

    pipe = Text2ImagePipeline.from_config("configs/sd_txt2img_smoke.yaml",
                                          param_dtype=None)
    # perturb past the zero-init output convs so conditioning matters
    pipe.unet_params = jax.tree.map(
        lambda p: p + 0.05 * jnp.cos(1.7 * jnp.arange(p.size, dtype=jnp.float32)
                                     ).reshape(p.shape).astype(p.dtype),
        pipe.unet_params)
    kw = dict(num_steps=2, guidance_scale=2.0, seed=3)
    plain = pipe.generate(["a big cat"], **kw)
    weighted = pipe.generate(["a (big:1.8) cat"], **kw)
    assert not np.array_equal(plain, weighted)
    # explicit weight 1.0 tokenizes identically (hash tokenizer splits on
    # whitespace) and applies no scaling -> same image
    unit = pipe.generate(["a (big:1.0) cat"], **kw)
    np.testing.assert_array_equal(plain, unit)
    # weighting in the negative prompt also flows
    negw = pipe.generate(["a big cat"], negative_prompt="(blurry:1.6)", **kw)
    negp = pipe.generate(["a big cat"], negative_prompt="blurry", **kw)
    assert not np.array_equal(negw, negp)
