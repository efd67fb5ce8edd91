"""Checkpoint merging: endpoint exactness, add-difference semantics, and
interop with the export/import surface."""

import numpy as np
import pytest

from sd_tpu.utils.merge import merge_checkpoints


def _sd(seed):
    rng = np.random.RandomState(seed)
    return {"model.w": rng.randn(3, 4).astype(np.float32),
            "model.b": rng.randn(4).astype(np.float16)}


def test_weighted_endpoints_and_interpolation():
    a, b = _sd(0), _sd(1)
    m0, _ = merge_checkpoints(a, b, alpha=0.0)
    m1, _ = merge_checkpoints(a, b, alpha=1.0)
    for k in a:
        np.testing.assert_allclose(m0[k], a[k], atol=1e-3)
        np.testing.assert_allclose(m1[k], b[k], atol=1e-3)
    mh, _ = merge_checkpoints(a, b, alpha=0.5)
    np.testing.assert_allclose(
        mh["model.w"], 0.5 * a["model.w"] + 0.5 * b["model.w"], rtol=1e-6)
    assert mh["model.b"].dtype == np.float16  # dtype preserved


def test_add_difference():
    a, b, c = _sd(0), _sd(1), _sd(2)
    m, _ = merge_checkpoints(a, b, c=c, alpha=1.0, mode="add_difference")
    np.testing.assert_allclose(
        m["model.w"], a["model.w"] + (b["model.w"] - c["model.w"]),
        rtol=1e-5)
    # B == C: transplanting a zero diff is identity
    mi, _ = merge_checkpoints(a, b, c=b, alpha=0.7, mode="add_difference")
    np.testing.assert_allclose(mi["model.w"], a["model.w"], atol=1e-6)
    with pytest.raises(ValueError, match="base checkpoint"):
        merge_checkpoints(a, b, mode="add_difference")


def test_missing_and_mismatched_keys():
    a, b = _sd(0), _sd(1)
    a["only_a"] = np.zeros(2, np.float32)
    m, skipped = merge_checkpoints(a, b, alpha=0.5)
    assert skipped == ["only_a"]
    np.testing.assert_array_equal(m["only_a"], a["only_a"])
    b2 = dict(b, **{"model.w": np.zeros((2, 2), np.float32)})
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_checkpoints(a, b2)


def test_merge_through_checkpoint_surface(tmp_path):
    """Merge two exported smoke checkpoints and load the result back —
    the full community merge workflow on this framework's surface."""
    from sd_tpu.models.sd_export import save_sd_checkpoint
    from sd_tpu.models.sd_import import load_sd_checkpoint
    from sd_tpu.pipeline import Text2ImagePipeline

    cfg = "configs/sd_txt2img_smoke.yaml"
    import jax

    p1 = Text2ImagePipeline.from_config(cfg, param_dtype=None)
    p2 = Text2ImagePipeline.from_config(cfg, param_dtype=None,
                                        rng=jax.random.PRNGKey(42))
    a_path, b_path = str(tmp_path / "a.safetensors"), str(tmp_path / "b.safetensors")
    p1.to_sd_checkpoint(a_path)
    p2.to_sd_checkpoint(b_path)
    merged, skipped = merge_checkpoints(
        load_sd_checkpoint(a_path), load_sd_checkpoint(b_path), alpha=0.5)
    assert not skipped
    out = str(tmp_path / "m.safetensors")
    save_sd_checkpoint(out, merged)
    pm = Text2ImagePipeline.from_sd_checkpoint(cfg, out, param_dtype=None)
    # merged pipeline generates (finite, right shape) and differs from both
    img = pm.generate(["a cat"], num_steps=2, guidance_scale=2.0, seed=1)
    assert img.shape == (1, 32, 32, 3)
    ia = p1.generate(["a cat"], num_steps=2, guidance_scale=2.0, seed=1)
    assert not np.array_equal(img, ia)
