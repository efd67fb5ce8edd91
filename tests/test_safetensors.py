"""Native safetensors I/O: format compliance (cross-validated against the
official library when present) and the checkpoint-surface integration."""

import numpy as np
import pytest

import ml_dtypes

from sd_tpu.utils.safetensors_io import load_safetensors, save_safetensors


def _sample_tensors():
    rng = np.random.RandomState(0)
    return {
        "a.weight": rng.randn(4, 3, 2).astype(np.float32),
        "a.bias": rng.randn(7).astype(np.float16),
        "b.scale": rng.randn(3, 3).astype(np.float32).astype(ml_dtypes.bfloat16),
        "ids": np.arange(12, dtype=np.int64).reshape(3, 4),
        "flag": np.array(True),
        "scalar": np.array(2.5, dtype=np.float32),
    }


def test_roundtrip(tmp_path):
    path = str(tmp_path / "t.safetensors")
    t = _sample_tensors()
    save_safetensors(path, t, metadata={"format": "pt", "note": "x"})
    back, meta = load_safetensors(path, return_metadata=True)
    assert meta == {"format": "pt", "note": "x"}
    assert set(back) == set(t)
    for k in t:
        assert back[k].dtype == np.asarray(t[k]).dtype, k
        assert back[k].shape == np.asarray(t[k]).shape, k
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(t[k]), err_msg=k)


def test_cross_validation_official_library(tmp_path):
    """Our writer must be readable by the official lib and vice versa —
    the strongest format-compliance oracle available offline."""
    st = pytest.importorskip("safetensors.numpy")
    t = {k: v for k, v in _sample_tensors().items()
         if v.dtype != ml_dtypes.bfloat16}  # safetensors.numpy lacks bf16

    ours = str(tmp_path / "ours.safetensors")
    save_safetensors(ours, t, metadata={"format": "pt"})
    theirs_view = st.load_file(ours)
    for k in t:
        np.testing.assert_array_equal(theirs_view[k], t[k], err_msg=k)

    theirs = str(tmp_path / "theirs.safetensors")
    st.save_file(t, theirs, metadata={"format": "pt"})
    ours_view, meta = load_safetensors(theirs, return_metadata=True)
    assert meta["format"] == "pt"
    for k in t:
        np.testing.assert_array_equal(ours_view[k], t[k], err_msg=k)


def test_cross_validation_bf16_torch(tmp_path):
    """bf16 path against safetensors.torch (numpy API lacks bf16)."""
    st = pytest.importorskip("safetensors.torch")
    torch = pytest.importorskip("torch")

    x32 = np.random.RandomState(1).randn(5, 6).astype(np.float32)
    path = str(tmp_path / "bf16.safetensors")
    st.save_file({"w": torch.from_numpy(x32).to(torch.bfloat16)}, path)
    back = load_safetensors(path)
    assert back["w"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        np.asarray(back["w"], dtype=np.float32),
        torch.from_numpy(x32).to(torch.bfloat16).to(torch.float32).numpy())

    ours = str(tmp_path / "bf16b.safetensors")
    save_safetensors(ours, {"w": x32.astype(ml_dtypes.bfloat16)})
    w = st.load_file(ours)["w"]
    assert w.dtype == torch.bfloat16
    np.testing.assert_array_equal(
        w.to(torch.float32).numpy(),
        x32.astype(ml_dtypes.bfloat16).astype(np.float32))


def test_malformed_rejected(tmp_path):
    path = str(tmp_path / "bad.safetensors")
    t = {"w": np.zeros((2, 2), dtype=np.float32)}
    save_safetensors(path, t)
    raw = bytearray(open(path, "rb").read())
    # corrupt the declared data_offsets span via shape (header is JSON text)
    corrupted = bytes(raw).replace(b'"shape":[2,2]', b'"shape":[2,3]')
    bad = str(tmp_path / "bad2.safetensors")
    open(bad, "wb").write(corrupted)
    with pytest.raises(ValueError, match="data_offsets"):
        load_safetensors(bad)


def test_sd_checkpoint_safetensors_suffix(tmp_path):
    """load_sd_checkpoint / save_sd_checkpoint dispatch on the suffix, so
    the whole import/export surface (incl. Text2ImagePipeline.from/to_
    sd_checkpoint) speaks the ecosystem format."""
    from sd_tpu.models.sd_export import save_sd_checkpoint
    from sd_tpu.models.sd_import import load_sd_checkpoint

    sd = {"model.diffusion_model.x": np.random.RandomState(2)
          .randn(3, 4).astype(np.float32)}
    path = str(tmp_path / "w.safetensors")
    save_sd_checkpoint(path, sd)
    back = load_sd_checkpoint(path)
    np.testing.assert_array_equal(back["model.diffusion_model.x"],
                                  sd["model.diffusion_model.x"])

    half_path = str(tmp_path / "w16.safetensors")
    save_sd_checkpoint(half_path, sd, half=True)
    back16 = load_sd_checkpoint(half_path)  # reader upcasts to fp32
    assert back16["model.diffusion_model.x"].dtype == np.float32
    np.testing.assert_array_equal(
        back16["model.diffusion_model.x"],
        sd["model.diffusion_model.x"].astype(np.float16).astype(np.float32))


def test_pipeline_safetensors_roundtrip(tmp_path):
    """Pipeline-level: to_sd_checkpoint(.safetensors) -> from_sd_checkpoint
    reproduces identical generations."""
    from sd_tpu.pipeline import Text2ImagePipeline

    cfg = "configs/sd_txt2img_smoke.yaml"
    pipe = Text2ImagePipeline.from_config(cfg, param_dtype=None)
    path = str(tmp_path / "pipe.safetensors")
    pipe.to_sd_checkpoint(path)
    back = Text2ImagePipeline.from_sd_checkpoint(cfg, path, param_dtype=None)
    a = pipe.generate(["a cat"], num_steps=2, guidance_scale=2.0, seed=5)
    b = back.generate(["a cat"], num_steps=2, guidance_scale=2.0, seed=5)
    np.testing.assert_array_equal(a, b)
