"""Native C++ image loader: build, PIL parity, batch API, dataset fast path.

The native loader (sd_tpu/native/image_loader.cc) replaces the PIL decode
path of the reference's loaders (reference: DDPM/ImageDataset.py:9-47)
with libjpeg/libpng + PIL-compatible separable resampling. These tests pin
the parity contract: every decoded pixel within 1/255 of the PIL path.
"""

import numpy as np
import pytest
from PIL import Image

from sd_tpu import native
from sd_tpu.data.datasets import ImageFolderDataset, _load_image

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader did not build on this host"
)

# 1 u8 step scaled to the [-1, 1] range, plus float slack.
TOL = 1.05 / 127.5


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(7)
    # Non-square so resize actually resamples both axes differently.
    arr = (rng.random((93, 141, 3)) * 255).astype(np.uint8)
    paths = {}
    for name, save in [
        ("rgb.jpg", lambda p: Image.fromarray(arr).save(p, quality=95)),
        ("rgb.png", lambda p: Image.fromarray(arr).save(p)),
        ("gray.jpg", lambda p: Image.fromarray(arr[..., 0]).save(p)),
        ("rgba.png", lambda p: Image.fromarray(
            np.dstack([arr, arr[..., :1]])).save(p)),
    ]:
        path = root / name
        save(str(path))
        paths[name] = str(path)
    return root, paths


def _pil(path, size, method, center_crop=False):
    resample = {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC}[method]
    img = Image.open(path).convert("RGB")
    if center_crop:
        w, h = img.size
        s = min(w, h)
        img = img.crop(((w - s) // 2, (h - s) // 2,
                        (w + s) // 2, (h + s) // 2))
    return np.asarray(img.resize((size, size), resample), np.float32) / 127.5 - 1.0


@pytest.mark.parametrize("name", ["rgb.jpg", "rgb.png", "gray.jpg", "rgba.png"])
@pytest.mark.parametrize("method", ["bilinear", "bicubic"])
def test_pil_parity(images, name, method):
    _, paths = images
    got = native.decode_resize(paths[name], 64, method)
    assert got is not None and got.shape == (64, 64, 3)
    assert np.abs(got - _pil(paths[name], 64, method)).max() < TOL


@pytest.mark.parametrize("size", [32, 200])  # down- and up-scaling
def test_center_crop_and_scales(images, size):
    _, paths = images
    got = native.decode_resize(paths["rgb.jpg"], size, "bicubic",
                               center_crop=True)
    ref = _pil(paths["rgb.jpg"], size, "bicubic", center_crop=True)
    assert np.abs(got - ref).max() < TOL


def test_value_range(images):
    _, paths = images
    got = native.decode_resize(paths["rgb.jpg"], 64, "bicubic")
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_batch_matches_single_and_flags_failures(images, tmp_path):
    _, paths = images
    bad = str(tmp_path / "missing.jpg")
    batch, ok = native.load_batch(
        [paths["rgb.jpg"], paths["rgb.png"], bad], 48, "bicubic", threads=2)
    assert ok.tolist() == [True, True, False]
    single = native.decode_resize(paths["rgb.jpg"], 48, "bicubic")
    np.testing.assert_array_equal(batch[0], single)
    assert np.all(batch[2] == 0.0)  # failed slot zero-filled


def test_truncated_file_falls_back(tmp_path):
    path = tmp_path / "trunc.jpg"
    path.write_bytes(b"\xff\xd8\xff\xe0corrupt")
    assert native.decode_resize(str(path), 32, "bicubic") is None


def test_dataset_uses_native_path(images, monkeypatch):
    """ImageFolderDataset output is identical whether the native loader is
    enabled or force-disabled — the fast path is a pure optimization."""
    root, _ = images
    ds = ImageFolderDataset(str(root), image_size=32, random_flip=False)
    via_native = [ds[i]["image"] for i in range(len(ds))]

    from sd_tpu.native import loader as nloader
    monkeypatch.setattr(nloader, "decode_resize",
                        lambda *a, **k: None)
    via_pil = [ds[i]["image"] for i in range(len(ds))]
    for a, b in zip(via_native, via_pil):
        assert np.abs(a - b).max() < TOL


def test_load_image_helper_parity(images):
    _, paths = images
    got = _load_image(paths["rgb.jpg"], 64, "bicubic")
    assert np.abs(got - _pil(paths["rgb.jpg"], 64, "bicubic")).max() < TOL
