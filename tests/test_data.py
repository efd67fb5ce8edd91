"""Data-package tests: datasets, loader/prefetch, degradations.
Reference semantics: SURVEY.md §2.13 (DDPM/ImageDataset.py, Dataset/lsun.py,
Diffusion/data/coco.py, image_degradation/)."""

import json
import os

import numpy as np
import pytest

from sd_tpu.data.datasets import (
    CocoCaptionDataset,
    ImageFolderDataset,
    ImagePathsDataset,
    LSUNDataset,
)
from sd_tpu.data.degradation import (
    add_gaussian_noise,
    add_jpeg_noise,
    add_poisson_noise,
    add_speckle_noise,
    apply_blur,
    degradation_bsrgan,
    degradation_bsrgan_plus,
    gaussian_kernel_2d,
    random_blur_kernel,
)
from sd_tpu.data.loader import DataLoader, collate, parallel_data_prefetch


@pytest.fixture
def image_dir(tmp_path):
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        arr = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(d)


def test_image_folder_dataset(image_dir):
    ds = ImageFolderDataset(image_dir, image_size=32)
    assert len(ds) == 6
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["image"].dtype == np.float32
    assert -1.0 <= item["image"].min() and item["image"].max() <= 1.0


def test_lsun_dataset_no_flip(image_dir):
    ds = LSUNDataset(image_dir, image_size=16)
    a = ds[0]["image"]
    b = ds[0]["image"]
    np.testing.assert_array_equal(a, b)  # deterministic (no random flip)


def test_image_paths_dataset(image_dir):
    paths = [os.path.join(image_dir, f) for f in sorted(os.listdir(image_dir))][:3]
    ds = ImagePathsDataset(paths, image_size=16,
                           labels={"cls": np.array([0, 1, 2])})
    item = ds[2]
    assert item["image"].shape == (16, 16, 3)
    assert item["cls"] == 2


def test_coco_caption_dataset(image_dir, tmp_path):
    files = sorted(os.listdir(image_dir))
    ann = {
        "images": [{"id": i, "file_name": f} for i, f in enumerate(files)],
        "annotations": [
            {"image_id": i, "caption": f"caption {i}"} for i in range(len(files))
        ] + [{"image_id": 0, "caption": "second caption"}],
    }
    ann_file = tmp_path / "captions.json"
    ann_file.write_text(json.dumps(ann))
    ds = CocoCaptionDataset(image_dir, str(ann_file), image_size=16)
    assert len(ds) == 7  # one per (image, caption) pair
    item = ds[0]
    assert item["image"].shape == (16, 16, 3)
    assert item["txt_raw"] == "caption 0"


def test_dataloader_batching(image_dir):
    ds = ImageFolderDataset(image_dir, image_size=16)
    dl = DataLoader(ds, batch_size=4, num_workers=2, seed=1)
    batches = list(dl)
    assert len(batches) == 1  # 6 imgs, drop_last
    assert batches[0]["image"].shape == (4, 16, 16, 3)
    # second epoch reshuffles
    assert len(list(dl)) == 1


def test_collate_mixed_types():
    items = [{"image": np.zeros((2, 2)), "txt_raw": "a"},
             {"image": np.ones((2, 2)), "txt_raw": "b"}]
    out = collate(items)
    assert out["image"].shape == (2, 2, 2)
    assert out["txt_raw"] == ["a", "b"]


def test_parallel_data_prefetch():
    out = parallel_data_prefetch(lambda x: x * 2, list(range(10)), n_proc=3,
                                 target_data_type="list")
    assert out == [x * 2 for x in range(10)]
    arr = parallel_data_prefetch(lambda x: np.full((2,), x), list(range(4)),
                                 n_proc=2)
    assert arr.shape == (4, 2)


# -- degradations -----------------------------------------------------------


def test_gaussian_kernel_properties():
    k = gaussian_kernel_2d(21, 2.0)
    assert k.shape == (21, 21)
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-6)
    # isotropic kernel is symmetric
    np.testing.assert_allclose(k, k.T, atol=1e-8)
    # anisotropic rotated is not
    ka = gaussian_kernel_2d(21, 3.0, 0.5, theta=0.7)
    assert not np.allclose(ka, ka.T, atol=1e-6)


def test_blur_preserves_mean():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    k = random_blur_kernel(rng)
    out = apply_blur(img, k)
    np.testing.assert_allclose(out.mean(), img.mean(), atol=0.02)
    assert out.std() < img.std()  # blur reduces variance


def test_noise_ops_bounded():
    rng = np.random.default_rng(0)
    img = np.full((16, 16, 3), 0.5, np.float32)
    for fn in (add_gaussian_noise, add_poisson_noise, add_speckle_noise,
               add_jpeg_noise):
        out = fn(img, rng)
        assert out.shape == img.shape
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert not np.allclose(out, img)  # noise actually applied


def test_degradation_bsrgan_output_size():
    rng = np.random.default_rng(0)
    img = np.random.default_rng(1).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    lq, hq = degradation_bsrgan(img, sf=4, rng=rng)
    assert lq.shape == (16, 16, 3)
    assert hq.shape == (64, 64, 3)
    lq2, _ = degradation_bsrgan_plus(img, sf=2, rng=rng)
    assert lq2.shape == (32, 32, 3)
    lq3, _ = degradation_bsrgan(img, sf=4, rng=rng, light=True)
    assert lq3.shape == (16, 16, 3)


def test_named_degradation_models():
    """bicubic / srmd / dpsr / classical single-degradation modes
    (reference: image_degradation/bsrgan.py:228-296): output sizes, ranges,
    and the srmd-vs-dpsr order actually matters."""
    from sd_tpu.data.degradation import (bicubic_degradation,
                                         classical_degradation,
                                         dpsr_degradation, gaussian_kernel_2d,
                                         srmd_degradation)

    rng = np.random.default_rng(0)
    img = rng.random((48, 48, 3)).astype(np.float32)
    k = gaussian_kernel_2d(15, 1.5)

    for fn in (lambda x: bicubic_degradation(x, 3),
               lambda x: srmd_degradation(x, k, 3),
               lambda x: dpsr_degradation(x, k, 3),
               lambda x: classical_degradation(x, k, 3)):
        out = fn(img)
        assert out.shape == (16, 16, 3)
        assert out.dtype == np.float32
        assert 0.0 <= out.min() and out.max() <= 1.0 + 1e-6

    # blur-then-down != down-then-blur
    a = srmd_degradation(img, k, 3)
    b = dpsr_degradation(img, k, 3)
    assert np.abs(a - b).max() > 1e-3


def test_degradation_bsrgan_variant():
    """The paper-variant composite (reference: bsrgan.py:530-613) hits the
    target size for every seed and stays in range."""
    from sd_tpu.data.degradation import degradation_bsrgan_variant

    img = np.random.default_rng(1).random((64, 64, 3)).astype(np.float32)
    for seed in range(6):
        lq, hq = degradation_bsrgan_variant(img, sf=4,
                                            rng=np.random.default_rng(seed))
        assert lq.shape == (16, 16, 3)
        assert hq.shape == (64, 64, 3)
        assert 0.0 <= lq.min() and lq.max() <= 1.0 + 1e-6


def test_add_sharpening():
    """USM sharpening (reference: bsrgan.py:299-322) amplifies edges but
    keeps range and shape."""
    from sd_tpu.data.degradation import add_sharpening

    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 1.0  # hard vertical edge
    out = add_sharpening(img, weight=0.5, radius=7, threshold=10)
    assert out.shape == img.shape
    assert 0.0 <= out.min() and out.max() <= 1.0 + 1e-6
    # local contrast across the edge does not decrease
    assert (out[:, 17] - out[:, 14]).mean() >= (img[:, 17] - img[:, 14]).mean() - 1e-6


def test_class_caption_dataset(tmp_path):
    """Captions derived from the class label (filename prefix / dirname) —
    the caption-less-class-data path for conditional LDM training."""
    import numpy as np
    from PIL import Image

    from sd_tpu.data.datasets import ClassCaptionDataset

    d = tmp_path / "imgs"
    (d / "sub").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for name in ["cat.0.jpg", "dog.0.jpg"]:
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(d / name)
    Image.fromarray(
        rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
        d / "sub" / "bird.0.jpg")

    ds = ClassCaptionDataset(str(d), image_size=16)
    caps = sorted(ds[i]["txt_raw"] for i in range(len(ds)))
    assert caps == ["a photo of a bird", "a photo of a cat",
                    "a photo of a dog"]
    assert ds[0]["image"].shape == (16, 16, 3)

    ds2 = ClassCaptionDataset(str(d), image_size=16, label_from="dirname",
                              template="{}")
    assert {ds2[i]["txt_raw"] for i in range(len(ds2))} == {"imgs", "sub"}
