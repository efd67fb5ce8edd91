"""Host-side datasets: image folders, LSUN-style lists, COCO captions,
albumentations-style path datasets.

Capability parity with the reference loaders (reference:
DDPM/ImageDataset.py:9-47 folder-of-images with resize/flip/normalize;
Dataset/lsun.py:8-36 LSUNBase; Diffusion/data/coco.py:9-57 CocoDataset
(pycocotools); Diffusion/data/base.py:8-95 ImagePaths/Txt2ImgIterableBase).

TPU-first: everything here is pure host code (PIL + numpy) that yields NHWC
float32 arrays in [-1, 1]; device transfer and sharding happen in
sd_tpu.parallel. pycocotools is not required — COCO's annotation JSON is
parsed directly.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _load_image(path: str, size: int, method: str = "bicubic",
                center_crop: bool = False) -> np.ndarray:
    # Fast path: the native C++ decoder (sd_tpu/native) — GIL-free libjpeg/
    # libpng decode + PIL-compatible resampling (parity <1/255, tested in
    # tests/test_native_loader.py). Returns None for formats it doesn't
    # carry (CMYK JPEG, bmp/webp, truncated files) → PIL below.
    from sd_tpu.native import loader as _native

    native = _native.decode_resize(path, size, method, center_crop)
    if native is not None:
        return native

    from PIL import Image

    img = Image.open(path).convert("RGB")
    if center_crop:
        w, h = img.size
        s = min(w, h)
        img = img.crop(((w - s) // 2, (h - s) // 2,
                        (w + s) // 2, (h + s) // 2))
    resample = {"bicubic": Image.BICUBIC, "bilinear": Image.BILINEAR,
                "lanczos": Image.LANCZOS, "nearest": Image.NEAREST}[method]
    img = img.resize((size, size), resample)
    return np.asarray(img, np.float32) / 127.5 - 1.0


class ImageFolderDataset:
    """Folder-of-images dataset with resize + random horizontal flip +
    [-1,1] normalization (reference: DDPM/ImageDataset.py)."""

    def __init__(self, root: str, image_size: int = 256,
                 random_flip: bool = True, center_crop: bool = False,
                 seed: int = 0):
        self.root = root
        self.image_size = image_size
        self.random_flip = random_flip
        self.center_crop = center_crop
        self.paths = sorted(
            os.path.join(dp, f)
            for dp, _, files in os.walk(root)
            for f in files
            if f.lower().endswith(IMG_EXTENSIONS)
        )
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Advance the flip RNG stream (called by loaders between epochs)."""
        self._epoch = epoch

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> dict:
        img = _load_image(self.paths[idx], self.image_size,
                          center_crop=self.center_crop)
        if self.random_flip:
            # Per-item generator: __getitem__ runs concurrently from the
            # loader's thread pool and np.random.Generator is not
            # thread-safe — a shared stream would be racy/non-reproducible.
            rng = np.random.default_rng((self.seed, self._epoch, idx))
            if rng.random() < 0.5:
                img = img[:, ::-1].copy()
        return {"image": img}


class LSUNDataset(ImageFolderDataset):
    """LSUN-style folder dataset (reference: Dataset/lsun.py LSUNBase —
    resize 256 + normalize; flip off by default there)."""

    def __init__(self, root: str, image_size: int = 256, **kw):
        kw.setdefault("random_flip", False)
        super().__init__(root, image_size, **kw)


class ImagePathsDataset:
    """Explicit path-list dataset with optional per-item labels
    (reference: Diffusion/data/base.py ImagePaths)."""

    def __init__(self, paths: Sequence[str], image_size: int = 256,
                 labels: dict | None = None, center_crop: bool = True):
        self.paths = list(paths)
        self.image_size = image_size
        self.labels = labels or {}
        self.center_crop = center_crop

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> dict:
        out = {k: v[idx] for k, v in self.labels.items()}
        out["image"] = _load_image(self.paths[idx], self.image_size,
                                   center_crop=self.center_crop)
        return out


class ClassCaptionDataset(ImageFolderDataset):
    """Folder dataset that derives a text caption from each image's class
    label — the filename prefix (`cat.123.jpg` → "cat") or the parent
    directory name — formatted through `template`. For class-labeled but
    caption-less data (e.g. the reference's bundled cat/dog layout,
    Dataset/Data): lets the text-conditioned LDM path train
    class-conditionally with CFG, the prompt-space analog of the
    reference's ClassEmbedder conditioner (ldm/modules/encoders/modules.py;
    ours: models/conditioners.py ClassEmbedder)."""

    def __init__(self, root: str, image_size: int = 256,
                 label_from: str = "filename_prefix",
                 template: str = "a photo of a {}", **kw):
        super().__init__(root, image_size, **kw)
        assert label_from in ("filename_prefix", "dirname"), label_from
        self.label_from = label_from
        self.template = template

    def label(self, idx: int) -> str:
        path = self.paths[idx]
        if self.label_from == "dirname":
            return os.path.basename(os.path.dirname(path))
        return os.path.basename(path).split(".")[0]

    def __getitem__(self, idx: int) -> dict:
        out = super().__getitem__(idx)
        out["txt_raw"] = self.template.format(self.label(idx))
        return out


class CocoCaptionDataset:
    """(image, caption) pairs from a COCO captions annotation file
    (reference: Diffusion/data/coco.py CocoDataset, ldm/Dataset/coco.py).

    Parses `captions_*.json` directly: {'images': [{id, file_name}],
    'annotations': [{image_id, caption}]} — no pycocotools needed.
    One example per (image, caption) pair, like the reference."""

    def __init__(self, image_dir: str, annotation_file: str,
                 image_size: int = 256, max_items: int | None = None):
        self.image_dir = image_dir
        self.image_size = image_size
        with open(annotation_file) as f:
            meta = json.load(f)
        id_to_file = {im["id"]: im["file_name"] for im in meta["images"]}
        self.items = []
        for ann in meta["annotations"]:
            fn = id_to_file.get(ann["image_id"])
            if fn is None:
                continue
            self.items.append((fn, ann["caption"]))
            if max_items is not None and len(self.items) >= max_items:
                break

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> dict:
        fn, caption = self.items[idx]
        img = _load_image(os.path.join(self.image_dir, fn), self.image_size)
        return {"image": img, "txt_raw": caption.strip()}


class SRDataset(ImageFolderDataset):
    """Paired HR/LR dataset for super-resolution diffusion training.

    Yields {'image': HR [size,size,3] in [-1,1],
            'lr':    LR [size/sf,size/sf,3] in [-1,1]}
    with the LR side produced on host by either plain bicubic 1/sf
    downsampling or the BSRGAN degradation composite
    (sd_tpu.data.degradation; reference pipeline:
    image_degradation/bsrgan.py — the reference ships it as SR training
    augmentation but never wires a trainer to it).

    degradation: 'bicubic' | 'bsrgan' | 'bsrgan_light' | 'bsrgan_variant'.
    The degradation RNG is keyed per (seed, epoch, index) like the flip RNG
    so concurrent __getitem__ calls stay reproducible.
    """

    def __init__(self, root: str, image_size: int = 256, sf: int = 4,
                 degradation: str = "bicubic", **kw):
        super().__init__(root, image_size=image_size, **kw)
        if image_size % sf:
            raise ValueError(f"image_size={image_size} not divisible by sf={sf}")
        self.sf = sf
        self.degradation = degradation

    def __getitem__(self, idx: int) -> dict:
        from sd_tpu.data import degradation as deg

        item = super().__getitem__(idx)
        hr01 = (item["image"] + 1.0) * 0.5  # degradation ops live in [0,1]
        if self.degradation == "bicubic":
            lr01 = deg.bicubic_degradation(hr01, self.sf)
        else:
            rng = np.random.default_rng(
                (self.seed, self._epoch, idx, 0x5F))
            if self.degradation == "bsrgan":
                lr01, _ = deg.degradation_bsrgan(hr01, self.sf, rng)
            elif self.degradation == "bsrgan_light":
                lr01, _ = deg.degradation_bsrgan(hr01, self.sf, rng,
                                                 light=True)
            elif self.degradation == "bsrgan_variant":
                lr01, _ = deg.degradation_bsrgan_variant(hr01, self.sf, rng)
            else:
                raise ValueError(
                    f"unknown degradation {self.degradation!r}")
        item["lr"] = np.clip(lr01, 0, 1).astype(np.float32) * 2.0 - 1.0
        return item
