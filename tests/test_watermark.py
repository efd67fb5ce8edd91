"""Invisible DCT watermark (utils/watermark.py): exact round-trip,
imperceptibility (PSNR), JPEG survival, blind-detection negative control,
and the pipeline hook."""

import io

import numpy as np
import pytest

from sd_tpu.utils.watermark import (
    detect_watermark,
    embed_watermark,
    str_to_bits,
    verify_watermark,
)


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    # smooth natural-ish image: low-frequency ramp + mild texture
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32) / 255.0
    base = 128 + 60 * np.sin(3 * xx) * np.cos(2 * yy)
    tex = rng.normal(0, 8, (256, 256, 3)).astype(np.float32)
    return np.clip(base[..., None] + tex, 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse)


def test_str_to_bits_stable():
    b1 = str_to_bits("sd_tpu", 48)
    b2 = str_to_bits("sd_tpu", 48)
    np.testing.assert_array_equal(b1, b2)
    assert b1.shape == (48,) and set(np.unique(b1)) <= {0, 1}
    assert not np.array_equal(b1, str_to_bits("other", 48))


def test_roundtrip_exact(img):
    bits = str_to_bits("sd_tpu", 48)
    marked = embed_watermark(img, bits, key=7)
    got, conf = detect_watermark(marked, 48, key=7)
    np.testing.assert_array_equal(got, bits)
    assert conf > 0.95


def test_imperceptible(img):
    marked = embed_watermark(img, str_to_bits("sd_tpu", 48), key=7)
    assert _psnr(img, marked) >= 40.0


def test_survives_jpeg(img):
    from PIL import Image

    bits = str_to_bits("sd_tpu", 48)
    marked = embed_watermark(img, bits, key=7)
    buf = io.BytesIO()
    Image.fromarray(marked).save(buf, "JPEG", quality=80)
    decoded = np.asarray(Image.open(io.BytesIO(buf.getvalue())))
    got, _ = detect_watermark(decoded, 48, key=7)
    acc = float(np.mean(got == bits))
    assert acc >= 0.9, f"bit accuracy {acc} after JPEG q80"
    assert verify_watermark(decoded, "sd_tpu", key=7)


def test_unmarked_negative_control(img):
    got, conf = detect_watermark(img, 48, key=7)
    want = str_to_bits("sd_tpu", 48)
    acc = float(np.mean(got == want))
    assert acc < 0.8, f"unmarked image should not verify (acc={acc})"
    assert not verify_watermark(img, "sd_tpu", key=7)


def test_wrong_key_fails(img):
    bits = str_to_bits("sd_tpu", 48)
    marked = embed_watermark(img, bits, key=7)
    got, _ = detect_watermark(marked, 48, key=8)
    assert float(np.mean(got == bits)) < 0.8


def test_pipeline_hook(tmp_path):
    """generate(watermark=...) marks every output; detection verifies."""
    import jax

    from sd_tpu.core.config import load_yaml
    from sd_tpu.pipeline import Text2ImagePipeline

    cfg = load_yaml("configs/sd_txt2img_smoke.yaml")
    # 8-px latents decode to 32-px images — too few 8×8 blocks for 48
    # bits, so use a short payload (4 bits / 16 blocks) — real
    # serving sizes carry 48 bits comfortably (test_survives_jpeg)
    pipe = Text2ImagePipeline(cfg, param_dtype=None)
    img = pipe.generate(["x"], num_steps=2, guidance_scale=1.0, seed=0,
                        watermark="wm", watermark_bits=4)
    got, _ = detect_watermark(img[0], 4, key=0)
    want = str_to_bits("wm", 4)
    assert float(np.mean(got == want)) >= 0.9
