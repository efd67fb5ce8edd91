"""Metrics, logging, and visual observability.

Capability parity with the reference's logging surface (SURVEY.md §5.5:
Lightning self.log dicts, log_images grids, log_txt_as_img, sample GIFs —
ldm/diffusion/ddpm.py:459-468,1829-1938, DDPM/utils.py:12-51,
ldm/utils.py:17-38,71-75), TPU-flavored: metrics come out of the jitted step
as a dict of scalars, a host-side JSONL writer streams them, and image
grids/GIFs are assembled on host with PIL.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import jax
import numpy as np

PyTree = Any


class MetricsLogger:
    """Append-only JSONL metrics stream + console echo."""

    def __init__(self, path: str | None = None, echo_every: int = 50):
        self.path = path
        self.echo_every = echo_every
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, step: int, metrics: dict) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self.echo_every and step % self.echo_every == 0:
            shown = {k: round(v, 5) for k, v in rec.items()
                     if k not in ("time",)}
            print(f"[metrics] {shown}")

    def close(self):
        if self._f:
            self._f.close()


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    """Peak signal-to-noise ratio in dB between image batches in [-1, 1]
    (data_range 2.0). The reference eyeballs reconstructions
    (VAE/test/test.py:200-267); this is the quantitative fence used by
    tests/test_quality.py."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    w = np.outer(g, g)
    return w / w.sum()


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    """Mean SSIM over a batch of NHWC images (channels averaged), standard
    11×11 gaussian window, Wang et al. constants."""
    from scipy.signal import convolve2d

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 3:
        a, b = a[None], b[None]
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    w = _gaussian_window()
    conv = lambda x: convolve2d(x, w, mode="valid")
    vals = []
    for i in range(a.shape[0]):
        for c in range(a.shape[-1]):
            x, y = a[i, :, :, c], b[i, :, :, c]
            mx, my = conv(x), conv(y)
            vx = conv(x * x) - mx**2
            vy = conv(y * y) - my**2
            vxy = conv(x * y) - mx * my
            s = ((2 * mx * my + c1) * (2 * vxy + c2)) / (
                (mx**2 + my**2 + c1) * (vx + vy + c2))
            vals.append(np.mean(s))
    return float(np.mean(vals))


def ismap(x) -> bool:
    """4D with >3 channels — a segmentation-style conditioning map
    (reference: ldm/utils.py ismap; NHWC here)."""
    return hasattr(x, "ndim") and x.ndim == 4 and x.shape[-1] > 3


def isimage(x) -> bool:
    """4D with 1 or 3 channels (reference: ldm/utils.py isimage; NHWC)."""
    return hasattr(x, "ndim") and x.ndim == 4 and x.shape[-1] in (1, 3)


def count_params(tree: PyTree) -> int:
    """Total parameter count (reference: ldm/utils.py:71-75 count_params)."""
    return sum(np.prod(x.shape) for x in jax.tree.leaves(tree)
               if hasattr(x, "shape"))


def postprocess(images: np.ndarray) -> np.ndarray:
    """[-1,1] float NHWC → uint8 (reference: DDPM/utils.py postprocess)."""
    images = np.asarray(images, dtype=np.float32)
    images = np.clip((images + 1.0) * 127.5, 0, 255)
    return images.astype(np.uint8)


def make_grid(images: np.ndarray, rows: int | None = None,
              cols: int | None = None, pad: int = 2):
    """uint8 NHWC batch → one PIL image grid
    (reference: DDPM/utils.py create_images_grid)."""
    from PIL import Image

    n, h, w, c = images.shape
    if cols is None:
        # honor an explicit row count: sqrt-square only when neither is given
        cols = int(np.ceil(np.sqrt(n)) if rows is None else np.ceil(n / rows))
    if rows is None:
        rows = int(np.ceil(n / cols))
    grid = Image.new("RGB", (cols * (w + pad) - pad, rows * (h + pad) - pad),
                     (255, 255, 255))
    for i in range(n):
        img = Image.fromarray(images[i] if c == 3 else images[i].repeat(3, -1))
        grid.paste(img, ((i % cols) * (w + pad), (i // cols) * (h + pad)))
    return grid


def save_image_grid(images, path: str, **kw) -> None:
    """float [-1,1] batch → grid PNG on disk."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    make_grid(postprocess(np.asarray(images)), **kw).save(path)


def save_animation(frames, path: str, duration_ms: int = 100) -> None:
    """Sequence of [-1,1] batches → GIF of the denoising trajectory
    (reference: DDPM/utils.py create_sampling_animation)."""
    from PIL import Image

    imgs = [make_grid(postprocess(np.asarray(f))) for f in frames]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=duration_ms, loop=0)


def log_txt_as_img(shape_hw: tuple[int, int], texts: list[str]) -> np.ndarray:
    """Render prompts into image tensors for visual conditioning logs
    (reference: ldm/utils.py:17-38). Returns float NHWC in [-1, 1]."""
    from PIL import Image, ImageDraw

    h, w = shape_hw
    out = np.zeros((len(texts), h, w, 3), np.float32)
    for i, text in enumerate(texts):
        img = Image.new("RGB", (w, h), (255, 255, 255))
        draw = ImageDraw.Draw(img)
        nc = max(1, int(40 * (w / 256)))
        lines = "\n".join(text[s: s + nc] for s in range(0, len(text), nc))
        draw.multiline_text((0, 0), lines, fill=(0, 0, 0))
        out[i] = np.asarray(img, np.float32) / 127.5 - 1.0
    return out


# ---------------------------------------------------------------------------
# profiling / tracing (SURVEY.md §5.1 — the reference has none; TPU-native
# replacement: jax.profiler + compiled cost analysis)
# ---------------------------------------------------------------------------


def compiled_cost(fn, *args) -> dict:
    """FLOPs/bytes estimate of a jitted fn from XLA's cost analysis
    (the TPU replacement for the reference's thop hook,
    openai_model/attention.py:414-435)."""
    lowered = jax.jit(fn).lower(*args)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return dict(analysis) if analysis else {}


def profile_trace(log_dir: str):
    """Context manager producing a TensorBoard-loadable device trace
    (SURVEY.md §5.1 — the reference has no tracing; this is the jax.profiler
    replacement). Usage: `with profile_trace("/tmp/trace"): step(...)`."""
    return jax.profiler.trace(log_dir, create_perfetto_link=False)


class StepTimer:
    """Wall-clock per-step timing with warmup skip; reports mean/p50/p90."""

    def __init__(self, skip_first: int = 2):
        self.skip = skip_first
        self.times: list[float] = []
        self._t0 = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.skip:
            self.times.append(dt)

    def stats(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "steps": len(arr),
        }
