"""LPIPS perceptual metric: VGG16 feature extractor + learned 1×1 linear heads.

Capability parity with the reference (reference: Lpips/lpips.py:7-231 —
Vgg16 sliced at the five relu stages, ScalingLayer, NetLinLayer,
unit-normalize → squared diff → 1×1 weighting → spatial average → sum), as a
Flax module in NHWC with fp32 feature math.

Pretrained weights: the reference downloads torchvision VGG16 + the
`vgg.pth` linear heads with an MD5 check (Lpips/utils.py:5-48). This
environment has no network egress, so weights load from a local torch
checkpoint via `import_torch_vgg16` / `import_torch_lpips_lins` when a path
is supplied; with random weights LPIPS is still a valid (untrained) perceptual
distance for smoke tests — tests that need the calibrated metric skip when no
checkpoint is present.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision vgg16.features conv channel plan; slices end after each relu
# stage the reference taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
_VGG_PLAN: tuple[tuple[int, ...], ...] = (
    (64, 64),
    (128, 128),
    (256, 256, 256),
    (512, 512, 512),
    (512, 512, 512),
)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)


class Vgg16Features(nn.Module):
    """VGG16 conv trunk returning the 5 relu-stage feature maps
    (reference: Lpips/lpips.py:7-86). Frozen in use: wrap apply in
    `jax.lax.stop_gradient` or exclude params from the optimizer."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, ...]:
        feats = []
        for stage, widths in enumerate(_VGG_PLAN):
            for i, w in enumerate(widths):
                x = nn.Conv(
                    w, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv{stage + 1}_{i + 1}",
                )(x)
                x = nn.relu(x)
            feats.append(x)
            if stage != len(_VGG_PLAN) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return tuple(feats)


def normalize_tensor(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Unit-normalize along channels (reference: Lpips/lpips.py normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
    return (x / (norm + eps)).astype(x.dtype)


def spatial_average(x: jax.Array, keepdims: bool = True) -> jax.Array:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


class LPIPS(nn.Module):
    """Learned perceptual distance (reference: Lpips/lpips.py:131-231).

    Inputs in [-1, 1], NHWC. Returns per-sample distance [B, 1, 1, 1].
    """

    use_dropout: bool = True  # parity flag; dropout is inert at inference
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        # ScalingLayer: ImageNet-ish shift/scale in [-1,1] space
        # (reference: Lpips/lpips.py:89-104)
        shift = jnp.asarray([-0.030, -0.088, -0.188], jnp.float32)
        scale = jnp.asarray([0.458, 0.448, 0.450], jnp.float32)
        xs = (x.astype(jnp.float32) - shift) / scale
        ys = (y.astype(jnp.float32) - shift) / scale

        vgg = Vgg16Features(dtype=self.dtype, name="vgg")
        fx = vgg(xs)
        fy = vgg(ys)

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (normalize_tensor(a) - normalize_tensor(b)) ** 2
            # NetLinLayer: 1×1 conv, no bias (reference: Lpips/lpips.py:107-123)
            w = nn.Conv(
                1, (1, 1), use_bias=False,
                kernel_init=nn.initializers.ones,  # replaced by imported weights
                dtype=self.dtype, name=f"lin{i}",
            )(d.astype(jnp.float32))
            total = total + spatial_average(w)
        return total


# ---------------------------------------------------------------------------
# torch checkpoint importers (reference weight flow: Lpips/utils.py:5-48)
# ---------------------------------------------------------------------------

_VGG_TORCH_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def _vgg_param_names() -> list[str]:
    names = []
    for stage, widths in enumerate(_VGG_PLAN):
        for i in range(len(widths)):
            names.append(f"conv{stage + 1}_{i + 1}")
    return names


def import_torch_vgg16(params: dict, state_dict: dict, prefix: str = "features.") -> dict:
    """Copy torchvision VGG16 `features.*` conv weights into a Vgg16Features
    param tree (OIHW → HWIO). `params` is the flax params dict for the module
    holding the convs; returns an updated copy."""
    params = jax.tree.map(lambda x: x, params)  # shallow copy
    for name, idx in zip(_vgg_param_names(), _VGG_TORCH_IDX):
        w = np.asarray(state_dict[f"{prefix}{idx}.weight"], dtype=np.float32)
        b = np.asarray(state_dict[f"{prefix}{idx}.bias"], dtype=np.float32)
        params[name]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        params[name]["bias"] = jnp.asarray(b)
    return params


def import_torch_lpips_lins(params: dict, state_dict: dict) -> dict:
    """Copy the `vgg.pth` NetLinLayer weights (`lin{i}.model.1.weight`,
    [1, C, 1, 1]) into the LPIPS param tree."""
    params = jax.tree.map(lambda x: x, params)
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in state_dict:  # some dumps use 'lins.{i}.model.1.weight'
            key = f"lins.{i}.model.1.weight"
        w = np.asarray(state_dict[key], dtype=np.float32)  # [1, C, 1, 1] OIHW
        params[f"lin{i}"]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    return params


def _find_default_vgg_ckpt() -> str | None:
    """torchvision's default download location for vgg16 weights."""
    import glob
    import os

    hits = glob.glob(os.path.expanduser(
        "~/.cache/torch/hub/checkpoints/vgg16-*.pth"))
    return hits[0] if hits else None


def make_lpips_fn(
    image_size: int = 64,
    vgg_ckpt: str | None = None,
    lin_ckpt: str | None = None,
    mode: str = "auto",
    seed: int = 0,
    dtype=None,
):
    """Build a frozen perceptual-distance closure lpips_fn(x, y) -> [B,1,1,1].

    mode:
      "calibrated" — require torch VGG16 weights (raises if none found);
      "random"     — FIXED-SEED random VGG features + unit lin heads: a
                     documented surrogate when the pretrained artifacts are
                     unavailable (random-CNN perceptual distances are far
                     closer to the calibrated metric than pixel losses —
                     the untrained-net rows of Zhang et al. 2018, table 5);
                     NOT the reference's calibrated loss, so runs using it
                     log `lpips=random`;
      "auto"       — calibrated when weights are present locally, else random;
      "none"       — returns None (pixel-only losses).

    The closure's params are constants (never in an optimizer); gradients
    still flow through the *inputs*, which is what the GAN losses need.
    """
    if mode == "none":
        return None
    if mode == "auto":
        vgg_ckpt = vgg_ckpt or _find_default_vgg_ckpt()
        mode = "calibrated" if vgg_ckpt else "random"
    if mode == "calibrated" and vgg_ckpt is None:
        vgg_ckpt = _find_default_vgg_ckpt()
        if vgg_ckpt is None:
            raise FileNotFoundError(
                "mode='calibrated' needs torchvision vgg16 weights "
                "(vgg_ckpt=... or ~/.cache/torch/hub/checkpoints/)")
    variables = load_lpips_params(
        jax.random.PRNGKey(seed), image_size, vgg_ckpt, lin_ckpt)
    model = LPIPS(dtype=dtype)

    def lpips_fn(x, y):
        return model.apply(variables, x, y)

    lpips_fn.calibrated = mode == "calibrated"
    return lpips_fn


def load_lpips_params(
    rng: jax.Array,
    image_size: int = 64,
    vgg_ckpt: str | None = None,
    lin_ckpt: str | None = None,
) -> dict:
    """Init LPIPS params; graft torch weights when checkpoint paths are given."""
    model = LPIPS()
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = model.init(rng, dummy, dummy)
    params = variables["params"]
    if vgg_ckpt is not None:
        import torch

        sd = torch.load(vgg_ckpt, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        params["vgg"] = import_torch_vgg16(params["vgg"], sd)
    if lin_ckpt is not None:
        import torch

        sd = torch.load(lin_ckpt, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        params = import_torch_lpips_lins(params, sd)
    return {"params": params}
