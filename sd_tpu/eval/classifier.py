"""Tiny image classifier + classifier-free-guidance steering metric.

The reference trains conditioning machinery (class/text embedders,
crossattn dispatch — clip_encoder/modules.py:25-45, ldm/diffusion/ddpm.py:
2004-2034) but never demonstrates, let alone measures, that guidance steers
the sample distribution. This module closes that loop quantitatively: train
a small probe classifier on the labeled real data, then score guided sample
batches by the probe's accuracy/confidence on the requested class. Guided
sampling works iff `steering_score(prompt="cat") ≫ chance` and rises with
guidance scale.

Everything here is one jitted train step + one jitted forward — probe-scale
on purpose (it shares the chip with the model being evaluated).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


class TinyImageClassifier(nn.Module):
    """4-block conv probe: conv(stride 2)+GN+silu ×4 → mean-pool → logits.

    GroupNorm (not BatchNorm) so train and eval are the same pure function —
    no running-stat state to thread through jit.
    """

    num_classes: int
    width: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.width
        for i, mult in enumerate((1, 2, 4, 4)):
            x = nn.Conv(w * mult, (3, 3), strides=(2, 2), name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=min(8, w * mult), name=f"norm_{i}")(x)
            x = nn.silu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="head")(x)


def train_image_classifier(
    images: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    *,
    steps: int = 300,
    batch_size: int = 32,
    lr: float = 1e-3,
    width: int = 32,
    seed: int = 0,
    augment_flip: bool = True,
) -> tuple[TinyImageClassifier, dict]:
    """Train the probe on an in-memory labeled set ([-1,1] NHWC images).

    Returns (module, params). Probe-scale: the whole set stays on host,
    batches are gathered per step with a folded-in PRNG (deterministic)."""
    images = np.asarray(images, np.float32)
    labels = np.asarray(labels, np.int32)
    model = TinyImageClassifier(num_classes=num_classes, width=width)
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros((1, *images.shape[1:])))["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y, key):
        if augment_flip:
            flip = jax.random.bernoulli(key, shape=(x.shape[0], 1, 1, 1))
            x = jnp.where(flip, x[:, :, ::-1, :], x)

        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            acc = (logits.argmax(-1) == y).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    n = len(images)
    loss = acc = jnp.float32(0)
    for i in range(steps):
        key = jax.random.fold_in(rng, i)
        idx = np.asarray(jax.random.randint(key, (batch_size,), 0, n))
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(images[idx]),
            jnp.asarray(labels[idx]), jax.random.fold_in(key, 1))
    return model, {"params": params,
                   "final_loss": float(loss), "final_acc": float(acc)}


def classifier_fn(model: TinyImageClassifier,
                  params) -> Callable[[jax.Array], jax.Array]:
    """Jitted images→logits forward for `steering_score`."""
    return jax.jit(lambda x: model.apply({"params": params}, x))


def steering_score(logits_fn: Callable[[jax.Array], jax.Array],
                   samples: np.ndarray, target_class: int) -> dict:
    """Score a guided sample batch against the class it was asked for.

    Returns {"accuracy": fraction argmax == target,
             "confidence": mean softmax prob of target}.
    Chance accuracy is 1/num_classes; guidance is demonstrated when the
    accuracy at cfg>1 clears both chance and the cfg=1 score.
    """
    logits = np.asarray(jax.device_get(logits_fn(jnp.asarray(
        np.asarray(samples, np.float32)))))
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    return {
        "accuracy": float((logits.argmax(-1) == target_class).mean()),
        "confidence": float(probs[:, target_class].mean()),
    }
