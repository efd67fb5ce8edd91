"""Vector quantizers: argmin codebook VQ (with remap + legacy beta placement),
one-hot legacy VQ with perplexity, Gumbel-softmax VQ, and an EMA codebook.

Capability parity with the reference quantizer family
(reference: vqvae/quantize.py:6-181 VectorQuantize2,
ldm/tamming/quantize.py:9-107 VectorQuantizer, :110-210 GumbelQuantize,
:213-329 VectorQuantizer2 + get_codebook_entry, :331-446 EmbeddingEMA /
EMAVectorQuantizer).

TPU-first design notes:
  * nearest-code search is one [N, K] matmul (‖z‖² + ‖e‖² − 2 z·eᵀ) — an MXU
    op over the 8192-entry codebook, not an elementwise expansion;
  * codebook lookup is `codebook[idx]` (XLA gather, fine on TPU for K≤64k);
  * straight-through estimator via `z + stop_gradient(z_q − z)`;
  * EMA codebook update is a pure function returning new codebook state
    (no in-place buffers — composes with jit/pjit and shards on the K axis).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _nearest_code(z_flat: jax.Array, codebook: jax.Array) -> jax.Array:
    """argmin_k ‖z − e_k‖² via the expanded-square matmul form. [N] int32."""
    z32 = z_flat.astype(jnp.float32)
    e32 = codebook.astype(jnp.float32)
    d = (
        jnp.sum(z32**2, axis=1, keepdims=True)
        + jnp.sum(e32**2, axis=1)[None, :]
        - 2.0 * jnp.dot(z32, e32.T, preferred_element_type=jnp.float32)
    )
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def _perplexity(indices: jax.Array, n_e: int) -> jax.Array:
    one_hot = jax.nn.one_hot(indices, n_e, dtype=jnp.float32)
    avg_probs = jnp.mean(one_hot, axis=0)
    return jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))


class VectorQuantizer(nn.Module):
    """Canonical argmin VQ with commitment loss, straight-through gradients,
    optional index remap to a "used" subset and `sane_index_shape`
    (reference: vqvae/quantize.py:6-181, ldm/tamming/quantize.py:213-329).

    `legacy=True` reproduces the reference's legacy beta placement
    (beta on the encoder-commitment term swapped relative to the fixed form).
    Input/output layout is NHWC: z [B, H, W, C] with C == e_dim.
    """

    n_e: int
    e_dim: int
    beta: float = 0.25
    legacy: bool = True
    remap: str | Sequence[int] | None = None
    unknown_index: str | int = "random"
    sane_index_shape: bool = False

    def setup(self):
        # uniform init U(-1/K, 1/K) — the reference's codebook init
        scale = 1.0 / self.n_e
        self.embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -scale, scale),
            (self.n_e, self.e_dim),
        )
        if self.remap is not None:
            used = (
                np.load(self.remap)
                if isinstance(self.remap, str)
                else np.asarray(self.remap, dtype=np.int64)
            )
            self.used = jnp.asarray(used, dtype=jnp.int32)
            self.re_embed = int(used.shape[0])
            if self.unknown_index == "extra":
                self.re_embed += 1
        else:
            self.used = None
            self.re_embed = self.n_e

    # -- remap helpers (reference: ldm/tamming/quantize.py:236-262) ----------

    def remap_to_used(self, inds: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        match = inds[..., None] == self.used[None, :]
        new = jnp.argmax(match, axis=-1).astype(jnp.int32)
        unknown = ~jnp.any(match, axis=-1)
        if self.unknown_index == "random":
            if rng is None:
                rng = jax.random.PRNGKey(0)
            rand = jax.random.randint(rng, new.shape, 0, self.re_embed, jnp.int32)
            return jnp.where(unknown, rand, new)
        fill = self.re_embed - 1 if self.unknown_index == "extra" else int(self.unknown_index)
        return jnp.where(unknown, fill, new)

    def unmap_to_all(self, inds: jax.Array) -> jax.Array:
        if self.unknown_index == "extra":
            inds = jnp.where(inds >= self.used.shape[0], 0, inds)
        return jnp.take(self.used, inds)

    # -- forward -------------------------------------------------------------

    def __call__(self, z: jax.Array, rng: jax.Array | None = None):
        """Returns (z_q, loss, (perplexity, min_one_hot, indices))."""
        B, H, W, C = z.shape
        assert C == self.e_dim
        z_flat = z.reshape(-1, self.e_dim)
        idx = _nearest_code(z_flat, self.embedding)
        z_q = jnp.take(self.embedding, idx, axis=0).reshape(z.shape).astype(z.dtype)

        z32, zq32 = z.astype(jnp.float32), z_q.astype(jnp.float32)
        commit = jnp.mean((jax.lax.stop_gradient(zq32) - z32) ** 2)
        embed = jnp.mean((zq32 - jax.lax.stop_gradient(z32)) ** 2)
        # Reference placement (ldm/tamming/quantize.py:290-295): legacy puts
        # beta on the *embedding* term, the fixed form puts it on commitment.
        if self.legacy:
            loss = commit + self.beta * embed
        else:
            loss = self.beta * commit + embed

        # straight-through
        z_q = z + jax.lax.stop_gradient(z_q - z)
        perplexity = _perplexity(idx, self.n_e)

        if self.used is not None:
            idx = self.remap_to_used(idx.reshape(B, -1), rng).reshape(-1)
        if self.sane_index_shape:
            idx = idx.reshape(B, H, W)
        return z_q, loss, (perplexity, None, idx)

    def get_codebook_entry(self, indices: jax.Array, shape: tuple | None = None):
        """Lookup codes for sampled indices (reference:
        ldm/tamming/quantize.py:312-329). `shape` is (B, H, W, C) or None."""
        if self.used is not None:
            indices = self.unmap_to_all(indices.reshape(-1))
        z_q = jnp.take(self.embedding, indices.reshape(-1), axis=0)
        if shape is not None:
            z_q = z_q.reshape(shape)
        return z_q


class VectorQuantizerOneHot(nn.Module):
    """Legacy scatter/one-hot VQ with perplexity reporting
    (reference: ldm/tamming/quantize.py:9-107). The one-hot × codebook matmul
    is itself the TPU-friendly lookup (MXU instead of gather)."""

    n_e: int
    e_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z: jax.Array):
        scale = 1.0 / self.n_e
        embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -scale, scale),
            (self.n_e, self.e_dim),
        )
        z_flat = z.reshape(-1, self.e_dim)
        idx = _nearest_code(z_flat, embedding)
        one_hot = jax.nn.one_hot(idx, self.n_e, dtype=jnp.float32)
        z_q = jnp.dot(one_hot, embedding, preferred_element_type=jnp.float32)
        z_q = z_q.reshape(z.shape).astype(z.dtype)

        z32, zq32 = z.astype(jnp.float32), z_q.astype(jnp.float32)
        # commit + beta*embed (reference: ldm/tamming/quantize.py:77-78)
        loss = jnp.mean(
            (jax.lax.stop_gradient(zq32) - z32) ** 2
        ) + self.beta * jnp.mean((zq32 - jax.lax.stop_gradient(z32)) ** 2)

        z_q = z + jax.lax.stop_gradient(z_q - z)
        perplexity = _perplexity(idx, self.n_e)
        return z_q, loss, (perplexity, one_hot, idx)


class GumbelQuantize(nn.Module):
    """Gumbel-softmax categorical VQ: soft codebook mixture during training,
    hard argmax at eval; KL-to-uniform prior as the codebook loss
    (reference: ldm/tamming/quantize.py:110-210)."""

    n_e: int
    e_dim: int
    straight_through: bool = True
    kl_weight: float = 5e-4
    temp_init: float = 1.0
    remap: str | Sequence[int] | None = None

    @nn.compact
    def __call__(
        self,
        z: jax.Array,
        rng: jax.Array | None = None,
        temp: float | None = None,
        deterministic: bool = False,
    ):
        """z: [B, H, W, hidden]. Returns (z_q, kl_loss, (perplexity, None, idx))."""
        temp = self.temp_init if temp is None else temp
        logits = nn.Conv(self.n_e, (1, 1), name="proj")(z).astype(jnp.float32)
        embedding = self.param(
            "embedding", nn.initializers.normal(1.0), (self.n_e, self.e_dim)
        )
        used = self._used()
        if self.remap is not None:
            # restrict the categorical to the "used" subset: unused logits are
            # masked out of the softmax, the mixture sees zeros there
            # (reference: ldm/tamming/quantize.py:180-187 slices to used rows
            # then scatters back into full_zeros).
            mask = np.full((self.n_e,), -np.inf, np.float32)
            mask[used] = 0.0
            logits = logits + jnp.asarray(mask)

        if deterministic or rng is None:
            soft = jax.nn.softmax(logits / temp, axis=-1)
        else:
            gumbel = jax.random.gumbel(rng, logits.shape, jnp.float32)
            soft = jax.nn.softmax((logits + gumbel) / temp, axis=-1)

        # the reference forces hard quantization at eval time
        # ("we must quantize", ldm/tamming/quantize.py:173)
        hard = self.straight_through or deterministic
        if hard:
            idx = jnp.argmax(soft, axis=-1)
            one_hot = jax.nn.one_hot(idx, self.n_e, dtype=jnp.float32)
            probs = one_hot + soft - jax.lax.stop_gradient(soft)
        else:
            probs = soft
            idx = jnp.argmax(soft, axis=-1)

        z_q = jnp.einsum(
            "bhwk,kd->bhwd", probs, embedding, preferred_element_type=jnp.float32
        ).astype(z.dtype)

        qy = jax.nn.softmax(logits, axis=-1)
        kl = self.kl_weight * jnp.mean(
            jnp.sum(jnp.where(jnp.isfinite(logits),
                              qy * jnp.log(qy * self.n_e + 1e-10), 0.0),
                    axis=-1)
        )
        perplexity = _perplexity(idx.reshape(-1), self.n_e)
        if self.remap is not None:
            # report indices in the used-subset space (reference remap_to_used,
            # ldm/tamming/quantize.py:195-196). The mask guarantees argmax
            # lands in `used`, so a static inverse table suffices.
            inv = np.zeros((self.n_e,), np.int32)
            inv[used] = np.arange(len(used), dtype=np.int32)
            idx = jnp.take(jnp.asarray(inv), idx)
        return z_q, kl, (perplexity, None, idx.astype(jnp.int32))

    def _used(self) -> np.ndarray | None:
        if self.remap is None:
            return None
        return (np.load(self.remap) if isinstance(self.remap, str)
                else np.asarray(self.remap, dtype=np.int64))

    def get_codebook_entry(self, indices: jax.Array,
                           shape: tuple | None = None) -> jax.Array:
        """Lookup codes for sampled indices (reference:
        ldm/tamming/quantize.py:203-210 — one-hot @ embed with unmap under
        remap). `indices` are in the remapped (used-subset) space when
        `remap` is set."""
        emb = self.get_variable("params", "embedding")
        used = self._used()
        flat = indices.reshape(-1)
        if used is not None:
            flat = jnp.take(jnp.asarray(used, dtype=jnp.int32), flat)
        z_q = jnp.take(emb, flat, axis=0)
        if shape is not None:
            z_q = z_q.reshape(shape)
        return z_q


class EMAVectorQuantizer(nn.Module):
    """EMA-codebook VQ as a Flax module: the codebook lives in a mutable
    'codebook' variable collection (weight / cluster_size / embed_avg) and is
    updated with Laplace-smoothed EMA when the collection is mutable and
    `update=True` — the reference's EMAVectorQuantizer semantics
    (ldm/tamming/quantize.py:331-446; the torch version keeps these as
    registered buffers updated in-place during forward).

    The gradient loss is the commitment term only (beta * ‖sg[z_q] − z‖²);
    the codebook itself learns through the EMA statistics, not gradients.
    """

    n_e: int
    e_dim: int
    beta: float = 0.25
    decay: float = 0.99
    eps: float = 1e-5

    @nn.compact
    def __call__(self, z: jax.Array, update: bool = False):
        """z: [B, H, W, e_dim]. Returns (z_q, loss, (perplexity, None, idx)).

        `update=True` (with the 'codebook' collection mutable) applies the
        EMA codebook update as a side effect.
        """
        weight = self.variable(
            "codebook", "weight",
            lambda: jax.random.normal(self.make_rng("params"),
                                      (self.n_e, self.e_dim), jnp.float32),
        )
        cluster_size = self.variable(
            "codebook", "cluster_size", lambda: jnp.zeros((self.n_e,), jnp.float32))
        embed_avg = self.variable(
            "codebook", "embed_avg", lambda: weight.value.copy())

        B, H, W, C = z.shape
        assert C == self.e_dim
        z_flat = z.reshape(-1, self.e_dim).astype(jnp.float32)
        idx = _nearest_code(z_flat, weight.value)
        z_q = jnp.take(weight.value, idx, axis=0).reshape(z.shape).astype(z.dtype)

        loss = self.beta * jnp.mean(
            (jax.lax.stop_gradient(z_q.astype(jnp.float32)) - z.astype(jnp.float32)) ** 2
        )

        if update and not self.is_initializing():
            one_hot = jax.nn.one_hot(idx, self.n_e, dtype=jnp.float32)
            counts = jnp.sum(one_hot, axis=0)
            sums = jnp.dot(one_hot.T, z_flat, preferred_element_type=jnp.float32)
            new_cs = cluster_size.value * self.decay + (1 - self.decay) * counts
            new_ea = embed_avg.value * self.decay + (1 - self.decay) * sums
            n = jnp.sum(new_cs)
            smoothed = (new_cs + self.eps) / (n + self.n_e * self.eps) * n
            cluster_size.value = new_cs
            embed_avg.value = new_ea
            weight.value = new_ea / smoothed[:, None]

        z_q = z + jax.lax.stop_gradient(z_q - z)
        perplexity = _perplexity(idx, self.n_e)
        return z_q, loss, (perplexity, None, idx)

    def get_codebook_entry(self, indices: jax.Array, shape: tuple | None = None):
        w = self.get_variable("codebook", "weight")
        z_q = jnp.take(w, indices.reshape(-1), axis=0)
        if shape is not None:
            z_q = z_q.reshape(shape)
        return z_q


# ---------------------------------------------------------------------------
# EMA codebook (reference: ldm/tamming/quantize.py:331-446)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmaCodebook:
    """Functional EMA codebook state (EmbeddingEMA): per-code weights plus EMA
    cluster sizes and embedding averages, updated with Laplace smoothing."""

    weight: jax.Array        # [K, D]
    cluster_size: jax.Array  # [K]
    embed_avg: jax.Array     # [K, D]
    decay: float = dataclasses.field(metadata=dict(static=True), default=0.99)
    eps: float = dataclasses.field(metadata=dict(static=True), default=1e-5)

    @classmethod
    def create(cls, rng: jax.Array, n_e: int, e_dim: int, decay: float = 0.99,
               eps: float = 1e-5) -> "EmaCodebook":
        w = jax.random.normal(rng, (n_e, e_dim), jnp.float32)
        return cls(
            weight=w,
            cluster_size=jnp.zeros((n_e,), jnp.float32),
            embed_avg=w.copy(),
            decay=decay,
            eps=eps,
        )


def ema_quantize(
    codebook: EmaCodebook, z: jax.Array, update: bool = True
) -> tuple[jax.Array, EmaCodebook, jax.Array, jax.Array]:
    """One EMA-VQ step: quantize `z` [..., D] and (optionally) return the
    updated codebook. Returns (z_q, new_codebook, perplexity, indices)."""
    orig_shape = z.shape
    z_flat = z.reshape(-1, orig_shape[-1]).astype(jnp.float32)
    idx = _nearest_code(z_flat, codebook.weight)
    one_hot = jax.nn.one_hot(idx, codebook.weight.shape[0], dtype=jnp.float32)
    z_q = jnp.take(codebook.weight, idx, axis=0).reshape(orig_shape).astype(z.dtype)

    new_cb = codebook
    if update:
        d = codebook.decay
        counts = jnp.sum(one_hot, axis=0)
        sums = jnp.dot(one_hot.T, z_flat, preferred_element_type=jnp.float32)
        cluster_size = codebook.cluster_size * d + (1 - d) * counts
        embed_avg = codebook.embed_avg * d + (1 - d) * sums
        n = jnp.sum(cluster_size)
        smoothed = (
            (cluster_size + codebook.eps)
            / (n + codebook.weight.shape[0] * codebook.eps)
            * n
        )
        weight = embed_avg / smoothed[:, None]
        new_cb = dataclasses.replace(
            codebook, weight=weight, cluster_size=cluster_size, embed_avg=embed_avg
        )

    z_q = z + jax.lax.stop_gradient(z_q - z)
    perplexity = _perplexity(idx, codebook.weight.shape[0])
    return z_q, new_cb, perplexity, idx
