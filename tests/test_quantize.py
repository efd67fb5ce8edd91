"""Quantizer tests: nearest-code correctness, straight-through gradients,
remap round-trips, Gumbel behavior, EMA codebook convergence.
Reference semantics: SURVEY.md §2.9 (vqvae/quantize.py, ldm/tamming/quantize.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.models.quantize import (
    EmaCodebook,
    GumbelQuantize,
    VectorQuantizer,
    VectorQuantizerOneHot,
    _nearest_code,
    ema_quantize,
)


def test_nearest_code_exact():
    codebook = jnp.array([[0.0, 0.0], [1.0, 1.0], [-1.0, 2.0]])
    z = jnp.array([[0.1, -0.1], [0.9, 1.2], [-0.8, 1.7]])
    idx = _nearest_code(z, codebook)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2])


def test_vq_snaps_to_codebook(rng):
    vq = VectorQuantizer(n_e=8, e_dim=4)
    z = jax.random.normal(rng, (2, 4, 4, 4))
    params = vq.init(rng, z)
    z_q, loss, (perp, _, idx) = vq.apply(params, z)
    emb = params["params"]["embedding"]
    # forward value equals the selected codebook rows (straight-through keeps
    # z's gradient but the primal is the quantized value)
    expected = jnp.take(emb, idx, axis=0).reshape(z.shape)
    np.testing.assert_allclose(np.asarray(z_q), np.asarray(expected), atol=1e-6)
    assert float(loss) >= 0.0


def test_vq_straight_through_gradient(rng):
    vq = VectorQuantizer(n_e=8, e_dim=4)
    z = jax.random.normal(rng, (1, 2, 2, 4))
    params = vq.init(rng, z)

    def f(z):
        z_q, _, _ = vq.apply(params, z)
        return jnp.sum(z_q * 2.0)

    g = jax.grad(f)(z)
    # straight-through: dz == d(output) exactly
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(g), atol=1e-6)


def test_vq_legacy_vs_fixed_beta(rng):
    # the two beta placements share the same primal value (stop_gradient is
    # identity in the primal) but weight the encoder-commitment GRADIENT
    # differently: legacy leaves dz unscaled (beta lands on the embedding
    # term), the fixed form scales dz by beta
    # (reference: ldm/tamming/quantize.py:290-295).
    z = jax.random.normal(rng, (1, 2, 2, 4))
    grads = {}
    for legacy in (True, False):
        vq = VectorQuantizer(n_e=8, e_dim=4, beta=0.25, legacy=legacy)
        params = vq.init(jax.random.PRNGKey(0), z)
        g = jax.grad(lambda zz: vq.apply(params, zz)[1])(z)
        grads[legacy] = np.asarray(g)
    np.testing.assert_allclose(grads[False] / 0.25, grads[True], atol=1e-6)


def test_vq_remap_round_trip(rng):
    used = [1, 3, 5]
    vq = VectorQuantizer(n_e=8, e_dim=4, remap=used, unknown_index="extra",
                         sane_index_shape=True)
    z = jax.random.normal(rng, (2, 2, 2, 4))
    params = vq.init(rng, z)
    _, _, (_, _, idx) = vq.apply(params, z)
    assert idx.shape == (2, 2, 2)
    assert int(idx.max()) <= len(used)  # 'extra' slot allowed

    # unmap maps in-range indices back into the used set
    bound = vq.bind(params)
    back = bound.unmap_to_all(jnp.array([0, 1, 2]))
    assert set(np.asarray(back).tolist()) <= set(used)


def test_vq_one_hot_matches_gather(rng):
    z = jax.random.normal(rng, (1, 4, 4, 4))
    vq1 = VectorQuantizer(n_e=8, e_dim=4)
    vq2 = VectorQuantizerOneHot(n_e=8, e_dim=4)
    p1 = vq1.init(jax.random.PRNGKey(7), z)
    p2 = {"params": {"embedding": p1["params"]["embedding"]}}
    q1, _, (_, _, i1) = vq1.apply(p1, z)
    q2, _, (_, _, i2) = vq2.apply(p2, z)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)


def test_gumbel_quantize(rng):
    gq = GumbelQuantize(n_e=16, e_dim=4)
    z = jax.random.normal(rng, (2, 4, 4, 8))
    params = gq.init(rng, z, rng)
    z_q, kl, (perp, _, idx) = gq.apply(params, z, rng)
    assert z_q.shape == (2, 4, 4, 4)
    assert idx.shape == (2, 4, 4)
    # deterministic path needs no rng and is stable
    a = gq.apply(params, z, None, None, True)[0]
    b = gq.apply(params, z, None, None, True)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_ema_codebook_moves_toward_data(rng):
    cb = EmaCodebook.create(rng, n_e=4, e_dim=2, decay=0.5)
    data = jnp.tile(jnp.array([[5.0, 5.0]]), (64, 1)).reshape(8, 8, 2)
    for _ in range(20):
        _, cb, _, idx = ema_quantize(cb, data)
    # the most-used code should have drifted to the data mean
    counts = np.bincount(np.asarray(idx), minlength=4)
    top = int(np.argmax(counts))
    np.testing.assert_allclose(np.asarray(cb.weight[top]), [5.0, 5.0], atol=0.2)


def test_ema_quantize_no_update_keeps_state(rng):
    cb = EmaCodebook.create(rng, n_e=4, e_dim=2)
    data = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 2))
    _, cb2, _, _ = ema_quantize(cb, data, update=False)
    np.testing.assert_array_equal(np.asarray(cb.weight), np.asarray(cb2.weight))


def test_gumbel_remap_indices_are_subset_space():
    """With remap, returned indices live in the used-subset space (reference
    remap_to_used semantics, ldm/tamming/quantize.py:195-196)."""
    used = [1, 5, 9, 13]
    gq = GumbelQuantize(n_e=16, e_dim=4, remap=used)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    params = gq.init(jax.random.PRNGKey(1), z)
    _, _, (_, _, idx) = gq.apply(params, z, deterministic=True)
    assert int(jnp.max(idx)) < len(used) and int(jnp.min(idx)) >= 0


def test_gumbel_get_codebook_entry_roundtrip():
    """decode-from-indices works for the gumbel family, incl. remap unmap."""
    used = [1, 5, 9, 13]
    gq = GumbelQuantize(n_e=16, e_dim=4, remap=used)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    params = gq.init(jax.random.PRNGKey(1), z)
    z_q, _, (_, _, idx) = gq.apply(params, z, deterministic=True)
    got = gq.apply(params, idx, (2, 4, 4, 4),
                   method=GumbelQuantize.get_codebook_entry)
    # deterministic hard path: z_q IS the embedding of idx
    np.testing.assert_allclose(np.asarray(got), np.asarray(z_q),
                               rtol=1e-6, atol=1e-6)


def test_vqmodel_decode_code_gumbel():
    from sd_tpu.models.autoencoder import VQModel

    m = VQModel(embed_dim=4, n_embed=16, ch=8, ch_mult=(1, 2),
                num_res_blocks=1, resolution=16, z_channels=4,
                quantizer_type="gumbel")
    x = jnp.ones((1, 16, 16, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    _, _, (_, _, idx) = m.apply(variables, x, method=VQModel.encode)
    out = m.apply(variables, idx.reshape(-1), (1, 8, 8, 4),
                  method=VQModel.decode_code)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out, np.float32)).all()
