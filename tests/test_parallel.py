"""Mesh/sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4:
the standard fake cluster for TPU code)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sd_tpu.parallel.mesh import (
    TP_RULES_UNET,
    infer_param_sharding,
    make_mesh,
    make_parallel_train_step,
    put_sharded_params,
    replicated,
    shard_batch,
)


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.shape == (8,)

    mesh2 = make_mesh({"data": 4, "model": 2})
    assert mesh2.devices.shape == (4, 2)

    with pytest.raises(AssertionError):
        make_mesh({"data": 3})


def test_shard_batch_layout(rng):
    mesh = make_mesh()
    batch = {"image": jnp.zeros((16, 4, 4, 3)), "label": jnp.zeros((16,))}
    sharded = shard_batch(mesh, batch)
    # each device holds 16/8 = 2 examples
    shard_shapes = [s.data.shape for s in sharded["image"].addressable_shards]
    assert all(s == (2, 4, 4, 3) for s in shard_shapes)


def test_infer_param_sharding_rules():
    mesh = make_mesh({"data": 4, "model": 2})
    params = {
        "block": {"attn1": {"to_q": {"kernel": jnp.zeros((64, 64))},
                            "to_out": {"kernel": jnp.zeros((64, 64))}}},
        "conv": {"kernel": jnp.zeros((3, 3, 8, 8))},
        "odd": {"to_q": {"kernel": jnp.zeros((7, 7))}},  # indivisible
    }
    sh = infer_param_sharding(params, mesh, TP_RULES_UNET)
    assert sh["block"]["attn1"]["to_q"]["kernel"].spec == P(None, "model")
    assert sh["block"]["attn1"]["to_out"]["kernel"].spec == P("model", None)
    assert sh["conv"]["kernel"].spec == P()          # unmatched -> replicated
    assert sh["odd"]["to_q"]["kernel"].spec == P()   # indivisible -> replicated


def test_dp_train_step_matches_single_device(rng):
    """Data-parallel jitted step over the mesh == single-device result."""
    mesh = make_mesh()

    def train_step(state, batch, rng):
        def loss_fn(w):
            pred = batch["x"] @ w
            return jnp.mean((pred - batch["y"]) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(state["w"])
        return {"w": state["w"] - 0.1 * g}, {"loss": loss}

    w0 = jax.random.normal(rng, (4, 2))
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(1), (16, 4)),
        "y": jax.random.normal(jax.random.PRNGKey(2), (16, 2)),
    }

    # single device
    ref_state, ref_logs = train_step({"w": w0}, batch, rng)

    # parallel
    state_sharding = {"w": replicated(mesh)}
    pstep = make_parallel_train_step(train_step, mesh, state_sharding)
    state = jax.device_put({"w": w0}, state_sharding)
    sbatch = shard_batch(mesh, batch)
    new_state, logs = pstep(state, sbatch, rng)

    np.testing.assert_allclose(np.asarray(new_state["w"]),
                               np.asarray(ref_state["w"]), atol=1e-5)
    np.testing.assert_allclose(float(logs["loss"]), float(ref_logs["loss"]),
                               rtol=1e-5)


def test_tp_sharded_matmul_correctness(rng):
    """A column-parallel matmul under jit+sharding equals the dense result."""
    mesh = make_mesh({"data": 2, "model": 4})
    w = jax.random.normal(rng, (16, 32))
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 16))

    from jax.sharding import NamedSharding

    w_sh = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None)))

    f = jax.jit(lambda x, w: jax.nn.relu(x @ w))
    out = f(x_sh, w_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(jax.nn.relu(x @ w)),
                               atol=1e-5)


def test_spatial_parallel_unet_matches(rng):
    """Sequence/spatial parallelism: conv+attention UNet with H sharded over
    'model' must equal the unsharded result (GSPMD halo exchange)."""
    from jax.sharding import NamedSharding

    from sd_tpu.models.unet_sd import UNetModel
    from sd_tpu.parallel.mesh import spatial_sharding

    mesh = make_mesh({"data": 2, "model": 4})
    unet = UNetModel(in_channels=4, model_channels=32, out_channels=4,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_heads=4, context_dim=32)
    x = jax.random.normal(rng, (4, 32, 32, 4))
    t = jnp.zeros((4,), jnp.int32)
    c = jnp.zeros((4, 7, 32))
    params = unet.init(rng, x[:1], t[:1], c[:1])["params"]

    sp = spatial_sharding(mesh)
    xs = jax.device_put(x, sp)
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    f = jax.jit(lambda p, x, t, c: unet.apply({"params": p}, x, t, c),
                out_shardings=sp)
    out = f(ps, xs, t, c)
    ref = unet.apply({"params": params}, x, t, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    assert out.sharding.spec == P("data", "model", None, None)


def test_put_sharded_params(rng):
    mesh = make_mesh({"data": 4, "model": 2})
    params = {"to_q": {"kernel": jax.random.normal(rng, (8, 8))}}
    sh = infer_param_sharding(params, mesh, TP_RULES_UNET)
    placed = put_sharded_params(params, sh)
    assert placed["to_q"]["kernel"].sharding.spec == P(None, "model")


def test_shard_mapped_flash_attention(rng):
    """The flash kernel under shard_map over the head (model) axis equals
    the unsharded result — the TP path for attention (GSPMD cannot partition
    a pallas_call). Runs the real kernel in interpret mode on the CPU mesh."""
    from sd_tpu.kernels.attention import (
        _SHARD_CTX,
        _shard_mapped_flash,
        enable_sharded_attention,
    )
    from sd_tpu.kernels.flash_attention import flash_attention

    mesh = make_mesh({"data": 2, "model": 4})
    B, S, H, D = 2, 256, 8, 16
    q = jax.random.normal(rng, (B, S, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    scale = D ** -0.5

    ref = flash_attention(q, k, v, scale=scale, interpret=True)
    enable_sharded_attention(mesh, "model")  # off-TPU → interpret auto-on
    try:
        assert _SHARD_CTX["interpret"] is True
        out = _shard_mapped_flash(q, k, v, scale)
    finally:
        enable_sharded_attention(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
    assert _SHARD_CTX["mesh"] is None  # disabled again


def test_zero_state_sharding(rng):
    """ZeRO-1: Adam mu/nu and EMA shadows shard over the data axis (params
    stay replicated/TP) and the sharded step matches the replicated step."""
    import dataclasses

    import optax

    from sd_tpu.parallel.mesh import zero_state_sharding
    from sd_tpu.train.diffusion import (ddpm_optimizer, init_train_state,
                                        make_diffusion_train_step)

    mesh = make_mesh({"data": 4, "model": 2})
    params = {
        "dense": {"kernel": jax.random.normal(rng, (16, 32)),
                  "bias": jnp.zeros((32,))},
        "to_q": {"kernel": jax.random.normal(jax.random.PRNGKey(1), (16, 16))},
    }
    opt = ddpm_optimizer(1e-2)
    state = init_train_state(params, opt, ema_decay=0.99)
    sh = zero_state_sharding(state, mesh, tp_rules=TP_RULES_UNET)

    # mu/nu large leaves carry the data axis; params do not
    adam = [n for n in jax.tree.leaves(
        sh.opt_state, is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState))
        if isinstance(n, optax.ScaleByAdamState)][0]
    assert "data" in jax.tree.leaves(
        adam.mu, is_leaf=lambda x: isinstance(x, jax.sharding.NamedSharding)
    )[0].spec
    assert all(
        "data" not in (s.spec if s.spec else ())
        for s in jax.tree.leaves(
            sh.params,
            is_leaf=lambda x: isinstance(x, jax.sharding.NamedSharding))
    )
    # EMA shadow ZeRO-sharded too
    ema_sh = jax.tree.leaves(
        sh.ema.shadow,
        is_leaf=lambda x: isinstance(x, jax.sharding.NamedSharding))
    assert any("data" in (s.spec or ()) for s in ema_sh)

    def loss_fn(p, batch, rng, logvar):
        out = jnp.tanh(batch @ p["dense"]["kernel"] + p["dense"]["bias"])
        return jnp.mean(out**2) + jnp.mean(p["to_q"]["kernel"] ** 2), {}

    step = make_diffusion_train_step(loss_fn, opt, jit=False)
    batch = jax.random.normal(jax.random.PRNGKey(2), (8, 16))

    # replicated reference
    s_ref, logs_ref = jax.jit(step)(state, batch, jax.random.PRNGKey(3))

    from sd_tpu.parallel.mesh import make_parallel_train_step, shard_batch

    s_sh = jax.device_put(state, sh)
    pstep = make_parallel_train_step(step, mesh, sh)
    s_out, logs = pstep(s_sh, shard_batch(mesh, batch), jax.random.PRNGKey(3))

    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_out.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_ref.ema.shadow),
                    jax.tree.leaves(s_out.ema.shadow)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_fsdp_state_sharding(rng):
    """ZeRO-3/FSDP: params themselves shard over the data axis (each device
    holds 1/n of the weights), mu/nu/EMA take the identical layout, and the
    sharded step matches the replicated step."""
    import optax

    from sd_tpu.parallel.mesh import (fsdp_state_sharding,
                                      make_parallel_train_step, shard_batch)
    from sd_tpu.train.diffusion import (ddpm_optimizer, init_train_state,
                                        make_diffusion_train_step)

    mesh = make_mesh({"data": 4, "model": 2})
    params = {
        "dense": {"kernel": jax.random.normal(rng, (16, 32)),
                  "bias": jnp.zeros((32,))},
        "to_q": {"kernel": jax.random.normal(jax.random.PRNGKey(1), (16, 16))},
    }
    opt = ddpm_optimizer(1e-2)
    state = init_train_state(params, opt, ema_decay=0.99)
    sh = fsdp_state_sharding(state, mesh, tp_rules=TP_RULES_UNET)

    # params now CARRY the data axis (the ZeRO-3 difference from ZeRO-1) …
    assert "data" in tuple(sh.params["dense"]["kernel"].spec)
    # … on top of any TP placement
    assert tuple(sh.params["to_q"]["kernel"].spec) in (
        (None, "model"), ("data", "model"), (None, "model"), ("model", "data"))
    assert "model" in jax.tree.leaves(
        [a for a in sh.params["to_q"]["kernel"].spec if a])
    # mu/nu layout identical to the param layout (shard-local update)
    adam = [n for n in jax.tree.leaves(
        sh.opt_state, is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState))
        if isinstance(n, optax.ScaleByAdamState)][0]
    assert (adam.mu["dense"]["kernel"].spec
            == sh.params["dense"]["kernel"].spec)
    assert sh.ema.shadow["dense"]["kernel"].spec == \
        sh.params["dense"]["kernel"].spec

    # each device holds 1/4 of a data-sharded kernel
    s_sh = jax.device_put(state, sh)
    shard = s_sh.params["dense"]["kernel"].addressable_shards[0]
    assert shard.data.size == 16 * 32 // 4

    def loss_fn(p, batch, rng, logvar):
        out = jnp.tanh(batch @ p["dense"]["kernel"] + p["dense"]["bias"])
        return jnp.mean(out**2) + jnp.mean(p["to_q"]["kernel"] ** 2), {}

    step = make_diffusion_train_step(loss_fn, opt, jit=False)
    batch = jax.random.normal(jax.random.PRNGKey(2), (8, 16))

    s_ref, _ = jax.jit(step)(state, batch, jax.random.PRNGKey(3))
    pstep = make_parallel_train_step(step, mesh, sh)
    s_out, _ = pstep(s_sh, shard_batch(mesh, batch), jax.random.PRNGKey(3))

    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_out.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_ref.ema.shadow),
                    jax.tree.leaves(s_out.ema.shadow)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_fsdp_unet_train_step_matches(rng):
    """FSDP over the real SD UNet: a dp4 train step with ZeRO-3-sharded
    params/opt/EMA equals the single-device step (XLA all-gathers weights at
    use, reduce-scatters grads — derived entirely from the shardings)."""
    from sd_tpu.models.unet_sd import UNetModel
    from sd_tpu.parallel.mesh import (fsdp_state_sharding,
                                      make_parallel_train_step, shard_batch)
    from sd_tpu.train.diffusion import (ddpm_optimizer, init_train_state,
                                        make_diffusion_train_step)

    mesh = make_mesh({"data": 4, "model": 2})
    unet = UNetModel(in_channels=4, model_channels=32, out_channels=4,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_heads=4, context_dim=32)
    x = jax.random.normal(rng, (8, 16, 16, 4))
    c = jnp.zeros((8, 7, 32))
    params = unet.init(rng, x[:1], jnp.zeros((1,), jnp.int32), c[:1])["params"]

    opt = ddpm_optimizer(1e-3)
    state = init_train_state(params, opt, ema_decay=0.99)

    def loss_fn(p, batch, rng, logvar):
        t = jnp.zeros((batch.shape[0],), jnp.int32)
        ctx = jnp.zeros((batch.shape[0], 7, 32))
        out = unet.apply({"params": p}, batch, t, ctx)
        return jnp.mean(out**2), {}

    step = make_diffusion_train_step(loss_fn, opt, jit=False)

    s_ref, logs_ref = jax.jit(step)(state, x, jax.random.PRNGKey(3))

    sh = fsdp_state_sharding(state, mesh, tp_rules=TP_RULES_UNET)
    # a large conv kernel must actually be sharded on-device
    s_sh = jax.device_put(state, sh)
    total = sum(l.size for l in jax.tree.leaves(state.params))
    local = sum(l.addressable_shards[0].data.size
                for l in jax.tree.leaves(s_sh.params))
    assert local < 0.6 * total  # most weight bytes are 1/4-sharded

    pstep = make_parallel_train_step(step, mesh, sh)
    s_out, logs = pstep(s_sh, shard_batch(mesh, x), jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(logs["grad_norm"]),
                               float(logs_ref["grad_norm"]), rtol=1e-4)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(s_ref.params),
            jax.tree_util.tree_leaves_with_path(s_out.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4, err_msg=str(pa))
