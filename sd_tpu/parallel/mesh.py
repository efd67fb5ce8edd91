"""Device mesh + sharding: the scaling layer the reference never had.

The reference is single-GPU by construction (SURVEY.md §2.14, §5.8 —
`pl.Trainer(devices=1)`, no torch.distributed anywhere); this module is the
TPU-native design surface replacing that gap: a `jax.sharding.Mesh` over ICI,
NamedSharding annotations, and jit with in/out shardings so XLA inserts the
collectives (psum for DP grad sync, all_gather/reduce_scatter for TP)
— never hand-written NCCL-style calls.

Axes convention:
  * "data"  — batch axis; gradients all-reduce over it (DP).
  * "model" — tensor-parallel axis for attention/MLP kernels (TP), optional.

Typical single-slice v5e-8: Mesh {"data": 8} (models fit on one chip) or
{"data": 4, "model": 2} for TP experiments. Multi-host: call
`jax.distributed.initialize()` first; the same code paths apply with the
"data" axis laid out over DCN-connected slices.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any


def make_mesh(
    axes: dict[str, int] | None = None, devices: Sequence | None = None
) -> Mesh:
    """Build a Mesh. Default: all devices on one "data" axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes)
    shape = tuple(axes.values())
    assert int(np.prod(shape)) == len(devices), (
        f"mesh {axes} wants {np.prod(shape)} devices, have {len(devices)}"
    )
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: PyTree, axis: str = "data") -> PyTree:
    """Device-put a host batch sharded on the leading (batch) dimension."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim > 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


# ---------------------------------------------------------------------------
# parameter sharding rules
# ---------------------------------------------------------------------------

# Tensor-parallel rules for the SD UNet / transformer blocks: qkv and FF-in
# kernels split on the output dim (column parallel), out-proj and FF-out on
# the input dim (row parallel) — the Megatron layout over the "model" axis.
# Biases of column-parallel layers shard with the outputs.
TP_RULES_UNET: list[tuple[str, P]] = [
    (r".*(to_q|to_k|to_v|q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r".*(to_q|to_k|to_v|q_proj|k_proj|v_proj)/bias$", P("model")),
    (r".*qkv/kernel$", P(None, None, None, "model")),
    (r".*(to_out|out_proj|proj_out)/kernel$", P("model", None)),
    (r".*ff/proj_in/kernel$", P(None, "model")),
    (r".*ff/proj_in/bias$", P("model")),
    (r".*ff/proj_out/kernel$", P("model", None)),
    (r".*(fc1)/kernel$", P(None, "model")),
    (r".*(fc1)/bias$", P("model")),
    (r".*(fc2)/kernel$", P("model", None)),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def infer_param_sharding(
    params: PyTree,
    mesh: Mesh,
    rules: list[tuple[str, P]] | None = None,
) -> PyTree:
    """Map each param leaf to a NamedSharding: first regex rule that matches
    its path wins; unmatched leaves replicate. A rule whose PartitionSpec
    doesn't divide the leaf shape falls back to replication."""
    rules = rules or []
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def assign(path, leaf):
        name = _path_str(path)
        for pattern, spec in rules:
            if re.match(pattern, name):
                if _spec_fits(spec, leaf.shape, axis_sizes):
                    return NamedSharding(mesh, spec)
                break
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def _spec_fits(spec: P, shape: tuple, axis_sizes: dict) -> bool:
    if len(spec) > len(shape):
        return False
    for dim, names in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if names is None:
            continue
        names = names if isinstance(names, tuple) else (names,)
        total = int(np.prod([axis_sizes[n] for n in names]))
        if dim % total != 0:
            return False
    return True


def make_parallel_train_step(
    train_step: Callable,
    mesh: Mesh,
    state_sharding: PyTree,
    data_axis: str = "data",
):
    """jit a (state, batch, rng) -> (state, logs) step with explicit
    shardings: state as given, batch sharded on `data_axis`, rng replicated,
    logs replicated. XLA inserts the psum for gradient sync.

    When the mesh has a "model" axis, the Pallas flash-attention kernel is
    routed through shard_map over heads (GSPMD cannot partition a
    pallas_call), so tensor-parallel UNets keep the flash path."""
    if "model" in mesh.axis_names:
        from sd_tpu.kernels.attention import enable_sharded_attention

        enable_sharded_attention(mesh, "model", data_axis)

    def batch_spec(x):
        return NamedSharding(
            mesh, P(data_axis, *([None] * (max(x.ndim, 1) - 1)))
        )

    def jitted_for(batch):
        in_shardings = (
            state_sharding,
            jax.tree.map(batch_spec, batch),
            replicated(mesh),
        )
        out_shardings = (state_sharding, replicated(mesh))
        return jax.jit(
            train_step, in_shardings=in_shardings, out_shardings=out_shardings
        )

    cache = {}
    state_struct = jax.tree.structure(state_sharding)

    def step(state, batch, rng):
        # The jitted programs bake in `state_sharding` (closure-fixed); a
        # state with a different tree structure would silently hit the wrong
        # program, so enforce the single-sharding assumption explicitly.
        got = jax.tree.structure(state)
        assert got == state_struct, (
            "make_parallel_train_step was built for a different state "
            f"structure; rebuild it for this state ({got} != {state_struct})"
        )
        key = tuple(
            (tuple(x.shape), str(x.dtype)) for x in jax.tree.leaves(batch)
        )
        if key not in cache:
            cache[key] = jitted_for(batch)
        return cache[key](state, batch, rng)

    return step


# ---------------------------------------------------------------------------
# ZeRO-style optimizer/EMA state sharding over the data axis
# ---------------------------------------------------------------------------


def zero_param_like_sharding(
    params: PyTree,
    mesh: Mesh,
    data_axis: str = "data",
    tp_rules: list[tuple[str, P]] | None = None,
) -> PyTree:
    """Shardings for param-shaped state (Adam mu/nu, EMA shadows): each leaf
    keeps any tensor-parallel placement its parameter has AND additionally
    shards its largest remaining divisible dimension over `data_axis`
    (ZeRO-1: optimizer state partitioned across data-parallel workers, so it
    no longer replicates — removes the fp32 Adam+EMA HBM squeeze documented
    in BASELINE.md). Leaves with no divisible free dim stay as the param
    sharding (biases etc. — negligible bytes)."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_data = axis_sizes.get(data_axis, 1)
    base = infer_param_sharding(params, mesh, tp_rules or [])

    def widen(leaf, sh):
        if n_data <= 1 or leaf.ndim == 0:
            return sh
        spec = list(tuple(sh.spec) + (None,) * (leaf.ndim - len(sh.spec)))
        # largest dim not already sharded and divisible by the data size
        cand = [i for i in range(leaf.ndim)
                if spec[i] is None and leaf.shape[i] % n_data == 0]
        if not cand:
            return sh
        i = max(cand, key=lambda i: leaf.shape[i])
        spec[i] = data_axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(widen, params, base)


def zero_state_sharding(
    state,
    mesh: Mesh,
    data_axis: str = "data",
    tp_rules: list[tuple[str, P]] | None = None,
):
    """Sharding tree for a TrainState: params keep their (TP or replicated)
    layout; Adam mu/nu and the EMA shadow are ZeRO-sharded over `data_axis`;
    scalars replicate. Returns a TrainState-of-NamedShardings usable as
    make_parallel_train_step's state_sharding.

    Cost model (the ZeRO-1 trade): because grads come out of the psum
    matching the PARAM layout while mu/nu/EMA are data-axis-sharded, GSPMD
    reshards the gradient tree (dynamic-slice down to the shard, all-gather
    back for the param update) every step. That per-step gather traffic —
    one params-worth of bytes each way over ICI on the data axis — is the
    price paid for not replicating ~3 params-worth of fp32 state in HBM.
    Worth it whenever HBM is the binding constraint (the BASELINE.md
    Adam+EMA squeeze); for small models on fat-HBM chips, pass n_data=1
    layouts (plain infer_param_sharding) instead."""
    import dataclasses as _dc

    import optax

    p_shard = infer_param_sharding(state.params, mesh, tp_rules or [])
    z_shard = zero_param_like_sharding(state.params, mesh, data_axis, tp_rules)
    rep = replicated(mesh)

    def fix_opt(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=rep, mu=z_shard, nu=z_shard)
        return node

    opt_shard = jax.tree.map(
        fix_opt, state.opt_state,
        is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState),
    )
    # any remaining array leaves in the opt state (clip state etc.) replicate
    opt_shard = jax.tree.map(
        lambda n: n if isinstance(n, NamedSharding) else rep, opt_shard)
    ema_shard = (
        _dc.replace(state.ema, shadow=z_shard, num_updates=rep)
        if getattr(state, "ema", None) is not None else None
    )
    kw = {}
    if getattr(state, "logvar", None) is not None:
        kw["logvar"] = rep
    return _dc.replace(
        state, params=p_shard, opt_state=opt_shard, ema=ema_shard,
        step=rep, **kw,
    )


def fsdp_state_sharding(
    state,
    mesh: Mesh,
    data_axis: str = "data",
    tp_rules: list[tuple[str, P]] | None = None,
):
    """ZeRO-3 / FSDP: the PARAMS themselves — not just the optimizer state —
    shard over `data_axis` (each leaf on its largest divisible free dim, on
    top of any tensor-parallel placement from `tp_rules`). Adam mu/nu and the
    EMA shadow take the IDENTICAL layout, so the whole optimizer update runs
    shard-local with zero resharding; inside the forward/backward GSPMD
    all-gathers each weight at its use site and reduce-scatters its gradient
    — the standard JAX FSDP recipe (annotate, let XLA insert collectives;
    cf. the ZeRO-1 trade documented on zero_state_sharding).

    vs ZeRO-1 (`zero_state_sharding`): HBM drops by the full params-worth of
    bf16 weights per non-shard replica (on top of the fp32 Adam+EMA saving),
    at the price of one params-worth of all-gather per forward and backward
    instead of one per optimizer step. Worth it when the model itself no
    longer fits replicated — the reference's single-GPU stack has no
    counterpart (SURVEY §2.14); this is the scaling path past it."""
    import dataclasses as _dc

    import optax

    p_shard = zero_param_like_sharding(state.params, mesh, data_axis, tp_rules)
    rep = replicated(mesh)

    def fix_opt(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=rep, mu=p_shard, nu=p_shard)
        return node

    opt_shard = jax.tree.map(
        fix_opt, state.opt_state,
        is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState),
    )
    opt_shard = jax.tree.map(
        lambda n: n if isinstance(n, NamedSharding) else rep, opt_shard)
    ema_shard = (
        _dc.replace(state.ema, shadow=p_shard, num_updates=rep)
        if getattr(state, "ema", None) is not None else None
    )
    kw = {}
    if getattr(state, "logvar", None) is not None:
        kw["logvar"] = rep
    return _dc.replace(
        state, params=p_shard, opt_state=opt_shard, ema=ema_shard,
        step=rep, **kw,
    )


def gan_state_sharding(
    state,
    mesh: Mesh,
    data_axis: str = "data",
    mode: str = "zero1",
):
    """Sharding tree for a GanTrainState (two optimizers, discriminator
    batch stats, mutable model_state — sd_tpu.train.gan).

    mode="zero1": generator/discriminator params replicate; both optimizers'
    Adam mu/nu ZeRO-shard over `data_axis`. mode="fsdp": the params shard
    too, with mu/nu in the matching layout (shard-local update). Batch
    stats, model_state (e.g. the EMA-VQ codebook) and scalars replicate —
    they are tiny and updated by broadcast-identical math on every device.
    No tensor-parallel rules here: the codec stack is conv-dominated with
    no Megatron-splittable attention; scale it spatially instead
    (`spatial_sharding`)."""
    import dataclasses as _dc

    import optax

    rep = replicated(mesh)

    def rep_tree(tree):
        return jax.tree.map(lambda _: rep, tree)

    def plike(params):
        return zero_param_like_sharding(params, mesh, data_axis)

    if mode == "fsdp":
        pg, pd = plike(state.params_g), plike(state.params_d)
        mug, mud = pg, pd
    elif mode == "zero1":
        pg, pd = rep_tree(state.params_g), rep_tree(state.params_d)
        mug, mud = plike(state.params_g), plike(state.params_d)
    else:
        raise ValueError(f"mode={mode!r}: expected 'zero1' or 'fsdp'")

    def fix_opt(opt_state, mu_nu):
        def fix(node):
            if isinstance(node, optax.ScaleByAdamState):
                return optax.ScaleByAdamState(count=rep, mu=mu_nu, nu=mu_nu)
            return node

        out = jax.tree.map(
            fix, opt_state,
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState))
        return jax.tree.map(
            lambda n: n if isinstance(n, NamedSharding) else rep, out)

    return _dc.replace(
        state,
        params_g=pg,
        params_d=pd,
        batch_stats_d=rep_tree(state.batch_stats_d),
        opt_state_g=fix_opt(state.opt_state_g, mug),
        opt_state_d=fix_opt(state.opt_state_d, mud),
        step=rep,
        model_state=rep_tree(state.model_state),
    )


def spatial_sharding(mesh: Mesh, ndim: int = 4, data_axis: str = "data",
                     spatial_axis: str = "model") -> NamedSharding:
    """Sequence/spatial parallelism for NHWC activations: batch on the data
    axis AND image height on the second axis. GSPMD inserts the halo
    exchanges convolutions need and the all-gathers attention needs — the
    TPU-native analog of the reference's fold/unfold spatial patching
    (ldm/diffusion/ddpm.py:894-994) for images too large for one chip,
    without a patch loop."""
    spec = [None] * ndim
    spec[0] = data_axis
    if ndim >= 3:
        spec[1] = spatial_axis
    return NamedSharding(mesh, P(*spec))


def put_replicated(tree: PyTree, mesh: Mesh) -> PyTree:
    """Device-put a pytree fully replicated over the mesh."""
    return jax.device_put(tree, replicated(mesh))


def put_sharded_params(params: PyTree, shardings: PyTree) -> PyTree:
    return jax.tree.map(jax.device_put, params, shardings)
