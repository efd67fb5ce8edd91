"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard fake "cluster" for TPU code (SURVEY.md §4): multi-chip
sharding tests execute on host CPU with XLA's forced device count; numerics
tests get fp32 CPU determinism.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# the axon sitecustomize force-registers the tunneled TPU platform; the env
# var alone does not win — the config update does.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

# --- fast tier -------------------------------------------------------------
# `pytest -m fast` is the <5-minute regression net for iterating on kernels,
# samplers, and trainers (VERDICT r3 weak #7: the full 487-test suite costs
# ~52 min on this 1-vCPU host and protects round boundaries, not inner
# loops). Membership is by module: pure-math/golden tests and micro-shape
# parity tests. Timed on this host — keep additions under ~30 s/module.
_FAST_MODULES = {
    "test_schedules",
    "test_distributions",
    "test_ema",
    "test_groupnorm",
    "test_geglu",
    "test_conv2d",
    "test_flash_attention",
    "test_cross_attention",
    "test_nn_blocks",
    "test_diffusion",
    "test_dpm_solver",
    "test_plms",
    "test_unipc",
    "test_k_samplers",
    "test_guidance",
    "test_utils",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "fast: sub-5-minute regression tier (see docs/GUIDE.md)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
