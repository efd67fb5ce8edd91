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


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
