"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU plugin and forces
``jax_platforms='axon,cpu'`` at interpreter start, so overriding the env var
is not enough — we must update the jax config itself, and we must set
XLA_FLAGS before the CPU backend initialises.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # CPU tests: f64 for FD/oracle checks

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
