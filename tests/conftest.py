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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The suite compiles hundreds of scan-heavy XLA CPU programs; by ~180
    tests into a full run the accumulated jit cache reliably segfaulted the
    process inside a later compile (reproduced twice at the same test with
    the full prelude, never in isolation or in any subset — a cumulative
    code-memory effect, not a test bug). Dropping caches at module
    boundaries keeps the working set bounded; cross-module recompiles are
    cheap relative to the suite.
    """
    yield
    jax.clear_caches()
