"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests use xla_force_host_platform_device_count so pod
behavior is validated without TPU hardware (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys  # noqa: E402
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# The environment's sitecustomize may have programmatically registered a
# TPU-tunnel platform before JAX_PLATFORMS was read; override it so tests
# always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running golden/convergence tests")
    config.addinivalue_line(
        "markers", "multihost: spawns real OS processes (gloo collectives)")
    config.addinivalue_line(
        "markers", "parity: needs the compiled C++ reference (tools/)")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles hundreds of large CPU programs (interpret-mode
    megakernels, gradient graphs) in one process; past ~half the suite the
    XLA CPU backend aborts/segfaults inside backend_compile_and_load —
    compiler-level resource exhaustion, not a test failure. Releasing the
    executable cache between modules keeps the JIT arenas bounded; tests
    only pay a recompile when they share shapes across modules (rare)."""
    yield
    jax.clear_caches()
