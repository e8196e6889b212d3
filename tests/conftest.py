"""Test configuration.

Tests run on CPU with 8 virtual devices (so the sharded multi-chip path is
exercised without TPU hardware) and with float64 enabled for numerical
parity with the reference library's NumPy/SciPy implementation.

The env vars must be set before JAX is imported anywhere, which pytest
guarantees by loading conftest.py first.
"""

import os

# Force CPU: the sandbox pre-sets JAX_PLATFORMS=axon (the tunneled TPU),
# which is slow for the test suite and emulates float64 lossily. Set
# BB_TEST_ON_TPU=1 to run the suite against the real device instead.
if not os.environ.get("BB_TEST_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules. The full suite
    compiles hundreds of XLA:CPU programs in one process; holding them
    all alive exhausts JIT code-mapping resources and LLVM eventually
    segfaults inside backend_compile (seen deterministically around the
    ~134th test regardless of which tests ran). Cross-module cache reuse
    is rare, so the re-compile cost is negligible next to the crash."""
    yield
    jax.clear_caches()
if not os.environ.get("BB_TEST_ON_TPU"):
    # The sandbox's sitecustomize force-registers the axon TPU plugin and
    # overrides JAX_PLATFORMS, so the env var alone is not enough.
    jax.config.update("jax_platforms", "cpu")
