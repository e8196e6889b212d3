"""Bitpacked (Pallas byte-LUT) sparse backend vs explicit dense products.

The kernel runs in interpret mode on CPU, so these tests exercise the
exact program the TPU executes (block plans, padding, LUT build, the
two-register gather) with only the Mosaic lowering swapped out.
"""

import numpy as np
import pytest
import scipy.sparse as sps

import jax
import jax.numpy as jnp

from bayesbridge_tpu.design import SparseDesignMatrix
from bayesbridge_tpu.design.bitlut import (
    bitpacked_matvec, pack_bits, plan_blocks,
)

# On a real TPU (BB_TEST_ON_TPU=1) the kernels run compiled, where
# 64-bit tables are unsupported: build f32 designs with f32 tolerances.
_ON_TPU = jax.default_backend() == 'tpu'
_DTYPE = np.float32 if _ON_TPU else None
_TOL = dict(rtol=2e-5, atol=1e-6) if _ON_TPU \
    else dict(rtol=1e-8, atol=1e-10)


def _make_design(n=97, p=53, binary_only=True, seed=0):
    rng = np.random.default_rng(seed)
    X = (rng.random((n, p)) < 0.15).astype(np.float64)
    if not binary_only:
        X[:, ::7] *= rng.standard_normal((n, len(range(0, p, 7))))
    X[X == 0] = 0.0
    return sps.csr_matrix(X), X


def test_kernel_matches_dense_matvec():
    rng = np.random.default_rng(1)
    n, p = 300, 70
    X = (rng.random((n, p)) < 0.1).astype(np.uint8)
    v = rng.standard_normal(p)

    g_pad, m_pad, n_chunk = plan_blocks(p, n)
    bits = np.zeros((g_pad, m_pad), np.uint8)
    packed = pack_bits(X, axis=1)
    bits[:packed.shape[0], :n] = packed
    v_pad = np.zeros(8 * g_pad)
    v_pad[:p] = v
    out = bitpacked_matvec(
        jnp.asarray(bits),
        jnp.asarray(v_pad, _DTYPE or np.float64), n,
        n_chunk, interpret=not _ON_TPU)
    np.testing.assert_allclose(np.asarray(out, np.float64),
                               X.astype(np.float64) @ v,
                               rtol=(2e-5 if _ON_TPU else 1e-10),
                               atol=1e-6)


@pytest.mark.parametrize("binary_only", [True, False])
@pytest.mark.parametrize("center,intercept", [
    (False, False), (True, True), (True, False), (False, True),
])
def test_dot_tdot_match_explicit(binary_only, center, intercept):
    X_sp, X = _make_design(binary_only=binary_only)
    design = SparseDesignMatrix(
        X_sp, center_predictor=center, add_intercept=intercept,
        backend='bitpack', dtype=_DTYPE)
    assert design.backend == 'bitpack'

    Xc = X - X.mean(0) if center else X
    if intercept:
        Xc = np.hstack((np.ones((X.shape[0], 1)), Xc))
    rng = np.random.default_rng(3)
    v = rng.standard_normal(Xc.shape[1])
    u = rng.standard_normal(Xc.shape[0])
    np.testing.assert_allclose(np.asarray(design.dot(v)), Xc @ v, **_TOL)
    np.testing.assert_allclose(np.asarray(design.Tdot(u)), Xc.T @ u,
                               **_TOL)


def test_fisher_diag_matches_dense():
    X_sp, X = _make_design(binary_only=False)
    design = SparseDesignMatrix(X_sp, center_predictor=True,
                                add_intercept=True, backend='bitpack',
                                dtype=_DTYPE)
    rng = np.random.default_rng(5)
    w = rng.random(X.shape[0]) + 0.1
    Xc = np.hstack((np.ones((X.shape[0], 1)), X - X.mean(0)))
    np.testing.assert_allclose(
        np.asarray(design.compute_fisher_diag(w)),
        np.einsum('i,ij,ij->j', w, Xc, Xc),
        rtol=(2e-5 if _ON_TPU else 1e-8))


def test_densify_and_pytree_roundtrip():
    import jax
    X_sp, X = _make_design(binary_only=False)
    design = SparseDesignMatrix(X_sp, center_predictor=False,
                                add_intercept=False, backend='bitpack',
                                dtype=_DTYPE)
    # f32 storage (real-TPU runs) rounds the non-binary column values.
    np.testing.assert_allclose(design.toarray(), X,
                               rtol=(1e-6 if _ON_TPU else 1e-12))

    leaves, treedef = jax.tree_util.tree_flatten(design)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    v = np.random.default_rng(7).standard_normal(X.shape[1])
    np.testing.assert_allclose(np.asarray(rebuilt.dot(v)),
                               np.asarray(design.dot(v)))


@pytest.mark.slow
def test_gibbs_runs_on_bitpack_backend():
    """End-to-end: a short CG Gibbs chain over a bitpacked design agrees
    with the same chain over the hybrid backend (same seed, same draws:
    only the matvec implementation differs)."""
    from bayesbridge_tpu import (
        BayesBridge, RegressionModel, RegressionCoefPrior,
    )
    rng = np.random.default_rng(11)
    n, p = 120, 40
    X = sps.csr_matrix((rng.random((n, p)) < 0.2).astype(np.float64))
    beta = np.zeros(p)
    beta[:3] = 1.0
    logits = np.asarray(X @ beta)
    y = (rng.random(n) < 1 / (1 + np.exp(-logits))).astype(np.float64)

    def run(backend):
        from bayesbridge_tpu.design import SparseDesignMatrix as SDM
        from bayesbridge_tpu.models.logistic import LogisticModel
        design = SDM(X, center_predictor=False, add_intercept=True,
                     backend=backend, dtype=_DTYPE)
        model = LogisticModel(y, None, design)
        prior = RegressionCoefPrior(bridge_exponent=.5,
                                    regularizing_slab_size=2.)
        bridge = BayesBridge(model, prior,
                             dtype=jnp.float32 if _ON_TPU else None)
        samples, _ = bridge.gibbs(20, seed=0, coef_sampler_type='cg',
                                  init={'global_scale': 0.1})
        return samples['coef']

    coef_bit = run('bitpack')
    coef_hyb = run('hybrid')
    np.testing.assert_allclose(coef_bit, coef_hyb,
                               rtol=(1e-3 if _ON_TPU else 1e-5),
                               atol=(1e-4 if _ON_TPU else 1e-7))


@pytest.mark.slow
def test_f32_bitpack_design_inside_x64_session():
    """The production beyond-HBM combination: an explicitly-f32 bitpack
    design driving an f32 CG chain while the session has jax_enable_x64
    on (the suite default). Pins the 576d7d8 fix end-to-end
    (VERDICT r2 item 8)."""
    from bayesbridge_tpu import BayesBridge, RegressionCoefPrior
    from bayesbridge_tpu.models.logistic import LogisticModel
    assert jax.config.jax_enable_x64
    rng = np.random.default_rng(23)
    n, p = 100, 30
    X = sps.csr_matrix((rng.random((n, p)) < 0.2).astype(np.float64))
    y = (rng.random(n) < 0.5).astype(np.float64)
    design = SparseDesignMatrix(X, add_intercept=True,
                                backend='bitpack', dtype=np.float32)
    model = LogisticModel(y, None, design)
    bridge = BayesBridge(model, RegressionCoefPrior(
        bridge_exponent=.5, regularizing_slab_size=2.),
        dtype=jnp.float32)
    samples, info = bridge.gibbs(10, seed=0, coef_sampler_type='cg',
                                 init={'global_scale': 0.1},
                                 params_to_save=('coef', 'logp'))
    assert samples['coef'].dtype == np.float32 or np.all(
        np.isfinite(samples['coef']))
    assert np.all(np.isfinite(samples['logp']))


def test_auto_backend_beyond_hbm_budget(monkeypatch):
    """Auto rule: over the dense-block budget, a mostly-binary design
    must pick bitpack; a dense-ish design where ELL would be even
    larger stays hybrid as the least-bad option."""
    import bayesbridge_tpu.design.sparse as sparse_mod
    monkeypatch.setattr(sparse_mod, '_HYBRID_MAX_BYTES', 1e3)
    monkeypatch.setattr(sparse_mod, '_BITPACK_MAX_BYTES', 1e9)

    rng = np.random.default_rng(0)
    X_bin = sps.csr_matrix((rng.random((200, 64)) < 0.1).astype(float))
    d = SparseDesignMatrix(X_bin, add_intercept=False,
                           center_predictor=False, backend='auto',
                           dtype=np.float32)
    assert d.backend == 'bitpack'

    dense_vals = rng.standard_normal((200, 64)) * (rng.random((200, 64)) < .9)
    X_dense = sps.csr_matrix(dense_vals)
    d2 = SparseDesignMatrix(X_dense, add_intercept=False,
                            center_predictor=False, backend='auto',
                            dtype=np.float32)
    assert d2.backend == 'hybrid'
