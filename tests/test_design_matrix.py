"""Design-matrix unit tests.

Ports the semantics of the reference's design tests (reference:
tests/test_design_matrix.py:12-85 and
tests/design_matrix/test_sparse_matrix.py:27-57): implicit intercept and
centering must agree with the explicitly constructed ndarray, Fisher
information products must equal X'WX / XWX', and constant columns must be
scrubbed.
"""

import numpy as np
import pytest
import scipy.sparse as sps

from bayesbridge_tpu.design import DenseDesignMatrix, SparseDesignMatrix
from bayesbridge_tpu.utils.simulate_data import simulate_design

ATOL = RTOL = 1e-6


def center_and_add_intercept(X):
    X = X - X.mean(axis=0, keepdims=True)
    return np.hstack((np.ones((X.shape[0], 1)), X))


@pytest.fixture
def sparse_design_pair():
    X = simulate_design(100, 10, binary_frac=.5, format_='sparse', seed=0)
    design = SparseDesignMatrix(X, center_predictor=True, add_intercept=True)
    X_np = center_and_add_intercept(X.toarray())
    return design, X_np


def test_sparse_intercept_and_centering(sparse_design_pair):
    design, X_np = sparse_design_pair
    rng = np.random.default_rng(1)
    v = rng.standard_normal(X_np.shape[1])
    w = rng.standard_normal(X_np.shape[0])
    np.testing.assert_allclose(design.dot(v), X_np @ v, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(design.Tdot(w), X_np.T @ w, atol=ATOL,
                               rtol=RTOL)


def test_sparse_fisher_info():
    X = simulate_design(5, 3, binary_frac=.5, format_='sparse', seed=2)
    design = SparseDesignMatrix(X, center_predictor=True, add_intercept=True)
    X_np = center_and_add_intercept(X.toarray())
    weight = np.random.default_rng(3).exponential(size=5)
    expected = X_np.T @ (weight[:, None] * X_np)
    np.testing.assert_allclose(
        design.compute_fisher_info(weight), expected, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(
        design.compute_fisher_info(weight, diag_only=True),
        np.diag(expected), atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize("centered", [False, True])
@pytest.mark.parametrize("include_intrcpt", [False, True])
def test_sparse_transposed_fisher_info(centered, include_intrcpt):
    """X diag(weight) X' over predictors, with centering corrections
    (reference: tests/design_matrix/test_sparse_matrix.py:27-57)."""
    X = simulate_design(6, 4, binary_frac=.5, format_='sparse', seed=4)
    design = SparseDesignMatrix(
        X, center_predictor=centered, add_intercept=include_intrcpt)
    X_main = X.toarray() - (X.toarray().mean(0) if centered else 0.)
    rng = np.random.default_rng(5)
    weight = rng.exponential(size=X.shape[1] + int(include_intrcpt))
    w_main = weight[1:] if include_intrcpt else weight
    expected = (X_main * w_main[None, :]) @ X_main.T
    if include_intrcpt:
        expected = expected + weight[0]
    np.testing.assert_allclose(
        design.compute_transposed_fisher_info(weight, include_intrcpt),
        expected, atol=ATOL, rtol=RTOL)


def test_dense_intercept_and_centering():
    X = simulate_design(100, 10, binary_frac=.5, format_='dense', seed=6)
    design = DenseDesignMatrix(X, center_predictor=True, add_intercept=True)
    X_np = center_and_add_intercept(X)
    rng = np.random.default_rng(7)
    v = rng.standard_normal(X_np.shape[1])
    w = rng.standard_normal(X_np.shape[0])
    np.testing.assert_allclose(design.dot(v), X_np @ v, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(design.Tdot(w), X_np.T @ w, atol=ATOL,
                               rtol=RTOL)
    expected = X_np.T @ (np.ones(100)[:, None] * X_np)
    np.testing.assert_allclose(
        design.compute_fisher_info(np.ones(100)), expected,
        atol=ATOL, rtol=RTOL)


def test_intercept_removal():
    X = simulate_design(100, 10, binary_frac=.5, format_='sparse', seed=8)
    X_with_const = sps.hstack([
        np.ones((100, 1)), X[:, :5], -.5 * np.ones((100, 1)), X[:, 5:]
    ]).tocsr()
    with pytest.warns(UserWarning):
        scrubbed = SparseDesignMatrix.remove_intercept_indicator(X_with_const)
    np.testing.assert_allclose(X.toarray(), scrubbed.toarray())
    with pytest.warns(UserWarning):
        scrubbed_dense = DenseDesignMatrix.remove_intercept_indicator(
            X_with_const.toarray())
    np.testing.assert_allclose(X.toarray(), scrubbed_dense)


@pytest.mark.parametrize("backend", ['ell', 'hybrid'])
def test_sparse_matches_dense_products(backend):
    """Both storage backends must reproduce CSR semantics exactly."""
    X = simulate_design(50, 20, binary_frac=.8, format_='sparse', seed=9)
    sparse = SparseDesignMatrix(X, center_predictor=False,
                                add_intercept=False, backend=backend)
    assert sparse.backend == backend
    rng = np.random.default_rng(10)
    v = rng.standard_normal(20)
    w = rng.standard_normal(50)
    np.testing.assert_allclose(sparse.dot(v), X @ v, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(sparse.Tdot(w), X.T @ w, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(sparse.toarray(), X.toarray())


@pytest.mark.parametrize("backend", ['ell', 'hybrid'])
def test_sparse_backends_centered_products_and_fisher(backend):
    X = simulate_design(60, 12, binary_frac=.5, format_='sparse', seed=13)
    design = SparseDesignMatrix(X, center_predictor=True,
                                add_intercept=True, backend=backend)
    X_np = center_and_add_intercept(X.toarray())
    rng = np.random.default_rng(14)
    v = rng.standard_normal(13)
    w = rng.standard_normal(60)
    weight = rng.exponential(size=60)
    np.testing.assert_allclose(design.dot(v), X_np @ v, atol=ATOL,
                               rtol=RTOL)
    np.testing.assert_allclose(design.Tdot(w), X_np.T @ w, atol=ATOL,
                               rtol=RTOL)
    np.testing.assert_allclose(
        design.compute_fisher_info(weight, diag_only=True),
        np.diag(X_np.T @ (weight[:, None] * X_np)), atol=ATOL, rtol=RTOL)


def test_hybrid_splits_int4_exact_columns():
    """In float32 mode, binary/dummy columns land in the packed int4
    block and are represented exactly; continuous columns stay float32."""
    import scipy.sparse as sps
    rng = np.random.default_rng(15)
    binary = (rng.uniform(size=(40, 6)) < .3).astype(np.float64)
    dense = rng.standard_normal((40, 2)) * 1.7
    X = sps.csr_matrix(np.hstack([binary, dense]))
    design = SparseDesignMatrix(X, add_intercept=False, backend='hybrid',
                                dtype=np.float32)
    # Runtimes without S4 support (some PJRT plugins) fall to int8; the
    # tier must match what the capability probe reports.
    from bayesbridge_tpu.design.sparse import _int4_matmul_supported
    want = 'int4' if _int4_matmul_supported() else 'int8'
    assert str(design.X_exact.dtype) == want
    assert design.X_exact.shape[1] == 6
    assert design.X_float.shape[1] == 2
    v = rng.standard_normal(8).astype(np.float32)
    np.testing.assert_allclose(np.asarray(design.dot(v)),
                               X.toarray().astype(np.float32) @ v,
                               rtol=2e-6, atol=2e-6)


def test_hybrid_splits_int8_exact_columns():
    """Integer columns beyond the int4 range [-8, 7] take the int8 tier
    instead, still exact."""
    import scipy.sparse as sps
    rng = np.random.default_rng(15)
    counts = rng.integers(0, 100, size=(40, 6)).astype(np.float64) \
        * (rng.uniform(size=(40, 6)) < .5)
    dense = rng.standard_normal((40, 2)) * 1.7
    X = sps.csr_matrix(np.hstack([counts, dense]))
    design = SparseDesignMatrix(X, add_intercept=False, backend='hybrid',
                                dtype=np.float32)
    assert str(design.X_exact.dtype) == 'int8'
    assert design.X_exact.shape[1] == 6
    assert design.X_float.shape[1] == 2
    v = rng.standard_normal(8).astype(np.float32)
    np.testing.assert_allclose(np.asarray(design.dot(v)),
                               X.toarray().astype(np.float32) @ v,
                               rtol=2e-6, atol=2e-6)


def test_hybrid_int4_nonbinary_fisher_exact():
    """Non-binary int4 columns (small signed integers) square exactly in
    bf16 inside the Fisher second-moment path."""
    import scipy.sparse as sps
    rng = np.random.default_rng(23)
    small = rng.integers(-8, 8, size=(30, 5)).astype(np.float64) \
        * (rng.uniform(size=(30, 5)) < .6)
    X = sps.csr_matrix(small)
    design = SparseDesignMatrix(X, add_intercept=False, backend='hybrid',
                                dtype=np.float32)
    from bayesbridge_tpu.design.sparse import _int4_matmul_supported
    want = 'int4' if _int4_matmul_supported() else 'int8'
    assert str(design.X_exact.dtype) == want
    w = rng.uniform(.5, 2., size=30).astype(np.float32)
    expect = np.einsum('i,ij->j', w, small ** 2)
    got = np.asarray(design.compute_fisher_diag(w), np.float64)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_hybrid_int4_disabled_without_runtime_support(monkeypatch):
    """When the capability probe reports the runtime cannot execute S4
    (some PJRT plugins leave it UNIMPLEMENTED), the tier pick must fall
    to the next-cheapest representation instead of building an operand
    the device will reject."""
    import scipy.sparse as sps
    from bayesbridge_tpu.design import sparse as sparse_mod
    monkeypatch.delenv('BB_HYBRID_INT4', raising=False)
    rng = np.random.default_rng(15)
    binary = (rng.uniform(size=(40, 6)) < .3).astype(np.float64)
    X = sps.csr_matrix(binary)
    design = SparseDesignMatrix(X, add_intercept=False, backend='hybrid',
                                dtype=np.float32)
    assert str(design.X_exact.dtype) == 'int8'
    v = rng.standard_normal(6).astype(np.float32)
    np.testing.assert_allclose(np.asarray(design.dot(v)),
                               X.toarray().astype(np.float32) @ v,
                               rtol=2e-6, atol=2e-6)


def test_hybrid_falls_back_to_bf16_block():
    """Half-integer columns are not int8-representable but are bf16-exact;
    when they dominate, the exact block is stored bf16."""
    import scipy.sparse as sps
    rng = np.random.default_rng(16)
    halves = 0.5 * (rng.integers(0, 4, size=(40, 6))).astype(np.float64)
    dense = rng.standard_normal((40, 2)) * 1.7
    X = sps.csr_matrix(np.hstack([halves, dense]))
    design = SparseDesignMatrix(X, add_intercept=False, backend='hybrid',
                                dtype=np.float32)
    assert str(design.X_exact.dtype) == 'bfloat16'
    assert design.X_exact.shape[1] == 6
    v = rng.standard_normal(8).astype(np.float32)
    np.testing.assert_allclose(np.asarray(design.dot(v)),
                               X.toarray().astype(np.float32) @ v,
                               rtol=2e-6, atol=2e-6)


def test_hybrid_int8_nonbinary_fisher_diag():
    """Integer-count columns (non-binary) square exactly through the
    int8 block's Fisher-diagonal path."""
    import scipy.sparse as sps
    rng = np.random.default_rng(17)
    counts = rng.integers(0, 100, size=(30, 5)).astype(np.float64)
    counts[rng.uniform(size=counts.shape) < .5] = 0.0
    X = sps.csr_matrix(counts)
    design = SparseDesignMatrix(X, add_intercept=False, backend='hybrid',
                                dtype=np.float32)
    assert str(design.X_exact.dtype) == 'int8'
    assert not design.exact_is_binary
    weight = rng.exponential(size=30)
    expected = np.einsum('i,ij->j', weight, counts ** 2)
    np.testing.assert_allclose(
        np.asarray(design.compute_fisher_info(weight, diag_only=True)),
        expected, rtol=1e-4)


@pytest.mark.parametrize("center,intercept", [(True, True), (False, False)])
def test_quad_matvec_blockorder_matches_original(center, intercept):
    """The block-ordered CG operator must equal the original-order
    quad_matvec under the block permutation (the CG solver conjugates
    the whole solve by it; ops/cg.py)."""
    import jax.numpy as jnp
    X = simulate_design(60, 12, binary_frac=.5, format_='sparse', seed=21)
    design = SparseDesignMatrix(X, center_predictor=center,
                                add_intercept=intercept, backend='hybrid')
    ctx = design.cg_blockorder_ctx()
    assert ctx is not None
    perm, unperm, offset_bo = ctx
    perm, unperm = np.asarray(perm), np.asarray(unperm)
    assert sorted(perm.tolist()) == list(range(design.shape[1]))
    np.testing.assert_array_equal(perm[unperm], np.arange(len(perm)))
    rng = np.random.default_rng(22)
    v = rng.standard_normal(design.shape[1])
    w = rng.exponential(size=60)
    ref = np.asarray(design.quad_matvec(jnp.asarray(v), jnp.asarray(w)))
    out_bo = np.asarray(design.quad_matvec_blockorder(
        jnp.asarray(v)[perm], jnp.asarray(w), offset_bo))
    np.testing.assert_allclose(out_bo[unperm], ref, atol=ATOL, rtol=RTOL)


def test_matvec_counters_and_memoization():
    X = simulate_design(30, 10, binary_frac=.5, format_='sparse', seed=11)
    design = SparseDesignMatrix(X, add_intercept=False)
    v = np.random.default_rng(12).standard_normal(10)
    design.dot(v)
    design.Tdot(np.ones(30))
    assert design.get_dot_count() == (1, 1)
    assert design.n_matvec == 2
    design.reset_matvec_count()
    assert design.n_matvec == 0
    design.memoize_dot(True)
    r1 = design.dot(v)
    r2 = design.dot(v)  # memoized: no new evaluation
    assert design.dot_count == 1
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    design.memoize_dot(False)


def test_profiling_trace_writes_artifacts(tmp_path):
    """utils.profiling.trace captures an XLA trace of the block."""
    import os
    import jax.numpy as jnp
    import jax
    from bayesbridge_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path)):
        with annotate('test-region'):
            jax.block_until_ready(jnp.ones((32, 32)) @ jnp.ones((32, 32)))
    found = [f for d, _, fs in os.walk(tmp_path) for f in fs]
    assert found, "no trace artifacts written"

    # The xplane parser (bench.py's measured-roofline input) must read
    # the capture back; on CPU there are host rows only. The parser
    # rides the xprof converter, which CI runners don't install — the
    # trace-writing half above still runs there.
    pytest.importorskip('xprof')
    from bayesbridge_tpu.utils.profiling import op_stats_from_trace
    rows = op_stats_from_trace(str(tmp_path), device_only=False)
    assert rows and all('self_us' in r for r in rows)


@pytest.mark.parametrize("centered", [False, True])
@pytest.mark.parametrize("backend", ['hybrid', 'ell'])
def test_fisher_info_gram_matches_densified(centered, backend):
    """compute_fisher_info is built as a streamed p x p Gram product
    (no n x p densify — reference computes it sparsely too,
    sparse_matrix.py:131-162); it must agree with the densified oracle
    across backends, centering, and the multi-chunk accumulation path
    (BB_GRAM_CHUNK_BYTES forced tiny so > 1 chunk runs)."""
    import os
    X = simulate_design(300, 12, binary_frac=.5, format_='sparse', seed=11)
    design = SparseDesignMatrix(X, center_predictor=centered,
                                add_intercept=True, backend=backend,
                                dtype=np.float32)
    X_np = X.toarray()
    if centered:
        X_np = X_np - X_np.mean(axis=0, keepdims=True)
    X_np = np.hstack((np.ones((300, 1)), X_np))
    weight = np.random.default_rng(12).exponential(size=300)
    expected = X_np.T @ (weight[:, None] * X_np)
    old = os.environ.get('BB_GRAM_CHUNK_BYTES')
    os.environ['BB_GRAM_CHUNK_BYTES'] = '40000'  # ~3 chunks of 300 rows
    try:
        got = np.asarray(design.compute_fisher_info(weight), np.float64)
    finally:
        if old is None:
            os.environ.pop('BB_GRAM_CHUNK_BYTES')
        else:
            os.environ['BB_GRAM_CHUNK_BYTES'] = old
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=5e-4)


def test_fisher_info_beyond_densify_guard(monkeypatch):
    """Large-n small-p sparse designs — the regime where the sampler
    cost model SELECTS the Cholesky sampler — must compute X'WX without
    densifying (VERDICT r3 item 5): with the densify guard forced below
    n*p, the Gram path still returns the exact product while
    _materialize_dense would raise MemoryError."""
    from bayesbridge_tpu.design import sparse as sparse_mod
    X = simulate_design(400, 8, binary_frac=.5, format_='sparse', seed=13)
    design = SparseDesignMatrix(X, center_predictor=True,
                                add_intercept=True, dtype=np.float32)
    monkeypatch.setattr(sparse_mod, '_DENSE_FISHER_MAX_ELEMS', 1000)
    with pytest.raises(MemoryError):
        design._materialize_dense()
    weight = np.random.default_rng(14).exponential(size=400)
    X_np = center_and_add_intercept(X.toarray())
    expected = X_np.T @ (weight[:, None] * X_np)
    np.testing.assert_allclose(
        np.asarray(design.compute_fisher_info(weight), np.float64),
        expected, atol=5e-4, rtol=5e-4)


@pytest.mark.slow
def test_cholesky_sampler_large_n_sparse_end_to_end(monkeypatch):
    """(large-n, small-p) sparse logit runs coef_sampler_type='cholesky'
    end-to-end — the case the reference's own cost model selects
    Cholesky for (gibbs_util.py:61-65) and round 3 raised MemoryError
    on. The densify guard is forced below n*p to prove no dense n x p
    design is ever built."""
    from bayesbridge_tpu import BayesBridge, RegressionCoefPrior
    from bayesbridge_tpu import RegressionModel
    from bayesbridge_tpu.design import sparse as sparse_mod
    monkeypatch.setattr(sparse_mod, '_DENSE_FISHER_MAX_ELEMS', 2000)
    rng = np.random.default_rng(15)
    n, p = 600, 12
    X = simulate_design(n, p, binary_frac=.5, format_='sparse', seed=15)
    y = (rng.uniform(size=n) < .5).astype(np.float64)
    model = RegressionModel(y, X, family='logit', dtype=np.float32)
    bridge = BayesBridge(model, RegressionCoefPrior(bridge_exponent=.5))
    samples, info = bridge.gibbs(
        n_iter=20, n_burnin=10, coef_sampler_type='cholesky', seed=15)
    assert np.all(np.isfinite(samples['coef']))


def test_fisher_gram_f32_accuracy_vs_f64_oracle():
    """The Fisher Gram must hold f32-level accuracy on EVERY backend
    device: wide f32 MXU dots at XLA's DEFAULT precision chain their
    partial sums through bf16 on TPU (measured 1e-4..2e-3 rel err on a
    v5e, where the width-1 matvec emitter is f32-accurate), which would
    silently degrade the precision matrix feeding the Cholesky sampler.
    The Gram products therefore request the HIGHEST-precision f32
    decomposition; this pins it with n large enough (4096 rows) for
    bf16 partial-chaining to show. Trivially green on CPU; the teeth
    are in BB_TEST_ON_TPU=1 runs."""
    rng = np.random.default_rng(57)
    n, p = 4096, 96
    Xd = np.hstack([
        (rng.uniform(size=(n, p // 2)) < .3).astype(np.float64),
        rng.standard_normal((n, p // 2)),
    ])
    w = rng.exponential(size=n)
    dense_ref = center_and_add_intercept(Xd)
    G_ref = dense_ref.T @ (w[:, None] * dense_ref)
    scale = np.abs(G_ref).max()
    for design in (
        SparseDesignMatrix(sps.csr_matrix(Xd), center_predictor=True,
                           add_intercept=True, backend='hybrid',
                           dtype=np.float32),
        DenseDesignMatrix(Xd, center_predictor=True, add_intercept=True,
                          dtype=np.float32),
    ):
        G = np.asarray(design.compute_fisher_info(
            np.asarray(w, np.float32)), np.float64)
        assert np.max(np.abs(G - G_ref)) / scale < 1e-5


@pytest.mark.parametrize('centered', [False, True])
@pytest.mark.parametrize('intercept', [False, True])
@pytest.mark.parametrize('values', ['binary', 'categorical'])
def test_presolve_multirhs_matches_composed(centered, intercept, values):
    """The hybrid backend's default pre-solve layout — one multi-RHS
    MXU dot per stored block plus the squared-moment matvec
    (sparse._presolve_multirhs) — must reproduce the composed
    (Tdot, Tdot, fisher_diag) including intercept/centering and the
    non-binary exact-block square."""
    from bayesbridge_tpu.design.abstract import AbstractDesignMatrix
    rng = np.random.default_rng(hash((centered, intercept, values))
                                % 2 ** 31)
    n = 57
    if values == 'binary':
        exact = (rng.uniform(size=(n, 6)) < .3).astype(np.float64)
    else:
        exact = rng.integers(0, 5, size=(n, 6)).astype(np.float64)
    X = sps.csr_matrix(np.hstack(
        [exact, rng.standard_normal((n, 3)) * 1.3]))
    design = SparseDesignMatrix(X, center_predictor=centered,
                                add_intercept=intercept,
                                backend='hybrid', dtype=np.float32)
    assert design.has_presolve_reductions()
    assert design.fused_ne_mode('presolve') is None  # default policy
    u1 = rng.standard_normal(n).astype(np.float32)
    u2 = rng.standard_normal(n).astype(np.float32)
    w = rng.exponential(size=n).astype(np.float32)
    u4 = rng.standard_normal(n).astype(np.float32)
    got = design.presolve_reductions(u1, u2, w)
    ref = AbstractDesignMatrix.presolve_reductions(design, u1, u2, w)
    for g, r in zip(got, ref):
        r = np.asarray(r)
        np.testing.assert_allclose(np.asarray(g), r, rtol=2e-5,
                                   atol=2e-5 * np.abs(r).max())
    # The 4-column form (warm-start fold): the extra column must equal
    # a composed Tdot, and the first three outputs must be unchanged.
    got4 = design.presolve_reductions(u1, u2, w, u4)
    assert len(got4) == 4
    for g, r in zip(got4[:3], ref):
        r = np.asarray(r)
        np.testing.assert_allclose(np.asarray(g), r, rtol=2e-5,
                                   atol=2e-5 * np.abs(r).max())
    r4 = np.asarray(design.Tdot(u4))
    np.testing.assert_allclose(np.asarray(got4[3]), r4, rtol=2e-5,
                               atol=2e-5 * np.abs(r4).max())


def test_dense_presolve_multirhs_matches_composed():
    from bayesbridge_tpu.design.abstract import AbstractDesignMatrix
    rng = np.random.default_rng(61)
    X = rng.standard_normal((43, 12))
    design = DenseDesignMatrix(X, center_predictor=True,
                               add_intercept=True, dtype=np.float32)
    assert design.has_presolve_reductions()
    n = design.shape[0]
    u1 = rng.standard_normal(n).astype(np.float32)
    u2 = rng.standard_normal(n).astype(np.float32)
    w = rng.exponential(size=n).astype(np.float32)
    u4 = rng.standard_normal(n).astype(np.float32)
    got = design.presolve_reductions(u1, u2, w)
    ref = AbstractDesignMatrix.presolve_reductions(design, u1, u2, w)
    for g, r in zip(got, ref):
        r = np.asarray(r)
        np.testing.assert_allclose(np.asarray(g), r, rtol=2e-5,
                                   atol=2e-5 * np.abs(r).max())
    got4 = design.presolve_reductions(u1, u2, w, u4)
    assert len(got4) == 4
    for g, r in zip(got4[:3], ref):
        r = np.asarray(r)
        np.testing.assert_allclose(np.asarray(g), r, rtol=2e-5,
                                   atol=2e-5 * np.abs(r).max())
    r4 = np.asarray(design.Tdot(u4))
    np.testing.assert_allclose(np.asarray(got4[3]), r4, rtol=2e-5,
                               atol=2e-5 * np.abs(r4).max())


@pytest.mark.parametrize('backend', ['hybrid', 'ell'])
def test_quad_matvec_return_t(backend):
    """quad_matvec(return_t=True) must return the raw forward
    intermediate t = X v (intercept + centering included) alongside the
    unchanged operator output — the CG solver accumulates the draw's
    linear predictor from these."""
    rng = np.random.default_rng(7)
    n, p = 41, 9
    Xd = (rng.uniform(size=(n, p)) < .4) * rng.integers(1, 3, (n, p))
    design = SparseDesignMatrix(sps.csr_matrix(Xd.astype(np.float64)),
                                center_predictor=True, add_intercept=True,
                                backend=backend, dtype=np.float32)
    v = rng.standard_normal(design.shape[1]).astype(np.float32)
    w = rng.exponential(size=n).astype(np.float32)
    out_plain = np.asarray(design.quad_matvec(v, w))
    out, t = design.quad_matvec(v, w, return_t=True)
    np.testing.assert_allclose(np.asarray(out), out_plain, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(design.dot(v)),
                               rtol=1e-5, atol=1e-5)
    if backend == 'hybrid':
        ctx = design.cg_blockorder_ctx()
        assert ctx is not None
        perm, unperm, offset_bo = ctx
        out_bo, t_bo = design.quad_matvec_blockorder(
            v[np.asarray(perm)], w, offset_bo, return_t=True)
        np.testing.assert_allclose(
            np.asarray(out_bo)[np.asarray(unperm)], out_plain,
            rtol=1e-5, atol=1e-5 * np.abs(out_plain).max())
        np.testing.assert_allclose(np.asarray(t_bo), np.asarray(t),
                                   rtol=1e-5, atol=1e-5)


def test_presolve_multirhs_f64_design():
    """x64 sessions: the multi-RHS pre-solve must serve an f64-stored
    hybrid design at f64 numerics (the Gibbs CG gate now routes every
    capable backend through it, not just fused-eligible f32 ones)."""
    from bayesbridge_tpu.design.abstract import AbstractDesignMatrix
    rng = np.random.default_rng(67)
    n = 48
    X = sps.csr_matrix(np.hstack([
        (rng.uniform(size=(n, 5)) < .4).astype(np.float64),
        rng.standard_normal((n, 3)),
    ]))
    design = SparseDesignMatrix(X, center_predictor=True,
                                add_intercept=True, backend='hybrid',
                                dtype=np.float64)
    assert design.has_presolve_reductions()
    u1 = rng.standard_normal(n)
    u2 = rng.standard_normal(n)
    w = rng.exponential(size=n)
    got = design.presolve_reductions(u1, u2, w)
    ref = AbstractDesignMatrix.presolve_reductions(design, u1, u2, w)
    for g, r in zip(got, ref):
        r = np.asarray(r)
        assert np.asarray(g).dtype == np.float64
        np.testing.assert_allclose(np.asarray(g), r, rtol=1e-12,
                                   atol=1e-12 * np.abs(r).max())
