"""Fused normal-equations matvec (design/fusedne.py): the single-sweep
kernel behind SparseDesignMatrix.quad_matvec must reproduce the composed
dot-then-Tdot path (reference CG operator:
bayesbridge/reg_coef_sampler/cg_sampler.py:104-113) for every stored
tier, shape raggedness, and intercept/centering combination."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sps

from bayesbridge_tpu.design import SparseDesignMatrix
from bayesbridge_tpu.design import fusedne


def _dtype(tag):
    if tag == 'bf16':
        import ml_dtypes
        return ml_dtypes.bfloat16
    return {'int8': np.int8, 'f32': np.float32}[tag]


@pytest.mark.parametrize('tag', ['int8', 'bf16', 'f32'])
@pytest.mark.parametrize('shape', [(45, 70), (33, 150), (64, 128)])
def test_kernel_matches_dense_reference(tag, shape):
    n, pe = shape
    rng = np.random.default_rng(hash((tag, shape)) % 2 ** 31)
    X = rng.integers(-3, 4, size=(n, pe)).astype(_dtype(tag))
    v = rng.standard_normal(pe).astype(np.float32)
    c = rng.standard_normal(n).astype(np.float32)
    w = rng.exponential(size=n).astype(np.float32)
    out, u = fusedne.fused_ne_matvec(
        jnp.asarray(X), jnp.asarray(v), jnp.asarray(c), jnp.asarray(w),
        interpret=True)
    Xf = X.astype(np.float32)
    u_ref = w * (Xf @ v + c)
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out), Xf.T @ u_ref,
                               rtol=2e-4, atol=2e-3)


def test_kernel_multi_panel_accumulation(monkeypatch):
    """Shrinking the VMEM budget forces a multi-step grid, exercising
    the cross-panel accumulation of `out` and per-panel writes of `u`
    (including an undefined ragged row panel at the end)."""
    monkeypatch.setattr(fusedne, '_X_BUDGET', 32 * 1024)
    rng = np.random.default_rng(7)
    n, pe = 44, 200
    X = (rng.standard_normal((n, pe)) *
         (rng.uniform(size=(n, pe)) < 0.2)).astype(np.float32)
    v = rng.standard_normal(pe).astype(np.float32)
    c = rng.standard_normal(n).astype(np.float32)
    w = rng.exponential(size=n).astype(np.float32)
    r, grid, blocks = fusedne.plan(n, [(pe, jnp.float32)])
    assert grid >= 2 and n % r != 0 and blocks[0][2] > 0
    out, u = fusedne.fused_ne_matvec(
        jnp.asarray(X), jnp.asarray(v), jnp.asarray(c), jnp.asarray(w),
        interpret=True)
    u_ref = w * (X @ v + c)
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out), X.T @ u_ref,
                               rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize('shape', [(45, 70, 9), (64, 256, 128)])
def test_two_block_kernel_matches_dense_reference(monkeypatch, shape):
    """The two-block form (int8 exact + f32 float, shared row axis)
    must equal the dense composition, including across a multi-step
    grid with ragged row and lane tails."""
    monkeypatch.setattr(fusedne, '_X_BUDGET', 32 * 1024)
    n, pe, pf = shape
    rng = np.random.default_rng(hash(shape) % 2 ** 31)
    Xe = rng.integers(-3, 4, size=(n, pe)).astype(np.int8)
    Xf = (rng.standard_normal((n, pf)) *
          (rng.uniform(size=(n, pf)) < 0.3)).astype(np.float32)
    ve = rng.standard_normal(pe).astype(np.float32)
    vf = rng.standard_normal(pf).astype(np.float32)
    c = rng.standard_normal(n).astype(np.float32)
    w = rng.exponential(size=n).astype(np.float32)
    out_e, out_f, u = fusedne.fused_ne_matvec2(
        jnp.asarray(Xe), jnp.asarray(Xf), jnp.asarray(ve),
        jnp.asarray(vf), jnp.asarray(c), jnp.asarray(w), interpret=True)
    u_ref = w * (Xe.astype(np.float32) @ ve + Xf @ vf + c)
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=2e-5,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_e),
                               Xe.astype(np.float32).T @ u_ref,
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_f), Xf.T @ u_ref,
                               rtol=2e-4, atol=2e-3)


def _mixed_design(monkeypatch, seed=3, n=40, centered=False,
                  intercept=True, binary_only=False):
    # Pin the exact tier to int8: where the runtime supports packed s4
    # (XLA:CPU) the binary columns would get the int4 tier, which the
    # fused kernel does not serve — and every fused-vs-composed
    # comparison below would silently compare composed against itself.
    from bayesbridge_tpu.design import sparse as sparse_mod
    monkeypatch.delenv('BB_HYBRID_INT4', raising=False)
    rng = np.random.default_rng(seed)
    binary = (rng.uniform(size=(n, 6)) < .3).astype(np.float64)
    parts = [binary] if binary_only \
        else [binary, rng.standard_normal((n, 3)) * 1.3]
    X = sps.csr_matrix(np.hstack(parts))
    design = SparseDesignMatrix(X, center_predictor=centered,
                                add_intercept=intercept,
                                backend='hybrid', dtype=np.float32)
    assert str(design.X_exact.dtype) == 'int8'
    return design, X


@pytest.mark.parametrize('centered', [False, True])
@pytest.mark.parametrize('intercept', [False, True])
@pytest.mark.parametrize('binary_only', [False, True])
def test_quad_matvec_matches_composed(monkeypatch, centered, intercept,
                                      binary_only):
    design, _ = _mixed_design(monkeypatch, centered=centered,
                              intercept=intercept,
                              binary_only=binary_only)
    rng = np.random.default_rng(11)
    n, p = design.shape
    v = rng.standard_normal(p).astype(np.float32)
    w = rng.exponential(size=n).astype(np.float32)
    monkeypatch.setenv('BB_FUSED_NE', '0')
    composed = np.asarray(design.quad_matvec(v, w))
    monkeypatch.setenv('BB_FUSED_NE', '1')
    assert design.fused_ne_mode() is not None
    fused = np.asarray(design.quad_matvec(v, w))
    scale = np.abs(composed).max()
    np.testing.assert_allclose(fused, composed, rtol=2e-4,
                               atol=2e-4 * scale)


def test_quad_matvec_fused_inside_jit(monkeypatch):
    """The fused path must survive the pytree round trip (design as a
    jit argument), where eligibility flags ride in aux_data."""
    monkeypatch.setenv('BB_FUSED_NE', '1')
    design, _ = _mixed_design(monkeypatch)
    rng = np.random.default_rng(5)
    n, p = design.shape
    v = jnp.asarray(rng.standard_normal(p).astype(np.float32))
    w = jnp.asarray(rng.exponential(size=n).astype(np.float32))
    jitted = jax.jit(lambda d, v, w: d.quad_matvec(v, w))
    monkeypatch.setenv('BB_FUSED_NE', '0')
    composed = np.asarray(design.quad_matvec(v, w))
    monkeypatch.setenv('BB_FUSED_NE', '1')
    assert design.fused_ne_mode() is not None
    fused = np.asarray(jitted(design, v, w))
    np.testing.assert_allclose(fused, composed, rtol=2e-4,
                               atol=2e-4 * np.abs(composed).max())


def test_quad_matvec_sharded_1d_keeps_fused(monkeypatch):
    """On a 1-d observation mesh the fused kernels run per shard under
    shard_map with p-length partials psum-ed; quad_matvec must match
    the dense reference (uneven row count exercises the pad-and-shard
    zero rows)."""
    from bayesbridge_tpu.parallel.sharding import make_mesh, shard_design
    monkeypatch.setenv('BB_FUSED_NE', '1')
    design, X = _mixed_design(monkeypatch, n=49)
    mesh = make_mesh(min(2, len(jax.devices())))
    shard_design(design, mesh)
    assert design._hybrid_sharded and design._hybrid_shard is not None
    assert design.fused_ne_mode() is not None
    rng = np.random.default_rng(9)
    n, p = design.shape
    v = rng.standard_normal(p).astype(np.float32)
    w = rng.exponential(size=n).astype(np.float32)
    result = np.asarray(design.quad_matvec(v, w))
    dense = np.hstack([np.ones((X.shape[0], 1)), X.toarray()]) \
        .astype(np.float32)
    expect = dense.T @ (w * (dense @ v))
    np.testing.assert_allclose(result, expect, rtol=2e-4,
                               atol=2e-4 * np.abs(expect).max())


def test_sharded_1d_presolve_and_link_grad(monkeypatch):
    """The sharded fused pre-solve and link-gradient paths equal their
    unsharded composed counterparts."""
    from bayesbridge_tpu.parallel.sharding import make_mesh, shard_design
    monkeypatch.setenv('BB_FUSED_NE', '1')
    design, X = _mixed_design(monkeypatch, n=49, centered=True)
    ref_design, _ = _mixed_design(monkeypatch, n=49, centered=True)
    mesh = make_mesh(min(2, len(jax.devices())))
    shard_design(design, mesh)
    rng = np.random.default_rng(31)
    n, p = design.shape
    u1 = rng.standard_normal(n).astype(np.float32)
    u2 = rng.standard_normal(n).astype(np.float32)
    w = rng.exponential(size=n).astype(np.float32)
    got = design.presolve_reductions(u1, u2, w)
    monkeypatch.setenv('BB_FUSED_NE', '0')
    ref = ref_design.presolve_reductions(u1, u2, w)
    for g, r in zip(got, ref):
        r = np.asarray(r)
        np.testing.assert_allclose(np.asarray(g), r, rtol=2e-4,
                                   atol=2e-4 * np.abs(r).max())
    monkeypatch.setenv('BB_FUSED_NE', '1')
    beta = rng.standard_normal(p).astype(np.float32) * .3
    a = rng.integers(0, 2, size=n).astype(np.float32)
    b = np.ones(n, np.float32)
    lp1, g1 = design.fused_link_grad(beta, a, b, 'logit')
    dense = np.hstack([np.ones((n, 1)), X.toarray()]).astype(np.float32)
    dense[:, 1:] -= np.asarray(ref_design.column_offset)[None, :]
    t = dense @ beta
    u_ref = a - b / (1 + np.exp(-t))
    lp_ref = np.sum(a * t - b * np.logaddexp(0., t))
    g_ref = dense.T @ u_ref
    np.testing.assert_allclose(float(lp1), lp_ref, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), g_ref, rtol=2e-4,
                               atol=2e-4 * np.abs(g_ref).max())


@pytest.mark.parametrize('centered', [False, True])
def test_dense_quad_matvec_matches_composed(monkeypatch, centered):
    from bayesbridge_tpu.design.dense import DenseDesignMatrix
    rng = np.random.default_rng(13)
    X = rng.standard_normal((37, 11))
    design = DenseDesignMatrix(X, center_predictor=centered,
                               add_intercept=True, dtype=np.float32)
    n, p = design.shape
    v = rng.standard_normal(p).astype(np.float32)
    w = rng.exponential(size=n).astype(np.float32)
    monkeypatch.setenv('BB_FUSED_NE', '0')
    composed = np.asarray(design.quad_matvec(v, w))
    monkeypatch.setenv('BB_FUSED_NE', '1')
    assert design.fused_ne_mode() is not None
    fused = np.asarray(design.quad_matvec(v, w))
    np.testing.assert_allclose(fused, composed, rtol=2e-4,
                               atol=2e-4 * np.abs(composed).max())


@pytest.mark.parametrize('centered', [False, True])
@pytest.mark.parametrize('intercept', [False, True])
@pytest.mark.parametrize('binary_only', [False, True])
def test_presolve_reductions_match_composed(monkeypatch, centered,
                                            intercept, binary_only):
    """fused_tdots-backed presolve must reproduce (Tdot, Tdot,
    fisher_diag) including intercept/centering corrections."""
    design, _ = _mixed_design(monkeypatch, centered=centered,
                              intercept=intercept,
                              binary_only=binary_only)
    rng = np.random.default_rng(17)
    n, p = design.shape
    u1 = rng.standard_normal(n).astype(np.float32)
    u2 = rng.standard_normal(n).astype(np.float32)
    w = rng.exponential(size=n).astype(np.float32)
    monkeypatch.setenv('BB_FUSED_NE', '0')
    ref = design.presolve_reductions(u1, u2, w)
    monkeypatch.setenv('BB_FUSED_NE', '1')
    assert design.fused_ne_mode() is not None
    got = design.presolve_reductions(u1, u2, w)
    for g, r in zip(got, ref):
        r = np.asarray(r)
        np.testing.assert_allclose(np.asarray(g), r, rtol=2e-4,
                                   atol=2e-4 * np.abs(r).max())


def test_dense_presolve_reductions_match_composed(monkeypatch):
    from bayesbridge_tpu.design.dense import DenseDesignMatrix
    rng = np.random.default_rng(19)
    X = rng.standard_normal((41, 13))
    design = DenseDesignMatrix(X, center_predictor=True,
                               add_intercept=True, dtype=np.float32)
    n, p = design.shape
    u1 = rng.standard_normal(n).astype(np.float32)
    u2 = rng.standard_normal(n).astype(np.float32)
    w = rng.exponential(size=n).astype(np.float32)
    monkeypatch.setenv('BB_FUSED_NE', '0')
    ref = design.presolve_reductions(u1, u2, w)
    monkeypatch.setenv('BB_FUSED_NE', '1')
    assert design.fused_ne_mode() is not None
    got = design.presolve_reductions(u1, u2, w)
    for g, r in zip(got, ref):
        r = np.asarray(r)
        np.testing.assert_allclose(np.asarray(g), r, rtol=2e-4,
                                   atol=2e-4 * np.abs(r).max())


def test_posterior_draw_agrees_with_unfused(monkeypatch):
    """A full coefficient draw through sample_gaussian_posterior (the
    Gibbs step's facade, diag preconditioner) with the fused pre-solve
    + fused CG operator agrees with the composed path: the noise is
    drawn from the same key split, so only solver/kernel rounding
    differs."""
    from bayesbridge_tpu.ops.reg_coef import sample_gaussian_posterior
    from bayesbridge_tpu.ops.summarizer import summarizer_init
    design, _ = _mixed_design(monkeypatch, n=60)
    rng = np.random.default_rng(23)
    n, p = design.shape
    y_gauss = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    obs_prec = jnp.asarray(rng.exponential(size=n).astype(np.float32))
    gscale = jnp.asarray(0.5, jnp.float32)
    lscale = jnp.asarray(
        rng.uniform(0.5, 2.0, size=p - 1).astype(np.float32))
    summ = summarizer_init(p, jnp.float32)
    draws = {}
    for mode in ('0', '1'):
        monkeypatch.setenv('BB_FUSED_NE', mode)
        coef, _, info = sample_gaussian_posterior(
            jax.random.PRNGKey(3), design, y_gauss, obs_prec, gscale,
            lscale, np.asarray([2.0], np.float32), 2.0, summ, 'cg')
        assert bool(info['cg_converged'])
        draws[mode] = np.asarray(coef)
    np.testing.assert_allclose(draws['1'], draws['0'], rtol=5e-3,
                               atol=5e-3 * np.abs(draws['0']).max())


def test_posterior_draw_mixed_presolve_only_mode(monkeypatch):
    """The DEFAULT on-TPU dispatch policy fuses only the pre-solve
    group (fused_tdots) while the CG operator and link path run
    composed (design/fusedne.dispatch_mode 'auto'). That mixed
    combination must agree with the all-composed path; simulated here
    by forcing the interpreted kernel for kind='presolve' only."""
    from bayesbridge_tpu.design import fusedne
    from bayesbridge_tpu.ops.reg_coef import sample_gaussian_posterior
    from bayesbridge_tpu.ops.summarizer import summarizer_init
    design, _ = _mixed_design(monkeypatch, n=60)
    rng = np.random.default_rng(29)
    n, p = design.shape
    y_gauss = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    obs_prec = jnp.asarray(rng.exponential(size=n).astype(np.float32))
    gscale = jnp.asarray(0.5, jnp.float32)
    lscale = jnp.asarray(
        rng.uniform(0.5, 2.0, size=p - 1).astype(np.float32))
    summ = summarizer_init(p, jnp.float32)

    monkeypatch.setenv('BB_FUSED_NE', '0')
    ref, _, info = sample_gaussian_posterior(
        jax.random.PRNGKey(7), design, y_gauss, obs_prec, gscale,
        lscale, np.asarray([2.0], np.float32), 2.0, summ, 'cg')
    assert bool(info['cg_converged'])

    monkeypatch.setenv('BB_FUSED_NE', 'auto')
    monkeypatch.setattr(
        fusedne, 'dispatch_mode',
        lambda kind='quad', policy=None:
            True if kind == 'presolve' else None)
    assert design.fused_ne_mode('presolve') is not None
    assert design.fused_ne_mode('quad') is None
    mixed, _, info = sample_gaussian_posterior(
        jax.random.PRNGKey(7), design, y_gauss, obs_prec, gscale,
        lscale, np.asarray([2.0], np.float32), 2.0, summ, 'cg')
    assert bool(info['cg_converged'])
    ref, mixed = np.asarray(ref), np.asarray(mixed)
    np.testing.assert_allclose(mixed, ref, rtol=5e-3,
                               atol=5e-3 * np.abs(ref).max())


@pytest.mark.parametrize('family', ['logit', 'linear'])
def test_fused_loglik_gradient_matches_composed(monkeypatch, family):
    """models.compute_loglik_and_gradient through the one-sweep link
    kernel must match the composed dot-then-Tdot expressions (loglik
    AND gradient) — the HMC/NUTS leapfrog and MAP-search hot path."""
    from bayesbridge_tpu import RegressionModel
    from bayesbridge_tpu.utils.simulate_data import (
        simulate_design, simulate_outcome,
    )
    from bayesbridge_tpu.design import sparse as sparse_mod
    monkeypatch.delenv('BB_HYBRID_INT4', raising=False)
    rng = np.random.default_rng(29)
    X = simulate_design(90, 14, binary_frac=.6, seed=8)
    beta_true = np.zeros(14)
    beta_true[:4] = 1.0
    outcome = simulate_outcome(X, beta_true, family, seed=9)
    model = RegressionModel(outcome, X, family=family, dtype=np.float32)
    beta = jnp.asarray(rng.standard_normal(15).astype(np.float32) * .3)
    args = (beta,) if family == 'logit' \
        else (beta, jnp.asarray(1.7, jnp.float32))
    monkeypatch.setenv('BB_FUSED_NE', '0')
    lp0, g0 = model.compute_loglik_and_gradient(*args)
    monkeypatch.setenv('BB_FUSED_NE', '1')
    assert model.design.fused_ne_mode() is not None
    lp1, g1 = model.compute_loglik_and_gradient(*args)
    np.testing.assert_allclose(float(lp1), float(lp0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=2e-4,
                               atol=2e-4 * np.abs(np.asarray(g0)).max())


def test_fused_logit_loglik_extreme_predictor(monkeypatch):
    """The kernel's softplus is written stably (max(t,0) +
    log1p(exp(-|t|))); saturated linear predictors (|t| ~ 60) must not
    overflow to inf/NaN and must match the composed logaddexp form."""
    from bayesbridge_tpu import RegressionModel
    from bayesbridge_tpu.utils.simulate_data import (
        simulate_design, simulate_outcome,
    )
    from bayesbridge_tpu.design import sparse as sparse_mod
    monkeypatch.delenv('BB_HYBRID_INT4', raising=False)
    X = simulate_design(60, 8, binary_frac=.6, seed=12)
    beta_true = np.zeros(8)
    outcome = simulate_outcome(X, beta_true, 'logit', seed=13)
    model = RegressionModel(outcome, X, family='logit', dtype=np.float32)
    beta = jnp.asarray(np.full(9, 20.0, np.float32))  # t up to ~60+
    monkeypatch.setenv('BB_FUSED_NE', '0')
    lp0, g0 = model.compute_loglik_and_gradient(beta)
    monkeypatch.setenv('BB_FUSED_NE', '1')
    lp1, g1 = model.compute_loglik_and_gradient(beta)
    assert np.isfinite(float(lp1))
    np.testing.assert_allclose(float(lp1), float(lp0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4,
                               atol=1e-4 * np.abs(np.asarray(g0)).max())


@pytest.mark.slow
def test_hmc_chain_with_fused_gradient(monkeypatch):
    """A short HMC chain through the public API with the fused link
    kernel stays finite and tracks the composed chain's posterior
    location (same seed; trajectories diverge only by kernel
    rounding)."""
    from bayesbridge_tpu import (
        BayesBridge, RegressionModel, RegressionCoefPrior,
    )
    from bayesbridge_tpu.utils.simulate_data import (
        simulate_design, simulate_outcome,
    )
    from bayesbridge_tpu.design import sparse as sparse_mod
    monkeypatch.delenv('BB_HYBRID_INT4', raising=False)
    X = simulate_design(80, 10, binary_frac=.6, seed=10)
    beta = np.zeros(10)
    beta[:3] = 1.0
    outcome = simulate_outcome(X, beta, 'logit', seed=11)
    results = {}
    for mode in ('0', '1'):
        monkeypatch.setenv('BB_FUSED_NE', mode)
        model = RegressionModel(outcome, X, family='logit',
                                dtype=np.float32)
        bridge = BayesBridge(model, RegressionCoefPrior(
            bridge_exponent=.5, regularizing_slab_size=2.))
        samples, _ = bridge.gibbs(
            n_iter=15, n_burnin=5, seed=0, coef_sampler_type='hmc',
            init={'coef': np.zeros(11), 'global_scale': 0.1,
                  'local_scale': np.ones(10)},
            params_to_save=('coef', 'logp'))
        assert np.all(np.isfinite(np.asarray(samples['logp'])))
        results[mode] = np.asarray(samples['coef']).mean(axis=1)
    np.testing.assert_allclose(results['1'], results['0'], rtol=.5,
                               atol=.5)


@pytest.mark.slow
def test_vmapped_chains_with_fused_kernels(monkeypatch):
    """multichain vmaps the Gibbs step over chains; the fused Pallas
    kernels must batch (pallas_call gains a leading grid axis under
    vmap). Also pins that per-chain results match a single fused
    chain."""
    from bayesbridge_tpu import (
        BayesBridge, RegressionModel, RegressionCoefPrior,
    )
    from bayesbridge_tpu.multichain import gibbs_chains
    from bayesbridge_tpu.utils.simulate_data import (
        simulate_design, simulate_outcome,
    )
    from bayesbridge_tpu.design import sparse as sparse_mod
    monkeypatch.delenv('BB_HYBRID_INT4', raising=False)
    monkeypatch.setenv('BB_FUSED_NE', '1')
    X = simulate_design(100, 16, binary_frac=.7, seed=3)
    beta = np.zeros(16)
    beta[:4] = 1.0
    outcome = simulate_outcome(X, beta, 'logit', seed=4)
    model = RegressionModel(outcome, X, family='logit', dtype=np.float32)
    assert model.design.fused_ne_mode() is not None
    bridge = BayesBridge(model, RegressionCoefPrior(
        bridge_exponent=.5, regularizing_slab_size=2.))
    init = {'coef': np.zeros(17), 'global_scale': 0.1,
            'local_scale': np.ones(16)}
    samples, _ = gibbs_chains(bridge, 4, 2, seed=0, init=init,
                              coef_sampler_type='cg',
                              params_to_save=('coef', 'logp'))
    assert samples['coef'].shape[0] == 2
    assert np.all(np.isfinite(np.asarray(samples['logp'])))


def test_cg_draw_agrees_with_unfused(monkeypatch):
    """One CG Gaussian draw through ops/cg.py with the fused operator
    agrees with the composed operator to solver tolerance."""
    from bayesbridge_tpu.ops.cg import sample_gaussian_cg
    design, _ = _mixed_design(monkeypatch, n=60)
    rng = np.random.default_rng(21)
    n, p = design.shape
    obs_prec = jnp.asarray(rng.exponential(size=n).astype(np.float32))
    prior_prec_sqrt = jnp.asarray(
        rng.uniform(0.5, 2.0, size=p).astype(np.float32))
    z = jnp.asarray(rng.standard_normal(p).astype(np.float32))
    x0 = jnp.zeros(p, jnp.float32)
    precond = 1.0 / prior_prec_sqrt
    key = jax.random.PRNGKey(0)
    draws = {}
    for mode in ('0', '1'):
        monkeypatch.setenv('BB_FUSED_NE', mode)
        assert (design.fused_ne_mode() is not None) == (mode == '1')
        coef, info = sample_gaussian_cg(
            key, design, obs_prec, prior_prec_sqrt, z, x0, precond)
        assert bool(info['cg_converged'])
        draws[mode] = np.asarray(coef)
    np.testing.assert_allclose(draws['1'], draws['0'], rtol=5e-3,
                               atol=5e-3 * np.abs(draws['0']).max())


def test_int4_tier_defers_to_fused_eligibility(monkeypatch):
    """When the fused one-sweep kernels would engage (f32 design, fused
    dispatch on), the hybrid tier picker must NOT take int4 — int4
    storage disqualifies the fused path and costs more net HBM traffic
    than the 2x-denser tier saves. int4 remains a storage rescue when
    the fusable tier would blow the residency budget."""
    from bayesbridge_tpu.design import sparse as sparse_mod
    monkeypatch.setenv('BB_HYBRID_INT4', '1')
    # Report S4 capability regardless of platform, and build the S4
    # block under the CPU device (XLA:CPU executes S4; a TPU-session
    # default backend may not) — this test pins tier-pick LOGIC, not
    # hardware capability.
    monkeypatch.setattr(sparse_mod, '_int4_matmul_supported',
                        lambda device=None: True)
    monkeypatch.setenv('BB_FUSED_NE', '1')
    rng = np.random.default_rng(41)
    X = sps.csr_matrix(
        (rng.uniform(size=(50, 8)) < .4).astype(np.float64))
    with jax.default_device(jax.devices('cpu')[0]):
        design = SparseDesignMatrix(X, backend='hybrid',
                                    dtype=np.float32)
        assert str(design.X_exact.dtype) == 'int8'
        assert design.fused_ne_mode() is not None
        # Storage rescue: an int8 tier over the residency budget keeps
        # int4 even though it forfeits the fused kernels.
        monkeypatch.setattr(sparse_mod, '_HYBRID_MAX_BYTES', 10)
        design4 = SparseDesignMatrix(X, backend='hybrid',
                                     dtype=np.float32)
        assert str(design4.X_exact.dtype) == 'int4'
        assert design4.fused_ne_mode() is None
