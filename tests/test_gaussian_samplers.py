"""Deterministic closed-form checks of the Gaussian coefficient samplers.

Both samplers draw from N(Sigma z, Sigma) with
Sigma^{-1} = X' diag(w) X + diag(prior_prec_sqrt)^2. Given the same PRNG
key, the draw is a deterministic function of the standard-normal inputs,
so each sampler can be compared EXACTLY against dense linear algebra —
a much sharper test than moment matching.
"""

import numpy as np
import jax
import jax.numpy as jnp

from bayesbridge_tpu.design import DenseDesignMatrix, SparseDesignMatrix
from bayesbridge_tpu.ops.cholesky import sample_gaussian_cholesky
from bayesbridge_tpu.ops.cg import sample_gaussian_cg
from bayesbridge_tpu.utils.simulate_data import simulate_design


def _setup(seed, sparse=False):
    n, p = 40, 15
    X_raw = simulate_design(n, p, binary_frac=.5 if sparse else 0.,
                            format_='sparse' if sparse else 'dense',
                            seed=seed)
    if sparse:
        design = SparseDesignMatrix(X_raw, add_intercept=True,
                                    center_predictor=True)
        X = np.hstack((np.ones((n, 1)),
                       X_raw.toarray() - X_raw.toarray().mean(0)))
    else:
        design = DenseDesignMatrix(X_raw, add_intercept=True,
                                   center_predictor=True)
        X = np.asarray(design.X)
    rng = np.random.default_rng(seed)
    w = rng.exponential(size=n) + .1
    prior_prec_sqrt = rng.exponential(size=p + 1) + .5
    z = rng.standard_normal(p + 1)
    Prec = X.T @ (w[:, None] * X) + np.diag(prior_prec_sqrt ** 2)
    Sigma = np.linalg.inv(Prec)
    return design, X, w, prior_prec_sqrt, z, Sigma


def test_cholesky_sampler_matches_dense_algebra():
    design, X, w, pps, z, Sigma = _setup(0)
    key = jax.random.key(42)
    draw = np.asarray(sample_gaussian_cholesky(
        key, design, jnp.asarray(w), jnp.asarray(pps), jnp.asarray(z)))

    # Reproduce the sampler's own noise: it solves U x = eps with U the
    # upper factor of the Jacobi-preconditioned precision.
    fisher_diag = np.einsum('i,ij->j', w, X ** 2)
    s = 1.0 / np.sqrt(pps ** 2 + fisher_diag)
    Prec_precond = s[:, None] * (X.T @ (w[:, None] * X)) * s[None, :] \
        + np.diag((s * pps) ** 2)
    L = np.linalg.cholesky(Prec_precond)
    eps = np.asarray(jax.random.normal(key, z.shape, jnp.float64))
    mean_precond = np.linalg.solve(Prec_precond, s * z)
    noise = np.linalg.solve(L.T, eps)
    expected = s * (mean_precond + noise)
    np.testing.assert_allclose(draw, expected, rtol=1e-8, atol=1e-10)
    # And the mean part solves the true system.
    np.testing.assert_allclose(s * mean_precond, Sigma @ z, rtol=1e-8)


def test_cg_sampler_matches_dense_algebra():
    design, X, w, pps, z, Sigma = _setup(1, sparse=True)
    key = jax.random.key(7)
    p1 = X.shape[1]
    precond_scale = 1.0 / pps
    draw, info = sample_gaussian_cg(
        key, design, jnp.asarray(w), jnp.asarray(pps), jnp.asarray(z),
        coef_cg_init=jnp.zeros(p1), precond_scale=jnp.asarray(precond_scale),
        maxiter=500, atol=1e-10)
    assert bool(info['cg_converged'])

    # Reproduce the perturbation with the same key-split as the sampler.
    k1, k2 = jax.random.split(key)
    eps_obs = np.asarray(jax.random.normal(k1, (X.shape[0],), jnp.float64))
    eps_prior = np.asarray(jax.random.normal(k2, (p1,), jnp.float64))
    b = z + X.T @ (np.sqrt(w) * eps_obs) + pps * eps_prior
    expected = Sigma @ b
    np.testing.assert_allclose(np.asarray(draw), expected,
                               rtol=1e-6, atol=1e-8)


def test_cg_warm_fold_and_lin_pred_match_plain_solve():
    """The warm-start fold (`warm_tdot` precomputed via the pre-solve
    multi-RHS dot) and the in-loop linear-predictor accumulation must
    reproduce the plain solve: same key -> same draw (up to solver
    rounding), and lin_pred == X @ draw."""
    design, X, w, pps, z, Sigma = _setup(4, sparse=True)
    key = jax.random.key(11)
    p1 = X.shape[1]
    rng = np.random.default_rng(5)
    coef_init = jnp.asarray(rng.standard_normal(p1) * .1)
    precond_scale = jnp.asarray(1.0 / pps)

    plain, info_plain = sample_gaussian_cg(
        key, design, jnp.asarray(w), jnp.asarray(pps), jnp.asarray(z),
        coef_cg_init=coef_init, precond_scale=precond_scale,
        maxiter=500, atol=1e-10)

    lin0 = design.dot(coef_init)
    *_, warm_tdot = design.presolve_reductions(
        jnp.asarray(w), jnp.asarray(w), jnp.asarray(w),
        jnp.asarray(w) * lin0)
    folded, lin_pred, info_folded = sample_gaussian_cg(
        key, design, jnp.asarray(w), jnp.asarray(pps), jnp.asarray(z),
        coef_cg_init=coef_init, precond_scale=precond_scale,
        maxiter=500, atol=1e-10, warm_tdot=warm_tdot, lin_pred0=lin0,
        return_lin_pred=True)
    assert bool(info_folded['cg_converged'])
    np.testing.assert_allclose(np.asarray(folded), np.asarray(plain),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(lin_pred),
                               np.asarray(design.dot(folded)),
                               rtol=1e-6, atol=1e-9)

    # Without the fold, return_lin_pred alone must also accumulate the
    # predictor of the returned draw.
    draw2, lin2, _ = sample_gaussian_cg(
        key, design, jnp.asarray(w), jnp.asarray(pps), jnp.asarray(z),
        coef_cg_init=coef_init, precond_scale=precond_scale,
        maxiter=500, atol=1e-10, return_lin_pred=True)
    np.testing.assert_allclose(np.asarray(draw2), np.asarray(plain),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(lin2),
                               np.asarray(design.dot(draw2)),
                               rtol=1e-6, atol=1e-9)


def test_cg_iteration_count_benefits_from_preconditioning():
    """The prior preconditioner should solve heavily shrunk systems in
    far fewer iterations than the unpreconditioned solver."""
    design, X, w, pps, z, Sigma = _setup(2, sparse=True)
    # Strong shrinkage on most coordinates -> ill-conditioned raw system.
    pps = np.ones_like(pps)
    pps[3:] = 1e3
    key = jax.random.key(3)
    p1 = X.shape[1]
    _, info_precond = sample_gaussian_cg(
        key, design, jnp.asarray(w), jnp.asarray(pps), jnp.asarray(z),
        coef_cg_init=jnp.zeros(p1),
        precond_scale=jnp.asarray(1.0 / pps), maxiter=500, atol=1e-8)
    _, info_plain = sample_gaussian_cg(
        key, design, jnp.asarray(w), jnp.asarray(pps), jnp.asarray(z),
        coef_cg_init=jnp.zeros(p1),
        precond_scale=jnp.ones(p1), maxiter=500, atol=1e-8)
    assert int(info_precond['n_cg_iter']) <= int(info_plain['n_cg_iter'])
