"""Statistical parity against an independent NumPy/SciPy implementation.

PRNG streams cannot match across backends (SURVEY.md §4), so chain-level
parity is established distributionally: posterior means/sds from the
TPU sampler must agree with the independent CPU Gibbs implementation in
baselines/reference_impl.py (same algorithm, different code and RNG)
within Monte-Carlo error.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from baselines.reference_impl import NumpyBridgeGibbs, NumpyCoxGibbs, \
    polya_gamma, tilted_stable  # noqa: E402
from bayesbridge_tpu import BayesBridge, RegressionModel, \
    RegressionCoefPrior  # noqa: E402
from bayesbridge_tpu.models import LinearModel, LogisticModel, \
    CoxModel  # noqa: E402


def _simulate(family, n=100, p=20, seed=3):
    np.random.seed(seed)
    X = np.random.randn(n, p)
    beta = np.zeros(p)
    beta[:3] = 1.0
    if family == 'linear':
        outcome = LinearModel.simulate_outcome(X, beta, 1.0)
    else:
        n_trial = np.ones(n, dtype=np.int64)
        outcome = (LogisticModel.simulate_outcome(n_trial, X, beta),
                   n_trial)
    return X, outcome


def _run_tpu_chain(X, outcome, family, method, n_iter=1500, n_burnin=500):
    model = RegressionModel(outcome, X, family,
                            center_predictor=False)
    prior = RegressionCoefPrior(bridge_exponent=.5,
                                _global_scale_parametrization='raw')
    bridge = BayesBridge(model, prior)
    samples, _ = bridge.gibbs(
        n_iter, n_burnin, seed=0, coef_sampler_type=method,
        init={'global_scale': .1})
    return samples['coef']


def _run_numpy_chain(X, outcome, family, method, n_iter=1500,
                     n_burnin=500):
    gibbs = NumpyBridgeGibbs(X, outcome, family=family, bridge_exp=.5,
                             seed=11)
    out = gibbs.run(n_iter, n_burnin, method=method)
    return out['coef']


@pytest.mark.parametrize("family,method", [
    ('linear', 'cholesky'),
    ('logit', 'cholesky'),
    ('logit', 'cg'),
    # HMC/NUTS on the linear model target the same Gaussian conditional
    # the oracle's Cholesky update samples exactly, so the posteriors
    # must coincide (reference bayesbridge.py:372-395 allows hmc there).
    ('linear', 'nuts'),
])
@pytest.mark.slow
def test_posterior_moments_match_numpy_implementation(family, method):
    X, outcome = _simulate(family)
    coef_tpu = _run_tpu_chain(X, outcome, family, method)
    oracle_method = 'cholesky' if method in ('hmc', 'nuts') else method
    coef_np = _run_numpy_chain(X, outcome, family, oracle_method)

    mean_tpu, mean_np = coef_tpu.mean(1), coef_np.mean(1)
    sd_tpu, sd_np = coef_tpu.std(1), coef_np.std(1)
    # MCMC standard error ~ sd/sqrt(ESS); allow a generous multiple.
    tol = 6.0 * (sd_tpu + sd_np + 1e-3) / np.sqrt(200.0)
    assert np.all(np.abs(mean_tpu - mean_np) < tol), (
        np.abs(mean_tpu - mean_np) / tol)
    assert np.all(np.abs(sd_tpu - sd_np) < 0.5 * (sd_tpu + sd_np) + 1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("method", ['hmc', 'nuts'])
def test_cox_posterior_matches_numpy_oracle(method):
    """The Cox chain against an INDEPENDENT partial-likelihood HMC
    sampler (VERDICT r1 gap: the Cox path was pinned only by its own
    goldens; reference pins it via cox_model.py:180-237 + R checks)."""
    import warnings
    np.random.seed(7)
    n, p = 150, 15
    X = np.random.randn(n, p)
    beta = np.zeros(p)
    beta[:3] = 1.0
    event, censor = CoxModel.simulate_outcome(X, beta, censoring_frac=.5,
                                              seed=8)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        event, censor, X_sorted = CoxModel.preprocess_data(
            event, censor, X)

    model = RegressionModel((event, censor), X_sorted, family='cox',
                            center_predictor=False)
    prior = RegressionCoefPrior(bridge_exponent=.5,
                                regularizing_slab_size=2.,
                                _global_scale_parametrization='raw')
    bridge = BayesBridge(model, prior)
    n_iter, n_burnin = 2500, 500
    samples, _ = bridge.gibbs(
        n_iter, n_burnin, seed=0, coef_sampler_type=method,
        init={'global_scale': .1})
    coef_tpu = samples['coef']

    oracle = NumpyCoxGibbs(event, censor, X_sorted, bridge_exp=.5,
                           slab_size=2., seed=11)
    coef_np = oracle.run(n_iter, n_burnin)['coef']

    mean_tpu, mean_np = coef_tpu.mean(1), coef_np.mean(1)
    sd_tpu, sd_np = coef_tpu.std(1), coef_np.std(1)
    # HMC chains autocorrelate more than exact Gaussian draws; budget
    # the MC error at a conservative ESS of ~100 per chain.
    tol = 6.0 * (sd_tpu + sd_np + 1e-3) / np.sqrt(100.0)
    assert np.all(np.abs(mean_tpu - mean_np) < tol), (
        np.abs(mean_tpu - mean_np) / tol)
    assert np.all(np.abs(sd_tpu - sd_np) < 0.5 * (sd_tpu + sd_np) + 1e-3)


def test_numpy_rng_kernels_match_moments():
    """Sanity on the baseline's own kernels so the oracle is trustworthy."""
    rng = np.random.default_rng(0)
    z = 1.3
    draws = polya_gamma(rng, np.ones(50_000, dtype=np.int64),
                        np.full(50_000, z))
    mean = np.tanh(z / 2) / (2 * z)
    assert abs(draws.mean() - mean) < 5e-3
    alpha, tilt = 0.25, 1.0
    ts = tilted_stable(rng, alpha, np.full(50_000, tilt))
    assert abs(ts.mean() - alpha * tilt ** (alpha - 1)) < 0.05
