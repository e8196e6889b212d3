"""Public per-component update methods (reference bayesbridge.py:355-511):
the building blocks reference users script custom samplers with must exist
on BayesBridge and behave like their reference counterparts."""

import math

import numpy as np
import pytest

from bayesbridge_tpu import (
    BayesBridge, RegressionModel, RegressionCoefPrior,
)
from bayesbridge_tpu.utils.simulate_data import (
    simulate_design, simulate_outcome,
)


def _bridge(family='logit', n=80, p=12, seed=0):
    X = simulate_design(n, p, binary_frac=.7, seed=seed)
    beta = np.zeros(p)
    beta[:3] = 1.0
    outcome = simulate_outcome(X, beta, family, seed=seed + 1)
    model = RegressionModel(outcome, X, family=family)
    prior = RegressionCoefPrior(bridge_exponent=.5,
                                regularizing_slab_size=2.)
    bridge = BayesBridge(model, prior)
    bridge.rg.set_seed(11)
    return bridge


@pytest.mark.parametrize('family', ['linear', 'logit', 'cox'])
def test_update_obs_precision_by_family(family):
    bridge = _bridge(family)
    coef = np.full(bridge.n_pred, .1)
    obs_prec = bridge.update_obs_precision(coef)
    if family == 'linear':
        assert np.isscalar(obs_prec) and obs_prec > 0
    elif family == 'logit':
        obs_prec = np.asarray(obs_prec)
        assert obs_prec.shape == (bridge.model.n_obs,)
        assert np.all(obs_prec > 0)
    else:
        assert obs_prec is None


def test_initialize_obs_precision_matches_moment_default():
    bridge = _bridge('linear')
    coef = np.zeros(bridge.n_pred)
    got = bridge.initialize_obs_precision({}, coef)
    y = np.asarray(bridge.model.y)
    resid = y - np.asarray(bridge.model.design.dot(coef))
    np.testing.assert_allclose(got, np.mean(resid ** 2) ** -1)
    # Explicit init takes precedence.
    assert bridge.initialize_obs_precision({'obs_prec': 3.5}, coef) == 3.5


@pytest.mark.parametrize('method', ['cg', 'cholesky'])
def test_update_regress_coef_gaussian_paths(method):
    bridge = _bridge('logit')
    coef = np.zeros(bridge.n_pred)
    obs_prec = np.full(bridge.model.n_obs, .25)
    lscale = np.ones(bridge.n_pred - 1)
    new_coef, info = bridge.update_regress_coef(
        coef, obs_prec, .1, lscale, method)
    assert new_coef.shape == (bridge.n_pred,)
    assert np.all(np.isfinite(new_coef))
    assert np.any(new_coef != coef)


def test_update_regress_coef_hmc_path():
    bridge = _bridge('cox', n=60, p=8)
    coef = np.zeros(bridge.n_pred)
    lscale = np.ones(bridge.n_pred)
    new_coef, info = bridge.update_regress_coef(
        coef, None, .1, lscale, 'hmc')
    assert new_coef.shape == (bridge.n_pred,)
    assert np.all(np.isfinite(new_coef))


def test_update_global_scale_methods():
    bridge = _bridge('logit')
    rng = np.random.default_rng(5)
    coef = rng.standard_normal(11) * .5
    alpha = .5
    # 'sample' draws a positive value.
    g1 = bridge.update_global_scale(.1, coef, alpha)
    assert g1 > 0
    # 'optimize' equals the MC-EM maximizer when above the lower bound.
    g2 = bridge.update_global_scale(.1, coef, alpha, method='optimize')
    np.testing.assert_allclose(
        g2, bridge.monte_carlo_em_global_scale(coef, alpha))
    # None passes through.
    assert bridge.update_global_scale(.37, coef, alpha, method=None) == .37
    # Empty shrinkage set returns the reference's placeholder.
    assert bridge.update_global_scale(.1, np.zeros(0), alpha) == 1.0
    # All-zero coefficients clamp to the lower bound with a warning.
    with pytest.warns(UserWarning, match='unreasonably small'):
        g3 = bridge.update_global_scale(.1, np.zeros(11), alpha)
    assert g3 > 0


def test_monte_carlo_em_matches_closed_form():
    bridge = _bridge('logit')
    coef = np.array([.5, -.25, 1.0])
    alpha = .5
    phi = len(coef) / alpha / np.sum(np.abs(coef) ** alpha)
    np.testing.assert_allclose(
        bridge.monte_carlo_em_global_scale(coef, alpha),
        phi ** -(1 / alpha))


def test_update_local_scale_shapes_and_ridge_case():
    bridge = _bridge('logit')
    rng = np.random.default_rng(7)
    coef = rng.standard_normal(11) * .3
    lscale = bridge.update_local_scale(.5, coef, .5)
    assert lscale.shape == (11,)
    assert np.all(lscale > 0) and np.all(np.isfinite(lscale))
    # bridge_exp == 2 is the deterministic ridge case.
    np.testing.assert_array_equal(
        bridge.update_local_scale(.5, coef, 2), .5 * np.ones(11))


def test_compute_posterior_logprob_matches_reference_formula():
    bridge = _bridge('linear')
    rng = np.random.default_rng(9)
    coef = rng.standard_normal(bridge.n_pred) * .2
    gscale, obs_prec, alpha = .3, 1.7, .5
    got = bridge.compute_posterior_logprob(coef, gscale, obs_prec, alpha)
    # Independent NumPy evaluation of the reference's bookkeeping
    # (bayesbridge.py:480-511).
    loglik = float(bridge.model.compute_loglik_and_gradient(
        coef, obs_prec, loglik_only=True)[0])
    loglik += -.5 * np.sum((coef / bridge.prior.slab_size) ** 2)
    n_shrunk = len(coef) - bridge.n_unshrunk
    prior_logp = -n_shrunk * math.log(gscale) \
        - np.sum(np.abs(coef[bridge.n_unshrunk:] / gscale) ** alpha)
    sd = np.asarray(bridge.prior_sd_for_unshrunk, dtype=np.float64)
    finite = np.isfinite(sd)
    prior_logp += -.5 * np.sum(
        (coef[:bridge.n_unshrunk][finite] / sd[finite]) ** 2)
    prior_logp += -np.sum(np.log(sd[finite]))
    prm = bridge.prior.param['gscale_neg_power']
    prior_logp += (prm['shape'] - 1.) * math.log(gscale) \
        - prm['rate'] * gscale
    np.testing.assert_allclose(got, loglik + prior_logp, rtol=1e-8)


def test_change_log_base():
    np.testing.assert_allclose(
        RegressionCoefPrior.change_log_base(math.log(100.)), 2.0)
    np.testing.assert_allclose(
        RegressionCoefPrior.change_log_base(3., from_=10., to=100.), 1.5)


def test_manual_gibbs_loop_via_public_components():
    """A custom sampler loop written the reference way — alternating the
    public component updates — must run and move the chain."""
    bridge = _bridge('logit')
    alpha = bridge.prior.bridge_exp
    coef = np.zeros(bridge.n_pred)
    gscale = .1
    lscale = np.ones(bridge.n_pred - 1)
    obs_prec = bridge.initialize_obs_precision({}, coef)
    logps = []
    for _ in range(5):
        coef, _ = bridge.update_regress_coef(
            coef, obs_prec, gscale, lscale, 'cg')
        obs_prec = bridge.update_obs_precision(coef)
        shrunk = coef[bridge.n_unshrunk:]
        gscale = bridge.update_global_scale(gscale, shrunk, alpha)
        lscale = bridge.update_local_scale(gscale, shrunk, alpha)
        logps.append(bridge.compute_posterior_logprob(
            coef, gscale, obs_prec, alpha))
    assert np.all(np.isfinite(logps))
    assert len(set(np.round(logps, 6))) > 1  # the chain actually moved
