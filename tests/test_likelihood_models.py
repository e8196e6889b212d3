"""Likelihood-model tests: analytic derivatives vs finite differences,
and exact small-case checks of the Cox risk-set machinery
(reference: tests/test_likelihood_models.py:12-124)."""

from functools import partial

import numpy as np
import jax.numpy as jnp

from .derivative_tester import (
    numerical_grad_is_close, numerical_direc_deriv_is_close,
)
from .helper import simulate_data
from bayesbridge_tpu.models import LinearModel, LogisticModel, CoxModel
from bayesbridge_tpu.models.cox import (
    _HazardMultinomialProbMatrix, _sum_over_start_end,
)


def test_linear_model_gradient_and_hessian():
    y, X, beta = simulate_data(model='linear', seed=0, return_design_mat=True)
    model = LinearModel(y, X)
    f = partial(model.compute_loglik_and_gradient, obs_prec=1.)
    hess = model.get_hessian_matvec_operator(beta, 1.)
    assert numerical_grad_is_close(f, beta)
    assert numerical_direc_deriv_is_close(f, beta, hess, seed=0)


def test_logistic_model_gradient_and_hessian():
    y, X, beta = simulate_data(model='logit', seed=0, return_design_mat=True)
    n_success, n_trial = y
    model = LogisticModel(n_success, n_trial, X)
    f = model.compute_loglik_and_gradient
    hess = model.get_hessian_matvec_operator(beta)
    assert numerical_grad_is_close(f, beta)
    assert numerical_direc_deriv_is_close(f, beta, hess, seed=0)


def test_loglik_from_lin_pred_matches_loglik_only():
    """The Gibbs step computes X beta once and feeds it to both the
    obs-precision update and the log-density; loglik_from_lin_pred must
    equal the loglik_only path bit-for-bit (same expression, same
    operand)."""
    y, X, beta = simulate_data(model='linear', seed=3,
                               return_design_mat=True)
    model = LinearModel(y, X)
    lin_pred = model.design.dot(jnp.asarray(beta))
    ref, _ = model.compute_loglik_and_gradient(beta, 0.7, loglik_only=True)
    assert float(model.loglik_from_lin_pred(lin_pred, 0.7)) == float(ref)

    y, X, beta = simulate_data(model='logit', seed=3,
                               return_design_mat=True)
    model = LogisticModel(y[0], y[1], X)
    lin_pred = model.design.dot(jnp.asarray(beta))
    ref, _ = model.compute_loglik_and_gradient(beta, loglik_only=True)
    assert float(model.loglik_from_lin_pred(lin_pred)) == float(ref)


def set_up_cox_model(seed=0):
    y, X, beta = simulate_data(model='cox', seed=seed, return_design_mat=True)
    event_time, censoring_time = y
    return CoxModel(event_time, censoring_time, X), beta


def test_cox_observation_reordering_and_risk_set_counting():
    event_time = np.array([1, 5, np.inf, 2.5, 2.5, np.inf, 2])
    censoring_time = np.array([np.inf, np.inf, 3, np.inf, np.inf, 2, np.inf])
    X = np.arange(len(event_time))[:, np.newaxis]
    event_time, censoring_time, X = \
        CoxModel._permute_observations_by_event_and_censoring_time(
            event_time, censoring_time, X)
    assert np.all(event_time == np.array([1, 2, 2.5, 2.5, 5, np.inf, np.inf]))
    assert np.all(censoring_time
                  == np.array([np.inf] * 5 + [3, 2]))
    assert np.all(X == np.array([0, 6, 3, 4, 1, 2, 5])[:, np.newaxis])

    model = CoxModel(event_time, censoring_time, X)
    assert np.all(np.asarray(model.risk_set_start_index)
                  == np.array([0, 1, 2, 2, 4]))
    n_censored_before_event = np.array([0, 0, 1, 1, 2])
    assert np.all(np.asarray(model.risk_set_end_index)
                  == len(event_time) - 1 - n_censored_before_event)
    # Tied events both count as in each other's risk set.
    assert np.all(np.asarray(model.n_appearance_in_risk_set)
                  == np.array([1, 2, 4, 4, 5, 4, 2]))


def test_cox_drop_uninformative():
    event_time = np.array([2, 4, np.inf, np.inf])
    censoring_time = np.array([np.inf, np.inf, 3, 1])
    X = np.arange(4)[:, np.newaxis]
    event_time, censoring_time, X = \
        CoxModel._drop_uninformative_observations(
            event_time, censoring_time, X)
    assert np.all(event_time == np.array([2, 4, np.inf]))
    assert np.all(censoring_time == np.array([np.inf, np.inf, 3]))
    assert np.all(X == np.arange(3)[:, np.newaxis])


def test_cox_sum_over_risk_set():
    arr = jnp.array([1., 3., 2.])
    out = _sum_over_start_end(
        arr, jnp.array([0, 1]), jnp.array([2, 1]))
    assert np.all(np.asarray(out) == np.array([6., 3.]))


def test_cox_sum_over_risk_set_with_mid_sequence_ties():
    """The reference's two-sided cumsum trick silently assumed no
    mid-sequence ties; the prefix-sum formulation must handle them."""
    arr = jnp.array([1., 2., 4., 8., 16.])
    start = jnp.array([0, 1, 1, 3])  # tied events 1 & 2
    end = jnp.array([4, 4, 4, 4])
    out = np.asarray(_sum_over_start_end(arr, start, end))
    assert np.all(out == np.array([31., 30., 30., 24.]))


def test_cox_sum_over_events_matches_dense_matrix():
    model, beta = set_up_cox_model()
    _, rel_hazard, hazard_sum = model._compute_relative_hazard(beta)
    W = _HazardMultinomialProbMatrix(
        rel_hazard, hazard_sum, model.risk_set_start_index,
        model.risk_set_end_index, model.n_appearance_in_risk_set)
    np.testing.assert_allclose(
        np.asarray(W.sum_over_events()),
        np.asarray(W.compute_matrix()).sum(0),
        rtol=1e-10,
    )


def test_cox_matrix_products_match_dense():
    model, beta = set_up_cox_model()
    _, rel_hazard, hazard_sum = model._compute_relative_hazard(beta)
    W = _HazardMultinomialProbMatrix(
        rel_hazard, hazard_sum, model.risk_set_start_index,
        model.risk_set_end_index, model.n_appearance_in_risk_set)
    dense = np.asarray(W.compute_matrix())
    rng = np.random.default_rng(0)
    v_col = rng.standard_normal(dense.shape[1])
    v_row = rng.standard_normal(dense.shape[0])
    np.testing.assert_allclose(np.asarray(W.dot(v_col)), dense @ v_col,
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(W.Tdot(v_row)), dense.T @ v_row,
                               rtol=1e-8)


def test_cox_gradient():
    model, beta = set_up_cox_model()
    assert numerical_grad_is_close(model.compute_loglik_and_gradient, beta)


def test_cox_hessian_matvec():
    model, beta = set_up_cox_model()
    hess = model.get_hessian_matvec_operator(beta)
    assert numerical_direc_deriv_is_close(
        model.compute_loglik_and_gradient, beta, hess, seed=0)
