"""Simulated datasets shared across the test modules.

One entry point, ``simulate_data``, producing the same workload shape the
reference's suite exercises (tests/helper.py:8-41 upstream): a mostly
binary sparse design with Gaussian coefficients, and a family-specific
outcome. Cox data comes back already risk-set-sorted so tests can build
models directly.
"""

import numpy as np
import scipy.sparse as sps

from bayesbridge_tpu.models import LinearModel, LogisticModel, CoxModel
from bayesbridge_tpu.design import SparseDesignMatrix, DenseDesignMatrix
from bayesbridge_tpu.utils.simulate_data import simulate_design


def _linear_outcome(X, beta):
    return LinearModel.simulate_outcome(X, beta, noise_sd=1.), X


def _logit_outcome(X, beta):
    n = X.shape[0]
    trials = 1 + np.random.binomial(np.arange(n) + 1, .5)
    return (LogisticModel.simulate_outcome(trials, X, beta), trials), X


def _cox_outcome(X, beta):
    event, censor = CoxModel.simulate_outcome(X, beta)
    event, censor, X = CoxModel.preprocess_data(event, censor, X)
    return (event, censor), X


_OUTCOME_FNS = {
    'linear': _linear_outcome,
    'logit': _logit_outcome,
    'cox': _cox_outcome,
}


def simulate_data(model, n_obs=100, n_pred=50, seed=None,
                  return_design_mat=False):
    """Return (outcome, X, beta) for the given model family."""
    if seed is not None:
        np.random.seed(seed)
    if model not in _OUTCOME_FNS:
        raise NotImplementedError(model)

    X = simulate_design(n_obs, n_pred, binary_frac=.9)
    beta = np.random.randn(n_pred)
    outcome, X = _OUTCOME_FNS[model](X, beta)

    if return_design_mat:
        cls = SparseDesignMatrix if sps.issparse(X) else DenseDesignMatrix
        X = cls(X, add_intercept=False)
    return outcome, X, beta
