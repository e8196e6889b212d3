"""User-facing constructor that turns raw data into a likelihood model.

This is the package's data-ingestion boundary: pick the device-friendly
design-matrix storage (dense jnp block vs the sparse hybrid/ELL layouts),
apply the one-time host-side preprocessing each family needs, and hand
back the matching model object. Behavioral contract follows the
reference's factory (bayesbridge/model/factory.py:10-68): the Cox family
never gets an intercept, its observations are re-ordered by risk set up
front, and a bare outcome array under 'logit' means one Bernoulli trial
per row.
"""

from warnings import warn

import scipy.sparse as sps

from .linear import LinearModel
from .logistic import LogisticModel
from .cox import CoxModel
from ..design import DenseDesignMatrix, SparseDesignMatrix


def _build_linear(outcome, design):
    return LinearModel(outcome, design)


def _build_logit(outcome, design):
    # A tuple is (success count, trial count); anything else is a
    # binary response vector, for which the trial count is implicit.
    if isinstance(outcome, tuple):
        counts, trials = outcome
    else:
        counts, trials = outcome, None
    return LogisticModel(counts, trials, design)


_BUILDERS = {'linear': _build_linear, 'logit': _build_logit}


def RegressionModel(outcome, X, family='linear',
                    add_intercept=None, center_predictor=True, dtype=None,
                    fused=None, backend=None):
    """Package raw (outcome, X) data as a likelihood model for BayesBridge.

    Parameters
    ----------
    outcome :
        'linear' — response vector; 'logit' — (success count, trial
        count) pair, or a single binary vector; 'cox' — (event time,
        censoring time) pair.
    X : numpy array or scipy sparse matrix
        Design matrix. Sparse input selects the TPU sparse storage
        backends; dense input is stored as one device block.
    family : {'linear', 'logit', 'cox'}
    add_intercept : bool, optional
        Defaults to True for linear/logit. The Cox partial likelihood
        cannot identify an intercept, so it is always dropped there.
    center_predictor : bool
        Column-center X (implicitly — never materialized for sparse
        storage).
    dtype : optional float dtype for the device-resident design.
    fused : optional fused-kernel policy for the design
        ('auto' | 'full' | '1' | '0'; see
        ``design.fusedne.dispatch_mode``). Per-design — two models in
        one process can run different policies. Defaults to the
        ``BB_FUSED_NE`` env var.
    backend : optional sparse-storage backend override
        ('auto' | 'hybrid' | 'bitpack' | 'winell' | 'ell'); None (the
        default) lets the design's byte-budget auto-select choose.
        Ignored for dense X.
    """
    if family == 'cox':
        if add_intercept:
            warn("Intercept is not identifiable in the Cox model and "
                 "won't be added.")
        event_time, censoring_time, X = CoxModel.preprocess_data(
            outcome[0], outcome[1], X)
        design = _make_design(X, False, center_predictor, dtype, fused,
                              backend)
        return CoxModel(event_time, censoring_time, design)

    builder = _BUILDERS.get(family)
    if builder is None:
        raise NotImplementedError(family)
    design = _make_design(
        X, True if add_intercept is None else add_intercept,
        center_predictor, dtype, fused, backend)
    return builder(outcome, design)


def _make_design(X, add_intercept, center_predictor, dtype, fused=None,
                 backend=None):
    if sps.issparse(X):
        return SparseDesignMatrix(
            X, add_intercept=add_intercept,
            center_predictor=center_predictor, dtype=dtype, fused=fused,
            backend=backend if backend is not None else 'auto')
    if backend not in (None, 'auto'):
        warn("backend='{}' is a sparse-storage option; dense X stores "
             "as one device block.".format(backend))
    return DenseDesignMatrix(X, add_intercept=add_intercept,
                             center_predictor=center_predictor,
                             dtype=dtype, fused=fused)
