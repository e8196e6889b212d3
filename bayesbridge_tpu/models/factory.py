"""RegressionModel factory: data preprocessing + model construction.

Reference behavior: bayesbridge/model/factory.py:10-68.
"""

from warnings import warn

import scipy.sparse as sps

from .linear import LinearModel
from .logistic import LogisticModel
from .cox import CoxModel
from ..design import DenseDesignMatrix, SparseDesignMatrix


def RegressionModel(outcome, X, family='linear',
                    add_intercept=None, center_predictor=True, dtype=None):
    """Prepare input data for BayesBridge.

    Parameters
    ----------
    outcome : array, or tuple of two arrays
        (n_success, n_trial) for 'logit' (a single array means binary);
        (event_time, censoring_time) for 'cox'.
    X : numpy array or scipy sparse matrix
    family : {'linear', 'logit', 'cox'}
    add_intercept : bool or None
        None adds an intercept except for the Cox family.
    center_predictor : bool
    dtype : optional float dtype for the device-resident design
    """
    if add_intercept is None:
        add_intercept = (family != 'cox')

    if family == 'cox':
        if add_intercept:
            add_intercept = False
            warn("Intercept is not identifiable in the Cox model and "
                 "won't be added.")
        event_time, censoring_time = outcome
        event_time, censoring_time, X = CoxModel.preprocess_data(
            event_time, censoring_time, X)

    DesignMatrix = SparseDesignMatrix if sps.issparse(X) \
        else DenseDesignMatrix
    design = DesignMatrix(
        X, add_intercept=add_intercept, center_predictor=center_predictor,
        dtype=dtype,
    )

    if family == 'linear':
        return LinearModel(outcome, design)
    if family == 'logit':
        if isinstance(outcome, tuple):
            n_success, n_trial = outcome
        else:
            n_success, n_trial = outcome, None
        return LogisticModel(n_success, n_trial, design)
    if family == 'cox':
        return CoxModel(event_time, censoring_time, design)
    raise NotImplementedError(family)
