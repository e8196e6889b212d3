"""Cox proportional-hazards model (Breslow partial likelihood).

Reference behavior: bayesbridge/model/cox_model.py:7-355. Observations
are pre-sorted (host-side, one-time) so that events come first in
ascending event time, followed by censored observations in descending
censoring time; each event's risk set is then the contiguous index range
[start_index_k, end_index_k].

TPU-first re-design of the risk-set algebra: every risk-set reduction is
expressed as ONE prefix sum plus gathers —

    sum(arr[s_k : e_k + 1]) = csum[e_k + 1] - csum[s_k]

with csum = [0, cumsum(arr)], instead of the reference's two-sided
cumsum splicing (cox_model.py:216-237), which assumed no mid-sequence
event-time ties. cumsum/gather map directly onto the VPU and keep the
whole likelihood, gradient, and Hessian-matvec inside jit.
"""

from warnings import warn

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from .abstract import AbstractModel


def _sum_over_start_end(arr, start_index, end_index):
    """k-th output = sum(arr[start_index[k] : end_index[k] + 1])."""
    csum = jnp.concatenate((jnp.zeros(1, arr.dtype), jnp.cumsum(arr)))
    return csum[end_index + 1] - csum[start_index]


@jax.tree_util.register_pytree_node_class
class CoxModel(AbstractModel):

    name = 'cox'

    def tree_flatten(self):
        children = (self.risk_set_start_index, self.risk_set_end_index,
                    self.n_appearance_in_risk_set, self.design)
        aux = (self.n_event, self.event_time.tobytes(),
               self.censoring_time.tobytes())
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.risk_set_start_index, obj.risk_set_end_index,
         obj.n_appearance_in_risk_set, obj.design) = children
        obj.n_event = aux[0]
        obj.event_time = np.frombuffer(aux[1], dtype=np.float64)
        obj.censoring_time = np.frombuffer(aux[2], dtype=np.float64)
        return obj

    def __init__(self, event_time, censoring_time, design):
        event_time = np.asarray(event_time, dtype=np.float64)
        censoring_time = np.asarray(censoring_time, dtype=np.float64)
        if np.any(event_time[:-1] > event_time[1:]):
            raise ValueError(
                "The observations need to be sorted in increasing order of "
                "event time (use CoxModel.preprocess_data)."
            )
        if np.any(censoring_time[:-1] < censoring_time[1:]):
            raise ValueError(
                "The observations need to be sorted in decreasing order of "
                "censoring time (use CoxModel.preprocess_data)."
            )
        n_event = int(len(event_time) - np.sum(np.isinf(event_time)))
        start_index, end_index = self._find_risk_set_index(
            event_time[:n_event], np.flip(censoring_time[n_event:])
        )
        n_appearance = self.count_risk_set_appearance(
            len(event_time), start_index, end_index
        )
        if not np.all(n_appearance >= 1):
            raise ValueError(
                "Some individuals never appear in the risk set; remove them "
                "before constructing the CoxModel."
            )

        self.n_event = n_event
        self.event_time = event_time
        self.censoring_time = censoring_time
        self.risk_set_start_index = jnp.asarray(start_index, jnp.int32)
        self.risk_set_end_index = jnp.asarray(end_index, jnp.int32)
        self.n_appearance_in_risk_set = jnp.asarray(n_appearance, jnp.int32)
        self.design = design

    # ------------------------------------------------------------------ #
    # One-time host-side preprocessing (cox_model.py:57-178)             #
    # ------------------------------------------------------------------ #

    @staticmethod
    def preprocess_data(event_time, censoring_time, X):
        event_time, censoring_time, X = \
            CoxModel._permute_observations_by_event_and_censoring_time(
                event_time, censoring_time, X)
        return CoxModel._drop_uninformative_observations(
            event_time, censoring_time, X)

    @staticmethod
    def _permute_observations_by_event_and_censoring_time(
            event_time, censoring_time, X):
        event_time = np.asarray(event_time, dtype=np.float64)
        censoring_time = np.asarray(censoring_time, dtype=np.float64)
        if not np.all(np.equal(np.isinf(event_time),
                               np.isfinite(censoring_time))):
            raise ValueError(
                "Exactly one of event or censoring time must be infinity "
                "for each observation."
            )
        is_sorted = (np.all(event_time[:-1] <= event_time[1:])
                     and np.all(censoring_time[:-1] >= censoring_time[1:]))
        if is_sorted:
            return event_time, censoring_time, X
        warn(
            "The observations and design matrix will be sorted so that "
            "event times are ascending and censoring times descending."
        )
        # Stable sorts preserve the reference's ordering of ties
        # (cox_model.py:104-112, which ranks then argsorts): events
        # (finite event time) ascending first, then censored observations
        # in descending censoring time.
        event_order = np.argsort(event_time, kind='stable')
        censoring_order = np.argsort(-censoring_time, kind='stable')
        sort_ind = np.concatenate((
            event_order[np.isfinite(event_time[event_order])],
            censoring_order[np.isfinite(censoring_time[censoring_order])],
        ))
        assert len(np.unique(sort_ind)) == len(sort_ind)
        event_time = event_time[sort_ind]
        censoring_time = censoring_time[sort_ind]
        X = X.tocsr()[sort_ind, :] if sps.issparse(X) else X[sort_ind, :]
        return event_time, censoring_time, X

    @staticmethod
    def _drop_uninformative_observations(event_time, censoring_time, X):
        # Observations censored before the first event never enter a risk
        # set (cox_model.py:124-146).
        is_uninformative = censoring_time < np.min(event_time)
        if np.any(is_uninformative):
            warn("Some observations do not contribute to the likelihood, "
                 "so they are being removed.")
            keep = np.logical_not(is_uninformative)
            event_time = event_time[keep]
            censoring_time = censoring_time[keep]
            X = X[keep, :]
        return event_time, censoring_time, X

    @staticmethod
    def _find_risk_set_index(event_time, censoring_time_ascending):
        """start/end index of each event's risk set; inputs are the finite
        event times (ascending) and finite censoring times (ascending)
        (cox_model.py:162-178)."""
        n_event = len(event_time)
        # Tied events share the risk set of the first of the ties.
        start_index = np.searchsorted(event_time, event_time, side='left')
        # Tied censoring times still count as in the risk set, so censored
        # observations strictly before t drop out (side='left').
        n_censored_before = np.searchsorted(
            censoring_time_ascending, event_time, side='left')
        end_index = n_event + len(censoring_time_ascending) - 1 \
            - n_censored_before
        return start_index.astype(np.int64), end_index.astype(np.int64)

    @staticmethod
    def count_risk_set_appearance(n_obs, start_index, end_index):
        """#risk sets containing each observation, via a difference array
        (replaces the reference's per-event loop, cox_model.py:148-160)."""
        delta = np.zeros(n_obs + 1, dtype=np.int64)
        valid = start_index <= end_index
        np.add.at(delta, start_index[valid], 1)
        np.add.at(delta, end_index[valid] + 1, -1)
        return np.cumsum(delta[:-1])

    @staticmethod
    def np_rank_by_value(arr):
        order = np.argsort(arr)
        rank = np.empty(len(arr))
        rank[order] = np.arange(len(arr))
        return rank

    # ------------------------------------------------------------------ #
    # Likelihood / gradient / Hessian (jit-traceable)                    #
    # ------------------------------------------------------------------ #

    def _compute_relative_hazard(self, beta):
        log_hazard = self.design.dot(beta)
        log_hazard = log_hazard - jnp.max(log_hazard)  # overflow guard
        rel_hazard = jnp.exp(log_hazard)
        hazard_sum = _sum_over_start_end(
            rel_hazard, self.risk_set_start_index, self.risk_set_end_index)
        return log_hazard, rel_hazard, hazard_sum

    def compute_loglik_and_gradient(self, beta, loglik_only=False):
        log_hazard, rel_hazard, hazard_sum = \
            self._compute_relative_hazard(beta)
        # Zero hazard-sum means the coefficients have diverged; the
        # reference returns -inf (cox_model.py:186-189). Keep it traceable
        # with a where-guard.
        any_zero = jnp.any(hazard_sum == 0.)
        safe_sum = jnp.where(hazard_sum == 0., 1.0, hazard_sum)
        loglik = jnp.sum(log_hazard[:self.n_event] - jnp.log(safe_sum))
        loglik = jnp.where(any_zero, -jnp.inf, loglik)
        if loglik_only:
            return loglik, None
        W = _HazardMultinomialProbMatrix(
            rel_hazard, safe_sum, self.risk_set_start_index,
            self.risk_set_end_index, self.n_appearance_in_risk_set,
        )
        v = jnp.concatenate((
            jnp.ones(self.n_event, rel_hazard.dtype),
            jnp.zeros(self.design.shape[0] - self.n_event, rel_hazard.dtype),
        )) - W.sum_over_events()
        grad = self.design.Tdot(v)
        grad = jnp.where(any_zero, jnp.full_like(grad, jnp.nan), grad)
        return loglik, grad

    def compute_hessian(self, beta):
        raise NotImplementedError()

    def get_hessian_matvec_operator(self, beta):
        _, rel_hazard, hazard_sum = self._compute_relative_hazard(beta)
        # Guard the division exactly like the gradient path above: a
        # zero hazard sum (saturated coefficients in f32) would turn the
        # Hessian matvec into inf/nan and poison the HMC curvature
        # estimate with no diagnostic.
        safe_sum = jnp.where(hazard_sum == 0., 1.0, hazard_sum)
        W = _HazardMultinomialProbMatrix(
            rel_hazard, safe_sum, self.risk_set_start_index,
            self.risk_set_end_index, self.n_appearance_in_risk_set,
        )
        row_sum = W.sum_over_events()

        def hessian_op(v):
            Xv = self.design.dot(v)
            return -self.design.Tdot(row_sum * Xv - W.Tdot(W.dot(Xv)))

        return hessian_op

    def calc_intercept_mle(self):
        raise NotImplementedError(
            "Intercept is not identifiable in the Cox model.")

    # ------------------------------------------------------------------ #
    # Simulation (cox_model.py:273-306)                                  #
    # ------------------------------------------------------------------ #

    @staticmethod
    def simulate_outcome(X, beta, censoring_frac=.9, seed=None):
        """Exponential survival under a constant baseline hazard, with
        exponential censoring calibrated to the requested censored
        fraction."""
        if seed is not None:
            np.random.seed(seed)
        log_hazard = np.asarray(X.dot(beta))
        log_hazard = log_hazard - np.max(log_hazard)
        hazard = np.exp(log_hazard)
        event_time = np.random.exponential(scale=1.0 / hazard)
        # Solve P(Z < t) = 1 - censoring_frac for the censoring scale.
        t = np.quantile(event_time, 1 - censoring_frac)
        scale = -t / np.log(censoring_frac)
        censoring_time = np.random.exponential(
            scale=scale * np.ones(len(hazard)))
        censored = event_time >= censoring_time
        censoring_time[~censored] = np.inf
        event_time[censored] = np.inf
        return event_time, censoring_time


class _HazardMultinomialProbMatrix:
    """Operator view of the n_event-by-n matrix whose k-th row holds the
    conditional event probabilities over risk set k:
    W[k, j] = rel_hazard[j] / hazard_sum[k] for j in risk set k
    (cox_model.py:308-355). All products reduce to one cumsum + gathers.
    """

    def __init__(self, rel_hazard, hazard_sum, start_index, end_index,
                 n_appearance):
        self.rel_hazard = rel_hazard
        self.hazard_sum = hazard_sum
        self.start_index = start_index
        self.end_index = end_index
        self.n_appearance = n_appearance

    def sum_over_events(self):
        """Column sums: obs j appears in risk sets of the first
        n_appearance[j] events, so its column sum is
        rel_hazard[j] * cumsum(1/hazard_sum)[n_appearance[j] - 1]."""
        normalizer_csum = jnp.cumsum(1.0 / self.hazard_sum)
        return normalizer_csum[self.n_appearance - 1] * self.rel_hazard

    def dot(self, v):
        return _sum_over_start_end(
            self.rel_hazard * v, self.start_index, self.end_index
        ) / self.hazard_sum

    def Tdot(self, v):
        partial = jnp.cumsum(v / self.hazard_sum)
        return self.rel_hazard * partial[self.n_appearance - 1]

    def compute_matrix(self):
        """Dense materialization (test oracle only)."""
        n = len(self.rel_hazard)
        cols = jnp.arange(n)[None, :]
        in_risk_set = jnp.logical_and(
            cols >= self.start_index[:, None],
            cols <= self.end_index[:, None],
        )
        return jnp.where(
            in_risk_set, self.rel_hazard[None, :] / self.hazard_sum[:, None],
            0.0,
        )
