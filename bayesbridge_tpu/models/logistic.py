"""Binomial logistic regression model.

Reference behavior: bayesbridge/model/logistic_model.py:6-121. The
log-likelihood uses the numerically stable ``logaddexp`` form; the
Polya-Gamma conditional mean feeds the observation-precision
initialization (logistic_model.py:79-87).
"""

import jax
import jax.numpy as jnp
import numpy as np
from warnings import warn

from .abstract import AbstractModel
from ..utils.dtypes import default_float


@jax.tree_util.register_pytree_node_class
class LogisticModel(AbstractModel):
    """Registered as a pytree so the (large) outcome/design arrays enter
    jitted functions as arguments rather than baked-in constants."""

    name = 'logit'

    def __init__(self, n_success, n_trial, design):
        self._validate(n_success, n_trial, design)
        if n_trial is None:
            n_trial = np.ones(len(n_success))
            warn("The numbers of trials were not specified. The binary "
                 "outcome is assumed.")
        # Host copy of the trial counts: static data that parametrizes the
        # Polya-Gamma lane expansion (repeat/segment-sum) at trace time.
        self.n_trial_np = np.asarray(n_trial, dtype=np.int64)
        self.all_unit_trials = bool(np.all(self.n_trial_np == 1))
        self.n_trial = jnp.asarray(n_trial, default_float())
        self.n_success = jnp.asarray(n_success, self.n_trial.dtype)
        self.design = design

    def tree_flatten(self):
        children = (self.n_success, self.n_trial, self.design)
        aux = (self.n_trial_np.tobytes(), self.all_unit_trials)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.n_success, obj.n_trial, obj.design = children
        obj.n_trial_np = np.frombuffer(aux[0], dtype=np.int64)
        obj.all_unit_trials = aux[1]
        return obj

    @staticmethod
    def _validate(n_success, n_trial, design):
        if n_trial is None:
            if np.max(n_success) > 1:
                raise ValueError(
                    "If not binary, the number of trials must be specified.")
            if len(n_success) != design.shape[0]:
                raise ValueError(
                    "Incompatible sizes of the outcome and design matrix.")
            return
        if not (len(n_trial) == len(n_success) == design.shape[0]):
            raise ValueError(
                "Incompatible sizes of the outcome vectors and design "
                "matrix.")
        if np.any(np.asarray(n_trial) <= 0):
            raise ValueError("Number of trials must be strictly positive.")
        if np.any(np.asarray(n_success) > np.asarray(n_trial)):
            raise ValueError(
                "Number of successes cannot be larger than that of trials.")

    def compute_loglik_and_gradient(self, beta, loglik_only=False):
        if not loglik_only:
            # Loglik + score in ONE design sweep on fused-eligible
            # backends (design/fusedne.py) — every HMC/NUTS leapfrog
            # step and MAP line search calls this.
            fused = self.design.fused_link_grad(
                beta, self.n_success, self.n_trial, 'logit')
            if fused is not None:
                return fused
        logit_prob = self.design.dot(beta)
        loglik = jnp.sum(
            self.n_success * logit_prob
            - self.n_trial * jnp.logaddexp(0., logit_prob)
        )
        if loglik_only:
            return loglik, None
        predicted_prob = jax_sigmoid(logit_prob)
        grad = self.design.Tdot(
            self.n_success - self.n_trial * predicted_prob)
        return loglik, grad

    def loglik_from_lin_pred(self, lin_pred):
        """Log-likelihood from a precomputed linear predictor X beta —
        identical to ``compute_loglik_and_gradient(..., loglik_only=
        True)[0]`` without its design pass; shared with the
        Polya-Gamma update inside the Gibbs step (one fewer full
        design read per iteration)."""
        return jnp.sum(
            self.n_success * lin_pred
            - self.n_trial * jnp.logaddexp(0., lin_pred))

    def compute_hessian(self, beta):
        prob = jax_sigmoid(self.design.dot(beta))
        weight = self.n_trial * prob * (1 - prob)
        return -self.design.compute_fisher_info(weight)

    def get_hessian_matvec_operator(self, beta):
        prob = jax_sigmoid(self.design.dot(beta))
        weight = self.n_trial * prob * (1 - prob)
        # quad_matvec == Tdot(weight * dot(v)); fused backends serve it
        # in one stored-block sweep.
        return lambda v: -self.design.quad_matvec(v, weight)

    def calc_intercept_mle(self):
        p_mle = float(jnp.mean(self.n_success) / jnp.mean(self.n_trial))
        return float(np.log(p_mle / (1 - p_mle)))

    @staticmethod
    def compute_polya_gamma_mean(shape, tilt):
        """E[PG(shape, tilt)] = shape * tanh(tilt/2) / (2 tilt), with the
        small-tilt limit shape/4 (logistic_model.py:79-87)."""
        min_magnitude = 1e-5
        shape = jnp.asarray(shape, jnp.result_type(float))
        tilt = jnp.asarray(tilt)
        safe_tilt = jnp.where(jnp.abs(tilt) > min_magnitude, tilt, 1.0)
        mean = 0.5 * shape * jnp.tanh(safe_tilt / 2.0) / safe_tilt
        return jnp.where(jnp.abs(tilt) > min_magnitude, mean, shape / 4.0)

    @staticmethod
    def convert_to_probability_scale(logit_prob, truncate=False):
        if truncate:
            # Guarantees 0 < prob < 1 in double precision
            # (logistic_model.py:95-103).
            logit_prob = jnp.clip(logit_prob, -709.0, 36.7)
        return 1.0 / (1.0 + jnp.exp(-logit_prob))

    @staticmethod
    def compute_predicted_prob(X, beta, truncate=False):
        return LogisticModel.convert_to_probability_scale(
            jnp.asarray(X.dot(beta)), truncate)

    @staticmethod
    def simulate_outcome(n_trial, X, beta, seed=None):
        """Host-side data simulation; X only needs `.dot`."""
        prob = np.asarray(LogisticModel.compute_predicted_prob(X, beta))
        if seed is not None:
            np.random.seed(seed)
        return np.random.binomial(np.asarray(n_trial).astype(np.int64), prob)


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))
