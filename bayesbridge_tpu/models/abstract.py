"""Likelihood-model interface.

Mirrors the reference's AbstractModel contract (reference:
bayesbridge/model/abstract_model.py:4-42): log-likelihood + gradient,
Hessian matrix-vector operator, intercept MLE and outcome simulation.
Implementations are built from pure jnp functions of (beta, data) so the
Gibbs/HMC hot paths trace cleanly under jit.
"""

import abc


class AbstractModel(abc.ABC):

    @property
    def n_obs(self):
        return self.design.shape[0]

    @property
    def n_pred(self):
        return self.design.shape[1]

    @property
    def intercept_added(self):
        return self.design.intercept_added

    @abc.abstractmethod
    def compute_loglik_and_gradient(self, beta, loglik_only=False):
        """Return (loglik, grad); grad is None when loglik_only."""

    @abc.abstractmethod
    def get_hessian_matvec_operator(self, beta):
        """Return v -> Hessian(beta) @ v (a pure jittable closure)."""

    @abc.abstractmethod
    def calc_intercept_mle(self):
        """Intercept MLE assuming all other coefficients are zero."""

    @staticmethod
    @abc.abstractmethod
    def simulate_outcome(*args, **kwargs):
        ...
