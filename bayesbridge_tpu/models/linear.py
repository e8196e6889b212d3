"""Gaussian linear regression model.

Reference behavior: bayesbridge/model/linear_model.py:6-48.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .abstract import AbstractModel


@jax.tree_util.register_pytree_node_class
class LinearModel(AbstractModel):
    """Registered as a pytree so the (large) outcome/design arrays enter
    jitted functions as arguments rather than baked-in constants."""

    name = 'linear'

    def __init__(self, y, design):
        self.y = jnp.asarray(y)
        self.design = design

    def tree_flatten(self):
        return (self.y, self.design), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.y, obj.design = children
        return obj

    def compute_loglik_and_gradient(self, beta, obs_prec, loglik_only=False):
        if not loglik_only:
            # Loglik + score in ONE design sweep on fused-eligible
            # backends (design/fusedne.py).
            fused = self.design.fused_link_grad(
                beta, self.y,
                jnp.full(self.y.shape, obs_prec, self.y.dtype), 'linear')
            if fused is not None:
                lp, grad = fused
                return lp + 0.5 * self.y.size * jnp.log(obs_prec), grad
        resid = self.y - self.design.dot(beta)
        loglik = 0.5 * self.y.size * jnp.log(obs_prec) \
            - 0.5 * obs_prec * jnp.sum(resid ** 2)
        grad = None if loglik_only else obs_prec * self.design.Tdot(resid)
        return loglik, grad

    def loglik_from_lin_pred(self, lin_pred, obs_prec):
        """Log-likelihood from a precomputed linear predictor X beta —
        identical to ``compute_loglik_and_gradient(..., loglik_only=
        True)[0]`` without its design pass. The Gibbs step computes
        X beta once per iteration and shares it between the
        observation-precision draw and the log-density bookkeeping
        (one fewer full design read per iteration)."""
        resid = self.y - lin_pred
        return 0.5 * self.y.size * jnp.log(obs_prec) \
            - 0.5 * obs_prec * jnp.sum(resid ** 2)

    def compute_hessian(self, beta, obs_prec):
        return -obs_prec * self.design.compute_fisher_info(
            jnp.ones(self.n_obs))

    def get_hessian_matvec_operator(self, beta, obs_prec):
        # quad_matvec == Tdot(1 * dot(v)); fused backends serve it in
        # one stored-block sweep.
        ones = jnp.ones(self.n_obs, self.y.dtype)
        return lambda v: -obs_prec * self.design.quad_matvec(v, ones)

    def calc_intercept_mle(self):
        return float(jnp.mean(self.y))

    @staticmethod
    def simulate_outcome(X, beta, noise_sd, seed=None):
        """Host-side data simulation; X only needs `.dot`."""
        if seed is not None:
            np.random.seed(seed)
        return np.asarray(X.dot(beta)) \
            + noise_sd * np.random.randn(X.shape[0])
