"""Direct (Cholesky) Gaussian coefficient sampler.

Samples from N(Sigma z, Sigma) with
Sigma^{-1} = X' diag(obs_prec) X + diag(prior_prec_sqrt)^2
(reference: bayesbridge/reg_coef_sampler/direct_gaussian_sampler.py:4-44).

TPU mapping: the weighted Gram matrix X'WX is one MXU matmul (via the
design's `compute_fisher_info`), followed by a Jacobi rescaling for
conditioning and `jnp.linalg.cholesky`. We use the standard lower-
triangular factorization semantics; the reference accidentally passed its
scale vector as scipy's `lower` flag (direct_gaussian_sampler.py:22) and
relied on scipy treating it as truthy — we implement the intended math.
"""

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve, solve_triangular


def sample_gaussian_cholesky(key, design, obs_prec, prior_prec_sqrt, z):
    """One draw from the conditional Gaussian posterior of the
    coefficients. Returns the sample in the original parametrization."""
    fisher_diag = design.compute_fisher_info(obs_prec, diag_only=True)
    jacobi_scale = 1.0 / jnp.sqrt(prior_prec_sqrt ** 2 + fisher_diag)

    fisher = design.compute_fisher_info(obs_prec)
    prec_precond = jacobi_scale[:, None] * fisher * jacobi_scale[None, :]
    prec_precond = prec_precond + jnp.diag(
        (jacobi_scale * prior_prec_sqrt) ** 2)

    chol_lower = jnp.linalg.cholesky(prec_precond)
    mean_precond = cho_solve((chol_lower, True), jacobi_scale * z)
    noise = solve_triangular(
        chol_lower.T, jax.random.normal(key, z.shape, z.dtype), lower=False)
    return jacobi_scale * (mean_precond + noise)
