"""On-the-fly posterior summarizer as a pure pytree state.

Replaces the reference's stateful summarizer objects (reference:
bayesbridge/reg_coef_sampler/reg_coef_posterior_summarizer.py:3-123) with
functional updates so the state can live in the ``lax.scan`` carry: the
running mean / second moment of the *prior-scaled* coefficients feed the
CG warm start and preconditioner, and a sign-aligned running mean of the
Lanczos principal component warm-starts the HMC stability estimate.
"""

import jax.numpy as jnp


def compute_prior_shrunk_scale(gscale, lscale, slab_size):
    """Slab-regularized prior scale, numerically stable
    (reg_coef_sampler.py:194-201)."""
    scale = gscale * lscale
    return scale / jnp.sqrt(1.0 + (scale / slab_size) ** 2)


def summarizer_init(n_coef, dtype, sd_prior_samplesize=5):
    return {
        'mean': jnp.zeros(n_coef, dtype),
        'square': jnp.ones(n_coef, dtype),
        'n_averaged': jnp.zeros((), jnp.int32),
        'sd_prior_guess': jnp.ones(n_coef, dtype),
        'sd_prior_samplesize': jnp.asarray(sd_prior_samplesize, dtype),
        'pc': jnp.zeros(n_coef, dtype),
        'pc_n_averaged': jnp.zeros((), jnp.int32),
    }


def _scale_coef(coef, gscale, lscale, n_unshrunk, slab_size):
    """Divide the shrunk block by its conditional prior scale
    (reg_coef_posterior_summarizer.py:12-16)."""
    prior_scale = compute_prior_shrunk_scale(gscale, lscale, slab_size)
    scaling = jnp.concatenate((
        jnp.ones(n_unshrunk, coef.dtype), prior_scale
    ))
    return coef / scaling, scaling


def summarizer_update(state, coef, gscale, lscale, n_unshrunk, slab_size):
    """Online mean / second-moment update of the scaled coefficients
    (reg_coef_posterior_summarizer.py:18-21, 93-103)."""
    coef_scaled, _ = _scale_coef(coef, gscale, lscale, n_unshrunk, slab_size)
    n = state['n_averaged']
    weight = 1.0 / (1.0 + n.astype(coef.dtype))
    return {
        **state,
        'mean': weight * coef_scaled + (1 - weight) * state['mean'],
        'square': weight * coef_scaled ** 2 + (1 - weight) * state['square'],
        'n_averaged': n + 1,
    }


def extrapolate_coef_condmean(state, gscale, lscale, n_unshrunk, slab_size):
    """Warm-start guess of the conditional posterior mean: scaled running
    mean mapped back through the current prior scale
    (reg_coef_posterior_summarizer.py:25-29)."""
    prior_scale = compute_prior_shrunk_scale(gscale, lscale, slab_size)
    scaling = jnp.concatenate((
        jnp.ones(n_unshrunk, state['mean'].dtype), prior_scale
    ))
    return state['mean'] * scaling


def estimate_coef_precond_scale_sd(state):
    """Shrunk estimator of the posterior sd of the scaled coefficients
    (reg_coef_posterior_summarizer.py:105-123): the sample variance is
    blended with the prior guess, weighted as if the guess were an average
    of `sd_prior_samplesize` earlier draws."""
    n = state['n_averaged'].astype(state['mean'].dtype)
    mean, sec_moment = state['mean'], state['square']
    prior_m = state['sd_prior_samplesize']

    var_est = jnp.where(
        n > 1, n / jnp.maximum(n - 1, 1) * (sec_moment - mean ** 2), 0.0
    )
    est_weight = jnp.where(n > 1, (n - 1) / (n - 1 + prior_m), 0.0)
    sd = jnp.sqrt(
        est_weight * jnp.maximum(var_est, 0.0)
        + (1 - est_weight) * state['sd_prior_guess'] ** 2
    )
    return sd


def update_precond_hessian_pc(state, pc):
    """Sign-aligned running average of the principal component
    (reg_coef_posterior_summarizer.py:43-62, 'average' method)."""
    n = state['pc_n_averaged']
    aligned = pc * jnp.where(jnp.vdot(state['pc'], pc) < 0, -1.0, 1.0)
    weight = 1.0 / (1.0 + n.astype(pc.dtype))
    new_pc = jnp.where(n == 0, pc, weight * aligned + (1 - weight) * state['pc'])
    return {**state, 'pc': new_pc, 'pc_n_averaged': n + 1}


def estimate_precond_hessian_pc(state, fallback):
    """Current principal-component estimate, or `fallback` (e.g. a random
    direction) while no update has been recorded yet
    (reg_coef_posterior_summarizer.py:64-70)."""
    return jnp.where(state['pc_n_averaged'] > 0, state['pc'], fallback)
