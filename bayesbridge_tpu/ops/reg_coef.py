"""Regression-coefficient sampler facade.

Functional equivalents of the reference's
SparseRegressionCoefficientSampler (reference:
bayesbridge/reg_coef_sampler/reg_coef_sampler.py:20-429): the collapsed
Gaussian update (Cholesky | CG) used inside the Gibbs scan, and the
host-side MAP search used once for chain initialization.
"""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.optimize

from .cg import (
    sample_gaussian_cg, choose_preconditioner, choose_diag_preconditioner,
)
from .cholesky import sample_gaussian_cholesky
from .summarizer import (
    compute_prior_shrunk_scale, summarizer_update, extrapolate_coef_condmean,
    estimate_coef_precond_scale_sd,
)


def sample_gaussian_posterior(
        key, design, y_gauss, obs_prec, gscale, lscale,
        prior_sd_for_unshrunk, slab_size, summ_state, method,
        cg_maxiter=500, cg_precond_by='diag', cg_atol_multiplier=1.0):
    """One draw of coef | obs_prec, gscale, lscale for linear/logit
    (reg_coef_sampler.py:60-103). Pure: returns (coef, summ_state, info).

    `cg_atol_multiplier`: scales the reference's stopping rule
    atol = 1e-5 * sqrt(n_pred) (reg_coef_sampler.py:95-96); 1.0
    reproduces it exactly.
    """
    n_unshrunk = len(prior_sd_for_unshrunk)
    dtype = y_gauss.dtype
    prior_shrunk_scale = compute_prior_shrunk_scale(gscale, lscale, slab_size)
    prior_sd = jnp.concatenate((
        jnp.asarray(prior_sd_for_unshrunk, dtype), prior_shrunk_scale
    ))
    prior_prec_sqrt = 1.0 / prior_sd

    if method == 'cholesky':
        v = design.Tdot(obs_prec * y_gauss)
        coef = sample_gaussian_cholesky(
            key, design, obs_prec, prior_prec_sqrt, v)
        # The solve computes in the design's dtype; return the chain
        # dtype so the scan carry stays type-stable (f32 chain over an
        # f64-stored design). No-op when they match.
        return coef.astype(dtype), summ_state, {}

    if method == 'cg':
        coef_init = extrapolate_coef_condmean(
            summ_state, gscale, lscale, n_unshrunk, slab_size)
        # The b-vector noise is drawn HERE (same key split/shape/dtype
        # order as sample_gaussian_cg's internal draw) so the three
        # pre-solve design reductions — collapsed observation, noise
        # Tdot, Jacobi diagonal — can go through presolve_reductions,
        # which capable backends serve with a batched layout (one
        # multi-RHS MXU dot per stored block, or one fused sweep under
        # a 'full' policy — design/sparse._presolve_multirhs,
        # design/fusedne.fused_tdots); elsewhere the composed
        # expressions are kept bitwise-identical to the unbatched
        # layout.
        #
        # Two further pass savings when the CG operator runs composed
        # (the measured default — fused_ne_mode('quad') is None):
        # (a) the warm start's initial-residual reduction
        #     X'(w * X coef_init) rides the pre-solve multi-RHS dot as
        #     a 4th column, so the initial residual costs ONE forward
        #     pass instead of a dot+Tdot pair;
        # (b) the draw's linear predictor X coef accumulates inside the
        #     CG loop from the operator's forward intermediates, so the
        #     Gibbs step's obs-precision/log-density updates need no
        #     separate design pass (returned as info['lin_pred']).
        n_obs = design.shape[0]
        k1, k2 = jax.random.split(key)
        composed_quad = design.fused_ne_mode('quad') is None
        want_lin_pred = composed_quad
        lin_pred0 = warm_tdot = None
        if cg_precond_by == 'diag' and design.has_presolve_reductions():
            # Match the composed path's eps dtype (= its Tdot output
            # dtype) so both branches consume the key stream
            # identically.
            eps_dtype = getattr(design, 'dtype', None) or jnp.float32
            eps_obs = jax.random.normal(k1, (n_obs,), eps_dtype)
            eps_prior = jax.random.normal(
                k2, (design.shape[1],), eps_dtype)
            fold_warm = design.fused_ne_mode('presolve') is None
            if fold_warm:
                lin_pred0 = design.dot(coef_init)
                v, pert, fisher_diag, warm_tdot = \
                    design.presolve_reductions(
                        obs_prec * y_gauss, jnp.sqrt(obs_prec) * eps_obs,
                        obs_prec, obs_prec * lin_pred0)
            else:
                v, pert, fisher_diag = design.presolve_reductions(
                    obs_prec * y_gauss, jnp.sqrt(obs_prec) * eps_obs,
                    obs_prec)
            precond_scale = 1.0 / jnp.sqrt(
                prior_prec_sqrt ** 2 + fisher_diag)
        else:
            v = design.Tdot(obs_prec * y_gauss)
            eps_obs = jax.random.normal(k1, (n_obs,), v.dtype)
            eps_prior = jax.random.normal(
                k2, (design.shape[1],), v.dtype)
            pert = design.Tdot(jnp.sqrt(obs_prec) * eps_obs)
            if cg_precond_by == 'diag':
                precond_scale = choose_diag_preconditioner(
                    design, obs_prec, prior_prec_sqrt)
            else:
                coef_sd = estimate_coef_precond_scale_sd(summ_state)
                precond_scale = choose_preconditioner(
                    prior_prec_sqrt, n_unshrunk, coef_sd)
        res = sample_gaussian_cg(
            key, design, obs_prec, prior_prec_sqrt, v,
            coef_cg_init=coef_init, precond_scale=precond_scale,
            maxiter=cg_maxiter,
            atol=cg_atol_multiplier * 1e-5 * np.sqrt(design.shape[1]),
            perturbation=pert + prior_prec_sqrt * eps_prior,
            warm_tdot=warm_tdot, lin_pred0=lin_pred0,
            return_lin_pred=want_lin_pred,
        )
        if want_lin_pred:
            coef, lin_pred, info = res
            info = {**info, 'lin_pred': lin_pred}
        else:
            coef, info = res
        coef = coef.astype(dtype)  # design dtype -> chain dtype
        summ_state = summarizer_update(
            summ_state, coef, gscale, lscale, n_unshrunk, slab_size)
        return coef, summ_state, info

    raise NotImplementedError(method)


# --------------------------------------------------------------------- #
# Preconditioning shared by HMC and the MAP search                      #
# --------------------------------------------------------------------- #

def compute_preconditioning_scale(
        gscale, lscale, coef_precond_post_sd, prior_sd_for_unshrunk,
        slab_size, unshrunk_target_sd_scale=1.0):
    """Per-coordinate change of variables: shrunk coordinates by their
    conditional prior scale, unshrunk ones by a posterior-sd estimate
    (reg_coef_sampler.py:174-192). Returns (precond_scale,
    precond_prior_prec)."""
    n_unshrunk = len(prior_sd_for_unshrunk)
    dtype = lscale.dtype
    shrunk_scale = compute_prior_shrunk_scale(gscale, lscale, slab_size)
    if n_unshrunk > 0:
        unshrunk_scale = unshrunk_target_sd_scale \
            * coef_precond_post_sd[:n_unshrunk]
        precond_scale = jnp.concatenate((unshrunk_scale, shrunk_scale))
        precond_prior_prec = jnp.concatenate((
            (jnp.asarray(prior_sd_for_unshrunk, dtype)
             / unshrunk_scale) ** -2,
            jnp.ones(len(lscale), dtype),
        ))
    else:
        precond_scale = shrunk_scale
        precond_prior_prec = jnp.ones(len(lscale), dtype)
    return precond_scale, precond_prior_prec


def make_precond_logp_and_grad(model, precond_scale, precond_prior_prec,
                               obs_prec=None):
    """Log conditional posterior (up to constant) and gradient in the
    preconditioned parametrization (reg_coef_sampler.py:259-279)."""
    def f(coef_precond, loglik_only=False):
        coef = coef_precond * precond_scale
        if model.name == 'linear':
            logp, grad_coef = model.compute_loglik_and_gradient(
                coef, obs_prec, loglik_only=loglik_only)
        else:
            logp, grad_coef = model.compute_loglik_and_gradient(
                coef, loglik_only=loglik_only)
        logp = logp - 0.5 * jnp.sum(precond_prior_prec * coef_precond ** 2)
        # The model's loglik/gradient compute in the design's dtype;
        # cast back to the chain dtype so the HMC/NUTS integrator loops
        # stay type-stable (f32 chain over an f64-stored design).
        dtype = coef_precond.dtype
        logp = logp.astype(dtype)
        if loglik_only:
            return logp, None
        grad = precond_scale * grad_coef - precond_prior_prec * coef_precond
        return logp, grad.astype(dtype)
    return f


def make_precond_hessian_matvec(model, coef_location, precond_scale,
                                precond_prior_prec, obs_prec=None):
    """Negative-Hessian matvec of the preconditioned log posterior
    (reg_coef_sampler.py:242-257)."""
    if model.name == 'linear':
        loglik_hess = model.get_hessian_matvec_operator(
            coef_location, obs_prec)
    else:
        loglik_hess = model.get_hessian_matvec_operator(coef_location)

    def matvec(v):
        # Cast back to the operand dtype: the model Hessian computes in
        # the design's dtype, which would otherwise promote the power
        # iteration's while-loop carry (f32 chain over f64 design).
        return (precond_prior_prec * v
                - precond_scale * loglik_hess(precond_scale * v)
                ).astype(v.dtype)
    return matvec


# --------------------------------------------------------------------- #
# MAP search (host-side, one-time chain initialization)                 #
# --------------------------------------------------------------------- #

def search_mode(coef, lscale, gscale, obs_prec, model,
                prior_sd_for_unshrunk, slab_size, optim_maxiter=None,
                use_newton_method=False, require_trust_region=False):
    """Conditional MAP of coef | scales via scipy L-BFGS-B (or Newton-CG /
    trust-ncg) over a jitted objective (reg_coef_sampler.py:281-391).

    One-time host-side initialization: the objective/gradient evaluate on
    device under jit; scipy drives the line search. Design matvecs are
    2 per objective evaluation (one `dot` for the linear predictor, one
    `Tdot` for the gradient), which is how `n_design_matvec` is counted.
    """
    dtype = np.asarray(coef).dtype
    coef_precond_post_sd = jnp.ones(len(coef), dtype)
    precond_scale, precond_prior_prec = compute_preconditioning_scale(
        gscale, jnp.asarray(lscale, dtype), coef_precond_post_sd,
        prior_sd_for_unshrunk, slab_size,
    )
    f = make_precond_logp_and_grad(
        model, precond_scale, precond_prior_prec, obs_prec)

    value_and_grad = jax.jit(lambda x: f(jnp.asarray(x, dtype)))
    n_eval = [0]

    def objective(x):
        n_eval[0] += 1
        logp, grad = value_and_grad(x)
        return -float(logp), -np.asarray(grad, dtype=np.float64)

    hessp = None
    if use_newton_method:
        @jax.jit
        def hessp_jit(x, v):
            matvec = make_precond_hessian_matvec(
                model, precond_scale * jnp.asarray(x, dtype),
                precond_scale, precond_prior_prec, obs_prec)
            return matvec(jnp.asarray(v, dtype))

        def hessp(x, v):
            return np.asarray(hessp_jit(x, v), dtype=np.float64)

    method, options = _choose_optim_method_and_options(
        optim_maxiter, use_newton_method, require_trust_region, len(coef))

    x0 = np.asarray(coef / np.asarray(precond_scale), dtype=np.float64)
    result = scipy.optimize.minimize(
        objective, x0, method=method, jac=True, hessp=hessp, options=options)

    coef = np.asarray(precond_scale) * result.x
    info = {
        'is_success': bool(result.success),
        'method': method,
        'n_iter': int(result.nit),
        'n_logp_eval': int(result.nfev),
        'n_grad_eval': int(result.nfev),
        'n_hess_eval': int(result.get('nhev', 0)),
        'n_design_matvec': 2 * n_eval[0],
    }
    return coef, info


def _choose_optim_method_and_options(optim_maxiter, use_newton_method,
                                     require_trust_region, n_param):
    """Reference heuristics (reg_coef_sampler.py:360-391)."""
    if optim_maxiter is None:
        optim_maxiter = 15 if use_newton_method else 250
    options = {'maxiter': optim_maxiter}
    tol = 1e-6 / np.sqrt(n_param)  # in analogy with the CG tolerance
    if not use_newton_method:
        method = 'L-BFGS-B'
        options.update({'gtol': tol, 'maxcor': 200})
    elif require_trust_region:
        method = 'trust-ncg'
        init_radius = 1.96 * np.sqrt(n_param)
        options.update({
            'gtol': tol,
            'initial_trust_radius': init_radius,
            'max_trust_radius': 4.0 * init_radius,
        })
    else:
        method = 'Newton-CG'
        options['xtol'] = tol
    return method, options
