"""HMC/NUTS coefficient update inside the Gibbs scan.

The jit-native equivalent of the reference's `sample_by_hmc`
(reference: bayesbridge/reg_coef_sampler/reg_coef_sampler.py:105-240):

1. precondition coordinates by prior scale (shrunk) / posterior-sd
   estimate (unshrunk);
2. estimate the top curvature of the preconditioned negative Hessian to
   calibrate the stepsize at the stability limit 2/sqrt(lambda_max) —
   the reference's `eigsh(k=1, ncv=2, tol=.1)` Lanczos becomes a
   warm-started power iteration in a `lax.while_loop` with the same
   loose 10% tolerance;
3. jittered stepsize and trajectory length, HMC or NUTS transition,
   Robbins-Monro adaptation of the stability-limit multiplier.

An optional outlier clamp of the stability estimate mirrors the
reference's StabilityEstimateStabilizer (reg_coef_sampler.py:394-429),
implemented as a fixed ring buffer of the last `_STAB_BUFFER` estimates
(the reference uses the full history; the window approximation keeps the
scan carry fixed-size).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import ndtri

from . import hmc as hmc_kernel
from . import nuts as nuts_kernel
from .reg_coef import (
    compute_preconditioning_scale, make_precond_logp_and_grad,
    make_precond_hessian_matvec,
)
from .summarizer import (
    estimate_coef_precond_scale_sd, estimate_precond_hessian_pc,
    extrapolate_coef_condmean, summarizer_update,
    update_precond_hessian_pc,
)
from .stepsize import hamiltonian_adapter_init, hamiltonian_adapter_update

_STAB_BUFFER = 100  # reference n_warmup (reg_coef_sampler.py:397)
_MAX_HMC_STEP = 512  # reg_coef_sampler.py:106


def init_hmc_carry(cfg):
    dtype = cfg.dtype
    adapter_state, _ = hamiltonian_adapter_init(dtype)
    carry = {'hmc_adapter': adapter_state,
             'n_curvature_invalid': jnp.zeros((), jnp.int32)}
    if cfg.curvature_est_stabilized:
        carry['stab_buffer'] = jnp.zeros(_STAB_BUFFER, dtype)
        carry['stab_n'] = jnp.zeros((), jnp.int32)
    return carry


def power_iteration_top_eigenvalue(matvec, v0, tol=0.1, max_iter=50):
    """Largest eigenvalue of a PSD operator, warm-started at v0, with the
    reference's coarse relative tolerance (reg_coef_sampler.py:228-230).
    Returns (eigval, eigvec, n_matvec)."""
    v0 = v0 / jnp.linalg.norm(v0)

    def cond(state):
        v, eig, eig_prev, n = state
        rel_change = jnp.abs(eig - eig_prev) / jnp.maximum(eig, 1e-30)
        return jnp.logical_and(n < max_iter,
                               jnp.logical_or(n < 2, rel_change > tol))

    def body(state):
        v, eig, eig_prev, n = state
        w = matvec(v)
        new_eig = jnp.vdot(v, w)
        norm = jnp.linalg.norm(w)
        v_new = w / jnp.maximum(norm, 1e-30)
        return v_new, new_eig, eig, n + 1

    init = (v0, jnp.zeros((), v0.dtype), jnp.full((), jnp.inf, v0.dtype),
            jnp.zeros((), jnp.int32))
    v, eig, _, n = lax.while_loop(cond, body, init)
    return eig, v, n


def _stabilize_estimate(carry, estimate):
    """Clamp outlier stability estimates via empirical quantiles of the
    recent history (reg_coef_sampler.py:406-429)."""
    buffer, n = carry['stab_buffer'], carry['stab_n']
    gaussian_cdf_at_onestd = 0.8414
    active = jnp.arange(_STAB_BUFFER) < n
    # The empirical CDF is over the WINDOW, so its denominator must be
    # the window occupancy, not the lifetime count — with the lifetime
    # n the ratio decays below the one-std threshold after ~119 updates
    # and the clamp silently disables itself.
    n_f = jnp.maximum(jnp.minimum(n, _STAB_BUFFER), 1) \
        .astype(estimate.dtype)
    cdf_at_estimate = jnp.sum(
        jnp.where(active, buffer < estimate, False)) / n_f

    filled = jnp.where(active, buffer, jnp.nan)
    median = jnp.nanmedian(filled)
    at_onestd = jnp.nanquantile(filled, gaussian_cdf_at_onestd)
    one_std_dist = at_onestd - median
    dist_above = jnp.minimum(
        2.0, ndtri(jnp.clip(cdf_at_estimate, 1e-6, 1 - 1e-6)) - 1.0)
    stabilized = at_onestd + one_std_dist * dist_above

    use_raw = jnp.logical_or(
        n < _STAB_BUFFER, cdf_at_estimate <= gaussian_cdf_at_onestd)
    result = jnp.where(use_raw, estimate, stabilized)

    # Push the *pre-stabilization* estimate into the ring buffer
    # (reference updates with the raw value, reg_coef_sampler.py:122-125).
    idx = jnp.mod(n, _STAB_BUFFER)
    carry = {
        **carry,
        'stab_buffer': buffer.at[idx].set(estimate),
        'stab_n': n + 1,
    }
    return carry, result


def sample_coef_by_hmc(cfg, model, key, carry):
    """One HMC/NUTS coefficient transition; returns (coef, carry, info)."""
    dtype = cfg.dtype
    method = cfg.coef_sampler_type
    coef, gscale, lscale = carry['coef'], carry['gscale'], carry['lscale']
    summ = carry['summ']

    k_pc, k_dtjit, k_timejit, k_kernel = jax.random.split(key, 4)

    # Linear family: the coefficient conditional depends on the current
    # observation precision (reference bayesbridge.py:388-391 passes the
    # model through with obs_prec in scope; our pure factories take it
    # explicitly). Logit/Cox log-likelihoods don't use it.
    obs_prec = carry['obs_prec'] if model.name == 'linear' else None

    coef_sd = estimate_coef_precond_scale_sd(summ)
    precond_scale, precond_prior_prec = compute_preconditioning_scale(
        gscale, lscale, coef_sd,
        cfg.prior_sd_for_unshrunk.astype(dtype), cfg.slab_size)

    # --- stability limit from the top preconditioned curvature -------- #
    coef_guess = extrapolate_coef_condmean(
        summ, gscale, lscale, cfg.n_unshrunk, cfg.slab_size)
    hess_matvec = make_precond_hessian_matvec(
        model, coef_guess, precond_scale, precond_prior_prec,
        obs_prec=obs_prec)
    pc_guess = estimate_precond_hessian_pc(
        summ, jax.random.normal(k_pc, (cfg.n_pred,), dtype))
    max_curvature, pc, n_hessian_matvec = power_iteration_top_eigenvalue(
        hess_matvec, pc_guess)
    # The reference raises on a non-positive curvature
    # (reg_coef_sampler.py:233-239); inside jit we clamp and flag.
    curvature_invalid = max_curvature <= 0
    max_curvature = jnp.maximum(max_curvature, 1e-30)
    summ = update_precond_hessian_pc(summ, pc)
    stability_limit = 2.0 / jnp.sqrt(max_curvature)

    if cfg.curvature_est_stabilized:
        carry_stab, stability_limit = _stabilize_estimate(
            carry, stability_limit)
        carry = carry_stab

    adjustment = jnp.exp(carry['hmc_adapter']['log_stepsize'])
    dt = jax.random.uniform(k_dtjit, (), dtype, 0.5, 1.0) \
        * adjustment * stability_limit

    # --- transition ---------------------------------------------------- #
    q0 = coef / precond_scale
    f = make_precond_logp_and_grad(
        model, precond_scale, precond_prior_prec, obs_prec=obs_prec)

    info = {
        'stepsize': dt,
        'stability_limit_est': stability_limit,
        'stability_adjustment_factor': adjustment,
        'n_hessian_matvec': n_hessian_matvec,
        'curvature_estimate_invalid': curvature_invalid,
    }

    if method == 'hmc':
        integration_time = jnp.pi / 2.0 \
            * jax.random.uniform(k_timejit, (), dtype, 0.8, 1.0)
        n_step = jnp.minimum(
            jnp.ceil(integration_time / dt).astype(jnp.int32),
            _MAX_HMC_STEP)
        q, hmc_info = hmc_kernel.generate_next_state(
            k_kernel, f, dt, n_step, q0)
        hamiltonian_error = hmc_info['hamiltonian_error']
        info.update({
            'accepted': hmc_info['accepted'],
            'accept_prob': hmc_info['accept_prob'],
            'n_grad_evals': hmc_info['n_grad_evals'],
            'instability_detected': hmc_info['instability_detected'],
            'n_integrator_step': n_step,
        })
    else:  # nuts
        max_height = int(np.log2(_MAX_HMC_STEP))
        q, nuts_info = nuts_kernel.generate_next_state(
            k_kernel, f, dt, q0, max_height=max_height)
        hamiltonian_error = nuts_info['ave_hamiltonian_error']
        info.update({
            'ave_accept_prob': nuts_info['ave_accept_prob'],
            'n_grad_evals': nuts_info['n_grad_evals'],
            'instability_detected': nuts_info['instability_detected'],
            'tree_height': nuts_info['tree_height'],
        })

    coef_new = q * precond_scale
    summ = summarizer_update(
        summ, coef_new, gscale, lscale, cfg.n_unshrunk, cfg.slab_size)
    adapter = hamiltonian_adapter_update(
        carry['hmc_adapter'],
        {'target_log10_error': cfg._hmc_target_log10_error},
        hamiltonian_error)

    carry = {**carry, 'summ': summ, 'hmc_adapter': adapter}
    return coef_new, carry, info
