"""The jitted Gibbs step and chain runner.

This is the TPU re-design of the reference's Python-level hot loop
(reference: bayesbridge/bayesbridge.py:210-240): one pure step function

    carry -> (carry, outputs)

implementing the exact conditional-update order — coefficients, then
observation precision, then global scale, then local scale (the order
matters: gscale | coef is drawn marginally of lscale, then
lscale | gscale, coef; bayesbridge.py:218-226) — driven by ``lax.scan``
with zero host round-trips per iteration. Burn-in and thinning are
structural: the runner scans unsaved iterations with no outputs and emits
one output pytree per retained sample, so device memory holds exactly the
retained chain.

All randomness is split from a single carried ``jax.random`` key, which
makes checkpoint/resume exact (the carry IS the checkpoint; SURVEY §5.4).
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .random.polya_gamma import sample_polya_gamma
from .random.tilted_stable import sample_tilted_stable
from .ops.reg_coef import sample_gaussian_posterior
from .ops.summarizer import summarizer_init
from .ops.stepsize import target_log10_hamiltonian_error
from .ops import hmc_update


class GibbsStepConfig:
    """Static configuration closed over by the step function."""

    def __init__(self, model, prior, options, n_unshrunk,
                 prior_sd_for_unshrunk, dtype):
        # Static metadata only: the model itself (with its large arrays)
        # is passed into the jitted chain as a pytree ARGUMENT, never
        # closed over, so device data stays out of the compiled program.
        self.model_name = model.name
        self.n_obs = model.n_obs
        self.bridge_exp = float(prior.bridge_exp)
        self.slab_size = float(prior.slab_size)
        self.gscale_prior_shape = float(prior.param['gscale_neg_power']['shape'])
        self.gscale_prior_rate = float(prior.param['gscale_neg_power']['rate'])
        self.coef_sampler_type = options.coef_sampler_type
        self.gscale_update_method = options.gscale_update
        self.curvature_est_stabilized = options.curvature_est_stabilized
        self.cg_preconditioner = getattr(options, 'cg_preconditioner',
                                         'diag')
        self.cg_atol_multiplier = float(
            getattr(options, 'cg_atol_multiplier', 1.0) or 1.0)
        self.n_unshrunk = n_unshrunk
        self.prior_sd_for_unshrunk = np.asarray(prior_sd_for_unshrunk,
                                                dtype=np.float64)
        self.dtype = dtype
        self.n_pred = model.n_pred
        self.n_shrunk = model.n_pred - n_unshrunk
        # Lower bound on the global scale: the value at which the prior
        # expected coefficient magnitude is 0.001 (bayesbridge.py:418-423).
        ave_magnitude = math.gamma(2 / self.bridge_exp) \
            / math.gamma(1 / self.bridge_exp)
        self.gscale_lower_bd = 0.001 / ave_magnitude
        # Static constant: -sum(log sd) over finite unshrunk prior sds
        # (bayesbridge.py:502-504).
        finite_sd = self.prior_sd_for_unshrunk[
            np.isfinite(self.prior_sd_for_unshrunk)]
        self.neg_log_prior_sd_sum = -float(np.sum(np.log(finite_sd))) \
            if len(finite_sd) else 0.0
        # HMC stepsize-adapter target (reg_coef_sampler.py:38-39).
        self._hmc_target_log10_error = target_log10_hamiltonian_error(0.95)
        # Host-side status hook (set per run by BayesBridge.gibbs). Lives
        # on the config — which is per-BayesBridge-instance and the jit's
        # static argument — so concurrent samplers never share printer
        # state. The debug callback reads it late (at call time), so the
        # cached trace picks up each run's manager.
        self._status = {'manager': None, 'n_iter': 0}


# --------------------------------------------------------------------- #
# Conditional updates                                                   #
# --------------------------------------------------------------------- #

def update_obs_precision(cfg, model, key, coef, lin_pred=None):
    """obs_prec | coef (bayesbridge.py:397-410). `lin_pred` optionally
    supplies a precomputed X @ coef so the step's single linear
    predictor is shared with the log-density bookkeeping (the two
    reads are one design pass instead of two)."""
    if model.name == 'linear':
        if lin_pred is None:
            lin_pred = model.design.dot(coef)
        resid = model.y - lin_pred
        rate = jnp.sum(resid ** 2) / 2.0
        gamma_draw = jax.random.gamma(
            key, model.n_obs / 2.0, dtype=cfg.dtype)
        # `rate` follows the model arrays' dtype; keep the carry in the
        # chain dtype (f32 chain over f64-stored model).
        return (gamma_draw / rate).astype(cfg.dtype)
    if model.name == 'logit':
        if lin_pred is None:
            lin_pred = model.design.dot(coef)
        # The draw computes in the design's dtype; keep the carry in the
        # chain dtype (they differ when a narrow-storage design backs a
        # float64 chain).
        return sample_polya_gamma(
            key, model.n_trial_np, lin_pred).astype(cfg.dtype)
    return jnp.zeros(0, cfg.dtype)  # cox: no observation precision


def update_global_scale(cfg, key, gscale, coef_shrunk):
    """gscale | coef via the conjugate Gamma update on
    phi = gscale^(-bridge_exp), with the MC-EM 'optimize' variant and the
    lower-bound guard (bayesbridge.py:412-456). Returns
    (gscale, clamped_flag)."""
    if cfg.n_shrunk == 0:
        return jnp.asarray(1.0, cfg.dtype), jnp.zeros((), bool)

    alpha = cfg.bridge_exp
    method = cfg.gscale_update_method
    abs_power_sum = jnp.sum(jnp.abs(coef_shrunk) ** alpha)

    if method == 'optimize':
        phi = cfg.n_shrunk / alpha / abs_power_sum
        new_gscale = phi ** (-1.0 / alpha)
    elif method == 'sample':
        shape = cfg.gscale_prior_shape + cfg.n_shrunk / alpha
        rate = cfg.gscale_prior_rate + abs_power_sum
        phi = jax.random.gamma(key, shape, dtype=cfg.dtype) / rate
        new_gscale = phi ** (-1.0 / alpha)
        all_zero = jnp.count_nonzero(coef_shrunk) == 0
        new_gscale = jnp.where(all_zero, 0.0, new_gscale)
    elif method is None:
        return gscale, jnp.zeros((), bool)
    else:
        raise ValueError(method)

    clamped = new_gscale < cfg.gscale_lower_bd
    return jnp.maximum(new_gscale, cfg.gscale_lower_bd), clamped


def update_local_scale(cfg, key, gscale, coef_shrunk):
    """lscale | gscale, coef via exponentially tilted stable draws, with
    the reference's under/overflow guards (bayesbridge.py:458-478).
    Returns (lscale, n_underflow, n_overflow)."""
    dtype = cfg.dtype
    if cfg.bridge_exp == 2:
        return (0.5 * jnp.ones(cfg.n_shrunk, dtype),
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    ts = sample_tilted_stable(
        key, cfg.bridge_exp / 2.0, (coef_shrunk / gscale) ** 2)
    lscale = jnp.sqrt(0.5 / ts)
    underflow = lscale == 0.0
    overflow = jnp.isinf(lscale)
    lscale = jnp.where(underflow, jnp.asarray(1e-15, dtype), lscale)
    lscale = jnp.where(overflow, 2.0 / gscale, lscale)
    return lscale, jnp.sum(underflow).astype(jnp.int32), \
        jnp.sum(overflow).astype(jnp.int32)


def compute_posterior_logprob(cfg, model, coef, gscale, obs_prec,
                              lin_pred=None):
    """Joint log density of (coef, gscale | rest), matching the
    reference's bookkeeping including its Gamma-prior-on-phi term written
    in terms of gscale (bayesbridge.py:480-511). `lin_pred` optionally
    supplies a precomputed X @ coef (shared with the obs-precision
    update — XLA does not CSE the two identical design products across
    the step, measured as one extra full design pass per iteration)."""
    if model.name == 'linear':
        loglik = model.loglik_from_lin_pred(lin_pred, obs_prec) \
            if lin_pred is not None else model.compute_loglik_and_gradient(
                coef, obs_prec, loglik_only=True)[0]
    elif model.name == 'logit' and lin_pred is not None:
        loglik = model.loglik_from_lin_pred(lin_pred)
    else:
        loglik, _ = model.compute_loglik_and_gradient(
            coef, loglik_only=True)
    if np.isfinite(cfg.slab_size):
        loglik = loglik - 0.5 * jnp.sum((coef / cfg.slab_size) ** 2)

    coef_shrunk = coef[cfg.n_unshrunk:]
    coef_unshrunk = coef[:cfg.n_unshrunk]
    prior_sd = jnp.asarray(cfg.prior_sd_for_unshrunk, cfg.dtype)

    prior_logp = -cfg.n_shrunk * jnp.log(gscale) \
        - jnp.sum(jnp.abs(coef_shrunk / gscale) ** cfg.bridge_exp)
    finite_sd = jnp.isfinite(prior_sd)
    prior_logp = prior_logp - 0.5 * jnp.sum(
        jnp.where(finite_sd, (coef_unshrunk
                              / jnp.where(finite_sd, prior_sd, 1.0)) ** 2,
                  0.0))
    prior_logp = prior_logp + cfg.neg_log_prior_sd_sum
    prior_logp = prior_logp \
        + (cfg.gscale_prior_shape - 1.0) * jnp.log(gscale) \
        - cfg.gscale_prior_rate * gscale
    return loglik + prior_logp


def update_regress_coef(cfg, model, key, carry):
    """coef | obs_prec, gscale, lscale (bayesbridge.py:372-395)."""
    if cfg.coef_sampler_type in ('cholesky', 'cg'):
        # The model's outcome arrays follow the session default dtype;
        # cast to the chain dtype so the carry stays type-stable when a
        # float32 chain runs inside a float64 session.
        if model.name == 'linear':
            y_gauss = model.y.astype(cfg.dtype)
            obs_prec_vec = carry['obs_prec'] \
                * jnp.ones(cfg.n_obs, cfg.dtype)
        else:  # logit: Polya-Gamma collapse to a Gaussian observation
            obs_prec_vec = carry['obs_prec']
            y_gauss = (model.n_success - model.n_trial / 2.0).astype(
                cfg.dtype) / obs_prec_vec
        coef, summ, info = sample_gaussian_posterior(
            key, model.design, y_gauss, obs_prec_vec,
            carry['gscale'], carry['lscale'],
            cfg.prior_sd_for_unshrunk.astype(cfg.dtype), cfg.slab_size,
            carry['summ'], cfg.coef_sampler_type,
            cg_precond_by=cfg.cg_preconditioner,
            cg_atol_multiplier=cfg.cg_atol_multiplier,
        )
        carry = {**carry, 'summ': summ}
        return coef, carry, info

    if cfg.coef_sampler_type in ('hmc', 'nuts'):
        return hmc_update.sample_coef_by_hmc(cfg, model, key, carry)

    raise NotImplementedError(cfg.coef_sampler_type)


# --------------------------------------------------------------------- #
# The step                                                               #
# --------------------------------------------------------------------- #

def gibbs_step(cfg, model, carry):
    key, k_coef, k_obs, k_gscale, k_lscale = jax.random.split(
        carry['key'], 5)
    carry = {**carry, 'key': key}

    coef, carry, info = update_regress_coef(cfg, model, k_coef, carry)
    # The coefficient draw computes in the DESIGN's dtype (its matvecs
    # promote); the carry must stay in the chain dtype or the scan body
    # is not type-stable when a float32 chain runs over float64-stored
    # model arrays.
    coef = coef.astype(cfg.dtype)
    if 'cg_converged' in info:
        carry = {**carry, 'n_cg_unconverged': carry['n_cg_unconverged']
                 + (~info.pop('cg_converged')).astype(jnp.int32)}
    if 'curvature_estimate_invalid' in info:
        # The reference RAISES on a non-positive curvature estimate
        # (reg_coef_sampler.py:233-239); inside jit the kernel clamps
        # and flags, and the count surfaces as an end-of-run warning
        # like the other guard rails.
        carry = {**carry, 'n_curvature_invalid':
                 carry['n_curvature_invalid']
                 + info.pop('curvature_estimate_invalid')
                 .astype(jnp.int32)}
    # ONE linear predictor per iteration, shared by the observation
    # precision draw and the log-density (the design's dot is a full
    # HBM pass of the stored blocks; XLA does not CSE the two). The CG
    # sampler accumulates it from its operator's forward intermediates
    # (info['lin_pred'], exact in exact arithmetic), in which case the
    # predictor costs no design pass at all.
    lin_pred = info.pop('lin_pred', None)
    if lin_pred is None:
        lin_pred = model.design.dot(coef) \
            if model.name in ('linear', 'logit') else None
    obs_prec = update_obs_precision(cfg, model, k_obs, coef, lin_pred)
    gscale, gscale_clamped = update_global_scale(
        cfg, k_gscale, carry['gscale'], coef[cfg.n_unshrunk:])
    lscale, n_under, n_over = update_local_scale(
        cfg, k_lscale, gscale, coef[cfg.n_unshrunk:])
    logp = compute_posterior_logprob(cfg, model, coef, gscale, obs_prec,
                                     lin_pred)

    carry = {
        **carry,
        'coef': coef, 'obs_prec': obs_prec,
        'gscale': gscale, 'lscale': lscale,
        'n_gscale_clamped':
            carry['n_gscale_clamped'] + gscale_clamped.astype(jnp.int32),
        'n_lscale_underflow': carry['n_lscale_underflow'] + n_under,
        'n_lscale_overflow': carry['n_lscale_overflow'] + n_over,
    }
    outputs = {
        'coef': coef, 'local_scale': lscale, 'global_scale': gscale,
        'obs_prec': obs_prec, 'logp': logp, **info,
    }
    return carry, outputs


def init_carry(cfg, key, coef, obs_prec, gscale, lscale, summ=None):
    dtype = cfg.dtype
    carry = {
        'key': key,
        'coef': jnp.asarray(coef, dtype),
        'obs_prec': jnp.asarray(
            obs_prec if obs_prec is not None else np.zeros(0), dtype),
        'gscale': jnp.asarray(gscale, dtype),
        'lscale': jnp.asarray(lscale, dtype),
        'summ': summ if summ is not None
        else summarizer_init(cfg.n_pred, dtype),
        'n_gscale_clamped': jnp.zeros((), jnp.int32),
        'n_lscale_underflow': jnp.zeros((), jnp.int32),
        'n_lscale_overflow': jnp.zeros((), jnp.int32),
    }
    if cfg.coef_sampler_type in ('hmc', 'nuts'):
        carry.update(hmc_update.init_hmc_carry(cfg))
    if cfg.coef_sampler_type == 'cg':
        carry['n_cg_unconverged'] = jnp.zeros((), jnp.int32)
    return carry


# --------------------------------------------------------------------- #
# The runner: burn-in + thinned emission, all inside one jit            #
# --------------------------------------------------------------------- #

@partial(jax.jit,
         static_argnames=('cfg', 'n_burnin', 'n_sample', 'thin',
                          'n_remainder', 'save_keys', 'status_interval'))
def run_chain(cfg, model, carry, n_burnin, n_sample, thin, n_remainder,
              save_keys, status_interval=0):
    """Run n_burnin + n_sample*thin + n_remainder Gibbs iterations,
    emitting one output pytree per retained sample (every `thin`-th
    post-burn-in iteration, reference semantics gibbs_util.py:164-199).

    Structure: one scan over "blocks", each block = a fori_loop of
    unsaved steps followed by one emitting step. The burn-in is folded
    into the first block and the post-save remainder into a final
    dropped block, so the (large) step graph appears exactly twice in
    the compiled program — compile time at big model sizes is dominated
    by graph size, not trip counts.

    `status_interval` > 0 prints a host-side progress line every that
    many iterations via jax.debug.callback."""
    # Iterations not covered by the save-blocks run in a final block
    # whose emission is dropped (burn-in-only calls land here too).
    tail_len = n_remainder + (n_burnin if n_sample == 0 else 0)
    has_tail = tail_len > 0
    n_blocks = n_sample + int(has_tail)
    # Unsaved steps preceding each block's emitting step.
    plain_counts = np.full(n_blocks, thin - 1, dtype=np.int32)
    if n_sample > 0:
        plain_counts[0] += n_burnin
    if has_tail:
        plain_counts[-1] = tail_len - 1
    block_ends = np.cumsum(plain_counts + 1) - 1  # iteration index of save

    def block(carry, xs):
        n_plain, end_it = xs

        def plain_body(i, c):
            c, _ = gibbs_step(cfg, model, c)
            _maybe_status(cfg, end_it - n_plain + i, status_interval)
            return c

        carry = lax.fori_loop(0, n_plain, plain_body, carry)
        carry, outputs = gibbs_step(cfg, model, carry)
        _maybe_status(cfg, end_it, status_interval)
        outputs = {k: v for k, v in outputs.items()
                   if k in save_keys or k not in
                   ('coef', 'local_scale', 'global_scale', 'obs_prec',
                    'logp')}
        return carry, outputs

    if n_blocks == 0:
        return carry, {}
    carry, outputs = lax.scan(
        block, carry,
        (jnp.asarray(plain_counts), jnp.asarray(block_ends)))
    if has_tail:  # drop the final (tail) block's emission
        outputs = jax.tree_util.tree_map(lambda x: x[:n_sample], outputs)
    return carry, outputs


def _maybe_status(cfg, it, status_interval):
    if not status_interval:
        return

    def report(iteration):
        manager = cfg._status.get('manager')
        if manager is not None:
            manager.print_status(int(iteration) + 1, cfg._status['n_iter'])

    lax.cond(
        (it + 1) % status_interval == 0,
        lambda i: jax.debug.callback(report, i),
        lambda i: None,
        it,
    )
