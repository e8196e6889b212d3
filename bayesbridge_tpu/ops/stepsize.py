"""Stepsize adaptation for HMC/NUTS.

Functional re-design of the reference's adapters (reference:
bayesbridge/reg_coef_sampler/hamiltonian_monte_carlo/stepsize_adapter.py:
6-326) so the adapter state can live in the Gibbs scan carry:

* :func:`hamiltonian_adapter_*` — Robbins-Monro adaptation targeting a
  Hamiltonian-error magnitude matched to the desired acceptance rate
  (the theory: under the high-dimensional limit the Hamiltonian error is
  N(-delta/2, delta) with acceptance 2*Phi(-sqrt(delta)/2); solve for
  delta and target sqrt(delta^2/4 + delta); stepsize_adapter.py:39-56).
* :class:`RobbinsMonroStepsizeAdapter`, :class:`DualAverageStepsizeAdapter`
  — host-side accept-rate based adapters for the standalone HMC/NUTS
  drivers (API parity with the reference; not used inside the scan).
"""

import math

import jax.numpy as jnp
import numpy as np
from scipy.stats import norm


def target_log10_hamiltonian_error(target_accept_prob):
    """stepsize_adapter.py:39-56."""
    if not 0 < target_accept_prob < 1:
        raise ValueError("Target probability must be within (0, 1).")
    delta = 4 * norm.ppf(target_accept_prob / 2) ** 2
    return 0.5 * math.log10(delta + delta ** 2 / 4)


def robbins_monro_stepsize(n_iter, init=1.0, decay_exponent=1.0,
                           reference_iteration=500,
                           adaptsize_at_reference=.05):
    """Decaying adaptation-size sequence, parametrized so it reaches
    `adaptsize_at_reference` after `reference_iteration` steps
    (stepsize_adapter.py:148-183). Works on traced n_iter."""
    decay_scale = reference_iteration / (
        (init / adaptsize_at_reference) ** (1 / decay_exponent) - 1)
    return init / (1 + n_iter / decay_scale) ** decay_exponent


def hamiltonian_adapter_init(dtype, init_stepsize=.3,
                             target_accept_prob=.95):
    """State + static params for the in-scan adapter
    (reg_coef_sampler.py:38-39 uses init_stepsize=.3, target=.95)."""
    log_init = math.log(init_stepsize)
    state = {
        'log_stepsize': jnp.asarray(log_init, dtype),
        'log_stepsize_averaged': jnp.asarray(log_init, dtype),
        'n_averaged': jnp.zeros((), jnp.int32),
    }
    params = {
        'target_log10_error': target_log10_hamiltonian_error(
            target_accept_prob),
    }
    return state, params


def _piecewise_adaptsize(log10_error, target, upper_bound=1.0):
    """'piecewise' transform (stepsize_adapter.py:104-119): shrink fast
    (log2 scale) when the error exceeds target, grow slowly (log1000
    scale) otherwise."""
    diff = target - log10_error
    adapt = jnp.where(diff < 0, diff / .301, diff / 3.0)
    return jnp.clip(adapt, -upper_bound, upper_bound)


def hamiltonian_adapter_update(state, params, hamiltonian_error):
    """One Robbins-Monro update from the observed Hamiltonian error
    (stepsize_adapter.py:70-83)."""
    dtype = state['log_stepsize'].dtype
    n = state['n_averaged']
    rm_stepsize = robbins_monro_stepsize(n.astype(dtype))
    log10_error = jnp.where(
        hamiltonian_error == 0.0, -jnp.inf,
        jnp.log10(jnp.abs(hamiltonian_error)))
    adaptsize = _piecewise_adaptsize(
        log10_error, params['target_log10_error'])
    log_stepsize = state['log_stepsize'] + rm_stepsize * adaptsize
    n_new = n + 1
    weight = 1.0 / n_new.astype(dtype)
    log_avg = weight * log_stepsize \
        + (1 - weight) * state['log_stepsize_averaged']
    return {
        'log_stepsize': log_stepsize,
        'log_stepsize_averaged': log_avg,
        'n_averaged': n_new,
    }


def adapter_stepsize(state, averaged=False):
    return jnp.exp(state['log_stepsize_averaged'] if averaged
                   else state['log_stepsize'])


# --------------------------------------------------------------------- #
# Host-side adapters for the standalone drivers                         #
# --------------------------------------------------------------------- #

class HamiltonianBasedStepsizeAdapter:
    """Host-side object wrapper over the functional adapter (API parity
    with stepsize_adapter.py:6-120)."""

    def __init__(self, init_stepsize, target_accept_prob=.9,
                 init_adaptsize=1., adapt_decay_exponent=1.,
                 reference_iteration=500, adaptsize_at_reference=.05):
        if init_stepsize <= 0:
            raise ValueError("The initial stepsize must be positive.")
        self._rm_kwargs = dict(
            init=init_adaptsize, decay_exponent=adapt_decay_exponent,
            reference_iteration=reference_iteration,
            adaptsize_at_reference=adaptsize_at_reference)
        self.target_log10_error = target_log10_hamiltonian_error(
            target_accept_prob)
        self.log_stepsize = math.log(init_stepsize)
        self.log_stepsize_averaged = self.log_stepsize
        self.n_averaged = 0

    def get_current_stepsize(self, averaged=False):
        return math.exp(self.log_stepsize_averaged if averaged
                        else self.log_stepsize)

    def reinitialize(self, init_stepsize):
        self.log_stepsize = math.log(init_stepsize)
        self.log_stepsize_averaged = self.log_stepsize
        self.n_averaged = 0

    def adapt_stepsize(self, hamiltonian_error):
        rm = robbins_monro_stepsize(self.n_averaged, **self._rm_kwargs)
        self.n_averaged += 1
        log10_error = -np.inf if hamiltonian_error == 0 \
            else math.log10(abs(hamiltonian_error))
        adapt = float(_piecewise_adaptsize(
            jnp.asarray(log10_error), self.target_log10_error))
        self.log_stepsize += rm * adapt
        weight = 1 / self.n_averaged
        self.log_stepsize_averaged = (
            weight * self.log_stepsize
            + (1 - weight) * self.log_stepsize_averaged)
        return math.exp(self.log_stepsize)

    # functional-state bridge (for checkpoint/resume)
    def get_state(self):
        return {
            'log_stepsize': self.log_stepsize,
            'log_stepsize_averaged': self.log_stepsize_averaged,
            'n_averaged': self.n_averaged,
        }

    def set_state(self, state):
        self.log_stepsize = float(state['log_stepsize'])
        self.log_stepsize_averaged = float(state['log_stepsize_averaged'])
        self.n_averaged = int(state['n_averaged'])


class RobbinsMonroStepsizeAdapter:
    """Accept-rate targeting Robbins-Monro adapter
    (stepsize_adapter.py:186-272)."""

    def __init__(self, init_stepsize, target_accept_prob=.9,
                 init_adaptsize=1., adapt_decay_exponent=1.,
                 reference_iteration=100, adaptsize_at_reference=.05):
        if init_stepsize <= 0:
            raise ValueError("The initial stepsize must be positive.")
        self._rm_kwargs = dict(
            init=init_adaptsize, decay_exponent=adapt_decay_exponent,
            reference_iteration=reference_iteration,
            adaptsize_at_reference=adaptsize_at_reference)
        self.target_accept_prob = target_accept_prob
        self.log_stepsize = math.log(init_stepsize)
        self.log_stepsize_averaged = self.log_stepsize
        self.n_averaged = 0

    def get_current_stepsize(self, averaged=False):
        return math.exp(self.log_stepsize_averaged if averaged
                        else self.log_stepsize)

    def adapt_stepsize(self, accept_prob, trans_type='linear'):
        rm = robbins_monro_stepsize(self.n_averaged, **self._rm_kwargs)
        self.n_averaged += 1
        adapt = self.transform_to_adaptsize(
            accept_prob, self.target_accept_prob, trans_type)
        self.log_stepsize += rm * adapt
        weight = 1 / self.n_averaged
        self.log_stepsize_averaged = (
            weight * self.log_stepsize
            + (1 - weight) * self.log_stepsize_averaged)
        return math.exp(self.log_stepsize)

    @staticmethod
    def transform_to_adaptsize(accept_prob, target, trans_type='linear'):
        if trans_type == 'linear':
            return accept_prob - target
        if trans_type == 'sign':
            return math.copysign(1., accept_prob - target)
        if trans_type == 'penalize-high-prob':
            # Roughly interpolates (0,-1), (target,0), (1,1): linear near
            # the target, saturating quickly as 1 - accept_prob becomes an
            # order of magnitude smaller than 1 - target
            # (stepsize_adapter.py:240-266).
            if accept_prob <= target:
                return (accept_prob - target) / target
            eps = 2.0 ** -52
            magnitude_diff = math.log10(
                (1. - (accept_prob - eps)) / (1 - target))
            w = 0. if magnitude_diff == 0 else math.exp(1 / magnitude_diff)
            adapt = ((1 - w) * (accept_prob - target) / target
                     - w * magnitude_diff)
            return min(1., adapt)
        raise NotImplementedError(trans_type)


class DualAverageStepsizeAdapter:
    """Nesterov dual averaging (stepsize_adapter.py:275-326)."""

    def __init__(self, init_stepsize, target_accept_prob=.9):
        if init_stepsize <= 0:
            raise ValueError("The initial stepsize must be positive.")
        self.log_stepsize = math.log(init_stepsize)
        self.log_stepsize_averaged = self.log_stepsize
        self.n_averaged = 0
        self.target_accept_prob = target_accept_prob
        self.latent_stat = 0.
        self.stepsize_averaging_log_decay_rate = 0.75
        self.latent_prior_samplesize = 10
        self.log_stepsize_shrinkage_mean = math.log(2.) + self.log_stepsize
        self.log_stepsize_shrinkage_strength = 0.05

    def get_current_stepsize(self, averaged=False):
        return math.exp(self.log_stepsize_averaged if averaged
                        else self.log_stepsize)

    def adapt_stepsize(self, accept_prob):
        self.n_averaged += 1
        weight = 1 / (self.n_averaged + self.latent_prior_samplesize)
        self.latent_stat = (1 - weight) * self.latent_stat \
            + weight * (self.target_accept_prob - accept_prob)
        self.log_stepsize = (
            self.log_stepsize_shrinkage_mean
            - math.sqrt(self.n_averaged)
            / self.log_stepsize_shrinkage_strength * self.latent_stat)
        avg_weight = self.n_averaged \
            ** -self.stepsize_averaging_log_decay_rate
        self.log_stepsize_averaged = (
            (1 - avg_weight) * self.log_stepsize_averaged
            + avg_weight * self.log_stepsize)
        return math.exp(self.log_stepsize)


def initialize_stepsize(compute_acceptprob, dt=1.0):
    """Doubling/halving search for a stepsize with ~50% one-step
    acceptance (stepsize_adapter.py:123-145). Host-side."""
    accept_prob = compute_acceptprob(dt)
    direction = 1 if accept_prob > 0.5 else -1
    while accept_prob == 0 or (2 * accept_prob) ** direction > 1:
        dt = dt * 2 ** direction
        accept_prob = compute_acceptprob(dt)
        if accept_prob == 0 and direction == 1:
            dt /= 2  # the last doubling overshot
            break
    return dt
