"""Hamiltonian Monte Carlo kernel (jit-native).

Re-designs the reference's HMC engine (reference:
bayesbridge/reg_coef_sampler/hamiltonian_monte_carlo/hmc.py:90-175 and
dynamics.py:11-83) as pure functions: velocity-Verlet leapfrog inside a
``lax.while_loop`` with a data-dependent step count (bounded by the
caller), a running min/max Hamiltonian divergence check (fluctuation >
100 rejects the trajectory), and a Metropolis correction — all traceable
inside the Gibbs scan.

The momentum is Gaussian with an optional diagonal mass; `f` returns
(logp, grad) and is any jit-compatible closure.
"""

import jax
import jax.numpy as jnp
from jax import lax


def compute_hamiltonian(logp, p, inv_mass_diag=None):
    kinetic = 0.5 * (jnp.vdot(p, p) if inv_mass_diag is None
                     else jnp.vdot(p, inv_mass_diag * p))
    return -logp + kinetic


def draw_momentum(key, n, dtype, sqrt_mass_diag=None):
    p = jax.random.normal(key, (n,), dtype)
    return p if sqrt_mass_diag is None else sqrt_mass_diag * p


def velocity_verlet(f, dt, q, p, grad, inv_mass_diag=None):
    """One leapfrog step (dynamics.py:59-67). Keeps the reference's
    guard: the final half-kick is skipped when logp is not finite."""
    p_half = p + 0.5 * dt * grad
    velocity = p_half if inv_mass_diag is None else inv_mass_diag * p_half
    q_new = q + dt * velocity
    logp, grad_new = f(q_new)
    finite = jnp.isfinite(logp)
    p_new = jnp.where(finite, p_half + 0.5 * dt * grad_new, p_half)
    grad_new = jnp.where(finite, grad_new, jnp.zeros_like(grad_new))
    return q_new, p_new, logp, grad_new


def simulate_dynamics(f, dt, n_step, q0, p0, logp0, grad0,
                      hamiltonian_tol=100.0, inv_mass_diag=None):
    """Integrate up to `n_step` (traced) leapfrog steps, stopping early on
    divergence (hmc.py:138-175). Returns
    (q, p, logp, grad, n_grad_evals, instability_detected)."""
    h0 = compute_hamiltonian(logp0, p0, inv_mass_diag)

    def cond(state):
        i = state['i']
        return jnp.logical_and(i < n_step,
                               jnp.logical_not(state['unstable']))

    def body(state):
        q, p, logp, grad = velocity_verlet(
            f, dt, state['q'], state['p'], state['grad'], inv_mass_diag)
        h = compute_hamiltonian(logp, p, inv_mass_diag)
        min_h = jnp.minimum(state['min_h'], h)
        max_h = jnp.maximum(state['max_h'], h)
        unstable = jnp.logical_or(
            jnp.logical_not(jnp.isfinite(logp)),
            (max_h - min_h) > hamiltonian_tol)
        return dict(q=q, p=p, logp=logp, grad=grad, i=state['i'] + 1,
                    min_h=min_h, max_h=max_h, unstable=unstable)

    out = lax.while_loop(cond, body, dict(
        q=q0, p=p0, logp=logp0, grad=grad0, i=jnp.zeros((), jnp.int32),
        min_h=h0, max_h=h0, unstable=jnp.zeros((), bool)))
    return (out['q'], out['p'], out['logp'], out['grad'], out['i'],
            out['unstable'])


def generate_next_state(key, f, dt, n_step, q0, logp0=None, grad0=None,
                        hamiltonian_tol=100.0, sqrt_mass_diag=None,
                        inv_mass_diag=None):
    """One MH-corrected HMC transition (hmc.py:90-135). Returns (q, info).
    """
    dtype = q0.dtype
    k_mom, k_accept = jax.random.split(key)
    n_grad_evals = jnp.zeros((), jnp.int32)
    if logp0 is None or grad0 is None:
        logp0, grad0 = f(q0)
        n_grad_evals = n_grad_evals + 1
    p0 = draw_momentum(k_mom, len(q0), dtype, sqrt_mass_diag)
    log_joint0 = -compute_hamiltonian(logp0, p0, inv_mass_diag)

    q, p, logp, grad, n_steps_taken, unstable = simulate_dynamics(
        f, dt, n_step, q0, p0, logp0, grad0, hamiltonian_tol, inv_mass_diag)
    n_grad_evals = n_grad_evals + n_steps_taken

    log_joint = -compute_hamiltonian(logp, p, inv_mass_diag)
    hamiltonian_error = jnp.where(
        unstable, -jnp.inf, log_joint - log_joint0)
    accept_prob = jnp.minimum(1.0, jnp.exp(hamiltonian_error))
    accepted = accept_prob > jax.random.uniform(k_accept, (), dtype)

    q_out = jnp.where(accepted, q, q0)
    logp_out = jnp.where(accepted, logp, logp0)
    grad_out = jnp.where(accepted, grad, grad0)
    info = {
        'logp': logp_out,
        'grad': grad_out,
        'accepted': accepted,
        'accept_prob': accept_prob,
        'hamiltonian_error': hamiltonian_error,
        'instability_detected': unstable,
        'n_grad_evals': n_grad_evals,
    }
    return q_out, info


# --------------------------------------------------------------------- #
# Standalone sampling driver (API parity with hmc.py:15-80)             #
# --------------------------------------------------------------------- #

def generate_samples(key, f, q0, n_burnin, n_sample, nstep_range,
                     dt_range, adapt_stepsize=False,
                     target_accept_prob=.9, final_adaptsize=.05):
    """Host-driven HMC loop over the jitted kernel: returns
    (samples [p, n], logp_samples, accept_prob, time_elapsed).

    Unlike the reference there is no stepsize auto-search when dt_range
    is None; pass an explicit range (use
    `stepsize.initialize_stepsize` to find one).
    """
    import time
    import numpy as np
    from .stepsize import HamiltonianBasedStepsizeAdapter

    if np.isscalar(dt_range):
        dt_range = np.array([dt_range, dt_range])
    if np.isscalar(nstep_range):
        nstep_range = np.array([nstep_range, nstep_range])

    adapter = HamiltonianBasedStepsizeAdapter(
        init_stepsize=1., target_accept_prob=target_accept_prob,
        reference_iteration=n_burnin, adaptsize_at_reference=final_adaptsize)

    q = jnp.asarray(q0)
    n_total = n_burnin + n_sample
    samples = np.zeros((len(q0), n_total))
    logp_samples = np.zeros(n_total)
    accept_prob = np.zeros(n_total)

    kernel = jax.jit(
        lambda key, dt, n_step, q: generate_next_state(key, f, dt, n_step, q)
    )
    tic = time.time()
    use_averaged = False
    rng = np.random.default_rng(0)
    for i in range(n_total):
        key, subkey = jax.random.split(key)
        dt = rng.uniform(dt_range[0], dt_range[1]) \
            * adapter.get_current_stepsize(use_averaged)
        n_step = rng.integers(nstep_range[0], nstep_range[1] + 1)
        q, info = kernel(subkey, dt, int(n_step), q)
        if i < n_burnin and adapt_stepsize:
            adapter.adapt_stepsize(float(info['hamiltonian_error']))
        elif i == n_burnin - 1:
            use_averaged = True
        samples[:, i] = np.asarray(q)
        logp_samples[i] = float(info['logp'])
        accept_prob[i] = float(info['accept_prob'])
    return samples, logp_samples, accept_prob, time.time() - tic
