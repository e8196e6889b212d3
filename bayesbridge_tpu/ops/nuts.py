"""No-U-Turn Sampler, de-recursed for XLA.

The reference NUTS builds its doubling trajectory with recursive Python
(_TrajectoryTree, reference:
bayesbridge/reg_coef_sampler/hamiltonian_monte_carlo/nuts.py:9-337),
which cannot trace. This module re-derives the sampler iteratively:

* Each doubling builds a subtree of 2^h leapfrog states sequentially in
  a `lax.while_loop`. The recursive version's U-turn checks occur at
  every *complete dyadic sub-interval* [l, r] (r = l + 2^j - 1,
  l % 2^j == 0, j >= 1) between the interval's first and last states;
  the iterative version reproduces the exact same check set with a
  checkpoint stack of max_height+1 states indexed by the bit pattern of
  the leaf counter (store at popcount(i >> 1) for even i, check slots
  [idx_max - trailing_ones(i) + 1, idx_max] for odd i).
* Within-subtree sampling uses reservoir substitution (replace the
  candidate with probability acceptable/n_acceptable), which is
  distribution-identical to the reference's pairwise 'uniform' merges;
  across doublings the reference's 'swap' rule (probability
  n_new/n_old, possibly > 1) is kept verbatim.
* Slice variable, divergence criterion (Hamiltonian fluctuation > 100),
  node-count-weighted average acceptance/Hamiltonian-error statistics,
  and the momentum-based U-turn test all match nuts.py:108-337.
"""

import jax
import jax.numpy as jnp
from jax import lax

from .hmc import compute_hamiltonian, velocity_verlet


def _popcount(x):
    return jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.int32)


def _trailing_ones(x):
    """Number of contiguous low-order 1-bits."""
    x = x.astype(jnp.uint32)
    # trailing ones of x == trailing zeros of x+1 == popcount((x+1 & -(x+1)) - 1)
    y = x + 1
    low_bit = y & (~y + 1)
    return _popcount(low_bit - 1)


def _u_turned(d, q_start, p_start, q_end, p_end):
    """Momentum-based U-turn between the two ends of an interval built in
    direction d (nuts.py:310-320)."""
    dq = d * (q_end - q_start)
    return jnp.logical_or(jnp.vdot(dq, p_end) < 0,
                          jnp.vdot(dq, p_start) < 0)


def _build_subtree(key, f, dt, d, h, start, threshold, init_joint,
                   max_height, hamiltonian_tol):
    """Integrate up to 2^h new states from `start` = (q, p, grad) in
    direction d; returns the subtree summary."""
    q0, p0, grad0 = start
    n = q0.shape[0]
    dtype = q0.dtype
    n_leaves = jnp.int32(1) << h

    ckpt_q = jnp.zeros((max_height + 1, n), dtype)
    ckpt_p = jnp.zeros((max_height + 1, n), dtype)

    init_state = dict(
        key=key,
        i=jnp.zeros((), jnp.int32),
        q=q0, p=p0, grad=grad0, logp=jnp.zeros((), dtype),
        ckpt_q=ckpt_q, ckpt_p=ckpt_p,
        n_acc=jnp.zeros((), jnp.int32),
        sample_q=q0, sample_logp=jnp.zeros((), dtype), sample_grad=grad0,
        turning=jnp.zeros((), bool),
        min_h=jnp.full((), jnp.inf, dtype),
        max_h=jnp.full((), -jnp.inf, dtype),
        sum_err=jnp.zeros((), dtype),
        sum_acc=jnp.zeros((), dtype),
    )

    def cond(s):
        unstable = (s['max_h'] - s['min_h']) > hamiltonian_tol
        return jnp.logical_and(
            s['i'] < n_leaves,
            jnp.logical_not(jnp.logical_or(s['turning'], unstable)))

    def body(s):
        key, k_res = jax.random.split(s['key'])
        q, p, logp, grad = velocity_verlet(
            f, d * dt, s['q'], s['p'], s['grad'])
        finite = jnp.isfinite(logp)
        joint = jnp.where(finite, -compute_hamiltonian(logp, p), -jnp.inf)
        hamiltonian = -joint

        acceptable = joint > threshold
        n_acc = s['n_acc'] + acceptable.astype(jnp.int32)
        take = jax.random.uniform(k_res, (), dtype) \
            < acceptable.astype(dtype) / jnp.maximum(n_acc, 1).astype(dtype)
        sample_q = jnp.where(take, q, s['sample_q'])
        sample_logp = jnp.where(take, logp, s['sample_logp'])
        sample_grad = jnp.where(take, grad, s['sample_grad'])

        i = s['i']
        idx_max = _popcount(i >> 1)
        is_even = (i % 2) == 0

        # Even leaf: store a checkpoint.
        ckpt_q = jnp.where(is_even,
                           s['ckpt_q'].at[idx_max].set(q), s['ckpt_q'])
        ckpt_p = jnp.where(is_even,
                           s['ckpt_p'].at[idx_max].set(p), s['ckpt_p'])

        # Odd leaf: U-turn checks against checkpoints idx_min..idx_max.
        idx_min = idx_max - _trailing_ones(i) + 1

        def check_slot(j, turning):
            active = jnp.logical_and(j >= idx_min, j <= idx_max)
            turned = _u_turned(d, s['ckpt_q'][j], s['ckpt_p'][j], q, p)
            return jnp.logical_or(turning,
                                  jnp.logical_and(active, turned))

        turning_new = lax.cond(
            is_even,
            lambda: s['turning'],
            lambda: lax.fori_loop(0, max_height + 1, check_slot,
                                  s['turning']),
        )

        return dict(
            key=key, i=i + 1, q=q, p=p, grad=grad, logp=logp,
            ckpt_q=ckpt_q, ckpt_p=ckpt_p,
            n_acc=n_acc,
            sample_q=sample_q, sample_logp=sample_logp,
            sample_grad=sample_grad,
            turning=turning_new,
            min_h=jnp.minimum(s['min_h'], hamiltonian),
            max_h=jnp.maximum(s['max_h'], hamiltonian),
            sum_err=s['sum_err'] + jnp.abs(init_joint - joint),
            sum_acc=s['sum_acc']
            + jnp.minimum(1.0, jnp.exp(joint - init_joint)),
        )

    out = lax.while_loop(cond, body, init_state)
    out['unstable'] = (out['max_h'] - out['min_h']) > hamiltonian_tol
    out['n_integrated'] = out['i']
    return out


def generate_next_state(key, f, dt, q0, logp0=None, grad0=None,
                        max_height=10, hamiltonian_error_tol=100.0):
    """One NUTS transition (nuts.py:108-151). Returns (q, info)."""
    dtype = q0.dtype
    k_mom, k_slice, k_dirs, k_grow = jax.random.split(key, 4)
    n_init_grad = 0
    if logp0 is None or grad0 is None:
        logp0, grad0 = f(q0)
        n_init_grad = 1  # counted, as in the reference (nuts.py:111-114)
    p0 = jax.random.normal(k_mom, q0.shape, dtype)
    joint0 = -compute_hamiltonian(logp0, p0)
    threshold = joint0 - jax.random.exponential(k_slice, (), dtype)
    directions = jnp.where(
        jax.random.uniform(k_dirs, (max_height,)) < 0.5, -1.0, 1.0
    ).astype(dtype)

    init = dict(
        key=k_grow,
        fwd=(q0, p0, grad0), bwd=(q0, p0, grad0),
        sample_q=q0, sample_logp=logp0, sample_grad=grad0,
        n_acc=jnp.asarray((joint0 > threshold), jnp.int32),
        u_turn=jnp.zeros((), bool),
        min_h=-joint0, max_h=-joint0,
        sum_err=jnp.zeros((), dtype),     # running totals over all nodes
        sum_acc=jnp.ones((), dtype),      # initial node contributes 1.0
        n_nodes=jnp.ones((), jnp.int32),
        n_grad=jnp.zeros((), jnp.int32),
        attempts=jnp.zeros((), jnp.int32),
        last_doubling_rejected=jnp.zeros((), bool),
    )

    def cond(s):
        unstable = (s['max_h'] - s['min_h']) > hamiltonian_error_tol
        terminated = jnp.logical_or(s['u_turn'], unstable)
        return jnp.logical_and(s['attempts'] < max_height,
                               jnp.logical_not(terminated))

    def body(s):
        key, k_sub, k_swap = jax.random.split(s['key'], 3)
        h = s['attempts']
        d = directions[h]
        start = lax.cond(d > 0, lambda: s['fwd'], lambda: s['bwd'])

        sub = _build_subtree(
            k_sub, f, dt, d, h, start, threshold, joint0, max_height,
            hamiltonian_error_tol)

        terminated_within = jnp.logical_or(sub['turning'], sub['unstable'])

        # 'swap' transition (nuts.py:287-295): probability n_new / n_old.
        swap_prob = sub['n_acc'].astype(dtype) \
            / jnp.maximum(s['n_acc'], 1).astype(dtype)
        do_swap = jnp.logical_and(
            jnp.logical_not(terminated_within),
            jax.random.uniform(k_swap, (), dtype) < swap_prob)
        sample_q = jnp.where(do_swap, sub['sample_q'], s['sample_q'])
        sample_logp = jnp.where(do_swap, sub['sample_logp'],
                                s['sample_logp'])
        sample_grad = jnp.where(do_swap, sub['sample_grad'],
                                s['sample_grad'])

        merged_end = (sub['q'], sub['p'], sub['grad'])
        take_end = jnp.logical_not(terminated_within)

        def upd_end(old, new):
            return tuple(jnp.where(take_end, n, o)
                         for o, n in zip(old, new))

        fwd = lax.cond(d > 0, lambda: upd_end(s['fwd'], merged_end),
                       lambda: s['fwd'])
        bwd = lax.cond(d > 0, lambda: s['bwd'],
                       lambda: upd_end(s['bwd'], merged_end))

        # Whole-trajectory U-turn after a successful merge
        # (nuts.py:296-299).
        q_f, p_f, _ = fwd
        q_b, p_b, _ = bwd
        whole_turn = _u_turned(1.0, q_b, p_b, q_f, p_f)
        u_turn = jnp.logical_or(
            s['u_turn'],
            jnp.logical_or(sub['turning'],
                           jnp.logical_and(take_end, whole_turn)))

        n_acc = s['n_acc'] + jnp.where(take_end, sub['n_acc'], 0)
        sum_err = s['sum_err'] + jnp.where(take_end, sub['sum_err'], 0.0)
        sum_acc = s['sum_acc'] + jnp.where(take_end, sub['sum_acc'], 0.0)
        n_nodes = s['n_nodes'] \
            + jnp.where(take_end, sub['n_integrated'], 0)

        return dict(
            key=key, fwd=fwd, bwd=bwd,
            sample_q=sample_q, sample_logp=sample_logp,
            sample_grad=sample_grad,
            n_acc=n_acc, u_turn=u_turn,
            min_h=jnp.minimum(s['min_h'], sub['min_h']),
            max_h=jnp.maximum(s['max_h'], sub['max_h']),
            sum_err=sum_err, sum_acc=sum_acc, n_nodes=n_nodes,
            n_grad=s['n_grad'] + sub['n_integrated'],
            attempts=s['attempts'] + 1,
            last_doubling_rejected=terminated_within,
        )

    out = lax.while_loop(cond, body, init)
    n_nodes_f = out['n_nodes'].astype(dtype)
    unstable = (out['max_h'] - out['min_h']) > hamiltonian_error_tol
    info = {
        'logp': out['sample_logp'],
        'grad': out['sample_grad'],
        'ave_accept_prob': out['sum_acc'] / n_nodes_f,
        'ave_hamiltonian_error': out['sum_err'] / n_nodes_f,
        'n_grad_evals': out['n_grad'] + n_init_grad,
        'tree_height': out['attempts'],
        'u_turn_detected': out['u_turn'],
        'instability_detected': unstable,
        'last_doubling_rejected': out['last_doubling_rejected'],
    }
    return out['sample_q'], info


# --------------------------------------------------------------------- #
# Standalone sampling driver (API parity with nuts.py:23-105)           #
# --------------------------------------------------------------------- #

def generate_samples(key, f, q0, n_burnin, n_sample, dt_range,
                     adapt_stepsize=False, target_accept_prob=.9,
                     final_adaptsize=.05, max_height=10):
    """Host-driven NUTS loop over the jitted kernel: returns
    (samples [p, n], info dict). Pass an explicit dt_range (use
    `stepsize.initialize_stepsize` to search for one)."""
    import time
    import numpy as np
    from .stepsize import HamiltonianBasedStepsizeAdapter

    if np.isscalar(dt_range):
        dt_range = np.array([dt_range, dt_range])

    adapter = HamiltonianBasedStepsizeAdapter(
        init_stepsize=1., target_accept_prob=target_accept_prob,
        reference_iteration=n_burnin, adaptsize_at_reference=final_adaptsize)

    q = jnp.asarray(q0)
    n_total = n_burnin + n_sample
    samples = np.zeros((len(q0), n_total))
    logp_samples = np.zeros(n_total)
    accept_prob = np.zeros(n_total)

    kernel = jax.jit(
        lambda key, dt, q: generate_next_state(
            key, f, dt, q, max_height=max_height))
    tic = time.time()
    use_averaged = False
    rng = np.random.default_rng(0)
    for i in range(n_total):
        key, subkey = jax.random.split(key)
        dt = rng.uniform(dt_range[0], dt_range[1]) \
            * adapter.get_current_stepsize(use_averaged)
        q, step_info = kernel(subkey, dt, q)
        if i < n_burnin and adapt_stepsize:
            adapter.adapt_stepsize(float(step_info['ave_hamiltonian_error']))
        elif i == n_burnin - 1:
            use_averaged = True
        samples[:, i] = np.asarray(q)
        logp_samples[i] = float(step_info['logp'])
        accept_prob[i] = float(step_info['ave_accept_prob'])
    return samples, {
        'logp_samples': logp_samples,
        'accept_prob_samples': accept_prob,
        'sampling_time': time.time() - tic,
    }
