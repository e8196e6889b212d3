"""Distributional correctness of the HMC and NUTS kernels on an
analytically known Gaussian target (the reference validated these only
indirectly through the Cox regression goldens)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesbridge_tpu.ops import hmc, nuts
from bayesbridge_tpu.ops.stepsize import initialize_stepsize


SD = jnp.asarray([0.5, 1.0, 2.0, 4.0])


def gaussian_logp_grad(q):
    logp = -0.5 * jnp.sum((q / SD) ** 2)
    return logp, -q / SD ** 2


def _run_kernel(kernel_step, key, n_samples, q0):
    q = q0
    out = np.zeros((len(q0), n_samples))
    for i in range(n_samples):
        key, sub = jax.random.split(key)
        q, _ = kernel_step(sub, q)
        out[:, i] = np.asarray(q)
    return out


def test_hmc_samples_gaussian_moments():
    step = jax.jit(lambda k, q: hmc.generate_next_state(
        k, gaussian_logp_grad, 0.25, 12, q))
    samples = _run_kernel(step, jax.random.key(0), 3000,
                          jnp.zeros(4, jnp.float64))
    sd_est = samples[:, 500:].std(axis=1)
    np.testing.assert_allclose(sd_est, np.asarray(SD), rtol=0.12)
    assert np.abs(samples[:, 500:].mean(axis=1)).max() < 0.25


def test_nuts_samples_gaussian_moments():
    step = jax.jit(lambda k, q: nuts.generate_next_state(
        k, gaussian_logp_grad, 0.3, q, max_height=8))
    samples = _run_kernel(step, jax.random.key(1), 3000,
                          jnp.zeros(4, jnp.float64))
    sd_est = samples[:, 500:].std(axis=1)
    np.testing.assert_allclose(sd_est, np.asarray(SD), rtol=0.12)
    assert np.abs(samples[:, 500:].mean(axis=1)).max() < 0.25


def test_nuts_tree_stats_sane():
    q = jnp.zeros(4, jnp.float64)
    _, info = jax.jit(lambda k, q: nuts.generate_next_state(
        k, gaussian_logp_grad, 0.3, q, max_height=8))(jax.random.key(2), q)
    assert 1 <= int(info['tree_height']) <= 8
    assert 0.0 <= float(info['ave_accept_prob']) <= 1.0
    assert int(info['n_grad_evals']) >= 1
    assert np.isfinite(float(info['ave_hamiltonian_error']))


def test_hmc_divergence_detection():
    """A wildly unstable stepsize must be flagged and rejected."""
    def sharp_logp(q):
        logp = -0.5 * jnp.sum((q * 100.0) ** 2)
        return logp, -q * 10000.0

    q0 = jnp.full(4, 0.05, jnp.float64)
    q, info = jax.jit(lambda k: hmc.generate_next_state(
        k, sharp_logp, 5.0, 20, q0))(jax.random.key(3))
    assert bool(info['instability_detected'])
    assert not bool(info['accepted'])
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q0))


def test_standalone_drivers_run():
    key = jax.random.key(4)
    samples, logp, accept, elapsed = hmc.generate_samples(
        key, gaussian_logp_grad, np.zeros(4), n_burnin=50, n_sample=100,
        nstep_range=(5, 10), dt_range=(0.2, 0.3), adapt_stepsize=True)
    assert samples.shape == (4, 150) and np.isfinite(logp).all()
    samples, info = nuts.generate_samples(
        key, gaussian_logp_grad, np.zeros(4), n_burnin=50, n_sample=100,
        dt_range=(0.2, 0.3), adapt_stepsize=True)
    assert samples.shape == (4, 150)
    assert np.isfinite(info['logp_samples']).all()


def test_initialize_stepsize_search():
    def accept_prob(dt):
        q0 = jnp.ones(4, jnp.float64)
        _, info = hmc.generate_next_state(
            jax.random.key(0), gaussian_logp_grad, dt, 1, q0)
        return float(info['accept_prob'])

    dt = initialize_stepsize(accept_prob)
    assert 0 < dt < 100


def test_stability_estimate_stabilizer_clamps_after_long_history():
    """The stability-estimate clamp (reference StabilityEstimateStabilizer,
    reg_coef_sampler.py:395-429) must keep working after MORE updates than
    the ring-buffer size: the empirical-CDF denominator is the window
    occupancy, not the lifetime count (which would silently disable the
    clamp after ~119 iterations)."""
    import numpy as np
    import jax.numpy as jnp
    from bayesbridge_tpu.ops.hmc_update import (
        _stabilize_estimate, _STAB_BUFFER,
    )

    rng = np.random.default_rng(0)
    carry = {
        'stab_buffer': jnp.zeros(_STAB_BUFFER),
        'stab_n': jnp.asarray(0, jnp.int32),
    }
    # Push 3x the window length of tight history values.
    for val in rng.normal(1.0, 0.05, size=3 * _STAB_BUFFER):
        carry, _ = _stabilize_estimate(carry, jnp.asarray(val))
    assert int(carry['stab_n']) == 3 * _STAB_BUFFER

    # A 10x outlier must be pulled back toward the history's scale...
    carry2, clamped = _stabilize_estimate(carry, jnp.asarray(10.0))
    assert float(clamped) < 2.0, float(clamped)
    # ... while an in-distribution estimate passes through unchanged.
    _, passed = _stabilize_estimate(carry, jnp.asarray(0.98))
    np.testing.assert_allclose(float(passed), 0.98)
