"""End-to-end tests for the recycled-basis deflated CG sampler.

The per-draw numerics (deflated draw == dense-algebra Gaussian, basis
recycling saves iterations, warm-fold composition) are pinned in
test_gaussian_samplers.py; here the option is exercised through the
public Gibbs API: the basis must be a type-stable scan carry, survive
gibbs_resume exactly, and leave the chain's stationary behavior intact.
"""

import math

import numpy as np
import pytest

from bayesbridge_tpu import (
    BayesBridge, RegressionModel, RegressionCoefPrior, SamplerOptions,
)
from bayesbridge_tpu.utils.simulate_data import (
    simulate_design, simulate_outcome,
)


def _make_bridge(seed=0, n=80, p=30):
    X = simulate_design(n, p, binary_frac=.6, format_='sparse', seed=seed)
    beta = np.zeros(p)
    beta[:3] = 1.0
    outcome = simulate_outcome(X, beta, 'logit', seed=seed + 1)
    model = RegressionModel(outcome, X, family='logit')
    prior = RegressionCoefPrior(bridge_exponent=.5,
                                regularizing_slab_size=2.)
    return BayesBridge(model, prior)


def _run(bridge, options, n_iter=12, restart_in_middle=False, seed=0):
    init = {'global_scale': 0.1,
            'local_scale': np.ones(bridge.model.n_pred - 1)}
    n_post = n_iter
    if restart_in_middle:
        n_post = math.ceil(n_iter / 2)
    samples, info = bridge.gibbs(
        n_post, 0, init=init, seed=seed, options=options,
        params_to_save='all')
    if restart_in_middle:
        samples, info = bridge.gibbs_resume(
            info, n_iter - n_post, merge=True, prev_samples=samples)
    return samples, info


@pytest.mark.slow
def test_deflated_gibbs_runs_and_matches_plain_statistics():
    """cg_recycled_basis=4 must run through the jitted scan (the basis
    is part of the carry — any dtype/shape instability crashes the
    trace) and produce draws that track the plain chain: identical
    model, same seed, per-draw difference bounded by the accumulated CG
    tolerance, and no convergence failures."""
    bridge = _make_bridge()
    opt_plain = SamplerOptions('cg', cg_recycled_basis=0)
    opt_defl = SamplerOptions('cg', cg_recycled_basis=4)
    s_plain, i_plain = _run(bridge, opt_plain)
    s_defl, i_defl = _run(bridge, opt_defl)
    assert np.all(np.isfinite(s_defl['logp']))
    assert i_defl['_random_gen_state'] is not None
    # Same seed, same Gaussian targets; the solves differ only by the
    # solver path, so early draws agree to solver tolerance. (They drift
    # apart as tolerance-level differences feed back through the chain,
    # so compare the first post-init draw, not the last.)
    np.testing.assert_allclose(s_defl['coef'][:, 0], s_plain['coef'][:, 0],
                               rtol=1e-3, atol=1e-4)


def test_deflated_resume_matches_uninterrupted():
    """gibbs_resume must carry the recycled basis: an interrupted
    deflated chain equals the uninterrupted one exactly (CPU float64).
    Before round 5 the basis was dropped by _extract_sampler_state and
    resume restarted deflation from the zero basis."""
    bridge = _make_bridge(seed=3, n=60, p=24)
    options = SamplerOptions('cg', cg_recycled_basis=4)
    s_full, _ = _run(bridge, options, n_iter=8)
    s_restart, _ = _run(bridge, options, n_iter=8, restart_in_middle=True)
    np.testing.assert_allclose(s_restart['coef'], s_full['coef'],
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(s_restart['logp'], s_full['logp'],
                               rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_deflated_gibbs_saves_cg_iterations():
    """Across a short chain on a correlated design, deflation should cut
    the total CG iteration count (the basis tracks the data geometry,
    which changes slowly between draws). Guarded loosely — the hard
    guarantees are per-draw (test_gaussian_samplers) — but a regression
    that made deflation a no-op or an iteration ADDER should trip this."""
    bridge = _make_bridge(seed=7, n=120, p=60)
    n_iter = 16
    _, i_plain = _run(bridge, SamplerOptions('cg', cg_recycled_basis=0),
                      n_iter=n_iter, seed=11)
    _, i_defl = _run(bridge, SamplerOptions('cg', cg_recycled_basis=8),
                     n_iter=n_iter, seed=11)
    iters_plain = np.asarray(i_plain['_reg_coef_sampling_info']['n_cg_iter'])
    iters_defl = np.asarray(i_defl['_reg_coef_sampling_info']['n_cg_iter'])
    assert iters_defl.sum() <= iters_plain.sum()


def test_cg_atol_multiplier_validation_and_roundtrip():
    with pytest.raises(ValueError):
        SamplerOptions('cg', cg_atol_multiplier=0.0)
    assert SamplerOptions(
        'cg', cg_atol_multiplier=30.0).get_info()[
            'cg_atol_multiplier'] == 30.0


@pytest.mark.slow
def test_cg_atol_multiplier_controls_iteration_budget():
    """A looser tolerance must run (valid chain, finite logp) with
    fewer CG iterations than the reference rule."""
    bridge = _make_bridge(seed=9)
    _, i_ref = _run(bridge, SamplerOptions('cg'), n_iter=6, seed=2)
    s_loose, i_loose = _run(
        bridge, SamplerOptions('cg', cg_atol_multiplier=100.0),
        n_iter=6, seed=2)
    assert np.all(np.isfinite(s_loose['logp']))
    it_ref = np.asarray(i_ref['_reg_coef_sampling_info']['n_cg_iter'])
    it_loose = np.asarray(i_loose['_reg_coef_sampling_info']['n_cg_iter'])
    assert it_loose.sum() < it_ref.sum()


def test_deflation_option_validation_and_roundtrip():
    """SamplerOptions validates k and round-trips it through get_info
    (the resume path rebuilds options from that dict, so a dropped key
    would silently disable deflation on resume)."""
    with pytest.raises(ValueError):
        SamplerOptions('cg', cg_recycled_basis=-1)
    opt = SamplerOptions('cg', cg_recycled_basis=16)
    assert opt.get_info()['cg_recycled_basis'] == 16
    assert SamplerOptions(
        **{k: v for k, v in opt.get_info().items()
           if k != 'coef_sampler_type'},
        coef_sampler_type='cg').cg_recycled_basis == 16
