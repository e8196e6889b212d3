"""Tests for vmapped multi-chain sampling.

The strongest check is exactness: a vmapped chain must reproduce, draw
for draw, the single-chain scan run with the same PRNG key — vmap and
mesh sharding are program transforms, not algorithm changes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesbridge_tpu import (
    BayesBridge, RegressionModel, RegressionCoefPrior,
)
from bayesbridge_tpu import step as step_mod
from bayesbridge_tpu.gibbs_util import SamplerOptions
from bayesbridge_tpu.multichain import gibbs_chains, gibbs_chains_resume
from bayesbridge_tpu.utils.mcmc_summarizer import (
    compute_split_rhat, compute_multichain_ess,
)
from tests.helper import simulate_data


def _make_bridge():
    outcome, X, _ = simulate_data(model='logit', seed=0)
    model = RegressionModel(outcome, X, family='logit')
    prior = RegressionCoefPrior(bridge_exponent=.5,
                                regularizing_slab_size=2.)
    return BayesBridge(model, prior)


@pytest.mark.slow
def test_vmapped_chains_match_sequential_runs():
    bridge = _make_bridge()
    n_chains, n_iter = 3, 12
    init = {'coef': np.zeros(bridge.n_pred), 'global_scale': 0.1,
            'local_scale': np.ones(bridge.n_pred - bridge.n_unshrunk)}
    samples, info = gibbs_chains(
        bridge, n_iter, n_chains, seed=11, init=dict(init),
        coef_sampler_type='cg', params_to_save=('coef', 'logp'))
    assert samples['coef'].shape == (n_chains, bridge.n_pred, n_iter)

    # Re-run each chain through the single-chain scan with the same key.
    options = SamplerOptions.pick_default_and_create(
        'cg', None, bridge.model.name, bridge.model.design)
    bridge.rg.set_seed(11)
    cfg = bridge._get_step_config(options)
    coef, obs_prec, lscale, gscale, _, _ = bridge.initialize_chain(
        dict(init), bridge.prior.bridge_exp, cfg)
    keys = jax.random.split(bridge.rg.key, n_chains)
    for c in range(n_chains):
        carry = step_mod.init_carry(cfg, keys[c], coef, obs_prec,
                                    gscale, lscale)
        _, outputs = step_mod.run_chain(
            cfg, bridge.model, carry, 0, n_iter, 1, 0,
            save_keys=('coef', 'logp'))
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(outputs['coef']), 0, -1),
            samples['coef'][c], rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_chains_shard_over_mesh():
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device (forced host) platform")
    from jax.sharding import Mesh
    bridge = _make_bridge()
    mesh = Mesh(np.array(jax.devices()[:2]), ('chains',))
    s_mesh, _ = gibbs_chains(
        bridge, 8, 2, seed=5, coef_sampler_type='cg',
        params_to_save=('coef',), mesh=mesh)
    s_plain, _ = gibbs_chains(
        bridge, 8, 2, seed=5, coef_sampler_type='cg',
        params_to_save=('coef',))
    np.testing.assert_allclose(s_mesh['coef'], s_plain['coef'],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_overdispersed_per_chain_inits():
    """A list of init dicts gives each chain its own starting point."""
    bridge = _make_bridge()
    n_chains = 3
    inits = [{'coef': np.full(bridge.n_pred, c * 1.0),
              'global_scale': 0.1,
              'local_scale': np.ones(bridge.n_pred - bridge.n_unshrunk)}
             for c in range(n_chains)]
    samples, info = gibbs_chains(
        bridge, 4, n_chains, seed=3, init=inits,
        coef_sampler_type='cholesky', params_to_save=('coef',))
    assert samples['coef'].shape == (n_chains, bridge.n_pred, 4)
    # Different starts must produce different early draws.
    assert not np.allclose(samples['coef'][0, :, 0],
                           samples['coef'][1, :, 0])

    with pytest.raises(ValueError, match="init dicts"):
        gibbs_chains(bridge, 2, 2, seed=0, init=inits,
                     coef_sampler_type='cholesky')


@pytest.mark.slow
def test_shared_partial_init_broadcasts_one_start():
    """A single (partial) init dict resolves once and every chain starts
    from the same state, even when unspecified parameters are drawn."""
    from bayesbridge_tpu.multichain import _stack_chain_inits
    bridge = _make_bridge()
    options = SamplerOptions.pick_default_and_create(
        'cg', None, bridge.model.name, bridge.model.design)
    cfg = bridge._get_step_config(options)
    bridge.rg.set_seed(42)
    coef, obs_prec, lscale, gscale = _stack_chain_inits(
        bridge, {'global_scale': 0.1}, 3, cfg)
    for arr in (coef, obs_prec, lscale, gscale):
        for c in (1, 2):
            np.testing.assert_array_equal(arr[c], arr[0])


@pytest.mark.slow
def test_multichain_jit_cache_is_reused():
    """Repeated gibbs_chains calls with the same config must not
    recompile the vmapped program."""
    from bayesbridge_tpu.multichain import _run_chains
    bridge = _make_bridge()
    kwargs = dict(seed=1, coef_sampler_type='cholesky',
                  params_to_save=('coef',),
                  init={'coef': np.zeros(bridge.n_pred),
                        'global_scale': 0.1,
                        'local_scale': np.ones(
                            bridge.n_pred - bridge.n_unshrunk)})
    gibbs_chains(bridge, 3, 2, **kwargs)
    size = _run_chains._cache_size()
    gibbs_chains(bridge, 3, 2, **kwargs)
    assert _run_chains._cache_size() == size


@pytest.mark.slow
def test_multichain_resume_equals_uninterrupted():
    """Per-chain resume must be bit-identical to the longer run."""
    bridge = _make_bridge()
    n_chains = 2
    init = {'coef': np.zeros(bridge.n_pred), 'global_scale': 0.1,
            'local_scale': np.ones(bridge.n_pred - bridge.n_unshrunk)}
    full, _ = gibbs_chains(
        bridge, 10, n_chains, seed=7, init=dict(init),
        coef_sampler_type='cg', params_to_save=('coef', 'logp'))
    first, info = gibbs_chains(
        bridge, 6, n_chains, seed=7, init=dict(init),
        coef_sampler_type='cg', params_to_save=('coef', 'logp'))
    merged, m_info = gibbs_chains_resume(
        bridge, info, 4, merge=True, prev_samples=first)
    np.testing.assert_array_equal(merged['coef'], full['coef'])
    np.testing.assert_array_equal(merged['logp'], full['logp'])
    assert m_info['n_iter'] == 10


@pytest.mark.slow
def test_rhat_and_pooled_ess():
    bridge = _make_bridge()
    # 72 draws x 4 chains keeps the split-rhat / pooled-ESS assertions
    # away from their loose thresholds while halving this test's share
    # of the fast-suite wall time on single-core hosts.
    samples, _ = gibbs_chains(
        bridge, 72, 4, n_burnin=24, seed=2, coef_sampler_type='cg',
        params_to_save=('coef', 'logp'))
    rhat = compute_split_rhat(samples['coef'])
    assert rhat.shape == (bridge.n_pred,)
    assert np.all(np.isfinite(rhat))
    assert np.median(rhat) < 1.3  # chains explore the same posterior
    ess = compute_multichain_ess(samples['coef'])
    assert ess.shape == (bridge.n_pred,)
    assert np.all(ess > 4)  # more than one effective draw per chain


def test_rhat_detects_disagreement():
    rng = np.random.default_rng(0)
    good = rng.standard_normal((4, 200))
    bad = good + np.arange(4)[:, None] * 10.0  # chains at different means
    assert compute_split_rhat(good[..., None, :]).item() < 1.1
    assert compute_split_rhat(bad[..., None, :]).item() > 2.0


@pytest.mark.slow
def test_multichain_cox_family():
    """Chains vmap over the Cox carry too (obs_prec is empty there)."""
    outcome, X, _ = simulate_data(model='cox', seed=4, n_obs=60, n_pred=10)
    model = RegressionModel(outcome, X, family='cox')
    prior = RegressionCoefPrior(bridge_exponent=.5,
                                regularizing_slab_size=2.)
    bridge = BayesBridge(model, prior)
    samples, info = gibbs_chains(
        bridge, 6, 2, seed=9, coef_sampler_type='hmc',
        init={'coef': np.zeros(bridge.n_pred), 'global_scale': .1,
              'local_scale': np.ones(bridge.n_pred)},
        params_to_save=('coef', 'logp'))
    assert samples['coef'].shape == (2, bridge.n_pred, 6)
    assert np.all(np.isfinite(samples['logp']))
