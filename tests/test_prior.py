"""Prior unit tests (reference: tests/test_prior.py:7-149): clone
equivalence, parametrization-independence of the Gamma hyper-parameters,
and full-sampler invariance under the global-scale parametrization."""

import numpy as np
import pytest

from .helper import simulate_data
from bayesbridge_tpu import BayesBridge, RegressionModel, RegressionCoefPrior


def test_clone():
    kwargs = {
        'bridge_exponent': 1. / 8,
        'n_fixed_effect': 1,
        'sd_for_fixed_effect': 1.11,
        'regularizing_slab_size': 2.22,
        'global_scale_prior_hyper_param': {'log10_mean': -4., 'log10_sd': 1.},
    }
    prior = RegressionCoefPrior(**kwargs)
    changed = {
        'n_fixed_effect': 3,
        'global_scale_prior_hyper_param': {'log10_mean': -6., 'log10_sd': 1.5},
    }
    kwargs_alt = {**kwargs, **changed}
    cloned = prior.clone(**changed)
    direct = RegressionCoefPrior(**kwargs_alt)
    assert np.all(cloned.__dict__.pop('sd_for_fixed')
                  == direct.__dict__.pop('sd_for_fixed'))
    assert cloned.__dict__ == direct.__dict__


def test_clone_warns_on_unknown_kwarg():
    prior = RegressionCoefPrior()
    with pytest.warns(UserWarning):
        prior.clone(not_a_real_option=1.)


def test_gscale_parametrization_invariant_hyperparam():
    """Gamma hyper-parameters must be identical whether the log10-mean is
    specified in the coef_magnitude or (shifted) raw parametrization."""
    bridge_exp = .25
    hyper = {'log10_mean': -4., 'log10_sd': 1.}
    prior_coef_scale = RegressionCoefPrior(
        bridge_exponent=bridge_exp, global_scale_prior_hyper_param=hyper,
        _global_scale_parametrization='coef_magnitude')
    unit_magnitude = RegressionCoefPrior.compute_power_exp_ave_magnitude(
        bridge_exp)
    hyper_raw = {'log10_mean': -4. - np.log10(unit_magnitude),
                 'log10_sd': 1.}
    prior_raw = RegressionCoefPrior(
        bridge_exponent=bridge_exp,
        global_scale_prior_hyper_param=hyper_raw,
        _global_scale_parametrization='raw')
    a = prior_coef_scale.param['gscale_neg_power']
    b = prior_raw.param['gscale_neg_power']
    assert a['shape'] == pytest.approx(b['shape'], rel=1e-10)
    assert a['rate'] == pytest.approx(b['rate'], rel=1e-10)


def _last_gibbs_sample(bridge, init, seed=0):
    samples, _ = bridge.gibbs(
        n_iter=10, n_burnin=0, init=init, coef_sampler_type='cholesky',
        seed=seed)
    return samples['coef'][:, -1]


@pytest.mark.slow
def test_gscale_paramet_invariance():
    """Sampler output must be invariant to the parametrization under a
    scale-invariant prior, differ under an informative one, and re-agree
    once the hyper-parameter is shifted accordingly
    (reference: tests/test_prior.py:61-149)."""
    y, X, beta = simulate_data(model='logit', seed=0)
    model = RegressionModel(y, X, family='logit')
    bridge_exp = .25
    magnitude = RegressionCoefPrior.compute_power_exp_ave_magnitude(
        bridge_exp)
    init = {'global_scale': .1, 'local_scale': np.ones(X.shape[1])}
    raw_init = {'global_scale': .1 / magnitude,
                'local_scale': magnitude * np.ones(X.shape[1])}

    def coef_sample(paramet, hyper=None, init_=None):
        prior = RegressionCoefPrior(
            bridge_exponent=bridge_exp, regularizing_slab_size=1.,
            global_scale_prior_hyper_param=hyper,
            _global_scale_parametrization=paramet)
        return _last_gibbs_sample(BayesBridge(model, prior), init_)

    # Scale-invariant (reference) prior: parametrization cannot matter.
    coef_raw = coef_sample('raw', init_=raw_init)
    coef_mag = coef_sample('coef_magnitude', init_=init)
    np.testing.assert_allclose(coef_raw, coef_mag, rtol=1e-10)

    # Informative prior: the same hyper-param numbers now mean different
    # things in the two parametrizations.
    hyper = {'log10_mean': -2. - np.log10(magnitude), 'log10_sd': 1.}
    coef_raw = coef_sample('raw', hyper, raw_init)
    coef_mag = coef_sample('coef_magnitude', hyper, init)
    assert not np.allclose(coef_raw, coef_mag, rtol=1e-10)

    # Shift the hyper-parameter: they must agree again.
    hyper_shifted = {'log10_mean': hyper['log10_mean']
                     + np.log10(magnitude), 'log10_sd': 1.}
    coef_mag = coef_sample('coef_magnitude', hyper_shifted, init)
    np.testing.assert_allclose(coef_raw, coef_mag, rtol=1e-10)
