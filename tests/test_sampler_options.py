"""SamplerOptions knobs and the model-factory backend override.

`cg_atol_multiplier` scales the reference's CG stopping rule
(atol = 1e-5 * sqrt(p), reg_coef_sampler.py:95-96) — these tests pin
the validation, the plumb-through to the solver (a looser budget must
actually change the iteration count), and the get_info/resume
round-trip, so a regression anywhere in the option path (gibbs_util ->
bridge cfg cache -> step cfg -> reg_coef atol) fails loudly. The
factory `backend=` override is checked for the construction-time
32-bit feasibility gate (design/sparse.py) that protects a forced
bitpack/winell pick from dying after the expensive build.
"""

import numpy as np
import pytest

from bayesbridge_tpu import (
    BayesBridge, RegressionModel, RegressionCoefPrior, SamplerOptions,
)
from bayesbridge_tpu.utils.simulate_data import (
    simulate_design, simulate_outcome,
)


def _bridge(seed=0, n=120, p=40):
    X = simulate_design(n, p, binary_frac=.6, format_='sparse', seed=seed)
    beta = np.zeros(p)
    beta[:3] = 1.0
    outcome = simulate_outcome(X, beta, 'logit', seed=seed + 1)
    model = RegressionModel(outcome, X, family='logit')
    return BayesBridge(model, RegressionCoefPrior(
        bridge_exponent=.5, regularizing_slab_size=2.))


def test_atol_multiplier_validation_and_info_round_trip():
    opts = SamplerOptions('cg', cg_atol_multiplier=7.5)
    assert opts.get_info()['cg_atol_multiplier'] == 7.5
    assert SamplerOptions('cg').get_info()['cg_atol_multiplier'] == 1.0
    for bad in (0.0, -1.0, float('nan')):
        with pytest.raises(ValueError):
            SamplerOptions('cg', cg_atol_multiplier=bad)


def test_atol_multiplier_reaches_the_solver():
    """A much looser budget must reduce the per-draw CG iteration
    count — this fails if any link of the option path (bridge cfg
    cache key included) silently drops the multiplier."""
    bridge = _bridge()
    init = {'global_scale': 0.1,
            'local_scale': np.ones(bridge.model.n_pred - 1)}

    def mean_cg(mult):
        opts = SamplerOptions('cg', cg_atol_multiplier=mult)
        _, info = bridge.gibbs(10, 0, init=init, seed=0, options=opts,
                               params_to_save=('coef',))
        return float(np.mean(np.asarray(
            info['_reg_coef_sampling_info']['n_cg_iter'])))

    tight, loose = mean_cg(1.0), mean_cg(1e3)
    assert loose < tight, (tight, loose)


@pytest.mark.slow  # three jitted-chain compiles; the option's live
# plumb-through stays in the fast lane via the reaches-the-solver test
def test_atol_multiplier_survives_resume():
    """gibbs_resume rebuilds its step config from the saved options:
    the restarted chain must equal the uninterrupted one draw-for-draw
    at a non-default multiplier."""
    bridge = _bridge(seed=3)
    init = {'global_scale': 0.1,
            'local_scale': np.ones(bridge.model.n_pred - 1)}
    opts = SamplerOptions('cg', cg_atol_multiplier=25.0)
    full, _ = bridge.gibbs(12, 0, init=init, seed=1, options=opts,
                           params_to_save='all')
    head, info = bridge.gibbs(6, 0, init=init, seed=1, options=opts,
                              params_to_save='all')
    merged, _ = bridge.gibbs_resume(info, 6, merge=True,
                                    prev_samples=head)
    np.testing.assert_array_equal(merged['coef'], full['coef'])


def test_factory_backend_override_forces_storage():
    X = simulate_design(60, 30, binary_frac=.9, format_='sparse', seed=9)
    outcome = simulate_outcome(X, np.zeros(30), 'logit', seed=10)
    model = RegressionModel(outcome, X, family='logit',
                            dtype=np.float32, backend='bitpack')
    assert model.design.backend == 'bitpack'
    model = RegressionModel(outcome, X, family='logit')  # auto default
    assert model.design.backend in ('hybrid', 'bitpack', 'winell', 'ell')


def test_forced_32bit_backend_rejects_wide_dtype_before_the_build(
        monkeypatch):
    """The COMPILED bitpack/winell Pallas kernels are 32-bit; a forced
    pick with a wider dtype on a TPU session must raise at
    CONSTRUCTION (design/sparse.py), not after minutes of packing at
    production scale. Off-TPU the interpret-mode kernels run any
    dtype, so the same construction must succeed there."""
    import jax

    import bayesbridge_tpu.design.sparse as sparse_mod

    X = simulate_design(60, 30, binary_frac=.9, format_='sparse', seed=9)
    outcome = simulate_outcome(X, np.zeros(30), 'logit', seed=10)

    monkeypatch.setattr(sparse_mod.jax, 'default_backend',
                        lambda: 'tpu')
    for backend in ('bitpack', 'winell'):
        with pytest.raises(ValueError, match='float32'):
            RegressionModel(outcome, X, family='logit',
                            dtype=np.float64, backend=backend)
    monkeypatch.undo()

    if jax.default_backend() != 'tpu':
        model = RegressionModel(outcome, X, family='logit',
                                dtype=np.float64, backend='bitpack')
        assert model.design.backend == 'bitpack'


def test_factory_backend_override_warns_for_dense():
    X = np.asarray(simulate_design(50, 8, binary_frac=0.,
                                   format_='dense', seed=2))
    outcome = simulate_outcome(X, np.zeros(8), 'logit', seed=3)
    with pytest.warns(UserWarning, match='sparse-storage'):
        RegressionModel(outcome, X, family='logit', backend='bitpack')
