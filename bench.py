"""Benchmark: TPU Gibbs sampler vs the NumPy/SciPy CPU baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline configuration is the BASELINE.json target shape (large
sparse logistic regression, CG sampler, bridge_exponent=0.5), scaled by
default to n=20k x p=10k so the CPU baseline finishes quickly; set
BB_BENCH_N / BB_BENCH_P to override (e.g. the full 100k x 50k for the
TPU side). `vs_baseline` is the wall-clock speedup in Gibbs
iterations/sec over the NumPy/SciPy implementation in
baselines/reference_impl.py (the reference's algorithm on the
reference's CPU stack: scipy CSR matvecs + scipy CG; the upstream
package itself is not buildable here - no Cython).
"""

import json
import os
import sys
import time

import numpy as np


def build_data(n_obs, n_pred, seed=0):
    from bayesbridge_tpu.utils.simulate_data import (
        simulate_design, simulate_outcome,
    )
    X = simulate_design(n_obs, n_pred, binary_frac=.9, seed=seed)
    beta = np.zeros(n_pred)
    beta[:10] = 1.0
    outcome = simulate_outcome(X, beta, 'logit', seed=seed + 1)
    return X, outcome


def time_tpu(X, outcome, n_iter, bridge_exp=0.5):
    import jax
    from bayesbridge_tpu import (
        BayesBridge, RegressionModel, RegressionCoefPrior,
    )

    dtype = np.float32 if jax.default_backend() != 'cpu' else None
    model = RegressionModel(outcome, X, family='logit', dtype=dtype)
    prior = RegressionCoefPrior(bridge_exponent=bridge_exp,
                                regularizing_slab_size=2.)
    bridge = BayesBridge(model, prior)
    # Supplying coef skips the one-time MAP search so the timing measures
    # the steady-state sampling throughput.
    init = {'coef': np.zeros(X.shape[1] + 1), 'global_scale': 0.1,
            'local_scale': np.ones(X.shape[1])}

    kwargs = dict(n_burnin=0, seed=0, coef_sampler_type='cg', init=init,
                  params_to_save=('coef', 'logp'))
    # Warm the chain past its transient (early iterations start at
    # coef=0 with a cold summarizer, so the CG solves and rejection
    # samplers are unrepresentatively slow), then time a steady-state
    # continuation via gibbs_resume. The CPU baseline is timed the same
    # way (run(resume=True) after a warm-up run).
    _, warm_info = bridge.gibbs(n_iter, **kwargs)
    bridge.gibbs_resume(warm_info, n_iter)  # compiles the resume path
    tic = time.time()
    samples, info = bridge.gibbs_resume(warm_info, n_iter)
    elapsed = time.time() - tic
    n_cg = info['_reg_coef_sampling_info']['n_cg_iter']
    from bayesbridge_tpu.utils.mcmc_summarizer import (
        compute_effective_sample_size,
    )
    # ESS over the first 200 non-intercept coefficients (rows are
    # coefficients, last axis is the iteration): a fixed subset covering
    # the 10 signal columns plus 190 noise columns, to bound the FFT
    # autocovariance cost at p=50k scale.
    ess = compute_effective_sample_size(samples['coef'][1:201])
    return n_iter / elapsed, {
        'elapsed_s': elapsed,
        'mean_cg_iter': float(np.mean(n_cg)),
        'final_logp': float(samples['logp'][-1]),
        'median_coef_ess_per_sec': round(float(np.median(ess)) / elapsed, 2),
        'backend': jax.default_backend(),
    }


def time_baseline(X, outcome, n_iter, bridge_exp=0.5):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from baselines.reference_impl import NumpyBridgeGibbs
    gibbs = NumpyBridgeGibbs(X, outcome, family='logit',
                             bridge_exp=bridge_exp, slab_size=2., seed=0)
    # Warm the chain past its transient (mirrors the TPU-side resume
    # timing), then time a steady-state continuation.
    gibbs.run(max(5, n_iter), method='cg')
    tic = time.time()
    gibbs.run(n_iter, method='cg', resume=True)
    elapsed = time.time() - tic
    return n_iter / elapsed, {'elapsed_s': elapsed}


def main():
    n_obs = int(os.environ.get('BB_BENCH_N', 20_000))
    n_pred = int(os.environ.get('BB_BENCH_P', 10_000))
    n_iter_tpu = int(os.environ.get('BB_BENCH_ITER', 200))
    n_iter_np = int(os.environ.get('BB_BENCH_ITER_BASELINE', 5))

    X, outcome = build_data(n_obs, n_pred)

    tpu_rate, tpu_info = time_tpu(X, outcome, n_iter_tpu)
    np_rate, np_info = time_baseline(X, outcome, n_iter_np)

    result = {
        'metric': 'gibbs_iters_per_sec_sparse_logit_cg_'
                  f'n{n_obs}_p{n_pred}',
        'value': round(tpu_rate, 3),
        'unit': 'iter/s',
        'vs_baseline': round(tpu_rate / np_rate, 2),
    }
    print(json.dumps(result))
    print('# details:', json.dumps({
        'tpu': tpu_info, 'baseline_iters_per_sec': round(np_rate, 4),
        'baseline': np_info,
    }), file=sys.stderr)


if __name__ == '__main__':
    main()
