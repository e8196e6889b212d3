"""Flagship-scale A/B of the recycled-basis deflated CG sampler.

Runs the bench's exact steady-state protocol (warm gibbs + timed
gibbs_resume on the cached n=100k x p=50k sparse-logit model) for
cg_recycled_basis in {0, 4, 8, 16} and prints one JSON line per
configuration: iter/s, mean CG iterations/draw, median coef ESS/sec.

The VERDICT r4 directive: the deflated solver shipped dark (zero tests,
off by default, absent from the bench). This sweep is the adopt-or-
delete measurement; its artifact is recorded in BASELINE.md and the
winning k becomes the bench default if it beats k=0.

Usage:  python -m baselines.sweep_deflation            # flagship shape
        BB_BENCH_N=20000 BB_BENCH_P=10000 BB_BENCH_ITER=50 \
            python -m baselines.sweep_deflation        # reduced scale
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from bench import build_data, _build_model_cached  # noqa: E402


def run_one(model, k_basis, n_iter, bridge_exp=0.5):
    from bayesbridge_tpu import (
        BayesBridge, RegressionCoefPrior, SamplerOptions,
    )
    from bayesbridge_tpu.utils.mcmc_summarizer import (
        compute_effective_sample_size,
    )
    n_pred_plus1 = model.design.shape[1]
    prior = RegressionCoefPrior(bridge_exponent=bridge_exp,
                                regularizing_slab_size=2.)
    bridge = BayesBridge(model, prior)
    init = {'coef': np.zeros(n_pred_plus1), 'global_scale': 0.1,
            'local_scale': np.ones(n_pred_plus1 - 1)}
    options = SamplerOptions('cg', cg_recycled_basis=k_basis)
    _, warm = bridge.gibbs(
        n_iter, n_burnin=0, seed=0, init=init, options=options,
        params_to_save=('coef', 'logp'))
    bridge.gibbs_resume(warm, n_iter)  # compile the resume path
    tic = time.time()
    samples, info = bridge.gibbs_resume(warm, n_iter)
    elapsed = time.time() - tic
    n_cg = np.asarray(info['_reg_coef_sampling_info']['n_cg_iter'])
    ess = compute_effective_sample_size(samples['coef'][1:201])
    return {
        'cg_recycled_basis': k_basis,
        'iters_per_sec': round(n_iter / elapsed, 3),
        'elapsed_s': round(elapsed, 2),
        'mean_cg_iter': round(float(n_cg.mean()), 2),
        'median_coef_ess_per_sec':
            round(float(np.median(ess)) / elapsed, 3),
        'final_logp': float(samples['logp'][-1]),
    }


def main():
    import jax
    n_obs = int(os.environ.get('BB_BENCH_N', 100_000))
    n_pred = int(os.environ.get('BB_BENCH_P', 50_000))
    n_iter = int(os.environ.get('BB_BENCH_ITER', 100))
    ks = [int(s) for s in
          os.environ.get('BB_SWEEP_K', '0,4,8,16').split(',')]

    X, outcome = build_data(n_obs, n_pred)
    dtype = np.float32 if jax.default_backend() != 'cpu' else None
    model = _build_model_cached(
        X, outcome, dtype,
        f'n{n_obs}_p{n_pred}_{np.dtype(dtype or np.float64).name}')
    print(json.dumps({'shape': [n_obs, n_pred], 'n_iter': n_iter,
                      'backend': jax.default_backend(),
                      'design_backend': model.design.backend,
                      'has_quad_matmat': model.design.has_quad_matmat()}),
          flush=True)
    for k in ks:
        res = run_one(model, k, n_iter)
        print(json.dumps(res), flush=True)


if __name__ == '__main__':
    main()
