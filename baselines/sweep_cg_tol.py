"""Flagship-scale sweep of the CG stopping tolerance vs ESS/sec.

The reference budgets each CG solve with atol = 1e-5 * sqrt(p)
(reg_coef_sampler.py:95-96) — a per-draw accuracy rule chosen for CPU
economics. On TPU the question is whether that budget maximizes the
STATISTICAL throughput (median coef ESS/sec): a looser solve costs
accuracy but buys iterations/sec; a tighter one the reverse. This
sweeps cg_atol_multiplier over decades around the reference rule and
prints one JSON line per setting (iter/s, mean CG iters, ESS/sec).

Usage:  python -m baselines.sweep_cg_tol                 # flagship
        BB_BENCH_N=20000 BB_BENCH_P=10000 BB_BENCH_ITER=100 \
            BB_SWEEP_TOL=0.1,1,10,100 python -m baselines.sweep_cg_tol
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from bench import build_data, _build_model_cached  # noqa: E402


def run_one(model, atol_mult, n_iter, bridge_exp=0.5):
    from bayesbridge_tpu import (
        BayesBridge, RegressionCoefPrior, SamplerOptions,
    )
    from bayesbridge_tpu.utils.mcmc_summarizer import (
        compute_effective_sample_size,
    )
    n_pred_plus1 = model.design.shape[1]
    bridge = BayesBridge(model, RegressionCoefPrior(
        bridge_exponent=bridge_exp, regularizing_slab_size=2.))
    init = {'coef': np.zeros(n_pred_plus1), 'global_scale': 0.1,
            'local_scale': np.ones(n_pred_plus1 - 1)}
    options = SamplerOptions('cg', cg_atol_multiplier=atol_mult)
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
        'cg_atol_multiplier': atol_mult,
        'iters_per_sec': round(n_iter / elapsed, 3),
        'elapsed_s': round(elapsed, 2),
        'mean_cg_iter': round(float(n_cg.mean()), 2),
        'median_coef_ess_per_sec':
            round(float(np.median(ess)) / elapsed, 3),
        'final_logp': float(samples['logp'][-1]),
        'n_timed_iter': n_iter,
    }


def main():
    import jax
    n_obs = int(os.environ.get('BB_BENCH_N', 100_000))
    n_pred = int(os.environ.get('BB_BENCH_P', 50_000))
    n_iter = int(os.environ.get('BB_BENCH_ITER', 100))
    mults = [float(s) for s in
             os.environ.get('BB_SWEEP_TOL', '0.1,1,10,100').split(',')]
    X, outcome = build_data(n_obs, n_pred)
    dtype = np.float32 if jax.default_backend() != 'cpu' else None
    model = _build_model_cached(
        X, outcome, dtype,
        f'n{n_obs}_p{n_pred}_{np.dtype(dtype or np.float64).name}')
    print(json.dumps({'shape': [n_obs, n_pred], 'n_iter': n_iter,
                      'backend': jax.default_backend(),
                      'design_backend': model.design.backend}), flush=True)
    for m in mults:
        print(json.dumps(run_one(model, m, n_iter)), flush=True)


if __name__ == '__main__':
    main()
