"""Flagship-shape A/B: hybrid int8 blocks vs the bitpack byte-LUT
backend (VERDICT r4 #2).

`backend='auto'` picks hybrid vs bitpack by HBM byte budget alone
(design/sparse.py); this measures the two head-to-head at the exact
regime the build exists for — the 90%-binary n=100k x p=50k sparse
logit — using the bench's steady-state protocol. Bitpack stores the
binary block at 1 bit/element in both orientations (8x fewer bytes
than int8), so even a throughput tie frees ~4 GB of HBM headroom; the
measured answer justifies (or overturns) the auto-select rule.

Usage:  python -m baselines.sweep_backend_ab
        BB_BENCH_N=20000 BB_BENCH_P=10000 BB_BENCH_ITER=50 \
            python -m baselines.sweep_backend_ab
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from bench import build_data, _build_model_cached, design_storage_bytes \
    # noqa: E402


def run_one(model, n_iter, bridge_exp=0.5):
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
    _, warm = bridge.gibbs(
        n_iter, n_burnin=0, seed=0, init=init,
        options=SamplerOptions('cg'), params_to_save=('coef', 'logp'))
    bridge.gibbs_resume(warm, n_iter)
    tic = time.time()
    samples, info = bridge.gibbs_resume(warm, n_iter)
    elapsed = time.time() - tic
    n_cg = np.asarray(info['_reg_coef_sampling_info']['n_cg_iter'])
    ess = compute_effective_sample_size(samples['coef'][1:201])
    return {
        'design_backend': model.design.backend,
        'design_gb': round(design_storage_bytes(model.design) / 1e9, 3),
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
    backends = os.environ.get('BB_SWEEP_BACKENDS',
                              'hybrid,bitpack').split(',')

    X, outcome = build_data(n_obs, n_pred)
    dtype = np.float32 if jax.default_backend() != 'cpu' else None
    dname = np.dtype(dtype or np.float64).name
    print(json.dumps({'shape': [n_obs, n_pred], 'n_iter': n_iter,
                      'backend': jax.default_backend()}), flush=True)
    for be in backends:
        # 'auto' and 'hybrid' share the bench's cache key (auto picks
        # hybrid at the flagship shape — asserted below) so the
        # already-built flagship blocks reload; other forced backends
        # get their own key.
        shared = be in ('auto', 'hybrid')
        suffix = '' if shared else f'_{be}'
        model = _build_model_cached(
            X, outcome, dtype, f'n{n_obs}_p{n_pred}_{dname}{suffix}',
            backend=None if shared else be)
        assert be == 'auto' or model.design.backend == be, \
            (be, model.design.backend)
        print(json.dumps(run_one(model, n_iter)), flush=True)


if __name__ == '__main__':
    main()
