"""Round-5 combined TPU measurement program.

One process, one device hold, artifacts appended as JSON lines to
baselines/r5_measure_artifact.jsonl the moment each leg lands (the
axon tunnel's compile latency varies by an order of magnitude between
sessions, so every partial result must survive a timeout):

  1. reduced-scale smoke — correctness gate
  2. flagship CG-tolerance sweep (cg_atol_multiplier in BB_R5_TOLS)
  3. flagship hybrid-vs-bitpack A/B (BB_R5_BACKENDS)

The deflation legs (smoke k=8 + flagship BB_R5_KS sweep) measured the
recycled-basis deflated-PCG option and sealed its removal — flagship
k=8 lost 31% throughput with zero CG iterations saved (artifact
baselines/r5_measure_artifact.jsonl, BASELINE.md post-mortem) — so
this program now sweeps only the surviving knobs.

Usage: python -m baselines.r5_measure            # full program
       BB_R5_LEGS=smoke,tol python -m baselines.r5_measure
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from bench import (  # noqa: E402
    build_data, _build_model_cached, design_storage_bytes, json_safe,
)

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   'r5_measure_artifact.jsonl')


def emit(rec):
    rec = {'t': round(time.time(), 1), **rec}
    line = json.dumps(json_safe(rec), allow_nan=False)
    print(line, flush=True)
    with open(ART, 'a') as f:
        f.write(line + '\n')


def run_one(model, n_iter, atol_mult=1.0, bridge_exp=0.5, seed=0):
    from bayesbridge_tpu import (
        BayesBridge, RegressionCoefPrior, SamplerOptions,
    )
    from bayesbridge_tpu.utils.mcmc_summarizer import (
        compute_effective_sample_size,
    )
    p1 = model.design.shape[1]
    bridge = BayesBridge(model, RegressionCoefPrior(
        bridge_exponent=bridge_exp, regularizing_slab_size=2.))
    init = {'coef': np.zeros(p1), 'global_scale': 0.1,
            'local_scale': np.ones(p1 - 1)}
    options = SamplerOptions('cg', cg_atol_multiplier=atol_mult)
    t0 = time.time()
    _, warm = bridge.gibbs(
        n_iter, n_burnin=0, seed=seed, init=init, options=options,
        params_to_save=('coef', 'logp'))
    t_warm = time.time() - t0
    bridge.gibbs_resume(warm, n_iter)  # compile the resume path
    tic = time.time()
    samples, info = bridge.gibbs_resume(warm, n_iter)
    elapsed = time.time() - tic
    n_cg = np.asarray(info['_reg_coef_sampling_info']['n_cg_iter'])
    ess = compute_effective_sample_size(samples['coef'][1:201])
    return {
        'cg_atol_multiplier': atol_mult,
        'design_backend': model.design.backend,
        'iters_per_sec': round(n_iter / elapsed, 3),
        'elapsed_s': round(elapsed, 2),
        'warm_plus_compile_s': round(t_warm, 1),
        'mean_cg_iter': round(float(n_cg.mean()), 2),
        'median_coef_ess_per_sec':
            round(float(np.median(ess)) / elapsed, 3),
        'final_logp': float(samples['logp'][-1]),
        'n_timed_iter': n_iter,
    }


def get_model(n_obs, n_pred, backend=None):
    import jax
    X, outcome = build_data(n_obs, n_pred, seed=5 if n_obs < 100_000
                            else 0)
    dtype = np.float32 if jax.default_backend() != 'cpu' else None
    dname = np.dtype(dtype or np.float64).name
    suffix = '' if backend in (None, 'hybrid') else f'_{backend}'
    return _build_model_cached(
        X, outcome, dtype, f'n{n_obs}_p{n_pred}_{dname}{suffix}',
        backend=None if backend in (None, 'hybrid') else backend)


def main():
    legs = os.environ.get('BB_R5_LEGS', 'smoke,tol,ab').split(',')
    tols = [float(s) for s in
            os.environ.get('BB_R5_TOLS', '10,3').split(',')]
    backends = os.environ.get('BB_R5_BACKENDS', 'bitpack').split(',')
    n_iter = int(os.environ.get('BB_BENCH_ITER', 100))

    if 'smoke' in legs:
        model = get_model(20_000, 10_000)
        res = run_one(model, 40)
        emit({'leg': 'smoke', 'shape': [20_000, 10_000], **res})

    if {'tol', 'ab'} & set(legs):
        flag = get_model(100_000, 50_000)

    if 'tol' in legs:
        for m in tols:
            res = run_one(flag, n_iter, atol_mult=m)
            emit({'leg': 'atol', 'shape': [100_000, 50_000], **res})

    if 'ab' in legs:
        emit({'leg': 'ab_note',
              'hybrid_gb': round(design_storage_bytes(flag.design) / 1e9,
                                 3)})
        for be in backends:
            model = get_model(100_000, 50_000, backend=be)
            res = run_one(model, n_iter)
            res['design_gb'] = round(
                design_storage_bytes(model.design) / 1e9, 3)
            emit({'leg': 'backend_ab', 'shape': [100_000, 50_000],
                  **res})


if __name__ == '__main__':
    main()
