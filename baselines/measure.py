"""Measure the BASELINE.md comparison table.

Runs the five BASELINE.json configurations on (a) this library (on
whatever backend JAX selects — the TPU in the benchmark environment) and
(b) the NumPy/SciPy reference-algorithm implementation, and prints a
markdown table of Gibbs iterations/sec plus ESS/sec for the headline
config.

Usage: python -m baselines.measure [--full]   (--full = n=100k x p=50k)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from baselines.reference_impl import NumpyBridgeGibbs  # noqa: E402


def _tpu_rate(X, outcome, family, method, n_iter, bridge_exp=.5,
              params=('logp',), thin=1, measure_ess=False):
    import jax
    from bayesbridge_tpu import (
        BayesBridge, RegressionModel, RegressionCoefPrior,
    )
    dtype = np.float32 if jax.default_backend() != 'cpu' else None
    model = RegressionModel(outcome, X, family=family, dtype=dtype)
    prior = RegressionCoefPrior(bridge_exponent=bridge_exp,
                                regularizing_slab_size=2.)
    bridge = BayesBridge(model, prior)
    p = X.shape[1]
    init = {'coef': np.zeros(p + 1), 'global_scale': 0.1,
            'local_scale': np.ones(p)}
    kwargs = dict(n_burnin=0, thin=thin, seed=0, coef_sampler_type=method,
                  init=init, params_to_save=params)
    # Warm the chain past its transient, then time a steady-state
    # continuation via gibbs_resume (the CPU side is timed the same way).
    _, warm_info = bridge.gibbs(n_iter, **kwargs)
    bridge.gibbs_resume(warm_info, n_iter)  # compiles the resume path
    tic = time.time()
    samples, info = bridge.gibbs_resume(warm_info, n_iter)
    elapsed = time.time() - tic
    ess_rate = None
    if measure_ess and 'coef' in samples:
        from bayesbridge_tpu.utils.mcmc_summarizer import (
            compute_effective_sample_size,
        )
        # First 200 non-intercept coefficient rows (signal + noise
        # columns), keeping the FFT autocovariance cost bounded.
        ess = compute_effective_sample_size(samples['coef'][1:201])
        ess_rate = float(np.median(ess)) / elapsed
    return n_iter / elapsed, ess_rate


def _np_rate(X, outcome, family, method, n_iter, bridge_exp=.5, reps=3):
    """CPU rate with repetition spread: the single-core host is shared,
    so one timing can be off by 2x (seen as an unexplained 183 -> 108
    iter/s drift in earlier dense-config numbers); report the best of
    `reps` repetitions (least-contended) plus the spread."""
    gibbs = NumpyBridgeGibbs(X, outcome, family=family,
                             bridge_exp=bridge_exp, slab_size=2., seed=0)
    gibbs.run(max(5, n_iter), method=method)  # warm past the transient
    rates = []
    for _ in range(reps):
        tic = time.time()
        gibbs.run(n_iter, method=method, resume=True)
        rates.append(n_iter / (time.time() - tic))
    return max(rates), (max(rates) - min(rates)) / max(rates)


def beyond_hbm():
    """End-to-end Gibbs chain in the beyond-HBM regime: an all-binary
    n=400k x p=50k design (20 GB as int8 dense — exceeds the chip's
    HBM next to the chain state) that `backend='auto'` serves with the
    bitpacked Pallas matvec (5.4 GB of bitmaps). The regime the
    reference handles via MKL CSR from host RAM
    (mkl_matvec.py:17-56)."""
    import jax
    from bayesbridge_tpu import (
        BayesBridge, RegressionModel, RegressionCoefPrior,
    )
    from bayesbridge_tpu.utils.simulate_data import (
        simulate_design, simulate_outcome,
    )
    n_obs, n_pred = 400_000, 50_000
    t0 = time.time()
    X = simulate_design(n_obs, n_pred, binary_frac=1.0, seed=0)
    beta = np.zeros(n_pred)
    beta[:10] = 1.0
    outcome = simulate_outcome(X, beta, 'logit', seed=1)
    print(f"data: {time.time()-t0:.0f}s, nnz={X.nnz:.3g} "
          f"(int8 dense would be {n_obs * n_pred / 1e9:.0f} GB)",
          file=sys.stderr, flush=True)

    t0 = time.time()
    model = RegressionModel(outcome, X, family='logit', dtype=np.float32)
    print(f"design build: {time.time()-t0:.0f}s, "
          f"backend={model.design.backend}", file=sys.stderr, flush=True)
    assert model.design.backend == 'bitpack'

    prior = RegressionCoefPrior(bridge_exponent=.5,
                                regularizing_slab_size=2.)
    bridge = BayesBridge(model, prior)
    init = {'coef': np.zeros(n_pred + 1), 'global_scale': 0.1,
            'local_scale': np.ones(n_pred)}
    n_iter = 30
    _, warm = bridge.gibbs(n_iter, seed=0, coef_sampler_type='cg',
                           init=init, params_to_save=('coef', 'logp'))
    bridge.gibbs_resume(warm, n_iter)
    tic = time.time()
    samples, info = bridge.gibbs_resume(warm, n_iter)
    dt = time.time() - tic
    n_cg = info['_reg_coef_sampling_info']['n_cg_iter']
    print(f"beyond-HBM bitpack Gibbs: {n_iter / dt:.2f} iter/s "
          f"(n={n_obs}, p={n_pred}, mean_cg_iter="
          f"{float(np.mean(n_cg)):.1f}, "
          f"final_logp={float(samples['logp'][-1]):.4g}, "
          f"backend={jax.default_backend()})")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--full', action='store_true',
                        help='headline n=100k x p=50k (TPU side only)')
    parser.add_argument('--beyond-hbm', action='store_true',
                        help='end-to-end bitpack chain at n=400k x p=50k')
    args = parser.parse_args()

    if args.beyond_hbm:
        beyond_hbm()
        return

    from bayesbridge_tpu.utils.simulate_data import (
        simulate_design, simulate_outcome,
    )

    rows = []

    def run(name, X, outcome, family, method, n_tpu, n_np, **kw):
        print(f"measuring: {name} ...", file=sys.stderr, flush=True)
        tpu, ess = _tpu_rate(X, outcome, family, method, n_tpu, **kw)
        if n_np:
            np_rate, np_spread = _np_rate(
                X, outcome, family, method, n_np,
                bridge_exp=kw.get('bridge_exp', .5))
        else:
            np_rate, np_spread = float('nan'), None
        rows.append((name, tpu, np_rate, np_spread,
                     tpu / np_rate if n_np else None, ess))

    # 1. Linear, dense n=500 x p=100, cholesky.
    np.random.seed(0)
    X = simulate_design(500, 100, binary_frac=0., format_='dense', seed=0)
    beta = np.zeros(100); beta[:5] = 1.
    y = simulate_outcome(X, beta, 'linear', seed=1)
    run('linear dense 500x100 cholesky', X, y, 'linear', 'cholesky',
        200, 200)

    # 2. Logistic (binomial), dense, cholesky.
    n_trial = 1 + np.random.binomial(10, .5, size=500).astype(np.int64)
    out = simulate_outcome(X, beta, 'logit', n_trial=n_trial, seed=2)
    run('logit binomial dense 500x100 cholesky', X, out, 'logit',
        'cholesky', 200, 200)

    # 3. Linear, sparse CSR, CG.
    Xs = simulate_design(5000, 2000, binary_frac=.9, seed=3)
    beta = np.zeros(2000); beta[:10] = 1.
    y = simulate_outcome(Xs, beta, 'linear', seed=4)
    run('linear sparse 5000x2000 cg', Xs, y, 'linear', 'cg', 100, 20)

    # 4. Headline: large sparse logistic, CG, bridge_exp=.5.
    if args.full:
        n_obs, n_pred, n_np = 100_000, 50_000, 0
    else:
        n_obs, n_pred, n_np = 20_000, 10_000, 5
    Xb = simulate_design(n_obs, n_pred, binary_frac=.9, seed=5)
    beta = np.zeros(n_pred); beta[:10] = 1.
    out = simulate_outcome(Xb, beta, 'logit', seed=6)
    run(f'logit sparse {n_obs}x{n_pred} cg', Xb, out, 'logit', 'cg',
        100, n_np, params=('coef', 'logp'), measure_ess=True)

    # 5. Demo workflow: bridge_exp=.25, thinning + summaries.
    Xd = simulate_design(10_000, 1_000, binary_frac=.9, seed=7)
    beta = np.zeros(1_000); beta[:10] = 1.
    out = simulate_outcome(Xd, beta, 'logit', seed=8)
    run('demo logit 10000x1000 cg thin=2 exp=.25', Xd, out, 'logit',
        'cg', 250, 25, bridge_exp=.25, params=('coef', 'logp'), thin=2,
        measure_ess=True)

    print("\n| Config | TPU iter/s | NumPy iter/s (spread) | speedup "
          "| ESS/sec |")
    print("|---|---|---|---|---|")
    for name, tpu, np_r, np_spread, speedup, ess in rows:
        np_txt = "-"
        if np_r == np_r:
            np_txt = f"{np_r:.3g}"
            if np_spread is not None:
                np_txt += f" (±{100 * np_spread:.0f}%)"
        print("| {} | {:.3g} | {} | {} | {} |".format(
            name, tpu, np_txt,
            f"{speedup:.1f}x" if speedup else "-",
            f"{ess:.3g}" if ess else "-"))


if __name__ == '__main__':
    main()
