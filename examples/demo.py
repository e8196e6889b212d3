"""End-to-end demo: sparse logistic bridge regression.

Script equivalent of the reference's demo notebook (reference:
demo.ipynb): simulate an n=10^4 x p=10^3 sparse design (90% binary
predictors), run warm-up CG-Gibbs with MC-EM global-scale optimization,
continue with full sampling, then resume the chain and plot posterior
credible intervals.

Run:  python examples/demo.py [--small]
"""

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from bayesbridge_tpu import (  # noqa: E402
    BayesBridge, RegressionModel, RegressionCoefPrior,
)
from bayesbridge_tpu.utils.simulate_data import (  # noqa: E402
    simulate_design, simulate_outcome,
)
from bayesbridge_tpu.utils.mcmc_summarizer import (  # noqa: E402
    plot_conf_interval, compute_effective_sample_size,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--small', action='store_true',
                        help='tiny version for a quick smoke run')
    parser.add_argument('--cpu', action='store_true',
                        help='force the CPU backend (remote-attached '
                             'accelerators pay an RPC round trip per '
                             'host-driven step, which dwarfs the compute '
                             'at demo sizes)')
    parser.add_argument('--plot', action='store_true')
    args = parser.parse_args()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    n_obs, n_pred = (500, 100) if args.small else (10_000, 1_000)
    n_burnin, n_iter = (50, 150) if args.small else (250, 1_000)

    print(f"simulating n={n_obs}, p={n_pred} sparse logistic data ...")
    X = simulate_design(n_obs, n_pred, binary_frac=.9, seed=111)
    beta_true = np.zeros(n_pred)
    beta_true[:5] = 1.0
    beta_true[5:10] = -0.5
    n_success, n_trial = simulate_outcome(X, beta_true, 'logit', seed=1)

    model = RegressionModel((n_success, n_trial), X, family='logit')
    prior = RegressionCoefPrior(
        bridge_exponent=0.25, regularizing_slab_size=2.)
    bridge = BayesBridge(model, prior)

    # Stage 1: warm-up with MC-EM updates of the global scale.
    print("warm-up (MC-EM global scale) ...")
    _, info = bridge.gibbs(
        n_burnin, 0, coef_sampler_type='cg', seed=0,
        options={'global_scale_update': 'optimize'},
        n_status_update=2)

    # Stage 2: full posterior sampling, resumed from the warm-up state.
    print("sampling ...")
    info['options']['global_scale_update'] = 'sample'
    samples, info = bridge.gibbs_resume(info, n_iter, n_status_update=4)

    # Stage 3: add more draws and merge.
    print("resuming for 250 more draws ...")
    samples, info = bridge.gibbs_resume(
        info, 250 if not args.small else 50,
        merge=True, prev_samples=samples)

    coef = samples['coef']
    ess = compute_effective_sample_size(coef[1:11])
    print("posterior means (first 10 shrunk coefs):",
          np.round(coef[1:11].mean(axis=1), 3))
    print("true:", beta_true[:10])
    print("min/median ESS over those coefs:",
          round(float(np.min(ess))), round(float(np.median(ess))))
    print("runtime: {:.2f} s for {:d} iterations".format(
        info['runtime'], info['n_iter']))

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        ax = plot_conf_interval(coef, n_coef_to_plot=25,
                                coef_index_offset=1)
        ax.figure.savefig('demo_conf_intervals.png', dpi=120)
        print("saved demo_conf_intervals.png")


if __name__ == '__main__':
    main()
